from eemflow_tpu.ops.pad import InputPadder, ImagePadder
from eemflow_tpu.ops.pooling import avg_pool2d
from eemflow_tpu.ops.upsample import (
    resize_bilinear,
    upsample_flow_to,
    upsample2d_flow_as,
    upflow8,
    convex_upsample_flow,
)
from eemflow_tpu.ops.warp import (bilinear_sampler, backwarp, backwarp_masked,
                                  forward_interpolate)
from eemflow_tpu.ops.correlation import local_correlation
from eemflow_tpu.ops.corr_block import build_corr_pyramid, lookup_corr_pyramid
