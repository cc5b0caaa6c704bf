from eemflow_tpu.data.meshflow import motion_propagate
from eemflow_tpu.data.gt_flow import estimate_corresponding_gt_flow
from eemflow_tpu.data.augment import FlowAugmentor, DenseSparseAugmentor
