from eemflow_tpu.events.voxel import (
    events_to_mask,
    events_to_voxel_grid,
    events_to_voxel_grid_batch,
    events_to_voxel_grid_np,
    pad_events,
    voxelize_batch_nhwc,
)
from eemflow_tpu.events.sequence import EventSequence
from eemflow_tpu.events.io import (
    read_compressed_events,
    read_events_h5,
    read_flo,
    read_flow_npy,
)
