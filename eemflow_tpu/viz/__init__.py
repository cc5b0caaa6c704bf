from eemflow_tpu.viz.flow_viz import (
    flow_to_image,
    visualize_optical_flow,
    events_to_event_image,
)
