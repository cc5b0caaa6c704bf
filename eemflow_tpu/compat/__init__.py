from eemflow_tpu.compat.torch_loader import (
    load_torch_checkpoint,
    torch_state_dict_to_flax,
    strip_module_prefix,
)
