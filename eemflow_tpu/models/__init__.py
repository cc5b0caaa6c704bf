from eemflow_tpu.models.registry import (
    MODEL_REGISTRY,
    fast_eval_kwargs,
    get_eval_model,
    get_model,
)
