from eemflow_tpu.models.registry import get_model, get_eval_model, MODEL_REGISTRY
