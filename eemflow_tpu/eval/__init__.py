from eemflow_tpu.eval.metrics import flow_error
from eemflow_tpu.eval.runner import Tester
