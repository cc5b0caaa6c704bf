from eemflow_tpu.train.loss import sequence_loss
from eemflow_tpu.train.optim import make_optimizer, onecycle_lr
