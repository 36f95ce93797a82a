from fiber_tpu.train.optim import make_optimizer, make_lr_schedule  # noqa: F401
from fiber_tpu.train.trainer import CoarseTrainer, TrainState  # noqa: F401
