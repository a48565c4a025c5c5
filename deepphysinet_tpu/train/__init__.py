from deepphysinet_tpu.train.losses import build_loss
from deepphysinet_tpu.train.optim import build_optimizer
from deepphysinet_tpu.train.schedules import build_lr_schedule

__all__ = ["build_loss", "build_optimizer", "build_lr_schedule"]
