from .losses import build_loss
from .optim import build_optimizer, build_schedule
from .saver import Saver
from .steps import BetaPolicy, TrainState, make_gan_step, make_rd_step
from .trainer import Trainer, build_trainer
