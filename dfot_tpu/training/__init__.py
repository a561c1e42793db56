from .noise_levels import NoiseLevelConfig, training_noise_levels
from .optim import make_lr_schedule, make_optimizer
from .state import TrainState, create_train_state, ema_update
from .trainer import make_train_step
