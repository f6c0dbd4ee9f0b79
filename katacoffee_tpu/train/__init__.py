from katacoffee_tpu.train.losses import compute_losses
from katacoffee_tpu.train.train import (
    TrainConfig,
    TrainState,
    init_train_state,
    make_train_step,
    make_sharded_train_step,
)
from katacoffee_tpu.train.replay import ReplayBuffer
