"""Training loops: jitted step builders, optimisers, workload drivers."""

from fetode_tpu.train.loop import (  # noqa: F401
    TrainState,
    init_state,
    make_epoch_scanner,
    make_minibatch_epoch,
    make_train_step,
)
from fetode_tpu.train.optim import make_optimizer  # noqa: F401
