"""Neural building blocks (L3): KAN layers, cells, encoders, denoisers."""

from fetode_tpu.nn.kan import (  # noqa: F401
    KANConfig,
    KANLinearConfig,
    kan_apply,
    kan_init,
    kan_linear_apply,
    kan_linear_init,
    kan_linear_regularization,
    kan_linear_state,
    kan_linear_update_grid,
    kan_regularization,
    kan_state_init,
    kanfet_apply,
    kanfet_config,
    kanfet_init,
    kanfet_state_init,
)
