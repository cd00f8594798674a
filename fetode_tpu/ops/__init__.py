"""Basis-function and numeric primitives (the L1 "ops" layer)."""

from fetode_tpu.ops.bsplines import (  # noqa: F401
    bspline_basis,
    curve2coeff,
    make_grid,
    refine_grid,
)
from fetode_tpu.ops.ferro import (  # noqa: F401
    FerroConfig,
    FerroParams,
    FerroState,
    ferro_apply,
    ferro_basis,
    ferro_init,
    ferro_state_init,
)
from fetode_tpu.ops.interp import cubic_hermite, linear_interp  # noqa: F401
from fetode_tpu.ops.pallas_adjoint import (  # noqa: F401
    make_train_solver,
    pallas_kanfet_solve_train,
)
from fetode_tpu.ops.pallas_ddpm import pallas_eps_head_sample  # noqa: F401
from fetode_tpu.ops.pallas_node import pallas_kanfet_solve  # noqa: F401
from fetode_tpu.ops.logistic import (  # noqa: F401
    HystereticLogisticParams,
    HystereticLogisticState,
    LogisticParams,
    hysteretic_logistic_basis,
    hysteretic_logistic_init,
    hysteretic_logistic_state,
    logistic_basis,
    logistic_init,
)
