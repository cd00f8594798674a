"""Diagnostics: hysteresis sweeps, plots, metrics logging, profiling."""

from fetode_tpu.diag.hysteresis import loop_openness, plot_loops, sweep_loop  # noqa: F401
from fetode_tpu.diag.logging import MetricLogger  # noqa: F401
from fetode_tpu.diag.plots import (  # noqa: F401
    plot_forecast,
    plot_losses,
    plot_model_comparison,
    plot_trajectory,
)
from fetode_tpu.diag.profiling import annotate, sync, time_fn, trace  # noqa: F401
