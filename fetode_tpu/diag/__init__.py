"""Diagnostics: hysteresis sweeps, plots, metrics logging, profiling."""
