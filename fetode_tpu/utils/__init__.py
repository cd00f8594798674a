"""Shared utilities (initialisers, pytree helpers, config plumbing)."""

from fetode_tpu.utils.init import kaiming_uniform, uniform  # noqa: F401
from fetode_tpu.utils.trees import trainable_mask  # noqa: F401
