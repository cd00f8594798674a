"""Numerical-safety debug utilities.

SURVEY.md §5.2: the reference's analogue is
``torch.autograd.set_detect_anomaly(True)`` and inline NaN guards; here:
a `debug_nans` context (XLA-level NaN detection), an assert-style finite
check for tests/drivers, and a pytree health report.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable XLA NaN detection inside the context (jit-level anomaly mode)."""
    prev = bool(jax.config.jax_debug_nans)
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(tree, name: str = "tree"):
    """Raise if any leaf contains non-finite values (host-synchronous;
    the reference's ``_check_finite``, train_kan_fet_ett.py:46-49)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not bool(jnp.isfinite(leaf).all()):
            raise FloatingPointError(f"non-finite values in {name}{path}")
    return tree


def tree_health(tree) -> dict:
    """Summary stats per leaf: max |x|, any non-finite — for debugging
    exploding solves without flooding logs."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        out[key] = {
            "max_abs": float(jnp.abs(leaf).max()) if leaf.size else 0.0,
            "nonfinite": int((~jnp.isfinite(leaf)).sum()),
        }
    return out


def device_init_watchdog(timeout_s: float = 300.0):
    """Fail fast if backend init hangs (a dead remote-TPU tunnel blocks
    ``jax.devices()`` indefinitely with no exception to catch).  Arms a
    daemon thread that hard-exits after ``timeout_s``; call the returned
    ``disarm()`` once devices are up.  ``timeout_s <= 0`` disables (the
    opt-out for FETODE_DEVICE_TIMEOUT).  Used by the CLI around its
    first device touch; bench.py keeps a dependency-free local copy so
    the guard is armed before any fetode_tpu import runs."""
    import os
    import sys
    import threading

    if timeout_s <= 0:
        return lambda: None
    done = threading.Event()

    def watch():
        if not done.wait(timeout_s):
            print(f"FATAL: jax device init exceeded {timeout_s:.0f}s "
                  "(remote TPU tunnel down?). Pin the platform with "
                  "--platform cpu, set FETODE_DEVICE_TIMEOUT=0 to wait "
                  "forever, or fix the tunnel.", file=sys.stderr,
                  flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    return done.set


def enable_compile_cache(path: str | None = None,
                         min_compile_secs: float = 0.5) -> str:
    """Point jax's persistent compilation cache at a stable directory so
    repeat runs skip recompilation (compile dominates cold CLI runs).

    Default location: ``$FETODE_CACHE_DIR``, else ``.jax_cache`` next to
    the package checkout (matching tests/conftest.py, bench.py and
    __graft_entry__.py).  Returns the directory used.
    """
    import os

    import jax

    if path is None:
        path = os.environ.get("FETODE_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
