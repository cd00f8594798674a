"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the environment before the first jax import anywhere in the test
process — pytest imports conftest first, so this is the place.
"""

import os

# The axon TPU plugin on this machine ignores JAX_PLATFORMS; set both the
# env knobs and the config flag below to reliably pin tests to CPU.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Double precision available for solver-accuracy oracles; library code is
# dtype-polymorphic (derives dtypes from inputs) so f32 paths stay exercised
# by passing explicit float32 arrays.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)

# Persistent compilation cache: jit-compile time dominates the suite
# (~19 min cold); cached reruns skip recompilation of unchanged programs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
