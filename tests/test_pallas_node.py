"""Whole-solve Pallas NODE kernel: parity vs the while-mode XLA odeint
(interpret mode on CPU), batch padding, and stack validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.models.predprey import (
    PredPreyNODE,
    PredPreyTask,
    generate_data,
    predprey_init,
)
from fetode_tpu.models.predprey import predict as pp_predict
from fetode_tpu.ops.pallas_node import pallas_kanfet_solve


@pytest.fixture(scope="module")
def setup():
    task = PredPreyTask()
    ts, _, _ = generate_data(task)
    ts = ts[:40].astype(jnp.float32)  # short horizon keeps interpret fast
    spec = PredPreyNODE.kanfet(max_steps=256, solver_mode="while")
    params = predprey_init(jax.random.PRNGKey(0), spec)
    return spec, params, ts


def _reference(params, spec, x0s, ts):
    return jax.vmap(lambda x0: pp_predict(params, spec, x0, ts))(x0s)


def test_whole_solve_matches_odeint(setup):
    spec, params, ts = setup
    x0s = jax.random.uniform(jax.random.PRNGKey(1), (4, 2), jnp.float32,
                             0.5, 2.0)
    ref = _reference(params, spec, x0s, ts)
    out = pallas_kanfet_solve(params, spec.kan, x0s, ts, rtol=spec.rtol,
                              atol=spec.atol, max_steps=256, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_whole_solve_batch_padding(setup):
    """B not a multiple of block_b: padded lanes must not leak into the
    returned trajectories."""
    spec, params, ts = setup
    x0s = jax.random.uniform(jax.random.PRNGKey(2), (5, 2), jnp.float32,
                             0.5, 2.0)
    full = pallas_kanfet_solve(params, spec.kan, x0s, ts, rtol=spec.rtol,
                               atol=spec.atol, max_steps=256,
                               interpret=True, block_b=4)
    assert full.shape == (5, ts.shape[0], 2)
    solo = pallas_kanfet_solve(params, spec.kan, x0s[4:5], ts,
                               rtol=spec.rtol, atol=spec.atol,
                               max_steps=256, interpret=True)
    np.testing.assert_allclose(np.asarray(full[4]), np.asarray(solo[0]),
                               rtol=1e-5, atol=1e-5)


def test_whole_solve_rejects_non_kanfet(setup):
    spec, params, ts = setup
    # a stack with the ferro branch off is not a KANFET stack
    from fetode_tpu.nn.kan import KANConfig, KANLinearConfig

    cfg = KANConfig(layers=tuple(
        KANLinearConfig(in_features=i, out_features=o, ferro_num_basis=0)
        for i, o in ((2, 10), (10, 2))))
    x0s = jnp.ones((2, 2), jnp.float32)
    with pytest.raises(ValueError):
        pallas_kanfet_solve(params, cfg, x0s, ts, interpret=True)
