"""Whole-solve kernel for the cond-diffusion node encoder
(ops/pallas_node_enc.py) must match the XLA dopri5 path of
``node_encoder_apply`` — final latent state, parameter gradients, the z0
cotangent AND the interpolated-signal (x_seq -> past/x_proj) cotangent —
in interpret mode, and plug in via ``solver_mode='pallas'``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.models.cond_diffusion import (
    NodeEncoderCfg,
    node_encoder_apply,
    node_encoder_init,
)

CFG = dict(d_in=3, cond_dim=16, x_proj_dim=8, ode_hidden=16,
           rtol=1e-3, atol=1e-4, max_steps=24)


@pytest.fixture(scope="module")
def setup():
    cfg = NodeEncoderCfg(**CFG)
    params = node_encoder_init(jax.random.PRNGKey(0), cfg)
    past = jax.random.normal(jax.random.PRNGKey(1), (4, 20, cfg.d_in),
                             dtype=jnp.float32)
    return cfg, params, past


def test_final_state_matches_xla(setup):
    cfg, params, past = setup
    ref = node_encoder_apply(params, cfg, past)
    out = node_encoder_apply(params, cfg._replace(solver_mode="pallas"),
                             past)
    assert out.shape == ref.shape == (4, cfg.cond_dim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_scan_autodiff(setup):
    cfg, params, past = setup
    tgt = jax.random.normal(jax.random.PRNGKey(2), (4, cfg.cond_dim),
                            dtype=jnp.float32)

    def loss(p, x, mode):
        out = node_encoder_apply(p, cfg._replace(solver_mode=mode), x)
        return jnp.mean((out - tgt) ** 2)

    gk = jax.grad(lambda p, x: loss(p, x, "pallas"), argnums=(0, 1))(
        params, past)
    gs = jax.grad(lambda p, x: loss(p, x, "scan"), argnums=(0, 1))(
        params, past)
    # the past cotangent exercises the in-kernel signal scatter (g_xseq
    # -> x_proj chain); param grads cover LN + all three field layers
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gs)):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.999, cos
        np.testing.assert_allclose(a, b, rtol=0.02, atol=5e-5)


def test_signal_cotangent_nonzero_beyond_t0(setup):
    cfg, params, past = setup

    def loss(x):
        out = node_encoder_apply(params, cfg._replace(solver_mode="pallas"),
                                 x)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(past)
    # interior time steps feed the solve only through interpolation; a
    # broken scatter would zero them (index 0 also feeds z0 directly)
    assert float(jnp.abs(g[:, 1:-1]).sum()) > 0
    assert np.isfinite(np.asarray(g)).all()
