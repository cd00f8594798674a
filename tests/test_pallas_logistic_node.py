"""Whole-solve logistic-NODE adjoint kernel (ops/pallas_logistic_node.py)
must match the XLA dopri5 path of the KanFetNODE 'plain' field —
forward, parameter gradients, and h0 cotangent — in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.models.ecg import (
    KanFetNODESpec,
    kanfet_node_apply,
    kanfet_node_field,
    kanfet_node_init,
)
from fetode_tpu.ops.pallas_logistic_node import pallas_logistic_node_solve
from fetode_tpu.solvers.dopri5 import odeint_dopri5


@pytest.fixture(scope="module")
def setup():
    spec = KanFetNODESpec(T=24, latent_dim=8, num_basis=4, max_steps=16)
    params = kanfet_node_init(jax.random.PRNGKey(0), spec)
    h0 = jax.random.normal(jax.random.PRNGKey(1), (5, spec.latent_dim))
    return spec, params, h0


def _xla_solve(params, spec, h0, mode="while"):
    ts = jnp.asarray([0.0, 1.0], h0.dtype)
    return odeint_dopri5(lambda t, h: kanfet_node_field(params, spec, t, h),
                         h0, ts, rtol=spec.rtol, atol=spec.atol,
                         max_steps=spec.max_steps, mode=mode)[-1]


def test_forward_matches_xla(setup):
    spec, params, h0 = setup
    ref = _xla_solve(params, spec, h0)
    out = pallas_logistic_node_solve(params, h0, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_scan_autodiff(setup):
    spec, params, h0 = setup
    sub = {"field_mixer": params["field_mixer"],
           "proj_w": params["proj_w"], "proj_b": params["proj_b"]}

    def loss_kernel(fp):
        p = dict(params, **fp)
        return jnp.sum(pallas_logistic_node_solve(p, h0, spec) ** 2)

    def loss_scan(fp):
        p = dict(params, **fp)
        return jnp.sum(_xla_solve(p, spec, h0, mode="scan") ** 2)

    gk = jax.grad(loss_kernel)(sub)
    gs = jax.grad(loss_scan)(sub)
    fa = np.concatenate([np.ravel(v) for v in
                         jax.tree_util.tree_leaves(gk)])
    fb = np.concatenate([np.ravel(v) for v in
                         jax.tree_util.tree_leaves(gs)])
    rel = np.linalg.norm(fa - fb) / (np.linalg.norm(fb) + 1e-30)
    assert rel < 1e-4, rel


def test_h0_cotangent_matches(setup):
    spec, params, h0 = setup
    gk = jax.grad(lambda h: jnp.sum(
        pallas_logistic_node_solve(params, h, spec) ** 2))(h0)
    gs = jax.grad(lambda h: jnp.sum(
        _xla_solve(params, spec, h, mode="scan") ** 2))(h0)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gs),
                               rtol=1e-4, atol=1e-6)


def test_model_apply_pallas_mode(setup):
    spec, params, h0 = setup
    x = jax.random.normal(jax.random.PRNGKey(2), (5, spec.T))
    ps = spec._replace(solver_mode="pallas")
    np.testing.assert_allclose(
        np.asarray(kanfet_node_apply(params, ps, x)),
        np.asarray(kanfet_node_apply(params, spec, x)),
        rtol=1e-5, atol=1e-5)

    def loss(p, s):
        return jnp.sum(kanfet_node_apply(p, s, x) ** 2)

    gp = jax.grad(loss)(params, ps)
    gs = jax.grad(loss)(params, spec)
    for name in ("encoder_w", "cls_w", "proj_w"):
        np.testing.assert_allclose(np.asarray(gp[name]),
                                   np.asarray(gs[name]),
                                   rtol=1e-4, atol=1e-5)


def test_mlp_field_falls_back(setup):
    spec, params, h0 = setup
    ms = KanFetNODESpec(T=24, latent_dim=8, num_basis=4, max_steps=16,
                        field="mlp", solver_mode="pallas")
    mp = kanfet_node_init(jax.random.PRNGKey(3), ms)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, ms.T))
    out = kanfet_node_apply(mp, ms, x)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sharded_matches_per_shard_solves(setup):
    """shard_map DP == concatenated per-shard solves + psum'd grads
    (batch-global step control makes per-shard the defined contract)."""
    import jax.flatten_util
    from fetode_tpu.ops.pallas_logistic_node import (
        pallas_logistic_node_solve_sharded,
    )
    from fetode_tpu.parallel import make_mesh

    spec, params, _ = setup
    mesh = make_mesh(8)
    h0 = jax.random.normal(jax.random.PRNGKey(6), (16, spec.latent_dim))

    def loss_sharded(fp):
        p = dict(params, **fp)
        return jnp.sum(pallas_logistic_node_solve_sharded(
            p, h0, spec, mesh) ** 2)

    def loss_pershard(fp):
        p = dict(params, **fp)
        outs = [pallas_logistic_node_solve(p, h0[2 * i:2 * i + 2], spec)
                for i in range(8)]
        return jnp.sum(jnp.concatenate(outs) ** 2)

    sub = {"field_mixer": params["field_mixer"],
           "proj_w": params["proj_w"], "proj_b": params["proj_b"]}
    l1, g1 = jax.value_and_grad(loss_sharded)(sub)
    l2, g2 = jax.value_and_grad(loss_pershard)(sub)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-4, atol=1e-6)
