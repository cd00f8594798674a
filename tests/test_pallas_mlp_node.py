"""Whole-solve mlp-NODE adjoint kernel (ops/pallas_mlp_node.py) must match
the XLA dopri5 path of the KanFetNODE 'mlp' field — forward, parameter
gradients (incl. the in-kernel B-spline KAN layers), and the h0
cotangent — in interpret mode."""

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
from fetode_tpu.ops.pallas_mlp_node import _FIELD_KEYS, pallas_mlp_node_solve
from fetode_tpu.solvers.dopri5 import odeint_dopri5


@pytest.fixture(scope="module")
def setup():
    spec = KanFetNODESpec(T=24, latent_dim=8, num_basis=4, ode_hidden=16,
                          field="mlp", max_steps=16)
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
    out = pallas_mlp_node_solve(params, h0, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_grads_match_scan_autodiff(setup):
    spec, params, h0 = setup
    sub = {k: params[k] for k in _FIELD_KEYS}

    def loss_kernel(fp):
        p = dict(params, **fp)
        return jnp.sum(pallas_mlp_node_solve(p, h0, spec) ** 2)

    def loss_scan(fp):
        p = dict(params, **fp)
        return jnp.sum(_xla_solve(p, spec, h0, mode="scan") ** 2)

    gk = jax.grad(loss_kernel)(sub)
    gs = jax.grad(loss_scan)(sub)
    # Leaf-wise so a mismatch names the offending parameter.  Grid knot
    # buffers are skipped: they are non-trainable (never touched by an
    # optimizer), the kernel deliberately reports zero for them, while
    # scan autodiff emits their true (tiny) cotangent.
    flat_k = jax.tree_util.tree_leaves_with_path(gk)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(gs))
    for path, vk in flat_k:
        if any(getattr(p, "key", None) == "_buffers" for p in path):
            continue
        vs = flat_s[path]
        denom = np.linalg.norm(np.ravel(vs))
        if denom < 1e-20:
            # scan gradient ~0 for this leaf: the kernel must agree in
            # absolute terms, not get a free pass
            assert np.linalg.norm(np.ravel(vk)) < 1e-12, path
            continue
        rel = np.linalg.norm(np.ravel(vk) - np.ravel(vs)) / denom
        assert rel < 2e-4, (path, rel)


def test_h0_cotangent_matches(setup):
    spec, params, h0 = setup
    gk = jax.grad(lambda h: jnp.sum(
        pallas_mlp_node_solve(params, h, spec) ** 2))(h0)
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
    for name in ("encoder_w", "cls_w", "out_w", "ln_scale", "log_alpha"):
        np.testing.assert_allclose(np.asarray(gp[name]), np.asarray(gs[name]),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


@pytest.mark.slow
def test_sharded_matches_per_shard_solves(setup):
    """shard_map DP == concatenated per-shard solves + psum'd grads
    (batch-global step control makes per-shard the defined contract)."""
    import jax.flatten_util

    from fetode_tpu.ops.pallas_mlp_node import pallas_mlp_node_solve_sharded
    from fetode_tpu.parallel import make_mesh

    spec, params, _ = setup
    mesh = make_mesh(8)
    h0 = jax.random.normal(jax.random.PRNGKey(6), (16, spec.latent_dim))

    def loss_sharded(fp):
        p = dict(params, **fp)
        return jnp.sum(pallas_mlp_node_solve_sharded(p, h0, spec, mesh) ** 2)

    def loss_pershard(fp):
        p = dict(params, **fp)
        outs = [pallas_mlp_node_solve(p, h0[2 * i:2 * i + 2], spec)
                for i in range(8)]
        return jnp.sum(jnp.concatenate(outs) ** 2)

    sub = {k: params[k] for k in _FIELD_KEYS}
    l1, g1 = jax.value_and_grad(loss_sharded)(sub)
    l2, g2 = jax.value_and_grad(loss_pershard)(sub)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-4, atol=1e-6)
