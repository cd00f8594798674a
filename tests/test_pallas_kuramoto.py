"""Interpret-mode parity for the whole-rollout Kuramoto kernel
(ops/pallas_kuramoto.py) against the scan+conv XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.models.kuramoto import (KuramotoSpec, kuramoto_features,
                                        kuramoto_init, kuramoto_kan_apply)
from fetode_tpu.ops.pallas_kuramoto import (make_kuramoto_rollout,
                                            pallas_kuramoto_features)


@pytest.fixture(scope="module")
def setup():
    spec = KuramotoSpec(H=8, W=8, steps=5)
    key = jax.random.PRNGKey(3)
    params = kuramoto_init(key, spec)
    # non-trivial omega/K so parity exercises every term
    params["omega"] = 0.3 * jax.random.normal(
        jax.random.fold_in(key, 7), (spec.H, spec.W), jnp.float32)
    params["K"] = jnp.asarray(0.7, jnp.float32)
    x = jax.random.uniform(jax.random.fold_in(key, 11),
                           (6, spec.H, spec.W), jnp.float32)
    return spec, params, x


def test_feature_parity(setup):
    spec, params, x = setup
    ref = kuramoto_features(params, spec, x)
    out = pallas_kuramoto_features(params, spec, x, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_feature_parity_4d_input(setup):
    spec, params, x = setup
    ref = kuramoto_features(params, spec, x[:, None])
    out = pallas_kuramoto_features(params, spec, x[:, None], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_multi_block_accumulation(setup):
    """Batch split over several grid blocks (block_b=8, B=20) must match
    the single-block result, including the accumulated omega/K grads."""
    spec, params, x = setup
    B = 20
    xb = jnp.tile(x, (4, 1, 1))[:B]
    theta0 = (np.pi * (2.0 * xb - 1.0)).reshape(B, spec.H * spec.W)
    fn_blk = make_kuramoto_rollout(spec.H, spec.W, spec.steps, spec.dt,
                                   block_b=8, interpret=True)
    fn_one = make_kuramoto_rollout(spec.H, spec.W, spec.steps, spec.dt,
                                   block_b=128, interpret=True)
    wv = jax.random.normal(jax.random.PRNGKey(0),
                           (B, 2 * spec.H * spec.W), jnp.float32)

    def loss(fn, om, kc, th0):
        return jnp.sum(fn(om, kc, th0) * wv)

    for fn in (fn_blk, fn_one):
        np.testing.assert_allclose(
            np.asarray(fn(params["omega"], params["K"], theta0)),
            np.asarray(fn_one(params["omega"], params["K"], theta0)),
            atol=2e-5, rtol=2e-5)
    g_blk = jax.grad(lambda om, kc, th: loss(fn_blk, om, kc, th),
                     argnums=(0, 1, 2))(params["omega"], params["K"], theta0)
    g_one = jax.grad(lambda om, kc, th: loss(fn_one, om, kc, th),
                     argnums=(0, 1, 2))(params["omega"], params["K"], theta0)
    for a, b in zip(g_blk, g_one):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_grad_parity_vs_scan(setup):
    """(omega, K, theta0) cotangents of the kernel's discrete adjoint match
    the scan path's autodiff."""
    spec, params, x = setup
    wv = jax.random.normal(jax.random.PRNGKey(1),
                           (x.shape[0], 2 * spec.H * spec.W), jnp.float32)

    def loss_scan(om, kc, xi):
        f = kuramoto_features({"omega": om, "K": kc}, spec, xi)
        return jnp.sum(f * wv)

    def loss_pal(om, kc, xi):
        f = pallas_kuramoto_features({"omega": om, "K": kc}, spec, xi,
                                     interpret=True)
        return jnp.sum(f * wv)

    g_ref = jax.grad(loss_scan, argnums=(0, 1, 2))(params["omega"],
                                                   params["K"], x)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(params["omega"],
                                                  params["K"], x)
    for a, b, name in zip(g_pal, g_ref, ("omega", "K", "x")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4, err_msg=name)


def test_trace_then_eager_no_leak(setup):
    """Regression: the lru_cached rollout's first build happening INSIDE a
    jit trace must not leak tracers into later eager calls (the masks were
    once jnp constants materialised at cache time)."""
    spec, params, x = setup
    sp = spec._replace(steps=4, rollout="pallas")       # fresh cache entry
    jitted = jax.jit(lambda p, xi: kuramoto_features(p, sp, xi))
    a = jitted(params, x)
    b = kuramoto_features(params, sp, x)                # eager, same cache
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)


def test_spec_dispatch_full_model(setup):
    """spec.rollout='pallas' routes the full classifier through the kernel
    and matches the scan logits."""
    spec, params, x = setup
    spec_pal = spec._replace(rollout="pallas")
    ref = kuramoto_kan_apply(params, spec, x)
    out = kuramoto_kan_apply(params, spec_pal, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


# ------------------------------------------------------------- fused head


def test_fused_logits_parity(setup):
    """pallas_fused (rollout + KANLinear head in one kernel) matches the
    scan-path logits, including the logistic branch."""
    spec, params, x = setup
    out = kuramoto_kan_apply(params, spec._replace(rollout="pallas_fused"),
                             x)
    ref = kuramoto_kan_apply(params, spec, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_fused_logits_parity_multiblock(setup):
    """Batch spanning several grid blocks (block_b=8, B=20)."""
    from fetode_tpu.ops.pallas_kuramoto import make_kuramoto_fused_classifier

    spec, params, x = setup
    xb = jnp.tile(x, (4, 1, 1))[:20]
    ref = kuramoto_kan_apply(params, spec, xb)
    cfg = spec.head_cfg
    head = params["head"]
    sw = head["spline_weight"] * head["spline_scaler"][..., None]
    lp = head["logistic"]
    lw = (lp["weight"] * lp["scaler"][:, None]).reshape(
        cfg.out_features, cfg.in_features, cfg.logistic_num_basis)
    grid = head["_buffers"]["grid"]
    fn = make_kuramoto_fused_classifier(
        spec.H, spec.W, spec.steps, spec.dt, grid.shape[1],
        cfg.spline_order, cfg.logistic_num_basis, cfg.out_features,
        block_b=8, interpret=True)
    theta0 = (np.pi * (2.0 * xb - 1.0)).reshape(20, spec.H * spec.W)
    out = fn(params["omega"], params["K"], theta0, grid,
             head["base_weight"], sw, lp["a"], lp["b"], lw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_fused_grad_parity_vs_scan(setup):
    """Training through the fused path (VJP = rollout adjoint kernel + XLA
    head) matches the scan path's autodiff for every parameter leaf."""
    import optax

    spec, params, x = setup
    labels = jnp.arange(x.shape[0]) % spec.num_classes

    def loss(p, sp):
        logits = kuramoto_kan_apply(p, sp, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    g_ref = jax.grad(loss)(params, spec)
    g_fus = jax.grad(loss)(params, spec._replace(rollout="pallas_fused"))
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fus = jax.tree_util.tree_leaves(g_fus)
    for (path, a), b in zip(flat_ref, flat_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=3e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_fused_no_logistic_branch(setup):
    """Head without the logistic branch (logistic_num_basis=0) takes the
    dummy-zero path in the kernel and still matches."""
    spec, params, x = setup
    spec0 = spec._replace(num_basis=0)
    key = jax.random.PRNGKey(9)
    from fetode_tpu.models.kuramoto import kuramoto_init
    p0 = kuramoto_init(key, spec0)
    p0["omega"] = params["omega"]
    p0["K"] = params["K"]
    ref = kuramoto_kan_apply(p0, spec0, x)
    out = kuramoto_kan_apply(p0, spec0._replace(rollout="pallas_fused"), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
