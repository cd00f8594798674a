"""Whole-solve ferro-NODE adjoint kernel (ops/pallas_ferro_node.py) must
match the XLA dopri5 path of the ECG latent field — forward trajectory,
parameter gradients, and initial-state cotangent — in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.models.ecg import (
    KanFetMLPNODESpec,
    kanfet_mlp_node_apply,
    kanfet_mlp_node_field,
    kanfet_mlp_node_init,
)
from fetode_tpu.ops.ferro import ferro_state_init
from fetode_tpu.ops.pallas_ferro_node import pallas_ferro_node_solve
from fetode_tpu.solvers.dopri5 import odeint_dopri5


@pytest.fixture(scope="module")
def setup():
    spec = KanFetMLPNODESpec(T=24, latent_dim=8, ode_hidden=12,
                             num_basis=3, max_steps=16)
    params = kanfet_mlp_node_init(jax.random.PRNGKey(0), spec)
    h0 = jax.random.normal(jax.random.PRNGKey(1), (4, spec.latent_dim))
    return spec, params, h0


def _xla_solve(params, spec, h0, mode="while", noise_key=None):
    states = (ferro_state_init((h0.shape[0],), spec.fc1_cfg),
              ferro_state_init((h0.shape[0],), spec.fc2_cfg))
    nkeys = jax.random.split(noise_key) if noise_key is not None else None

    def rhs(t, h):
        return kanfet_mlp_node_field(params, spec, t, h, states, nkeys,
                                     per_eval_noise=False)

    ts = jnp.asarray([0.0, 1.0], h0.dtype)
    return odeint_dopri5(rhs, h0, ts, rtol=spec.rtol, atol=spec.atol,
                         max_steps=spec.max_steps, mode=mode)[-1]


def test_forward_matches_xla(setup):
    spec, params, h0 = setup
    ref = _xla_solve(params, spec, h0)
    out = pallas_ferro_node_solve(params["fc1"], params["fc2"], h0, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_param_grads_match_scan_autodiff(setup):
    spec, params, h0 = setup

    def loss_kernel(fp):
        hT = pallas_ferro_node_solve(fp["fc1"], fp["fc2"], h0, spec)
        return jnp.sum(hT ** 2)

    def loss_scan(fp):
        p = dict(params, fc1=fp["fc1"], fc2=fp["fc2"])
        return jnp.sum(_xla_solve(p, spec, h0, mode="scan") ** 2)

    sub = {"fc1": params["fc1"], "fc2": params["fc2"]}
    gk = jax.grad(loss_kernel)(sub)
    gs = jax.grad(loss_scan)(sub)
    fa = np.concatenate([np.ravel(gk[l][n]) for l in ("fc1", "fc2")
                         for n in ("k", "ec", "ps", "bias", "coef")])
    fb = np.concatenate([np.ravel(gs[l][n]) for l in ("fc1", "fc2")
                         for n in ("k", "ec", "ps", "bias", "coef")])
    rel = np.linalg.norm(fa - fb) / (np.linalg.norm(fb) + 1e-30)
    # the kernel's discrete adjoint drops the controller-chain term the
    # scan path differentiates; measured agreement is ~2e-7 here
    assert rel < 1e-4, rel


def test_h0_cotangent_matches(setup):
    spec, params, h0 = setup
    gk = jax.grad(lambda h: jnp.sum(pallas_ferro_node_solve(
        params["fc1"], params["fc2"], h, spec) ** 2))(h0)
    gs = jax.grad(lambda h: jnp.sum(
        _xla_solve(params, spec, h, mode="scan") ** 2))(h0)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gs),
                               rtol=1e-4, atol=1e-6)


def test_model_apply_pallas_mode(setup):
    """solver_mode='pallas' on the full model: logits and classifier/
    encoder grads match the scan path."""
    spec, params, h0 = setup
    x = jax.random.normal(jax.random.PRNGKey(2), (4, spec.T))
    ps = spec._replace(solver_mode="pallas")
    logits_p = kanfet_mlp_node_apply(params, ps, x)
    logits_s = kanfet_mlp_node_apply(params, spec, x)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_s),
                               rtol=1e-5, atol=1e-5)

    def loss(p, s):
        return jnp.sum(kanfet_mlp_node_apply(p, s, x) ** 2)

    gp = jax.grad(loss)(params, ps)
    gs = jax.grad(loss)(params, spec)
    for name in ("encoder_w", "cls_w"):
        np.testing.assert_allclose(np.asarray(gp[name]),
                                   np.asarray(gs[name]),
                                   rtol=1e-4, atol=1e-5)


def test_noisy_forward_matches_xla_frozen_noise(setup):
    """Device noise in-kernel: the frozen per-solve draws are
    bit-identical to the XLA dopri5 path's (same keys, same shapes), so
    the noisy trajectories must agree to fp tolerance."""
    spec, params, h0 = setup
    ns = spec._replace(noise_std=0.15)
    key = jax.random.PRNGKey(4)
    ref = _xla_solve(params, ns, h0, noise_key=key)
    out = pallas_ferro_node_solve(params["fc1"], params["fc2"], h0, ns,
                                  noise_key=key)
    assert not np.allclose(np.asarray(ref),
                           np.asarray(_xla_solve(params, spec, h0)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_noisy_grads_match_scan_autodiff(setup):
    """The reference's noise.detach(): only the coef gradient sees the
    noise.  Kernel grads under noise must match scan autodiff through
    the SAME frozen draws."""
    spec, params, h0 = setup
    ns = spec._replace(noise_std=0.15)
    key = jax.random.PRNGKey(7)

    def loss_kernel(fp):
        hT = pallas_ferro_node_solve(fp["fc1"], fp["fc2"], h0, ns,
                                     noise_key=key)
        return jnp.sum(hT ** 2)

    def loss_scan(fp):
        p = dict(params, fc1=fp["fc1"], fc2=fp["fc2"])
        return jnp.sum(_xla_solve(p, ns, h0, mode="scan",
                                  noise_key=key) ** 2)

    sub = {"fc1": params["fc1"], "fc2": params["fc2"]}
    gk = jax.grad(loss_kernel)(sub)
    gs = jax.grad(loss_scan)(sub)
    fa = np.concatenate([np.ravel(gk[l][n]) for l in ("fc1", "fc2")
                         for n in ("k", "ec", "ps", "bias", "coef")])
    fb = np.concatenate([np.ravel(gs[l][n]) for l in ("fc1", "fc2")
                         for n in ("k", "ec", "ps", "bias", "coef")])
    rel = np.linalg.norm(fa - fb) / (np.linalg.norm(fb) + 1e-30)
    assert rel < 1e-4, rel


def test_noisy_model_apply_pallas_mode(setup):
    """solver_mode='pallas' + noise_std on the full model routes through
    the kernel and matches the XLA path's logits for the same key."""
    spec, params, h0 = setup
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, spec.T))
    np_ = spec._replace(solver_mode="pallas", noise_std=0.1)
    nx = spec._replace(noise_std=0.1)
    out_p = kanfet_mlp_node_apply(params, np_, x, noise_key=key)
    out_x = kanfet_mlp_node_apply(params, nx, x, noise_key=key)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)


def test_batch_vec_layout_matches_loop_layout(setup):
    """The batch-vectorized (3-D block) kernels must agree with the
    per-sample-loop kernels on forward, parameter grads, and the frozen
    noisy forward."""
    import jax.flatten_util
    from fetode_tpu.ops.pallas_ferro_node import (
        frozen_solve_noise,
        make_ferro_node_solver,
    )

    spec, params, h0 = setup
    c1, c2 = spec.fc1_cfg, spec.fc2_cfg
    dims = ((c1.in_dim, c1.out_dim, c1.num_basis),
            (c2.in_dim, c2.out_dim, c2.num_basis))

    def mk(**kw):
        return make_ferro_node_solver(
            *dims, gate_slope=c1.gate_slope, alpha=c1.alpha,
            h_bound=spec.h_bound, dh_clip=spec.dh_clip, rtol=spec.rtol,
            atol=spec.atol, max_steps=spec.max_steps, interpret=True, **kw)

    loop_fn, vec_fn = mk(), mk(batch_vec=True)
    sub = {"fc1": params["fc1"], "fc2": params["fc2"]}

    def loss(fn):
        return lambda fp: jnp.sum(fn(fp["fc1"], fp["fc2"], h0) ** 2)

    (l1, g1), (l2, g2) = (jax.value_and_grad(loss(f))(sub)
                          for f in (loop_fn, vec_fn))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    # contraction order differs (MXU matmul vs lane reduction): f32-level
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-4, atol=1e-6)

    # noisy: same frozen draws through both layouts
    nsp = spec._replace(noise_std=0.15)
    nz = frozen_solve_noise(jax.random.PRNGKey(9), h0.shape[0],
                            nsp.fc1_cfg, nsp.fc2_cfg, dtype=h0.dtype)
    ln, vn = mk(noisy=True), mk(noisy=True, batch_vec=True)
    np.testing.assert_allclose(
        np.asarray(vn(params["fc1"], params["fc2"], h0, *nz)),
        np.asarray(ln(params["fc1"], params["fc2"], h0, *nz)),
        rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sharded_matches_per_shard_solves(setup):
    """shard_map over the 8-device 'data' axis == concatenated per-shard
    kernel solves (the kernel's step control is batch-global, so the
    sharded result is defined per shard), and parameter grads == the
    psum of per-shard grads."""
    import jax.flatten_util
    from fetode_tpu.ops.pallas_ferro_node import (
        pallas_ferro_node_solve_sharded,
    )
    from fetode_tpu.parallel import make_mesh

    spec, params, _ = setup
    mesh = make_mesh(8)
    h0 = jax.random.normal(jax.random.PRNGKey(5), (8, spec.latent_dim))

    def loss_sharded(fp):
        out = pallas_ferro_node_solve_sharded(fp["fc1"], fp["fc2"], h0,
                                              spec, mesh)
        return jnp.sum(out ** 2)

    def loss_pershard(fp):
        outs = [pallas_ferro_node_solve(fp["fc1"], fp["fc2"],
                                        h0[i:i + 1], spec)
                for i in range(8)]
        return jnp.sum(jnp.concatenate(outs) ** 2)

    sub = {"fc1": params["fc1"], "fc2": params["fc2"]}
    l1, g1 = jax.value_and_grad(loss_sharded)(sub)
    l2, g2 = jax.value_and_grad(loss_pershard)(sub)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_sharded_noisy_matches_per_shard_solves(setup):
    """Device noise on the sharded path: drawn once for the GLOBAL batch
    (same keys/values as the single-device entry) and sharded with h0 —
    each shard must see exactly its slice of the global draw."""
    from fetode_tpu.ops.pallas_ferro_node import (
        _spec_solve_noise,
        make_ferro_node_solver,
        pallas_ferro_node_solve_sharded,
    )
    from fetode_tpu.parallel import make_mesh

    spec, params, _ = setup
    ns = spec._replace(noise_std=0.15)
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(6)
    h0 = jax.random.normal(jax.random.PRNGKey(5), (8, spec.latent_dim))
    fc1, fc2 = params["fc1"], params["fc2"]
    c1, c2 = ns.fc1_cfg, ns.fc2_cfg

    out = pallas_ferro_node_solve_sharded(fc1, fc2, h0, ns, mesh,
                                          noise_key=key)

    fn = make_ferro_node_solver(
        (c1.in_dim, c1.out_dim, c1.num_basis),
        (c2.in_dim, c2.out_dim, c2.num_basis),
        gate_slope=c1.gate_slope, alpha=c1.alpha, h_bound=ns.h_bound,
        dh_clip=ns.dh_clip, rtol=ns.rtol, atol=ns.atol,
        max_steps=ns.max_steps, interpret=True, noisy=True)
    nz1, nz2 = _spec_solve_noise(fc1, fc2, h0, c1, c2, key)
    ref = jnp.concatenate([
        fn(fc1, fc2, h0[i:i + 1], nz1[i:i + 1], nz2[i:i + 1])
        for i in range(8)])
    # the noise must actually change the solution...
    clean = pallas_ferro_node_solve_sharded(fc1, fc2, h0, spec, mesh)
    assert not np.allclose(np.asarray(out), np.asarray(clean))
    # ...and match the per-shard slices of the global draw
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="noise_key"):
        pallas_ferro_node_solve_sharded(fc1, fc2, h0, ns, mesh)
