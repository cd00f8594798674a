"""Conditional-diffusion family: all five denoiser variants forward/grad,
encoders, a short training run, and forecast sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.models.cond_diffusion import (
    DENOISER_VARIANTS,
    cond_denoiser_apply,
    cond_denoiser_init,
    conv_encoder_apply,
    conv_encoder_init,
    make_denoiser_spec,
    node_encoder_apply,
    node_encoder_init,
)
from fetode_tpu.nn.diffusion import make_schedule
from fetode_tpu.train.cond_diffusion_driver import (
    CondDiffusionRun,
    evaluate_forecast,
    train_conditional_diffusion,
)


def _tiny_spec(name):
    return make_denoiser_spec(name, d_in=2, pred_len=4, seq_len=12,
                              cond_dim=8, time_dim=8, hidden=16,
                              ferro_num_basis=2)._replace(
        # shrink the node encoder for test speed
    )


def test_conv_encoder(key):
    from fetode_tpu.models.cond_diffusion import ConvEncoderCfg

    cfg = ConvEncoderCfg(d_in=3, hidden=8, out_dim=6)
    p = conv_encoder_init(key, cfg, jnp.float64)
    out = conv_encoder_apply(p, cfg, jax.random.normal(key, (4, 10, 3),
                                                       jnp.float64))
    assert out.shape == (4, 6)


def test_node_encoder(key):
    from fetode_tpu.models.cond_diffusion import NodeEncoderCfg

    cfg = NodeEncoderCfg(d_in=3, cond_dim=8, x_proj_dim=8, ode_hidden=8,
                         solver="rk4")
    p = node_encoder_init(key, cfg, jnp.float64)
    out = node_encoder_apply(p, cfg, jax.random.normal(key, (4, 10, 3),
                                                       jnp.float64))
    assert out.shape == (4, 8)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("name", sorted(DENOISER_VARIANTS))
@pytest.mark.slow
def test_denoiser_variants_forward_grad(key, name):
    spec = _tiny_spec(name)
    if spec.encoder == "node":
        spec = spec._replace()  # node cfg defaults are fine at tiny dims? use rk4
    p = cond_denoiser_init(key, spec, jnp.float64)
    x_t = jax.random.normal(key, (3, 4, 2), jnp.float64)
    past = jax.random.normal(key, (3, 12, 2), jnp.float64)
    t_idx = jnp.asarray([0, 5, 9])
    eps = cond_denoiser_apply(p, spec, x_t, past, t_idx)
    assert eps.shape == (3, 4, 2)
    assert np.all(np.isfinite(np.asarray(eps)))

    g = jax.grad(lambda p: cond_denoiser_apply(p, spec, x_t, past,
                                               t_idx).sum())(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def _toy_windows(n=48, Lx=12, Ly=4, D=2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n + Lx + Ly)
    base = np.stack([np.sin(t / 7.0), np.cos(t / 5.0)], -1).astype(np.float32)
    past = np.stack([base[i:i + Lx] for i in range(n)])
    fut = np.stack([base[i + Lx:i + Lx + Ly] for i in range(n)])
    return past + rng.normal(0, 0.01, past.shape).astype(np.float32), fut


def test_training_and_eval_run():
    spec = make_denoiser_spec("mlp", d_in=2, pred_len=4, seq_len=12,
                              cond_dim=8, time_dim=8, hidden=16)
    data = {
        "train": _toy_windows(seed=0),
        "val": _toy_windows(n=16, seed=1),
        "test": _toy_windows(n=16, seed=2),
    }
    run = CondDiffusionRun(seq_len=12, pred_len=4, diff_T=8, epochs=3,
                           batch_size=16, eval_samples=2)
    params, hist = train_conditional_diffusion(spec, data, run, log=None)
    assert len(hist["train"]) == 3
    assert np.isfinite(hist["train"]).all()

    res = evaluate_forecast(params, spec, run, *data["test"],
                            key=jax.random.PRNGKey(0), n_samples=2)
    assert np.isfinite(res["mse"])
    assert res["samples"].shape == (2, 16, 4, 2)


def test_mlp_hoisted_chain_matches_generic():
    """cond_denoiser_mlp_sample_loop == p_sample_loop over
    cond_denoiser_eps (same math, same PRNG layout)."""
    from fetode_tpu.models.cond_diffusion import (
        cond_denoiser_encode,
        cond_denoiser_eps,
        cond_denoiser_mlp_sample_loop,
    )
    from fetode_tpu.nn.diffusion import p_sample_loop

    spec = make_denoiser_spec("mlp", d_in=2, pred_len=4, seq_len=12,
                              cond_dim=8, time_dim=8, hidden=16)
    sched = make_schedule(10)
    key = jax.random.PRNGKey(3)
    params = cond_denoiser_init(key, spec)
    past = jax.random.normal(jax.random.PRNGKey(4), (5, 12, 2),
                             jnp.float32)
    cond = cond_denoiser_encode(params, spec, past)
    k = jax.random.PRNGKey(5)

    ref = p_sample_loop(
        sched,
        lambda y, t, c: cond_denoiser_eps(params, spec, y, c, t),
        (5, 4, 2), cond, k, dtype=jnp.float32)
    fast = cond_denoiser_mlp_sample_loop(params, spec, sched, cond, k,
                                         dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_mlp_hoisted_chain_rejects_other_nets():
    from fetode_tpu.models.cond_diffusion import (
        cond_denoiser_mlp_sample_loop,
    )

    spec = _tiny_spec("kan")
    with pytest.raises(ValueError, match="mlp"):
        cond_denoiser_mlp_sample_loop(None, spec, make_schedule(4),
                                      jnp.zeros((2, 8)),
                                      jax.random.PRNGKey(0))


def test_kan_hoisted_chain_matches_generic():
    """cond_denoiser_kan_sample_loop == p_sample_loop over
    cond_denoiser_eps: KANLinear's additivity over input dims makes the
    cond/t-emb hoist exact through the nonlinear basis."""
    from fetode_tpu.models.cond_diffusion import (
        cond_denoiser_encode,
        cond_denoiser_eps,
        cond_denoiser_kan_sample_loop,
    )
    from fetode_tpu.nn.diffusion import p_sample_loop

    spec = make_denoiser_spec("kan", d_in=2, pred_len=4, seq_len=12,
                              cond_dim=8, time_dim=8, hidden=16)
    sched = make_schedule(10)
    key = jax.random.PRNGKey(6)
    params = cond_denoiser_init(key, spec)
    past = jax.random.normal(jax.random.PRNGKey(7), (5, 12, 2),
                             jnp.float32)
    cond = cond_denoiser_encode(params, spec, past)
    k = jax.random.PRNGKey(8)

    ref = p_sample_loop(
        sched,
        lambda y, t, c: cond_denoiser_eps(params, spec, y, c, t),
        (5, 4, 2), cond, k, dtype=jnp.float32)
    fast = cond_denoiser_kan_sample_loop(params, spec, sched, cond, k,
                                         dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
