"""DDPM sampler fast paths: hoisted scan and whole-chain Pallas kernel
must match the generic reverse chain (same math, same PRNG layout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.models.forecasting import (
    DiffusionForecasterSpec,
    _cond,
    diffusion_forecaster_init,
    diffusion_forecaster_sample,
)
from fetode_tpu.nn.diffusion import (
    eps_head_apply,
    eps_head_sample_loop,
    make_schedule,
    p_sample_loop,
)
from fetode_tpu.ops.pallas_ddpm import pallas_eps_head_sample


@pytest.fixture(scope="module")
def setup():
    spec = DiffusionForecasterSpec(num_features=3, context_len=16,
                                   pred_len=6, diff_T=12)
    sched = make_schedule(spec.diff_T)
    key = jax.random.PRNGKey(0)
    params = diffusion_forecaster_init(key, spec)
    x_ctx = jax.random.normal(jax.random.PRNGKey(1),
                              (5, spec.context_len, spec.num_features),
                              jnp.float32)
    t_fut = jnp.arange(spec.pred_len, dtype=x_ctx.dtype)
    cond = _cond(params, spec, x_ctx, t_fut)
    return spec, sched, params, x_ctx, cond


def test_hoisted_loop_matches_generic(setup):
    spec, sched, params, x_ctx, cond = setup
    key = jax.random.PRNGKey(7)

    def eps_model(y_t, t_idx, c):
        return eps_head_apply(params["eps_head"], spec.eps_cfg, y_t, t_idx, c)

    ref = p_sample_loop(sched, eps_model, (cond.shape[0], spec.pred_len),
                        cond, key)
    fast = eps_head_sample_loop(params["eps_head"], spec.eps_cfg, sched,
                                cond, key)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_chain_matches_hoisted(setup):
    spec, sched, params, x_ctx, cond = setup
    key = jax.random.PRNGKey(8)
    fast = eps_head_sample_loop(params["eps_head"], spec.eps_cfg, sched,
                                cond, key)
    kern = pallas_eps_head_sample(params["eps_head"], spec.eps_cfg, sched,
                                  cond, key, interpret=True)
    np.testing.assert_allclose(np.asarray(kern), np.asarray(fast),
                               rtol=1e-4, atol=1e-4)


def test_forecaster_sample_pallas_multisample(setup):
    spec, sched, params, x_ctx, cond = setup
    out = diffusion_forecaster_sample(params, spec, sched, x_ctx,
                                      jax.random.PRNGKey(9), n_samples=3)
    assert out.shape == (3, x_ctx.shape[0], spec.pred_len)
    assert bool(jnp.all(jnp.isfinite(out)))
    # different samples differ (noise actually applied per sample)
    assert float(jnp.max(jnp.abs(out[0] - out[1]))) > 1e-6


def test_pallas_multisample_fold_matches_map(setup):
    """Folded sample×batch kernel == lax.map of single-sample kernels
    (same per-sample PRNG layout, so bit-close)."""
    spec, sched, params, x_ctx, cond = setup
    key = jax.random.PRNGKey(11)
    folded = pallas_eps_head_sample(params["eps_head"], spec.eps_cfg, sched,
                                    cond, key, n_samples=4, interpret=True)
    seq = jax.lax.map(
        lambda k: pallas_eps_head_sample(params["eps_head"], spec.eps_cfg,
                                         sched, cond, k, interpret=True),
        jax.random.split(key, 4))
    np.testing.assert_allclose(np.asarray(folded), np.asarray(seq),
                               rtol=1e-5, atol=1e-5)


def test_pallas_batch_blocking_matches_single_block(setup):
    """Grid-over-batch path (block_b < rows, incl. a ragged last block)
    == whole-batch single-block kernel."""
    spec, sched, params, x_ctx, cond = setup
    key = jax.random.PRNGKey(12)
    whole = pallas_eps_head_sample(params["eps_head"], spec.eps_cfg, sched,
                                   cond, key, n_samples=5, interpret=True)
    blocked = pallas_eps_head_sample(params["eps_head"], spec.eps_cfg, sched,
                                     cond, key, n_samples=5, block_b=8,
                                     interpret=True)  # 25 rows -> 4 blocks
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(whole),
                               rtol=1e-5, atol=1e-5)


def test_pallas_wide_lane_blocks_match(setup):
    """block_b >= 128 rides the wide-block path (multiples of 128 on the
    lane axis, round-4): same rows, different tiling, same samples."""
    spec, sched, params, x_ctx, cond = setup
    key = jax.random.PRNGKey(13)
    kw = dict(n_samples=60, interpret=True)          # 300 rows > block_b
    narrow = pallas_eps_head_sample(params["eps_head"], spec.eps_cfg, sched,
                                    cond, key, block_b=8, **kw)
    # 290 rounds down to bb=256 -> 2 blocks with a ragged tail
    wide = pallas_eps_head_sample(params["eps_head"], spec.eps_cfg, sched,
                                  cond, key, block_b=290, **kw)
    np.testing.assert_allclose(np.asarray(wide), np.asarray(narrow),
                               rtol=1e-5, atol=1e-5)
