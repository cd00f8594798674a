"""Whole-chain Pallas DDPM sampler: all T reverse-diffusion steps of the
MLP eps-head forecaster in ONE TPU kernel.

The reference's self-reported hotspot is its 200-250-step Python sampling
loop (``kan_diffusion_ett.py:749``).  The XLA answer is a ``lax.scan``
(nn/diffusion.py) and the algebraically-hoisted variant
(``eps_head_sample_loop``: cond/t-emb first-layer contributions moved out
of the loop).  This kernel removes the remaining per-step HLO loop
overhead: weights, the conditioning contribution, the t-embedding table
and all per-step noises stay VMEM-resident and the chain is one
``fori_loop`` of three MXU matmuls + the posterior update.

Everything step-dependent is precomputed host-side into tables indexed by
loop position (already reversed): t-emb first-layer rows (T, H), the
posterior coefficients (T, 3) with ``y' = c1*y - c2*eps_hat + c3*noise``,
and the noise draws (T, B, P) using the exact PRNG layout of
``p_sample_loop`` — so the kernel is deterministic and parity-testable
bit-close against the scan paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fetode_tpu.ops.pallas_node_common import interpret_default
from fetode_tpu.nn.diffusion import DiffusionSchedule, sinusoidal_emb


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _make_kernel(T, unroll=1):
    def kernel(y0_ref, condh_ref, tembh_ref, noise_ref, coef_ref,
               w1y_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref):
        ch = condh_ref[:]                                  # (B, H)

        def body(i, y):
            th = tembh_ref[pl.ds(i, 1), :]                 # (1, H)
            h = jax.nn.silu(_dot(y, w1y_ref[:]) + ch + th)
            h = jax.nn.silu(_dot(h, w2_ref[:]) + b2_ref[:])
            eps = _dot(h, w3_ref[:]) + b3_ref[:]           # (B, P)
            c = coef_ref[pl.ds(i, 1), :]                   # (1, 3)
            return c[0, 0] * y - c[0, 1] * eps + c[0, 2] * noise_ref[i]

        out_ref[:] = jax.lax.fori_loop(0, T, body, y0_ref[:],
                                       unroll=unroll)

    return kernel


def _make_kernel_fm(T, P, unroll=1):
    """Feature-major chain kernel for the gridded large-batch path.

    Batch rows ride the LANE axis (128-aligned blocks): the row-major
    kernel's (T, block, P) noise block pads P=24 lanes to 128 — 5.3x VMEM
    waste that blows the 16 MB scoped limit at useful block sizes
    (measured: 31.25 MB at 640 rows).  Here the noise table is
    (T*P, rows): per-step slices are SUBLANE slices at multiples of P,
    and the t-embedding row is fetched with a one-hot MXU matmul (dynamic
    lane indexing is the slow path on TPU; a (H, T) @ (T, 1) dot is not).
    """
    def kernel(y0_ref, condh_ref, tembt_ref, noise_ref, coef_ref,
               w1y_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref):
        ch = condh_ref[:]                                  # (H, B)
        tt = tembt_ref[:]                                  # (H, T)
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)

        def body(i, y):                                    # y: (P, B)
            th = _dot(tt, (iota == i).astype(jnp.float32))  # (H, 1)
            h = jax.nn.silu(_dot(w1y_ref[:], y) + ch + th)
            h = jax.nn.silu(_dot(w2_ref[:], h) + b2_ref[:])
            eps = _dot(w3_ref[:], h) + b3_ref[:]           # (P, B)
            c = coef_ref[pl.ds(i, 1), :]                   # (1, 3)
            nz = noise_ref[pl.ds(i * P, P), :]             # (P, B)
            return c[0, 0] * y - c[0, 1] * eps + c[0, 2] * nz

        out_ref[:] = jax.lax.fori_loop(0, T, body, y0_ref[:],
                                       unroll=unroll)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_samples", "block_b",
                                    "unroll", "interpret"))
def pallas_eps_head_sample(eps_params, cfg, sched: DiffusionSchedule, cond,
                           key, *, n_samples: int = 1, block_b: int = 512,
                           unroll: int = 1, interpret=None):
    """Sample forecasts — whole reverse chain in one kernel.

    Returns (B, pred_len), or (n_samples, B, pred_len) when
    ``n_samples`` > 1: samples are FOLDED into the batch axis (the
    conditioning is tiled, each sample keeps its own per-sample PRNG
    layout) so one kernel launch covers the whole sample×batch grid —
    the reference evaluates with 10-sample averaging
    (``kan_diffusion_ett.py:1133``), which the old ``lax.map`` path paid
    as 10 sequential chains.

    Rows beyond ``block_b`` ride a pallas grid over batch blocks: the
    per-step noise table is the VMEM scaling limit ((T, B, P) resident),
    so blocking keeps VMEM constant at any batch while each block's
    matmuls stay MXU-sized.  Same math and PRNG layout as
    ``eps_head_sample_loop``; ``cfg`` is the ``EpsHeadConfig``.
    ``interpret=None`` auto-selects interpret mode on the CPU backend.
    """
    if interpret is None:
        interpret = interpret_default()
    f32 = jnp.float32
    P, E, C = cfg.pred_len, cfg.t_emb_dim, cfg.cond_dim
    T = sched.T
    B = cond.shape[0]
    S = n_samples
    (W1, b1), (W2, b2), (W3, b3) = [(l["w"], l["b"]) for l in eps_params]
    W1y, W1c, W1t = W1[:, :P], W1[:, P:P + C], W1[:, P + C:]

    cond_h = (cond @ W1c.T + b1).astype(f32)               # (B, H)
    t_all = sinusoidal_emb(jnp.arange(T), E)
    temb_h = (t_all @ W1t.T).astype(f32)                   # (T, H)

    def draw(k):
        k_init, k_loop = jax.random.split(k)
        y0 = jax.random.normal(k_init, (B, P), f32)
        keys = jax.random.split(k_loop, T)
        noise = jax.vmap(lambda kk: jax.random.normal(kk, (B, P), f32))(keys)
        return y0, noise

    if S == 1:
        y0, noises = draw(key)
    else:
        # per-sample keys exactly as the lax.map path would split them
        y0, noises = jax.vmap(draw)(jax.random.split(key, S))
        y0 = y0.reshape(S * B, P)                          # (S*B, P)
        noises = jnp.moveaxis(noises, 0, 1).reshape(T, S * B, P)
        cond_h = jnp.tile(cond_h, (S, 1))

    t_rev = jnp.arange(T - 1, -1, -1)
    c1 = sched.sqrt_recip_alphas[t_rev]
    c2 = c1 * sched.betas[t_rev] / sched.sqrt_one_minus_alphas_bar[t_rev]
    c3 = jnp.where(t_rev == 0, 0.0,
                   jnp.sqrt(jnp.maximum(sched.posterior_variance[t_rev],
                                        1e-20)))
    coefs = jnp.stack([c1, c2, c3], axis=1).astype(f32)    # (T, 3)

    rows = S * B
    # The row-major single-block kernel's (T, rows, P) noise table pads
    # P lanes to 128; it only fits VMEM up to ~(8 MB / T / 512) rows.
    single_max = max(8, (8 << 20) // (T * 128 * 4))
    if rows <= min(block_b, single_max):
        inputs = [y0, cond_h, temb_h[t_rev], noises, coefs,
                  W1y.T.astype(f32), W2.T.astype(f32), b2[None].astype(f32),
                  W3.T.astype(f32), b3[None].astype(f32)]
        out = pl.pallas_call(
            _make_kernel(T, unroll),
            out_shape=jax.ShapeDtypeStruct((rows, P), f32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*inputs)
    else:
        # feature-major gridded path: lane-axis batch blocks in multiples
        # of 128 (smaller only when explicitly requested, e.g. interpret
        # tests).  Wider blocks amortise the T-step serial loop over wider
        # MXU matmuls; the VMEM cost is the double-buffered (T*P, bb)
        # noise block, so the block width is guarded against the scoped
        # budget (raised explicitly past Mosaic's 16 MB default).
        # Measured on v5e (benchmarks/run_ddpm_block_sweep.py, outputs
        # bit-identical across widths): 10xB=1024 266.7k -> 374.3k
        # samples/s at bb=512 (+40%, disjoint spreads); B=1024 +26%; at
        # 640 rows bb=256 wins (106.7k vs 98.8k) because bb=512 pads
        # 37.5% dead lanes — so the auto-choice caps padding waste at
        # ~20% of the processed lanes.
        H = cond_h.shape[1]
        vmem_cap = 64 << 20
        bb = block_b if block_b < 128 else block_b - block_b % 128

        def _est(bbx):  # double-buffered blocked streams + resident tables
            return 4 * (2 * bbx * (T * P + 2 * P + H)
                        + H * T + T * 3
                        + P * H + H * H + H + P * H + P)

        def _waste_ok(bbx):  # padded dead lanes <= 20% of processed lanes
            padded = -(-rows // bbx) * bbx
            return (padded - rows) * 5 <= padded

        while bb > 128 and (_est(bb) > vmem_cap or not _waste_ok(bb)):
            bb -= 128
        nblk = -(-rows // bb)
        pad = nblk * bb - rows
        y0t = jnp.pad(y0.T, ((0, 0), (0, pad)))              # (P, rows)
        cht = jnp.pad(cond_h.T, ((0, 0), (0, pad)))          # (H, rows)
        nzt = jnp.pad(jnp.moveaxis(noises, 2, 1).reshape(T * P, rows),
                      ((0, 0), (0, pad)))                    # (T*P, rows)
        full = lambda *shape: pl.BlockSpec(  # noqa: E731 — whole-array block
            shape, lambda i: (0,) * len(shape))
        inputs = [y0t, cht, temb_h[t_rev].T, nzt, coefs,
                  W1y.astype(f32), W2.astype(f32),
                  b2[:, None].astype(f32), W3.astype(f32),
                  b3[:, None].astype(f32)]
        in_specs = [
            pl.BlockSpec((P, bb), lambda i: (0, i)),         # y0
            pl.BlockSpec((H, bb), lambda i: (0, i)),         # cond_h
            full(H, T),                                      # temb (H, T)
            pl.BlockSpec((T * P, bb), lambda i: (0, i)),     # noises
            full(T, 3),                                      # coefs
            full(*inputs[5].shape), full(*inputs[6].shape),
            full(*inputs[7].shape), full(*inputs[8].shape),
            full(*inputs[9].shape),
        ]
        out = pl.pallas_call(
            _make_kernel_fm(T, P, unroll),
            grid=(nblk,),
            out_shape=jax.ShapeDtypeStruct((P, nblk * bb), f32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((P, bb), lambda i: (0, i)),
            interpret=interpret,
            # Limit = 2x the analytic estimate (capped at the physical
            # bound): vmem_limit_bytes is a scoped-allocation CAP, not a
            # reservation, so headroom is free — a 1.25x margin died in
            # Mosaic compile whenever the true scoped allocation beat
            # the hand-derived _est by >25% (advisor r4 finding; the
            # non-interpret branch is exercised on-chip only, CI runs
            # interpret=True).
            **({} if interpret else {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=max(16 << 20,
                                     min(100 << 20, _est(bb) * 2)))}),
        )(*inputs)[:, :rows].T
    out = out.astype(cond.dtype)
    return out if S == 1 else out.reshape(S, B, P)
