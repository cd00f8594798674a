"""Whole-rollout Pallas kernel for the Kuramoto phase lattice (MNIST
front-end, models/kuramoto.py — the rebuild of the reference's
``mnist_kuramoto_kan.py:145-204`` oscillator block).

The XLA path is a 10-step ``lax.scan`` whose carry (the phase field
theta, (B, H, W)) round-trips HBM every step, with two 3x3 cross convs
per step.  This kernel runs ALL ``steps`` Euler updates in one launch
with theta VMEM-resident: per step only VPU work (sin/cos) plus the
4-neighbour sums, which become two masked sublane shifts (+-1 within an
image row, masked at row boundaries) and two row shifts (+-W) — no conv
unit, no HBM traffic between steps.

Layout: lattice flattened on SUBLANES (H*W = 784 = 98 aligned tiles of
8), batch on LANES in 128-wide grid blocks, so any batch size streams
through one resident program.  The backward is an in-kernel discrete
adjoint: replay the rollout storing every theta_t in a VMEM scratch,
then walk the steps in reverse with the hand-derived coupling VJP

    c_i      = cos t_i * S(sin t)_i - sin t_i * S(cos t)_i
             = sum_{j in N(i)} sin(t_j - t_i)
    tbar_m   = gbar_m + dt*K*( cos t_m * S(gbar cos t)_m
                             + sin t_m * S(gbar sin t)_m
                             - gbar_m * (cos t_m * S(cos t)_m
                                        + sin t_m * S(sin t)_m) )

(S is the symmetric masked neighbour-sum operator, so S^T = S and the
scatter of cotangents is the same shift stencil).  omega/K gradients
accumulate across batch blocks inside the kernel (grid steps are
sequential on TPU).

Parity: features and (omega, K, theta0) gradients tested in interpret
mode against the scan path's autodiff (tests/test_pallas_kuramoto.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fetode_tpu.ops.pallas_node_common import interpret_default


def _row_masks(H, W):
    """(HW, 1) f32 masks: valid left / right neighbour per lattice site.

    Returned as NUMPY arrays: make_kuramoto_rollout is lru_cached, and a
    jnp constant materialised during a trace would leak that trace's
    tracer into every later call (measured: UnexpectedTracerError when
    the first call happens inside an epoch scan and the second eagerly).
    """
    col = np.arange(H * W) % W
    maskl = (col != 0).astype(np.float32)[:, None]
    maskr = (col != W - 1).astype(np.float32)[:, None]
    return maskl, maskr


def _make_nsum(HW, W, impl="shift"):
    """Masked 4-neighbour sum on the (HW, B) sublane layout.

    ``impl="shift"``: zero-pad + slice concatenates (4 copies).
    ``impl="roll"``: ``pltpu.roll`` sublane rotations — the wrap rows are
    exactly the rows the boundary masks zero (left wrap lands on col 0,
    right wrap on col W-1) or an explicit top/bottom mask kills them, so
    the result is identical; rotates map to single vector permutes where
    the concatenate form materialises sliced copies.
    """
    if impl == "shift":
        def nsum(x, maskl, maskr):
            z1 = jnp.zeros_like(x[:1])
            zw = jnp.zeros_like(x[:W])
            left = jnp.concatenate([z1, x[:-1]], axis=0) * maskl
            right = jnp.concatenate([x[1:], z1], axis=0) * maskr
            up = jnp.concatenate([zw, x[:-W]], axis=0)
            down = jnp.concatenate([x[W:], zw], axis=0)
            return left + right + up + down

        return nsum

    def nsum_roll(x, maskl, maskr):
        # Top/bottom wrap masks via in-kernel iota (Mosaic rejects
        # captured array constants); CSE dedupes across the step loop.
        rows = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0)
        mask_top = (rows >= W).astype(x.dtype)
        mask_bot = (rows < HW - W).astype(x.dtype)
        # pltpu.roll requires non-negative shifts: -s == HW - s (rotation)
        left = pltpu.roll(x, 1, 0) * maskl
        right = pltpu.roll(x, HW - 1, 0) * maskr
        up = pltpu.roll(x, W, 0) * mask_top
        down = pltpu.roll(x, HW - W, 0) * mask_bot
        return left + right + up + down

    return nsum_roll


def _make_fwd_kernel(HW, W, steps, dt, nsum_impl="shift", unroll=False):
    nsum = _make_nsum(HW, W, nsum_impl)

    def kernel(th0_ref, om_ref, k_ref, ml_ref, mr_ref, cos_ref, sin_ref):
        om, kc = om_ref[:], k_ref[0, 0]
        ml, mr = ml_ref[:], mr_ref[:]

        def body(_, th):
            s, c = jnp.sin(th), jnp.cos(th)
            coup = c * nsum(s, ml, mr) - s * nsum(c, ml, mr)
            return th + dt * (om + kc * coup)

        th = th0_ref[:]
        if unroll:
            for i in range(steps):
                th = body(i, th)
        else:
            th = jax.lax.fori_loop(0, steps, body, th)
        cos_ref[:] = jnp.cos(th)
        sin_ref[:] = jnp.sin(th)

    return kernel


def _make_bwd_kernel(HW, W, steps, dt):
    nsum = _make_nsum(HW, W)

    def kernel(cb_ref, sb_ref, th0_ref, om_ref, k_ref, ml_ref, mr_ref,
               th0bar_ref, gom_ref, gk_ref, rec_buf):
        om, kc = om_ref[:], k_ref[0, 0]
        ml, mr = ml_ref[:], mr_ref[:]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            gom_ref[:] = jnp.zeros_like(gom_ref)
            gk_ref[:] = jnp.zeros_like(gk_ref)

        def fstep(t, th):
            rec_buf[pl.ds(t * HW, HW), :] = th
            s, c = jnp.sin(th), jnp.cos(th)
            coup = c * nsum(s, ml, mr) - s * nsum(c, ml, mr)
            return th + dt * (om + kc * coup)

        thT = jax.lax.fori_loop(0, steps, fstep, th0_ref[:])
        gbar0 = -jnp.sin(thT) * cb_ref[:] + jnp.cos(thT) * sb_ref[:]

        def bstep(j, carry):
            gbar, gom, gk = carry
            t = steps - 1 - j
            th = rec_buf[pl.ds(t * HW, HW), :]
            s, c = jnp.sin(th), jnp.cos(th)
            ss, sc = nsum(s, ml, mr), nsum(c, ml, mr)
            coup = c * ss - s * sc
            gom = gom + dt * jnp.sum(gbar, axis=1, keepdims=True)
            gk = gk + dt * jnp.sum(gbar * coup)
            tb = (c * nsum(gbar * c, ml, mr) + s * nsum(gbar * s, ml, mr)
                  - gbar * (c * sc + s * ss))
            return gbar + dt * kc * tb, gom, gk

        zero_om = jnp.zeros((HW, 1), jnp.float32)
        gbar, gom, gk = jax.lax.fori_loop(
            0, steps, bstep, (gbar0, zero_om, jnp.zeros((), jnp.float32)))
        th0bar_ref[:] = gbar
        gom_ref[:] += gom
        gk_ref[:] += gk.reshape(1, 1)

    return kernel


# Scoped-VMEM budget for the backward kernel's replay scratch.  Both
# rollout kernels now request an explicit raised Mosaic limit (sized to
# the scratch, ≤100 MiB of the chip's 128), so the budget admits wide
# batch blocks (the round-4 lane-amortisation lever, block_b up to 512);
# the remaining cap leaves headroom for the ~8 live (HW, block_b)
# working arrays of the adjoint step.
_VMEM_BUDGET_BYTES = 48 * 2**20


@functools.lru_cache(maxsize=8)
def make_kuramoto_rollout(H, W, steps, dt, block_b=128, interpret=False,
                          nsum_impl="shift", unroll=False):
    """Differentiable whole-rollout for the Kuramoto feature front-end.

    Returns ``rollout(omega, K, theta0) -> feat`` where ``omega`` is
    (H, W), ``K`` a scalar, ``theta0`` (B, H*W), and ``feat`` is
    (B, 2*H*W) laid out [cos(theta_T) | sin(theta_T)] — exactly the scan
    path's feature layout (models/kuramoto.py: kuramoto_features).

    ``nsum_impl``/``unroll`` select the forward step's neighbour-sum form
    (concat shifts vs ``pltpu.roll``) and step-loop unrolling — the
    round-4 A/B knobs for the measured rollout bottleneck (~86% of
    inference time, ``benchmarks/run_kuramoto_decomp.py``).
    """
    f32 = jnp.float32
    HW = H * W

    # The backward replay scratch is (steps*HW, block_b) f32.  Blowing the
    # scoped-VMEM limit dies inside Mosaic compilation with an opaque
    # error (and interpret mode cannot catch it), so size the batch block
    # down pre-emptively and fail with a real message when even the
    # narrowest block cannot fit (e.g. steps*HW too large outright).
    def _scratch_bytes(bb):
        return (steps + 8) * HW * bb * 4

    while block_b > 8 and _scratch_bytes(block_b) > _VMEM_BUDGET_BYTES:
        block_b //= 2
    if _scratch_bytes(block_b) > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"kuramoto rollout backward needs ~{_scratch_bytes(block_b)/2**20:.1f}"
            f" MiB of VMEM replay scratch at block_b={block_b} "
            f"(steps={steps}, H*W={HW}) — over the ~"
            f"{_VMEM_BUDGET_BYTES/2**20:.0f} MiB budget. Reduce steps or the "
            f"lattice, or fall back to rollout='scan'.")

    maskl, maskr = _row_masks(H, W)
    # Measured at block_b=512: the backward's true scoped allocation is
    # ~1.7x the replay scratch (the ~8 live (HW, bb) adjoint-step arrays
    # + double-buffered blocked streams ride on top) — budget 2x.
    cparams = ({} if interpret else
               {"compiler_params": pltpu.CompilerParams(
                   vmem_limit_bytes=max(
                       16 << 20,
                       min(100 << 20, _scratch_bytes(block_b) * 2)))})

    def _blocks(rows):
        nblk = -(-rows // block_b)
        return nblk, nblk * block_b - rows

    def _prep(omega, kc):
        return [omega.reshape(HW, 1).astype(f32),
                jnp.asarray(kc, f32).reshape(1, 1),
                jnp.asarray(maskl), jnp.asarray(maskr)]

    full = lambda *shape: pl.BlockSpec(  # noqa: E731 — whole-array block
        shape, lambda i: (0,) * len(shape))

    def _fwd(omega, kc, theta0):
        B = theta0.shape[0]
        nblk, pad = _blocks(B)
        tht = jnp.pad(theta0.T.astype(f32), ((0, 0), (0, pad)))
        inputs = [tht] + _prep(omega, kc)
        cosT, sinT = pl.pallas_call(
            _make_fwd_kernel(HW, W, steps, dt, nsum_impl, unroll),
            grid=(nblk,),
            out_shape=[jax.ShapeDtypeStruct((HW, nblk * block_b), f32)] * 2,
            in_specs=[pl.BlockSpec((HW, block_b), lambda i: (0, i)),
                      full(HW, 1), full(1, 1), full(HW, 1), full(HW, 1)],
            out_specs=[pl.BlockSpec((HW, block_b), lambda i: (0, i))] * 2,
            interpret=interpret,
            **cparams,
        )(*inputs)
        return jnp.concatenate([cosT[:, :B].T, sinT[:, :B].T], axis=-1)

    def _bwd(omega, kc, theta0, ct):
        B = theta0.shape[0]
        nblk, pad = _blocks(B)
        cb = jnp.pad(ct[:, :HW].T.astype(f32), ((0, 0), (0, pad)))
        sb = jnp.pad(ct[:, HW:].T.astype(f32), ((0, 0), (0, pad)))
        tht = jnp.pad(theta0.T.astype(f32), ((0, 0), (0, pad)))
        inputs = [cb, sb, tht] + _prep(omega, kc)
        blk = pl.BlockSpec((HW, block_b), lambda i: (0, i))
        th0bar, gom, gk = pl.pallas_call(
            _make_bwd_kernel(HW, W, steps, dt),
            grid=(nblk,),
            out_shape=[jax.ShapeDtypeStruct((HW, nblk * block_b), f32),
                       jax.ShapeDtypeStruct((HW, 1), f32),
                       jax.ShapeDtypeStruct((1, 1), f32)],
            in_specs=[blk, blk, blk, full(HW, 1), full(1, 1),
                      full(HW, 1), full(HW, 1)],
            out_specs=[blk, full(HW, 1), full(1, 1)],
            scratch_shapes=[pltpu.VMEM((steps * HW, block_b), f32)],
            interpret=interpret,
            **cparams,
        )(*inputs)
        return (gom.reshape(H, W).astype(omega.dtype),
                gk[0, 0].astype(jnp.asarray(kc).dtype),
                th0bar[:, :B].T.astype(theta0.dtype))

    @jax.custom_vjp
    def rollout(omega, kc, theta0):
        return _fwd(omega, kc, theta0)

    def fwd(omega, kc, theta0):
        return _fwd(omega, kc, theta0), (omega, kc, theta0)

    def bwd(res, ct):
        return _bwd(*res, ct)

    rollout.defvjp(fwd, bwd)
    return rollout


# ------------------------------------------------------------------ fused head
#
# The fused classifier evaluates rollout AND the KANLinear(2HW, C) head in
# one launch: the Cox-de Boor recursion runs on (HW, block_b) planes (cos
# half, then sin half) and each basis plane is consumed immediately by a
# (C, HW) x (HW, block_b) MXU matmul — only the (B, C) logits leave the
# chip.  Round-3's motivating premise ("the head's basis materialisation
# dominates inference HBM traffic") was RETIRED by the round-4
# decomposition (benchmarks/run_kuramoto_decomp.py): the rollout itself is
# ~86% of inference time, so the fused path measures a TIE with
# rollout-kernel + XLA head (166k vs 168k img/s at B=1024).  It ships as
# the parity-tested single-launch serving path (one executable, no
# intermediate features in HBM), not as a throughput win.


def _make_fused_kernel(HW, W, steps, dt, n_knots, spline_order, n_logistic,
                       C_pad):
    nsum = _make_nsum(HW, W)
    n_deg0 = n_knots - 1

    n_coeff = n_deg0 - spline_order

    def head_half(x, gw_ref, wb_ref, sw_ref, lab_ref, lw_ref, acc):
        """Accumulate one feature half's head output into acc (C_pad, b).

        x: (HW, b) features; gw_ref: (n_coeff, HW, k+2) per-coefficient
        knot windows (gw[c, :, i] = grid[:, c+i]); wb_ref: (C_pad, HW);
        sw_ref: (n_coeff, C_pad, HW) pre-scaled spline weights; lab_ref:
        (K, HW, 2) packed logistic (a, b); lw_ref: (K, C_pad, HW)
        pre-scaled logistic weights.  Everything coefficient-major so a
        ``fori_loop`` body takes a cheap dynamic leading-dim slice.
        """
        f32 = jnp.float32
        acc = acc + jnp.dot(wb_ref[:], x * jax.nn.sigmoid(x),
                            preferred_element_type=f32)

        # Per-coefficient de Boor triangle inside a REAL fori_loop: basis
        # c only needs knots c..c+k+1, so one body keeps at most
        # spline_order+1 (HW, b) planes live — and the loop is the part
        # Mosaic cannot hoist across.  (Both a shared 11-plane Cox-de
        # Boor recursion and a Python-unrolled triangle OOM the 16 MiB
        # scoped-VMEM stack at block_b=128 — measured 65.6 / 84.1 MiB:
        # the stack allocator keeps every unrolled plane live.)  The
        # triangle recomputes ~2x the VPU flops, which are free next to
        # the rollout.
        def spline_coeff(c, acc):
            win = gw_ref[pl.ds(c, 1), :, :]
            g = lambda i: win[0, :, i:i + 1]               # noqa: E731
            b = [jnp.logical_and(x >= g(i), x < g(i + 1)).astype(f32)
                 for i in range(spline_order + 1)]
            for k in range(1, spline_order + 1):
                b = [(x - g(i)) / (g(i + k) - g(i)) * b[i]
                     + (g(i + k + 1) - x)
                     / (g(i + k + 1) - g(i + 1)) * b[i + 1]
                     for i in range(len(b) - 1)]
            sw_c = sw_ref[pl.ds(c, 1), :, :]
            return acc + jnp.dot(sw_c[0], b[0], preferred_element_type=f32)

        acc = jax.lax.fori_loop(0, n_coeff, spline_coeff, acc)

        if n_logistic:
            def logistic_coeff(c, acc):
                lab = lab_ref[pl.ds(c, 1), :, :][0]
                phi = 2.0 * jax.nn.sigmoid(lab[:, 0:1] * (x - lab[:, 1:2]))
                lw_c = lw_ref[pl.ds(c, 1), :, :]
                return acc + jnp.dot(lw_c[0], phi,
                                     preferred_element_type=f32)

            acc = jax.lax.fori_loop(0, n_logistic, logistic_coeff, acc)
        return acc

    def kernel(th0_ref, om_ref, k_ref, ml_ref, mr_ref,
               gwc_ref, gws_ref, wbc_ref, wbs_ref, swc_ref, sws_ref,
               labc_ref, labs_ref, lwc_ref, lws_ref,
               out_ref):
        om, kc = om_ref[:], k_ref[0, 0]
        ml, mr = ml_ref[:], mr_ref[:]

        def body(_, th):
            s, c = jnp.sin(th), jnp.cos(th)
            coup = c * nsum(s, ml, mr) - s * nsum(c, ml, mr)
            return th + dt * (om + kc * coup)

        th = jax.lax.fori_loop(0, steps, body, th0_ref[:])

        acc = jnp.zeros((C_pad, th.shape[1]), jnp.float32)
        acc = head_half(jnp.cos(th), gwc_ref, wbc_ref, swc_ref,
                        labc_ref, lwc_ref, acc)
        acc = head_half(jnp.sin(th), gws_ref, wbs_ref, sws_ref,
                        labs_ref, lws_ref, acc)
        out_ref[:] = acc

    return kernel


@functools.lru_cache(maxsize=8)
def make_kuramoto_fused_classifier(H, W, steps, dt, n_knots, spline_order,
                                   n_logistic, num_classes, block_b=128,
                                   interpret=False):
    """Whole-model forward: rollout + KANLinear head in ONE kernel launch.

    Returns ``fused(omega, K, theta0, grid, wb, sw, la, lb, lw) -> logits``
    with theta0 (B, H*W), grid (2HW, n_knots), wb (C, 2HW), sw pre-scaled
    (C, 2HW, n_coeff), la/lb (2HW, K), lw pre-scaled (C, 2HW, K), logits
    (B, C).  Differentiable: the VJP recomputes through the rollout
    kernel's discrete adjoint + the XLA head (exact same math), so
    training with the fused path stays correct — its win is inference,
    where the basis tensors never leave VMEM.
    """
    f32 = jnp.float32
    HW = H * W
    n_deg0 = n_knots - 1
    C_pad = max(8, -(-num_classes // 8) * 8)

    # The head loops are real fori_loops, so live VMEM is one loop body
    # (spline_order+1 basis planes + temporaries + the rollout's working
    # planes), NOT the coefficient count; shrink the batch block
    # pre-emptively rather than dying inside Mosaic.  The plane constant
    # is CALIBRATED on chip: Mosaic's stack measured 17.32 MiB at MNIST
    # shape (H*W=784, spline_order=3, block_b=128) = 43.1 planes of
    # (HW, block_b) f32 — the allocator keeps far more live than the
    # dataflow minimum.  The pallas_call raises the scoped limit to 64
    # MiB; this guard keeps the stack clear of that raised ceiling.
    def _live_bytes(bb):
        return (spline_order + 41) * HW * bb * 4

    _FUSED_BUDGET = 56 * 2**20
    while block_b > 8 and _live_bytes(block_b) > _FUSED_BUDGET:
        block_b //= 2
    if _live_bytes(block_b) > _FUSED_BUDGET:
        raise ValueError(
            f"kuramoto fused head needs ~{_live_bytes(block_b)/2**20:.1f} MiB"
            f" of VMEM at block_b={block_b} (H*W={HW}, n_knots={n_knots}) — "
            f"over the ~{_FUSED_BUDGET/2**20:.0f} MiB budget. Use "
            "rollout='pallas' (unfused head) instead.")

    maskl, maskr = _row_masks(H, W)

    def _blocks(rows):
        nblk = -(-rows // block_b)
        return nblk, nblk * block_b - rows

    full = lambda *shape: pl.BlockSpec(  # noqa: E731 — whole-array block
        shape, lambda i: (0,) * len(shape))

    def _pad_c(a):
        return jnp.pad(a.astype(f32), ((0, C_pad - a.shape[0]),)
                       + ((0, 0),) * (a.ndim - 1))

    def _fwd(omega, kc, theta0, grid, wb, sw, la, lb, lw):
        B = theta0.shape[0]
        nblk, pad = _blocks(B)
        tht = jnp.pad(theta0.T.astype(f32), ((0, 0), (0, pad)))
        grid = grid.astype(f32)
        wb = _pad_c(wb)

        def _coeff_major(a):  # (C, 2HW, k) -> (k, C_pad, 2HW)
            a = a.transpose(2, 0, 1).astype(f32)
            return jnp.pad(a, ((0, 0), (0, C_pad - a.shape[1]), (0, 0)))

        sw, lw = _coeff_major(sw), _coeff_major(lw)
        n_coeff = n_knots - spline_order - 1
        # per-coefficient knot windows: gw[c, :, i] = grid[:, c+i] —
        # leading-dim (untiled) layout so the kernel's fori body can
        # dynamic-slice one window; likewise pack logistic (a, b).
        gw = jnp.stack([grid[:, c:c + spline_order + 2]
                        for c in range(n_coeff)])        # (n_coeff, 2HW, k+2)
        lab = jnp.stack([la.T.astype(f32), lb.T.astype(f32)],
                        axis=-1)                         # (K, 2HW, 2)
        halves = []
        for sl in (slice(0, HW), slice(HW, 2 * HW)):
            halves += [gw[:, sl], wb[:, sl], sw[:, :, sl], lab[:, sl],
                       lw[:, :, sl]]
        (gwc, wbc, swc, labc, lwc, gws, wbs, sws, labs, lws) = halves
        inputs = [tht, omega.reshape(HW, 1).astype(f32),
                  jnp.asarray(kc, f32).reshape(1, 1),
                  jnp.asarray(maskl), jnp.asarray(maskr),
                  gwc, gws, wbc, wbs, swc, sws, labc, labs, lwc, lws]
        K = max(n_logistic, 1)
        out = pl.pallas_call(
            _make_fused_kernel(HW, W, steps, dt, n_knots, spline_order,
                               n_logistic, C_pad),
            grid=(nblk,),
            out_shape=jax.ShapeDtypeStruct((C_pad, nblk * block_b), f32),
            in_specs=[pl.BlockSpec((HW, block_b), lambda i: (0, i)),
                      full(HW, 1), full(1, 1), full(HW, 1), full(HW, 1),
                      full(n_coeff, HW, spline_order + 2),
                      full(n_coeff, HW, spline_order + 2),
                      full(C_pad, HW), full(C_pad, HW),
                      full(n_coeff, C_pad, HW), full(n_coeff, C_pad, HW),
                      full(K, HW, 2), full(K, HW, 2),
                      full(K, C_pad, HW), full(K, C_pad, HW)],
            out_specs=pl.BlockSpec((C_pad, block_b), lambda i: (0, i)),
            interpret=interpret,
            # Mosaic's default scoped-vmem limit is 16 MiB; the head's
            # stack measures 17.32 MiB at MNIST shape (H*W=784,
            # block_b=128) on a real chip — raise the limit as the other
            # whole-solve kernels do (ops/pallas_node_common.py) and let
            # _live_bytes guard the physical budget.
            **({} if interpret else {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20)}),
        )(*inputs)
        return out[:num_classes, :B].T

    def _head_ref(feat, grid, wb, sw, la, lb, lw):
        """XLA reference of the in-kernel head math (for the VJP path)."""
        from fetode_tpu.ops.bsplines import bspline_basis

        B = feat.shape[0]
        y = jnp.dot(jax.nn.silu(feat), wb.T, preferred_element_type=f32)
        bases = bspline_basis(feat, grid, spline_order)
        y = y + jnp.dot(bases.reshape(B, -1),
                        sw.reshape(sw.shape[0], -1).T,
                        preferred_element_type=f32)
        if n_logistic:
            phi = 2.0 * jax.nn.sigmoid(la * (feat[..., None] - lb))
            y = y + jnp.dot(phi.reshape(B, -1),
                            lw.reshape(lw.shape[0], -1).T,
                            preferred_element_type=f32)
        return y

    rollout = make_kuramoto_rollout(H, W, steps, dt, block_b=block_b,
                                    interpret=interpret)

    def _ref(omega, kc, theta0, grid, wb, sw, la, lb, lw):
        return _head_ref(rollout(omega, kc, theta0), grid, wb, sw, la, lb, lw)

    @jax.custom_vjp
    def fused(omega, kc, theta0, grid, wb, sw, la, lb, lw):
        return _fwd(omega, kc, theta0, grid, wb, sw, la, lb, lw)

    def fwd(*args):
        return _fwd(*args), args

    def bwd(res, ct):
        _, vjp = jax.vjp(_ref, *res)
        return vjp(ct)

    fused.defvjp(fwd, bwd)
    return fused


def pallas_kuramoto_logits(params, spec, x_img, *, interpret=None):
    """Fused whole-classifier forward (``rollout='pallas_fused'``): Kuramoto
    phase rollout AND the KANLinear head in one kernel — the basis
    expansions (``(B, 2HW, G+k)`` spline + ``(B, 2HW, K)`` logistic) stay
    in VMEM instead of round-tripping HBM.  Head math matches
    ``nn.kan.kan_linear_apply`` on the head config
    (reference: ``mnist_kuramoto_kan.py:207-283``)."""
    import math

    if interpret is None:
        interpret = interpret_default()
    if x_img.ndim == 4:
        x_img = x_img[:, 0]
    B = x_img.shape[0]
    theta0 = (math.pi * (2.0 * x_img - 1.0)).reshape(B, spec.H * spec.W)

    cfg = spec.head_cfg
    head = params["head"]
    sw = head["spline_weight"]
    if cfg.standalone_spline_scaler:
        sw = sw * head["spline_scaler"][..., None]
    if cfg.logistic_num_basis:
        lp = head["logistic"]
        lw = lp["weight"] * cfg.scale_logistic
        if cfg.standalone_logistic_scaler:
            lw = lw * lp["scaler"][:, None]
        lw = lw.reshape(cfg.out_features, cfg.in_features,
                        cfg.logistic_num_basis)
        la, lb = lp["a"], lp["b"]
    else:
        la = lb = jnp.zeros((cfg.in_features, 1), jnp.float32)
        lw = jnp.zeros((cfg.out_features, cfg.in_features, 1), jnp.float32)

    grid = head["_buffers"]["grid"]
    fn = make_kuramoto_fused_classifier(
        spec.H, spec.W, spec.steps, spec.dt, grid.shape[1], cfg.spline_order,
        cfg.logistic_num_basis, cfg.out_features, interpret=interpret)
    return fn(params["omega"], params["K"], theta0, grid,
              head["base_weight"], sw, la, lb, lw)


def pallas_kuramoto_features(params, spec, x_img, *, interpret=None):
    """Drop-in replacement for ``kuramoto_features`` (same layout) running
    the whole rollout + adjoint in one kernel pair."""
    import math

    if interpret is None:
        # Compiled Mosaic kernels with pltpu.VMEM scratch only lower on
        # TPU; every other backend (cpu tests, hypothetical gpu) takes
        # the interpreter, which is bit-faithful if slow.
        interpret = interpret_default()
    if x_img.ndim == 4:
        x_img = x_img[:, 0]
    B = x_img.shape[0]
    theta0 = (math.pi * (2.0 * x_img - 1.0)).reshape(B, spec.H * spec.W)
    fn = make_kuramoto_rollout(spec.H, spec.W, spec.steps, spec.dt,
                               interpret=interpret)
    return fn(params["omega"], params["K"], theta0)
