"""Workload configuration presets + flag overrides.

SURVEY.md §5.6: the reference's config surface is module constants,
kwargs, one dataclass and an unused argparse import.  Here every workload
has one preset dataclass mirroring the reference's de-facto published
hyper-parameters, overridable from the CLI (``fetode_tpu.cli``) with
``--key value`` flags.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


@dataclass
class PredPreyPreset:
    """train_kanfet_node_predprey.py:20-38 (lr 2e-3, 10k epochs,
    KANFET [2,10,2] grid 5, dopri5)."""

    epochs: int = 10_000
    epochs_per_call: int = 100
    lr: float = 2e-3
    layers: tuple = (2, 10, 2)
    grid_size: int = 5
    ferro_num_basis: int = 8
    method: str = "dopri5"
    rtol: float = 1e-7
    atol: float = 1e-9
    max_steps: int = 256
    # "auto" (scan under differentiation, while for no-grad eval),
    # "scan" (checkpointed XLA scan), "while" (early-exit eval), or
    # "pallas" (the whole-solve kernel with in-kernel discrete adjoint —
    # fastest measured training path on a real TPU chip).
    solver_mode: str = "auto"
    # Fit at the times the window targets were actually sampled (the
    # reference's t_learn grid runs 2.24% slow — see
    # PredPreyRun.consistent_time_base; flagship quality runs set True).
    consistent_time_base: bool = False
    # Multiple shooting (PredPreyRun.shooting_points; 0 disables) and
    # parallel-in-time segment sharding over the mesh 'data' axis
    # (PredPreyRun.shooting_devices).
    shooting_points: int = 0
    shooting_devices: int = 0
    # Durable checkpoint/resume (orbax): --ckpt-dir runs/ckpt
    # --ckpt-every 500 saves the full train state every 500 epochs;
    # --resume restores the latest checkpoint from --ckpt-dir and
    # continues (the reference's load_ckpt is a dead call,
    # predator_prey.py:123-124).
    ckpt_dir: str = ""
    ckpt_every: int = 0
    resume: bool = False
    # AOT executable cache dir ("" = off): repeat runs of the same config
    # load the epoch-scanner grad program from disk instead of paying the
    # per-process Mosaic remote compile (serve.py: AotCache/CachedJit).
    aot_cache: str = ""
    seed: int = 0


@dataclass
class ECGPreset:
    """train_ecg_kan_fet_nn_ode.py:1181-1261 (100 epochs "sweet spot",
    batch 8, latent 64, basis 12, dopri5 rtol 1e-2 atol 1e-3)."""

    # kanfet_node|kanfet_mlp_node|fepa_rnn|digital_rnn|node_rnn; "all":
    # train the reference's comparison set (+ a noisy ferro variant) and
    # emit the multi-model chart/table (train_ecg.py:1418-1463);
    # "noise_study": the clean-vs-noisy grid (compare_noise_ecg.py:
    # 1250-1452) as ONE vmapped population dispatch
    # (train/ecg_driver.py: compare_noise_population) over
    # --noise-stds x --noise-seeds.
    model: str = "kanfet_node"
    noise_stds: str = "0,0.1,0.2,0.5"
    noise_seeds: str = "0,1,2"
    epochs: int = 100
    batch_size: int = 8
    lr: float = 1e-3
    weight_decay: float = 1e-4
    latent_dim: int = 64
    num_basis: int = 12
    solver: str = "dopri5"
    rtol: float = 1e-2
    atol: float = 1e-3
    noise_std: float = 0.0
    # Ferro gate form on the kanfet_mlp_node model ONLY (the other ECG
    # models have no gate_impl field; the CLI refuses the combination):
    # "sigmoid" (reference math) or "tanh" (same function via the tanh
    # identity, ~1 ulp — the measured +12% VPU form on v5e; XLA solve
    # paths only).
    gate_impl: str = "sigmoid"
    # "auto" (scan under differentiation, while for no-grad eval),
    # "scan", or "pallas" (whole-solve in-kernel adjoint) on the NODE
    # models; the ferro kernel requires noise_std == 0 (falls back to
    # XLA otherwise).
    solver_mode: str = "auto"
    # kanfet_node latent field: "plain" (No_MLP_KANODEFunc) or "mlp"
    # (MLPKANODEFunc with the B-spline KAN stack).
    field: str = "plain"
    # Epochs per device dispatch (ECGRun.epochs_per_call): >1 blocks
    # whole epoch groups into one jit (3-4x on fast models); 1 keeps the
    # reference's per-epoch eval/best-tracking.
    epochs_per_call: int = 1
    # Data-parallel mesh (set via --mesh or directly): 0 = single device.
    mesh_devices: int = 0
    mesh_model: int = 1
    # Durable checkpoint/resume: --ckpt-dir D --ckpt-every N [--resume]
    # (train/checkpoint.py: DurableLoop; exact-curve resume).
    ckpt_dir: str = ""
    ckpt_every: int = 0
    resume: bool = False
    # AOT executable cache dir ('' = off): repeat runs of the same
    # config load the epoch program from disk instead of recompiling
    # (serve.py: AotCache).
    aot_cache: str = ""
    seed: int = 0


@dataclass
class ETTPreset:
    """train_kan_fet_ett.py:1341-1351 (ETTh1, context 96, pred 8,
    batch 64, 100 epochs, AdamW 1e-3 wd 1e-4, latent 64)."""

    dataset: str = "ETTh1"
    target: str = "OT"
    model: str = "point"             # point|diffusion|kan_diffusion|kan_fet_diffusion
    context_len: int = 96
    pred_len: int = 8
    batch_size: int = 64
    epochs: int = 100
    lr: float = 1e-3
    weight_decay: float = 1e-4
    latent_dim: int = 64
    diff_t: int = 200
    eval_samples: int = 10
    # "scan" (checkpointed XLA) or "pallas" (whole-solve latent-ODE
    # kernel with in-kernel discrete adjoint, ops/pallas_ode_dyn.py) on
    # the latent dopri5 solve shared by the point forecaster and all
    # three diffusion forecasters.  Eval always runs while-mode (the
    # driver downgrades: large eval chunks don't need adjoint records).
    solver_mode: str = "auto"
    mesh_devices: int = 0
    mesh_model: int = 1
    # Durable checkpoint/resume: --ckpt-dir D --ckpt-every N [--resume]
    # (train/checkpoint.py: DurableLoop; exact-curve resume).
    ckpt_dir: str = ""
    ckpt_every: int = 0
    resume: bool = False
    # AOT executable cache dir ('' = off): repeat runs of the same
    # config load the epoch program from disk instead of recompiling
    # (serve.py: AotCache).
    aot_cache: str = ""
    seed: int = 0


@dataclass
class CondDiffusionPreset:
    """kan_diffusion_ett.py:870-924 (seq 96, pred 24, T=250, batch 64,
    AdamW 2e-4, five denoiser variants)."""

    dataset: str = "ETTh1"
    denoiser: str = "kan_fet_all_node"
    seq_len: int = 96
    pred_len: int = 24
    diff_t: int = 250
    batch_size: int = 64
    epochs: int = 10
    lr: float = 2e-4
    eval_samples: int = 10
    # NODE-encoder denoisers (kan_node / kan_fet_all_node): "scan"
    # (checkpointed XLA) or "pallas" — the whole-solve encoder kernel
    # (ops/pallas_node_enc.py: signal interpolation + field + in-kernel
    # discrete adjoint; measured 4.9x on chip).
    solver_mode: str = "auto"
    mesh_devices: int = 0
    mesh_model: int = 1
    # Durable checkpoint/resume: --ckpt-dir D --ckpt-every N [--resume]
    # (train/checkpoint.py: DurableLoop; exact-curve resume).
    ckpt_dir: str = ""
    ckpt_every: int = 0
    resume: bool = False
    # AOT executable cache dir ('' = off): repeat runs of the same
    # config load the epoch program from disk instead of recompiling
    # (serve.py: AotCache).
    aot_cache: str = ""
    seed: int = 0


@dataclass
class TimeMMDPreset:
    """train_kan_fet_mmd*_multimodal.py:234-257 (context 50, pred 12,
    text SVD dim 7, batch 48, 50 epochs)."""

    domain: str = "Energy"           # Energy|Climate
    multimodal: bool = False
    context_len: int = 50
    pred_len: int = 12
    text_embed_dim: int = 7
    tfidf_max_features: int = 20_000
    batch_size: int = 48
    epochs: int = 50
    lr: float = 1e-3
    mesh_devices: int = 0
    mesh_model: int = 1
    # Durable checkpoint/resume: --ckpt-dir D --ckpt-every N [--resume]
    # (train/checkpoint.py: DurableLoop; exact-curve resume).
    ckpt_dir: str = ""
    ckpt_every: int = 0
    resume: bool = False
    # AOT executable cache dir ('' = off): repeat runs of the same
    # config load the epoch program from disk instead of recompiling
    # (serve.py: AotCache).
    aot_cache: str = ""
    seed: int = 0


@dataclass
class MNISTPreset:
    """mnist_kuramoto_kan.py:210-247 (10 Kuramoto steps dt 0.15,
    3 epochs, batch 128, AdamW 1e-3)."""

    kuramoto_steps: int = 10
    dt: float = 0.15
    num_basis: int = 8
    epochs: int = 3
    batch_size: int = 128
    lr: float = 1e-3
    # "auto" (pallas on the TPU backend, scan elsewhere), "scan"
    # (lax.scan + cross conv), or "pallas" (whole-rollout kernel,
    # ops/pallas_kuramoto.py — measured 1.5-1.6x the scan on v5e)
    rollout: str = "auto"
    mesh_devices: int = 0
    mesh_model: int = 1
    seed: int = 0


@dataclass
class SymbolicPreset:
    """smooth_test_KAN_ferro.py:125-160 (2-layer ferro-KAN symbolic
    regression of y = sin x + 0.1 x^2 with L1 coef pruning)."""

    hidden: int = 8
    num_basis: int = 6
    l1_coef: float = 1e-3
    epochs: int = 300
    lr: float = 5e-3
    n_points: int = 128
    seed: int = 0


@dataclass
class ServePreset:
    """AOT export + serving bench (fetode_tpu/serve.py).

    The reference has no deployment story (its scripts end at matplotlib
    figures); this workload exports a trained (or fresh) model as a
    compile-free serving bundle — one serialized TPU executable per batch
    bucket, params, portable StableHLO fallback — then loads it back and
    measures serving latency/throughput per bucket."""

    # What to serve: "ecg" (KanFet-NODE classifier logits), "ett"
    # (latent-ODE point forecaster), "predprey" (batched trajectory
    # solve), "ddpm" (whole-chain diffusion sampler), "cond_diffusion"
    # (conditional denoiser, hoisted conditioning), "mnist" (Kuramoto
    # classifier, fused rollout+head kernel).
    source: str = "ecg"
    # Batch buckets to export (one executable each; requests pad up /
    # chunk down at serve time). Must divide the data-axis device count.
    buckets: tuple = (8, 64, 256)
    # Where the bundle goes ("" = <out-dir>/bundle).
    bundle_dir: str = ""
    # Optional DurableLoop checkpoint dir: serve its best_params instead
    # of a fresh init (e.g. the --ckpt-dir of a prior ecg/ett run).
    ckpt_dir: str = ""
    # Latency bench: timed iterations per bucket.
    iters: int = 30
    # ECG source hypers (must match the training run when ckpt_dir is set)
    t_len: int = 96
    latent_dim: int = 64
    num_basis: int = 12
    field: str = "plain"
    solver_mode: str = "auto"
    rtol: float = 1e-2
    atol: float = 1e-3
    # ETT source hypers
    num_features: int = 7
    context_len: int = 96
    pred_len: int = 8
    # predprey source: serve trajectories over linspace(0, horizon, n_points)
    horizon: float = 14.0
    n_points: int = 140
    # ddpm source (the production diffusion eval path — the reference's
    # worst self-reported hotspot, kan_diffusion_ett.py:749): forecast =
    # mean of n_samples whole-chain reverse samples (fixed serving PRNG,
    # deterministic output), diff_T reverse steps.
    n_samples: int = 10
    diff_t: int = 200
    # cond_diffusion source: which of the 5 denoiser variants to serve
    # (kan_node is the measured-best conditioner at convergence).
    denoiser: str = "kan_node"
    # mnist source: Kuramoto rollout path ("scan", "pallas", or
    # "pallas_fused" — the one-kernel rollout+KANLinear-head classifier).
    rollout: str = "pallas_fused"
    seed: int = 0


PRESETS = {
    "predprey": PredPreyPreset,
    "ecg": ECGPreset,
    "ett": ETTPreset,
    "cond_diffusion": CondDiffusionPreset,
    "timemmd": TimeMMDPreset,
    "mnist": MNISTPreset,
    "symbolic": SymbolicPreset,
    "serve": ServePreset,
}


def make_config(workload: str, overrides: Optional[Dict[str, Any]] = None):
    """Instantiate a preset with typed overrides; unknown keys error."""
    cls = PRESETS[workload]
    cfg = cls()
    for k, v in (overrides or {}).items():
        if not hasattr(cfg, k):
            raise ValueError(f"unknown option {k!r} for workload {workload!r};"
                             f" valid: {[f.name for f in dataclasses.fields(cls)]}")
        cur = getattr(cfg, k)
        if isinstance(cur, bool):
            v = str(v).lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            v = int(v)
        elif isinstance(cur, float):
            v = float(v)
        elif isinstance(cur, tuple):
            v = tuple(int(x) for x in str(v).strip("()[]").split(","))
        setattr(cfg, k, v)
    return cfg
