"""ECG200 training drivers: per-model trainers + clean-vs-noisy comparison.

Capability parity with the trainer functions of ``train_ecg.py`` /
``train_ecg_kan_fet_nn_ode.py`` (AdamW, CE loss, grad clip 1.0, accuracy
eval, best-state tracking) and the noise-robustness comparison harness of
``compare_noise_ecg.py`` (same model trained at several device-noise
levels and seeds, accuracy curves side by side).

Device noise is *fresh per training step*: the reference draws new
Gaussian noise on every basis forward (``ferro_class.py:309-310``,
``:508-509`` — ``torch.randn_like(...).detach()``); here an explicit PRNG
key is split per minibatch step inside the jitted epoch scan, so no two
steps ever observe the same perturbation.  Evaluation averages logits over
``ECGRun.eval_noise_draws`` independent noise draws (a Monte-Carlo estimate
of the analog device's expected accuracy); for noiseless models the key is
ignored and the average is exact.

TPU-native: a whole epoch of minibatches is one jitted scan; evaluation is
one jitted batched forward.
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fetode_tpu.data.ecg200 import batch_iterator
from fetode_tpu.train.loop import (init_state, make_minibatch_epoch,
                                   make_minibatch_epochs_scanner,
                                   make_population_epochs_scanner)
from fetode_tpu.train.optim import make_optimizer


@dataclass
class ECGRun:
    epochs: int = 100
    batch_size: int = 8
    lr: float = 1e-3
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    seed: int = 0
    log_every: int = 10
    eval_noise_draws: int = 1   # logits averaged over this many noise keys
    # >0: evaluate accuracy in chunks of this many rows (lax.map) —
    # bounds the pallas whole-solve kernels' O(B) VMEM on big eval
    # splits (see _chunked_logits); 0 = whole split in one call (the
    # historical protocol of every recorded study).
    eval_chunk: int = 0
    # Epochs per device dispatch (make_minibatch_epochs_scanner).  >1
    # amortises host round trips (fast models are dispatch-bound — the
    # logistic KanFetNODE measures 3-4x); eval/best-tracking then happen
    # once per block instead of per epoch (the reference tracks per
    # epoch, so 1 is the parity default).
    epochs_per_call: int = 1
    # >0: train over a ('data','model') mesh of this many devices —
    # minibatch axis sharded over 'data' (grad psum via GSPMD);
    # mesh_model>1 column-shards output features over 'model'
    # (model_param_specs), else params replicate.  batch_size must
    # divide the data axis.
    mesh_devices: int = 0
    mesh_model: int = 1
    # Durable checkpoint/resume (train/checkpoint.py: DurableLoop).  All
    # per-epoch randomness is stateless (fold_in(base, ep), shuffles
    # seeded run.seed + ep), so (state, best) is the whole resume payload
    # and the resumed curve is exact.
    ckpt_dir: str = ""
    ckpt_every: int = 0
    resume: bool = False
    # AOT executable cache dir ("" = off): the epoch program is loaded
    # from / stored to disk as a serialized compiled executable
    # (serve.py: AotCache), skipping the per-process compile on repeat
    # runs.  This trainer takes an OPAQUE apply_fn, so the caller must
    # supply aot_tag — a hash of the model/spec identity
    # (serve.config_hash) — or the cache could serve the wrong program.
    aot_cache: str = ""
    aot_tag: str = ""


def cross_entropy(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def _chunked_logits(apply_i, x, n_draws, chunk):
    """Noise-draw-averaged logits over ``x``, optionally evaluated in
    ``chunk``-row pieces (``lax.map`` over chunks inside jit).

    ``chunk=0`` (default) evaluates the whole eval split in one call —
    the historical protocol every recorded study used.  ``chunk>0``
    bounds the per-launch working set: the pallas whole-solve kernels
    carry O(B) VMEM (attempt records, and for noisy ferro solves the
    frozen (B, out, in*K) noise operands — measured 146 MB > the 128 MB
    cap at B=100 x P=12 vmapped members), so population-over-members
    eval on the kernel path needs bounded chunks.  Noise-draw note: a
    chunked eval draws per (chunk, key) rather than per (split, key), so
    noisy-eval accuracies are a different (equally valid) Monte-Carlo
    estimate than the unchunked protocol — compare like with like.
    """
    def logits_of(xc):
        return jnp.mean(jnp.stack([apply_i(xc, i)
                                   for i in range(n_draws)]), 0)

    n = x.shape[0]
    if not chunk or n <= chunk:
        return logits_of(x)
    pad = (-n) % chunk
    xp = jnp.concatenate(
        [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])]) if pad else x
    lg = jax.lax.map(logits_of, xp.reshape(-1, chunk, *x.shape[1:]))
    return lg.reshape(-1, lg.shape[-1])[:n]


def accuracy(logits, labels):
    return (jnp.argmax(logits, -1) == labels).mean()


def train_ecg_model(
    init_fn: Callable,
    apply_fn: Callable,
    data,
    run: ECGRun = ECGRun(),
    log=print,
):
    """Generic ECG trainer.

    init_fn(key) -> params; apply_fn(params, x, key) -> logits, where
    ``key`` is a PRNG key consumed for device noise when the model is
    noisy (fresh per training step) and ignored otherwise.
    data = (x_train, y_train, x_test, y_test) numpy arrays.
    Returns (best_params, history).
    """
    x_train, y_train, x_test, y_test = data
    key = jax.random.PRNGKey(run.seed)
    key, init_key, noise_base, eval_base = jax.random.split(key, 4)
    params = init_fn(init_key)

    mesh = None
    _shard = lambda tree, batch_axis: tree       # noqa: E731
    if run.mesh_devices:
        from fetode_tpu.parallel import (make_mesh, model_param_specs,
                                         shard_batch_leaves, shard_params)

        mesh = make_mesh(run.mesh_devices, model=run.mesh_model)
        # model=1: replicate; model>1: column-parallel output-feature
        # sharding (GSPMD inserts the implied collectives).
        specs = (model_param_specs(params, mesh)
                 if run.mesh_model > 1 else None)
        params = shard_params(params, mesh, specs)
        _shard = lambda tree, batch_axis: shard_batch_leaves(  # noqa: E731
            tree, mesh, batch_axis=batch_axis)

    tx = make_optimizer(run.lr, kind="adamw", weight_decay=run.weight_decay,
                        grad_clip=run.grad_clip, params=params)
    state = init_state(params, tx)

    def loss_fn(p, k, xb, yb):
        return cross_entropy(apply_fn(p, xb, k), yb)

    epoch_fn = make_minibatch_epoch(loss_fn, tx, keyed=True)
    _wrap = lambda fn, nm: fn            # noqa: E731
    if run.aot_cache:
        if not run.aot_tag:
            raise ValueError(
                "ECGRun.aot_cache requires aot_tag: this trainer takes an "
                "opaque apply_fn, so the caller must pin the program "
                "identity (serve.config_hash of the model/spec)")
        from fetode_tpu.serve import AotCache, CachedJit

        _cache = AotCache(run.aot_cache)
        _wrap = lambda fn, nm: CachedJit(  # noqa: E731
            _cache, f"{nm}-{run.aot_tag}", fn)
        epoch_fn = _wrap(epoch_fn, "ecg-epoch")

    # Fixed eval keys (drawn once): evaluation is a consistent estimate of
    # the same "device instance" across epochs; vary run.seed for repeats.
    # At least one draw — noiseless models ignore the key entirely.
    eval_keys = jax.random.split(eval_base, max(1, run.eval_noise_draws))

    @jax.jit
    def eval_acc(p, x, y):
        # Draws are averaged SEQUENTIALLY (unrolled), not vmapped: vmapping
        # the whole-solve pallas path over keys stacks the frozen
        # (B, out, in*K) noise operands draws-fold in VMEM (measured OOM at
        # 4 draws x B=100 on the ECG ferro kernel).  run.eval_chunk
        # additionally bounds the per-launch batch (see _chunked_logits).
        logits = _chunked_logits(lambda xc, i: apply_fn(p, xc, eval_keys[i]),
                                 x, len(eval_keys), run.eval_chunk)
        return accuracy(logits, y)

    # Eval splits shard over 'data' when their length divides the axis,
    # else stay replicated (shard_batch_leaves handles ragged splits).
    x_test_j = _shard(jnp.asarray(x_test), 0)
    y_test_j = _shard(jnp.asarray(y_test), 0)
    x_train_j = _shard(jnp.asarray(x_train), 0)
    y_train_j = _shard(jnp.asarray(y_train), 0)

    history = {"loss": [], "train_acc": [], "test_acc": []}
    best = (-1.0, state.params)

    from fetode_tpu.train.checkpoint import DurableLoop

    dl = DurableLoop(run.ckpt_dir, run.ckpt_every, run.resume)
    start_ep, saved = dl.restore(state=state, best_crit=-1.0,
                                 best_params=state.params)
    if saved is not None:
        state = saved["state"]
        best = (float(saved["best_crit"]), saved["best_params"])
        if log is not None:
            log(f"[ckpt] resumed at epoch {start_ep} from {run.ckpt_dir}")

    t0 = time.perf_counter()
    E = max(1, run.epochs_per_call)
    # NOTE: if epochs % E != 0 the ragged tail block has a different
    # leading dim and costs one extra trace/compile of the epoch scan —
    # pick epochs_per_call | epochs for benchmark runs.
    block_fn = (_wrap(make_minibatch_epochs_scanner(loss_fn, tx, keyed=True),
                      f"ecg-block{E}")
                if E > 1 else None)
    for ep in range(start_ep, run.epochs, E):
        n = min(E, run.epochs - ep)
        if n == 1:
            bx, by = batch_iterator(x_train, y_train, run.batch_size,
                                    seed=run.seed + ep)
            ep_key = jax.random.fold_in(noise_base, ep)
            state, losses = epoch_fn(
                state, ep_key,
                _shard((jnp.asarray(bx), jnp.asarray(by)), 1))
        else:
            shuffles = [batch_iterator(x_train, y_train, run.batch_size,
                                       seed=run.seed + ep + i)
                        for i in range(n)]
            eb = _shard((jnp.asarray(np.stack([b[0] for b in shuffles])),
                         jnp.asarray(np.stack([b[1] for b in shuffles]))), 2)
            state, losses = block_fn(state, jax.random.fold_in(noise_base, ep),
                                     eb)
        tr_acc = float(eval_acc(state.params, x_train_j, y_train_j))
        te_acc = float(eval_acc(state.params, x_test_j, y_test_j))
        history["loss"].append(float(losses.mean()))
        history["train_acc"].append(tr_acc)
        history["test_acc"].append(te_acc)
        if te_acc > best[0]:
            best = (te_acc, state.params)
        dl.save(ep + n, state=state, best_crit=best[0], best_params=best[1],
                last=ep + n >= run.epochs)
        # Log whenever the block [ep, ep+n) crossed a log_every boundary
        # (reduces to ep % log_every == 0 at n == 1), labelled with the
        # last epoch the metrics were evaluated after.
        if log is not None and (
                (ep + n - 1) // run.log_every > (ep - 1) // run.log_every
                or ep + n >= run.epochs):
            log(f"epoch {ep + n - 1:3d} | loss {history['loss'][-1]:.4f} | "
                f"train_acc {tr_acc*100:.1f}% | test_acc {te_acc*100:.1f}%")
    history["wall_seconds"] = time.perf_counter() - t0
    history["best_test_acc"] = best[0]
    return best[1], history


def train_ecg_population(
    init_fn: Callable,
    apply_fn: Callable,
    data,
    run: ECGRun,
    members,
    log=print,
):
    """Train P independent (noise_std, seed) configurations in ONE
    vmapped program — the TPU-native form of the sequential
    clean-vs-noisy study (``compare_noise``): each member run is
    latency-bound at <0.4% of either chip peak, so running them as a
    population axis recovers ~P x the hardware.

    Args:
      init_fn: ``key -> params`` (shared architecture across members).
      apply_fn: ``(params, x, key, noise_std) -> logits`` with
        ``noise_std`` a TRACED per-member scalar (see
        ``ops.ferro.ferro_basis(noise_std=...)``); members with std 0.0
        add an exact zero, so their curves match a clean run bit-for-bit.
      members: sequence of ``(noise_std, seed)`` pairs.

    Per-member key derivation, shuffle seeding, and epoch-block keying
    are identical to :func:`train_ecg_model` with the same
    ``run.epochs_per_call`` (>1 — the block path), so member curves are
    bit-comparable to sequential runs.  ``run.mesh_devices > 0`` shards
    the POPULATION axis over a 'data' mesh: members are independent, so
    each device trains P/n members with zero collectives — an n-device
    pod runs an n x-larger study at single-member wall clock (P must
    divide over the devices).  Not supported here: mesh_model
    tensor-sharding and durable checkpointing.  The pallas whole-solve
    kernel IS population-capable (round 5): build ``apply_fn`` on a
    ``solver_mode="pallas"`` spec and the traced per-member noise_std
    rides into the vmapped kernel via pre-scaled noise operands
    (ops/pallas_ferro_node.py: ``frozen_solve_noise``).

    Returns ``(best_params, histories)``: ``best_params`` is a stacked
    pytree with leading axis P holding each member's best-test-accuracy
    snapshot; ``histories`` is a list of P per-member dicts shaped like
    :func:`train_ecg_model`'s history, plus ``block_seconds`` (wall per
    epoch block — block 0 carries the one-time compile, which is HEAVY
    for the vmapped program on a remote-compile TPU: measured ~20 min at
    P=12 on the reference spec; ``run.aot_cache`` + ``run.aot_tag``
    round-trip the compiled executable so repeat studies skip it).
    """
    if run.ckpt_dir:
        raise ValueError("train_ecg_population does not support "
                         "checkpoint options — use train_ecg_model")
    if run.mesh_model > 1:
        raise ValueError("train_ecg_population shards the POPULATION axis "
                         "over 'data'; mesh_model tensor-sharding is not "
                         "supported here")
    x_train, y_train, x_test, y_test = data
    P = len(members)
    stds = jnp.asarray([m[0] for m in members], jnp.float32)
    seeds = [int(m[1]) for m in members]

    # Identical derivation to train_ecg_model: PRNGKey(seed) split 4 ways.
    split4 = jax.vmap(lambda k: jax.random.split(k, 4))(
        jnp.stack([jax.random.PRNGKey(s) for s in seeds]))
    init_keys, noise_bases, eval_bases = (split4[:, 1], split4[:, 2],
                                          split4[:, 3])
    params = jax.vmap(init_fn)(init_keys)
    tx = make_optimizer(run.lr, kind="adamw", weight_decay=run.weight_decay,
                        grad_clip=run.grad_clip, params=params)
    state = jax.vmap(lambda p: init_state(p, tx))(params)

    # mesh_devices > 0: shard the POPULATION axis over the 'data' mesh —
    # members are independent, so each device trains P/n members with
    # ZERO collectives (GSPMD propagates the input sharding through the
    # vmapped program).  An 8-device pod runs an 8x-larger study at the
    # single-member wall clock.
    shard_pop = lambda t: t                                  # noqa: E731
    if run.mesh_devices:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as PSpec

        from fetode_tpu.parallel import make_mesh

        if P % run.mesh_devices:
            raise ValueError(f"population size {P} must divide over "
                             f"mesh_devices={run.mesh_devices}")
        _mesh = make_mesh(run.mesh_devices)
        _sh = NamedSharding(_mesh, PSpec("data"))
        _rep = NamedSharding(_mesh, PSpec())

        # INVARIANT (do not break): every population-stacked leaf —
        # params/opt-state from the vmapped init above, per-member keys,
        # stds, epoch batches — has the member axis LEADING, and no
        # non-population leaf in these trees has a leading dim equal to
        # P (optimizer hyperparams are scalars; batch shapes are
        # (P, E, nb, B, ...)).  A future leaf whose first axis
        # coincidentally equals P without being the member axis would be
        # mis-sharded here; shard by tree position if that ever appears.
        def shard_pop(tree):                     # leading-P leaves shard
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(
                    a, _sh if getattr(a, "ndim", 0) >= 1
                    and a.shape[0] == P else _rep), tree)

        state = shard_pop(state)
        stds = shard_pop(stds)

    def loss_fn(p, k, std, xb, yb):
        return cross_entropy(apply_fn(p, xb, k, std), yb)

    block_fn = make_population_epochs_scanner(loss_fn, tx)
    if run.aot_cache:
        if not run.aot_tag:
            raise ValueError("ECGRun.aot_cache requires aot_tag (see "
                             "train_ecg_model)")
        from fetode_tpu.serve import AotCache, CachedJit

        block_fn = CachedJit(AotCache(run.aot_cache),
                             f"ecg-pop{P}-{run.aot_tag}", block_fn)

    D = max(1, run.eval_noise_draws)
    eval_keys = jax.vmap(lambda k: jax.random.split(k, D))(eval_bases)

    @jax.jit
    def eval_acc(ps, eks, std_v, x, y):
        def one(p, ek, std):
            logits = _chunked_logits(
                lambda xc, i: apply_fn(p, xc, ek[i], std), x, D,
                run.eval_chunk)
            return accuracy(logits, y)
        return jax.vmap(one, in_axes=(0, 0, 0))(ps, eks, std_v)

    x_train_j, y_train_j = jnp.asarray(x_train), jnp.asarray(y_train)
    x_test_j, y_test_j = jnp.asarray(x_test), jnp.asarray(y_test)

    curves = {"loss": [], "train_acc": [], "test_acc": []}
    best_acc = jnp.full((P,), -1.0, jnp.float32)
    best_params = state.params
    block_seconds = []

    t0 = time.perf_counter()
    E = max(1, run.epochs_per_call)
    for ep in range(0, run.epochs, E):
        tb0 = time.perf_counter()
        n = min(E, run.epochs - ep)
        shuffles = [[batch_iterator(x_train, y_train, run.batch_size,
                                    seed=seed + ep + i) for i in range(n)]
                    for seed in seeds]
        eb = (jnp.asarray(np.stack([[b[0] for b in row]
                                    for row in shuffles])),
              jnp.asarray(np.stack([[b[1] for b in row]
                                    for row in shuffles])))
        eb = shard_pop(eb)
        bkeys = shard_pop(
            jax.vmap(lambda k: jax.random.fold_in(k, ep))(noise_bases))
        state, losses = block_fn(state, bkeys, stds, eb)
        # TRUE completion sync: under the axon tunnel block_until_ready
        # returns early, which silently turned block_seconds into
        # dispatch-only timings (caught in the round-4 60-epoch study —
        # the resulting "steady-state" speedup was bogus).  device_get
        # forces the host transfer, which cannot complete early.
        jax.device_get(jnp.sum(losses))
        block_seconds.append(time.perf_counter() - tb0)
        tr = eval_acc(state.params, eval_keys, stds, x_train_j, y_train_j)
        te = eval_acc(state.params, eval_keys, stds, x_test_j, y_test_j)
        curves["loss"].append(losses.mean(axis=(1, 2)))
        curves["train_acc"].append(tr)
        curves["test_acc"].append(te)
        improved = te > best_acc
        best_acc = jnp.where(improved, te, best_acc)
        sel = lambda b, nw: jnp.where(  # noqa: E731
            improved.reshape((P,) + (1,) * (nw.ndim - 1)), nw, b)
        best_params = jax.tree_util.tree_map(sel, best_params, state.params)
        if log is not None and (
                (ep + n - 1) // run.log_every > (ep - 1) // run.log_every
                or ep + n >= run.epochs):
            te_np = np.asarray(te)
            log(f"epoch {ep + n - 1:3d} | population P={P} | test_acc "
                f"mean {te_np.mean()*100:.1f}% "
                f"[{te_np.min()*100:.1f}, {te_np.max()*100:.1f}]%")
    wall = time.perf_counter() - t0

    best_acc = np.asarray(best_acc)
    stacked = {k: np.asarray(jnp.stack(v, 1)) for k, v in curves.items()}
    histories = []
    for i in range(P):
        histories.append({
            "loss": stacked["loss"][i].tolist(),
            "train_acc": stacked["train_acc"][i].tolist(),
            "test_acc": stacked["test_acc"][i].tolist(),
            "best_test_acc": float(best_acc[i]),
            "wall_seconds": wall,   # shared: the population is one program
            "block_seconds": block_seconds,   # [0] carries the compile
        })
    return best_params, histories


def compare_noise_population(
    init_fn: Callable,
    apply_fn: Callable,
    data,
    noise_stds=(0.0, 0.2),
    run: ECGRun = ECGRun(),
    seeds=(0,),
    log=print,
):
    """Population form of :func:`compare_noise`: the full noise-levels x
    seeds grid as ONE vmapped dispatch (12 runs -> 1 program for the
    reference's 3-seed x 4-noise study, ``compare_noise_ecg.py:1250-1452``).

    Unlike :func:`compare_noise`, the model factory is a single
    ``apply_fn(params, x, key, noise_std)`` with the noise level traced.
    Returns ``{std: {seed: history}}`` (same shape as ``compare_noise``).
    """
    members = [(std, seed) for std in noise_stds for seed in seeds]
    _, hists = train_ecg_population(init_fn, apply_fn, data, run, members,
                                    log=log)
    results = {}
    for (std, seed), hist in zip(members, hists):
        results.setdefault(std, {})[seed] = hist
    if log is not None:
        for std, per_seed in results.items():
            accs = np.asarray([h["best_test_acc"] for h in per_seed.values()])
            log(f"noise_std {std}: best test acc "
                f"{accs.mean()*100:.1f}% +/- {accs.std()*100:.1f}% "
                f"(seeds {list(per_seed)})")
    return results


def compare_noise(
    make_model: Callable,   # (noise_std) -> (init_fn, apply_fn)
    data,
    noise_stds=(0.0, 0.2),
    run: ECGRun = ECGRun(),
    seeds=(0,),
    log=print,
):
    """Train the same architecture at several device-noise levels x seeds
    and report the accuracy trade-off (the compare_noise_ecg.py capability
    — the analog-device fault-injection study, SURVEY.md §5.3).

    Returns ``{std: {seed: history}}``; the logged summary gives
    mean +/- spread of best test accuracy per noise level.
    """
    results = {}
    for std in noise_stds:
        per_seed = {}
        for seed in seeds:
            if log is not None:
                log(f"--- noise_std = {std}, seed = {seed} ---")
            init_fn, apply_fn = make_model(std)
            run_s = dataclasses.replace(run, seed=seed)
            _, hist = train_ecg_model(init_fn, apply_fn, data, run_s, log)
            per_seed[seed] = hist
        results[std] = per_seed
    if log is not None:
        for std, per_seed in results.items():
            accs = np.asarray([h["best_test_acc"] for h in per_seed.values()])
            log(f"noise_std {std}: best test acc "
                f"{accs.mean()*100:.1f}% +/- {accs.std()*100:.1f}% "
                f"(seeds {list(per_seed)})")
    return results
