"""AOT executable cache + model serving (production inference path).

Two measured pain points on the axon TPU drive this module:

1. Remote Mosaic compilation is slow (258-463 s for the flagship adjoint
   grad program, docs/ROADMAP.md "Known environment constraints") and the
   axon remote-compile path bypasses jax's persistent *compilation* cache,
   so every fresh process repays the full compile.  Round-tripping the
   **compiled executable** itself through
   ``jax.experimental.serialize_executable`` sidesteps the compiler
   entirely: measured reload of the whole-solve Pallas NODE program is
   **0.18 s** with bit-identical outputs (vs. the per-process compile).
2. Serving: the reference has no deployment story at all (its scripts end
   at matplotlib figures — e.g. ``/root/reference/train_ecg.py:1418``).
   A production forecaster must answer without paying any compile and at
   a latency the caller can budget for; that means ahead-of-time
   compilation, static shapes, and bucketed batching.

Components
----------
- :func:`fingerprint` — identity of the (jax, backend, device) world an
  executable is valid in.  Serialized executables are machine code for a
  specific topology; a mismatch is a cache MISS, never an error.
- :class:`AotCache` — disk cache of compiled executables keyed by
  (name, argument signature).  ``get_or_compile`` is the whole API.
- :func:`export_servable` / :func:`load_servable` — a self-contained
  bundle directory: params + one serialized executable per batch bucket
  + a portable StableHLO fallback (``jax.export``) + ``meta.json``.
- :class:`Servable` — bucket-padded batched inference over the bundle.
  Executables are compiled over a mesh of ALL local devices with the
  batch axis sharded over ``'data'`` — serving is data-parallel by
  construction and multi-chip-ready (single chip degrades to mesh(1)).
- :func:`serve_bench` — latency (p50/p99) + throughput measurement.

Shape discipline (TPU/XLA): an executable exists per static batch size.
``Servable.predict`` pads a request up to the smallest exported bucket
and splits requests larger than the biggest bucket into max-bucket
chunks — no recompiles at serve time, ever.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fetode_tpu.parallel import batch_sharding, make_mesh, replicated

__all__ = [
    "AotCache",
    "Servable",
    "export_servable",
    "fingerprint",
    "load_servable",
    "serve_bench",
    "tree_signature",
]


# ------------------------------------------------------------ identity


def fingerprint() -> Dict[str, Any]:
    """The world a serialized executable is valid in.

    Serialized executables are device code + a fixed device assignment;
    they only load back into the same jax/jaxlib version, backend, device
    kind, and local device count.
    """
    devs = jax.devices()
    return {
        "jax": jax.__version__,
        "platform": devs[0].platform,
        "device_kind": devs[0].device_kind,
        "n_devices": len(devs),
    }


def _exec_device_ids(compiled) -> list:
    """Device ids a compiled executable is assigned to.

    Serialized executables must be reloaded onto the same device
    assignment (``deserialize_and_load(execution_devices=...)``); the
    default — all local devices — breaks programs compiled for a subset
    (e.g. a single-device jit in an 8-device process)."""
    shardings, _ = compiled.input_shardings
    leaves = jax.tree_util.tree_leaves(shardings)
    ids = sorted({d.id for s in leaves for d in s.device_set})
    return ids or [d.id for d in jax.devices()]


def _compile_fresh(jitted, *args):
    """Compile for serialization: persistent-compilation-cache DISABLED.

    An executable that came out of jax's persistent compilation cache as
    an XLA:CPU AOT hit serializes to a payload whose reload is missing
    runtime symbols ("Buffer Definition Event: Function wrapped_convert
    not found" on the first result fetch).  Serialization needs a real
    compile there, so the cache is switched off around it — on CPU only:
    TPU executables are hermetic device binaries and round-trip fine from
    a cache hit (measured: the reloaded bundle serves bit-identically),
    and disabling the cache would put the full multi-minute compile back
    into every repeat export.
    """
    if jax.devices()[0].platform != "cpu":
        return jitted.lower(*args).compile()
    enabled = jax.config.jax_enable_compilation_cache
    try:
        jax.config.update("jax_enable_compilation_cache", False)
        return jitted.lower(*args).compile()
    finally:
        jax.config.update("jax_enable_compilation_cache", enabled)


def _deserialize(bundle):
    from jax.experimental.serialize_executable import deserialize_and_load

    by_id = {d.id: d for d in jax.devices()}
    dev_ids = bundle.get("device_ids") or sorted(by_id)
    return deserialize_and_load(
        bundle["payload"], bundle["in_tree"], bundle["out_tree"],
        execution_devices=[by_id[i] for i in dev_ids])


def tree_signature(tree: Any) -> str:
    """Stable hash of a pytree's structure + leaf shapes/dtypes.

    Two argument trees with the same signature lower to the same program
    shape; values never enter the hash (an AOT cache is a *program*
    cache, not a result cache).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parts = [str(treedef)]
    for leaf in leaves:
        x = jnp.asarray(leaf) if not hasattr(leaf, "shape") else leaf
        parts.append(f"{getattr(x, 'shape', ())}:{getattr(x, 'dtype', type(leaf).__name__)}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


# ------------------------------------------------------------ AOT cache


class AotCache:
    """Disk cache of compiled executables.

    >>> cache = AotCache("~/.cache/fetode_aot")
    >>> compiled, hit = cache.get_or_compile("train_step", jitted, *args)

    MISS path: ``jitted.lower(*args).compile()`` then serialize to disk.
    HIT path: deserialize (measured 0.18 s for the Pallas NODE program vs
    its multi-minute remote compile).  Any load failure — fingerprint
    mismatch, jax upgrade, corrupt file — silently degrades to a MISS.
    """

    def __init__(self, directory: str):
        self.directory = os.path.abspath(os.path.expanduser(directory))
        os.makedirs(self.directory, exist_ok=True)

    def _path(self, name: str, sig: str) -> str:
        safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in name)
        return os.path.join(self.directory, f"{safe}-{sig}.aot")

    def load(self, name: str, sig: str):
        """Return the cached compiled executable, or None."""
        path = self._path(name, sig)
        if not os.path.exists(path):
            return None
        try:
            with open(path, "rb") as f:
                bundle = pickle.load(f)
            if bundle["fingerprint"] != fingerprint():
                return None
            return _deserialize(bundle)
        except Exception:
            return None

    def store(self, name: str, sig: str, compiled) -> str:
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(compiled)
        bundle = {
            "fingerprint": fingerprint(),
            "payload": payload,
            "in_tree": in_tree,
            "out_tree": out_tree,
            "device_ids": _exec_device_ids(compiled),
        }
        path = self._path(name, sig)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(bundle, f)
        os.replace(tmp, path)  # atomic: concurrent readers never see a torn file
        return path

    def get_or_compile(self, name: str, jitted, *args) -> Tuple[Any, bool]:
        """(compiled, cache_hit).  ``jitted`` must be a ``jax.jit`` object."""
        sig = tree_signature(args)
        compiled = self.load(name, sig)
        if compiled is not None:
            # Trust nothing: a deserialized executable can fail only at
            # result materialization (XLA:CPU resolves runtime thunks BY
            # NAME in a process-global registry — "Function
            # transpose_copy_fusion.24 not found" — which is reliable in
            # a fresh process but flaky when reloading into a process
            # that has compiled other programs).  Execute-and-fetch once;
            # on failure fall through to a fresh compile.
            try:
                jax.device_get(compiled(*args))
                return compiled, True
            except Exception:
                pass
        compiled = _compile_fresh(jitted, *args)
        self.store(name, sig, compiled)
        return compiled, False


def config_hash(*parts) -> str:
    """Short stable hash of program-identity parts (specs, hypers).

    Use to build :class:`CachedJit` names: ``repr`` of NamedTuple specs
    and scalar hypers is deterministic within a process and across runs.
    """
    return hashlib.sha256("|".join(repr(p) for p in parts).encode()
                          ).hexdigest()[:12]


class CachedJit:
    """AOT-cached wrapper around ONE jitted callable with fixed arg shapes.

    First call resolves through :meth:`AotCache.get_or_compile` (disk hit
    = no compile at all — the lever that turns the multi-minute
    per-process Mosaic remote compile of a training step into a sub-second
    load); later calls go straight to the compiled executable, so new
    argument *values* are fine but new shapes/dtypes are not.

    ``name`` MUST encode every piece of program identity that is not
    visible in the argument shapes/dtypes (model spec, hyper-parameters
    closed over by the jitted function): the cache key is
    ``(name, tree_signature(args))`` and a stale name would load a
    silently wrong program.  Drivers hash the relevant config into it —
    see ``train/predprey_driver.py: make_scanner``.
    """

    def __init__(self, cache: AotCache, name: str, jitted):
        self.cache = cache
        self.name = name
        self.jitted = jitted
        self.compiled = None
        self.cache_hit: Optional[bool] = None

    def __call__(self, *args):
        if self.compiled is None:
            self.compiled, self.cache_hit = self.cache.get_or_compile(
                self.name, self.jitted, *args)
        return self.compiled(*args)


# ------------------------------------------------------------ servables


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def export_servable(
    path: str,
    fn: Callable,
    params: Any,
    example_batch: jax.Array,
    *,
    buckets: Sequence[int] = (1, 8, 64),
    mesh=None,
    extra_meta: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Export ``fn(params, batch)`` as a self-contained serving bundle.

    ``fn`` must be a pure function of (params, batch) with every other
    configuration (spec, solver budgets, horizons) closed over — the
    standard shape of every model apply in this package.

    Writes under ``path``:
      - ``params.pkl``      — numpy-ified params pytree
      - ``exec_b{B}.aot``   — serialized compiled executable per bucket
      - ``portable.jexport``— ``jax.export`` StableHLO of the max bucket
                              (survives jax upgrades / other topologies at
                              the cost of a compile on load)
      - ``meta.json``       — fingerprint, buckets, per-sample shape/dtype

    The executables are compiled over a mesh of all local devices, params
    replicated, batch sharded over ``'data'`` (single chip = mesh(1));
    bucket sizes must divide by the data-axis size.
    """
    from jax.experimental.serialize_executable import serialize

    os.makedirs(path, exist_ok=True)
    mesh = mesh if mesh is not None else make_mesh()
    n_data = mesh.shape["data"]
    rep = replicated(mesh)
    data_sh = batch_sharding(mesh)

    buckets = sorted(set(int(b) for b in buckets))
    bad = [b for b in buckets if b % n_data]
    if bad:
        raise ValueError(f"buckets {bad} not divisible by the data axis "
                         f"({n_data} devices)")

    sample = np.asarray(example_batch)[:1]
    params_dev = jax.device_put(params, rep)
    param_sh = jax.tree_util.tree_map(lambda _: rep, params)

    jitted = jax.jit(fn, in_shardings=(param_sh, data_sh), out_shardings=data_sh)

    meta: Dict[str, Any] = {
        "fingerprint": fingerprint(),
        "buckets": buckets,
        "sample_shape": list(sample.shape[1:]),
        "sample_dtype": str(sample.dtype),
        "mesh": {name: int(size) for name, size in mesh.shape.items()},
    }
    if extra_meta:
        meta.update(extra_meta)

    for b in buckets:
        xb = jnp.broadcast_to(jnp.asarray(sample), (b,) + sample.shape[1:])
        xb = jax.device_put(xb, data_sh)
        compiled = _compile_fresh(jitted, params_dev, xb)
        payload, in_tree, out_tree = serialize(compiled)
        bundle = {"payload": payload, "in_tree": in_tree,
                  "out_tree": out_tree,
                  "device_ids": _exec_device_ids(compiled)}
        with open(os.path.join(path, f"exec_b{b}.aot"), "wb") as f:
            pickle.dump(bundle, f)
        if b == buckets[-1]:
            import jax.export as jex

            exported = jex.export(jax.jit(fn))(
                jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
                jax.ShapeDtypeStruct(xb.shape, xb.dtype))
            with open(os.path.join(path, "portable.jexport"), "wb") as f:
                f.write(exported.serialize())

    with open(os.path.join(path, "params.pkl"), "wb") as f:
        pickle.dump(_to_numpy_tree(params), f)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


class Servable:
    """Loaded serving bundle: bucket-padded, chunked, data-parallel.

    ``predict(x)`` for any leading batch size B:
      - B <= max bucket: pad to the smallest bucket >= B, one call, slice.
      - B >  max bucket: split into max-bucket chunks (last chunk padded).
    No compiles happen at serve time (``load_servable`` fails fast if the
    bundle does not match this process's device world instead of silently
    recompiling — pass ``allow_portable=True`` to opt into the StableHLO
    fallback, which compiles once on load).
    """

    def __init__(self, path: str, meta: Dict[str, Any],
                 executables: Dict[int, Any], params: Any, mesh):
        self.path = path
        self.meta = meta
        self.executables = executables
        self.buckets = sorted(executables)
        self.mesh = mesh
        rep = replicated(mesh)
        self.params = jax.device_put(params, rep)
        self._data_sh = batch_sharding(mesh)

    def _call_bucket(self, b: int, x: jax.Array):
        xb = jax.device_put(x, self._data_sh)
        return self.executables[b](self.params, xb)

    def predict(self, x) -> jax.Array:
        x = jnp.asarray(x, dtype=self.meta["sample_dtype"])
        B = x.shape[0]
        max_b = self.buckets[-1]
        outs = []
        off = 0
        while off < B:
            take = min(max_b, B - off)
            chunk = x[off:off + take]
            bucket = next(b for b in self.buckets if b >= take)
            if take < bucket:  # pad with the last row (any valid row works)
                pad = jnp.broadcast_to(chunk[-1:], (bucket - take,) + chunk.shape[1:])
                chunk = jnp.concatenate([chunk, pad], axis=0)
            out = self._call_bucket(bucket, chunk)
            outs.append(out[:take])
            off += take
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def load_servable(path: str, *, allow_portable: bool = False) -> Servable:
    """Load a bundle written by :func:`export_servable`.

    Executable load is compile-free and requires the same fingerprint
    (jax version, backend, device kind and count) the bundle was exported
    under.  On mismatch: raises, unless ``allow_portable=True``, in which
    case the portable StableHLO module is compiled for the max bucket
    (one compile, then serving proceeds normally with a single bucket).
    """
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "params.pkl"), "rb") as f:
        params = pickle.load(f)

    mesh_shape = meta.get("mesh", {})
    mesh = make_mesh(model=int(mesh_shape.get("model", 1)))

    if meta["fingerprint"] == fingerprint():
        executables = {}
        rep = replicated(mesh)
        params_dev = jax.device_put(params, rep)
        data_sh = batch_sharding(mesh)
        for b in meta["buckets"]:
            with open(os.path.join(path, f"exec_b{b}.aot"), "rb") as f:
                bundle = pickle.load(f)
            try:
                ex = _deserialize(bundle)
                # Smoke-run before trusting: XLA:CPU resolves runtime
                # thunks by name in a process-global registry, which is
                # reliable in a fresh serving process but can miss when
                # reloading into a process that compiled other programs.
                zeros = jax.device_put(
                    jnp.zeros((b,) + tuple(meta["sample_shape"]),
                              meta["sample_dtype"]), data_sh)
                jax.device_get(ex(params_dev, zeros))
                executables[b] = ex
            except Exception:
                continue
        if executables:
            return Servable(path, meta, executables, params, mesh)
        # every executable failed its smoke run: fall through to the
        # portable StableHLO module (one compile on load) so the bundle
        # still serves
        allow_portable = True

    if not allow_portable:
        raise RuntimeError(
            f"bundle {path} was exported under {meta['fingerprint']}, this "
            f"process is {fingerprint()}; pass allow_portable=True to "
            f"recompile from the StableHLO fallback")

    import jax.export as jex

    with open(os.path.join(path, "portable.jexport"), "rb") as f:
        exported = jex.deserialize(f.read())
    b = meta["buckets"][-1]

    def call(p, x):
        return exported.call(p, x)

    compiled = jax.jit(call)  # traced/compiled on first use
    return Servable(path, meta, {b: compiled}, params, mesh)


# ------------------------------------------------------------ benching


def serve_bench(servable: Servable, batch, *, iters: int = 50,
                warmup: int = 5) -> Dict[str, float]:
    """Latency/throughput of ``servable.predict`` on a fixed batch.

    Returns p50/p99 latency (ms) over ``iters`` timed calls and the
    implied samples/s at p50.
    """
    import time

    x = jnp.asarray(batch)
    # device_get, not block_until_ready: the latter returns early under
    # the axon TPU tunnel (same discipline as bench.py), and a serving
    # latency number must include result delivery to the host anyway.
    for _ in range(warmup):
        jax.device_get(servable.predict(x))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.device_get(servable.predict(x))
        times.append(time.perf_counter() - t0)
    times_ms = np.sort(np.asarray(times)) * 1e3
    p50 = float(np.percentile(times_ms, 50))
    p99 = float(np.percentile(times_ms, 99))
    return {
        "batch": int(x.shape[0]),
        "iters": iters,
        "p50_ms": p50,
        "p99_ms": p99,
        "throughput_sps": float(x.shape[0] / (p50 / 1e3)),
    }
