"""Export a compile-free serving bundle, then load and serve from it.

`fetode_tpu/serve.py` packages any `fn(params, batch)` apply as AOT
executables per batch bucket + numpy params + a portable StableHLO
fallback.  Loading is compile-free (~0.1-3 s measured on v5e vs multi-
minute cold Mosaic compiles — BASELINE.md "Serving"); `predict` handles
arbitrary batch sizes by bucket padding + chunking.  The CLI equivalent
is `fetode serve --source ecg`.

Run:  python examples/03_serving_bundle.py [bundle_dir]
"""

import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from fetode_tpu.models import ecg as M
from fetode_tpu.serve import export_servable, load_servable, serve_bench

out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
    prefix="fetode_bundle_")

# Any pure apply works; here the ECG KanFet-NODE classifier (spec closed
# over, params explicit) at a small latent size.
spec = M.KanFetNODESpec(T=96, latent_dim=16, num_basis=4, max_steps=16)
params = M.kanfet_node_init(jax.random.PRNGKey(0), spec)
fn = lambda p, x: M.kanfet_node_apply(p, spec, x)           # noqa: E731
example = jnp.zeros((1, spec.T), jnp.float32)

# Buckets must divide over the data axis (all local devices): scale them
# to the device count so the example also runs on a virtual-8 CPU mesh.
n = jax.device_count()
meta = export_servable(out_dir, fn, params, example,
                       buckets=(n, 8 * n, 32 * n))
print(f"exported -> {out_dir} (buckets {meta['buckets']})")

servable = load_servable(out_dir)            # compile-free on same world
x = np.random.default_rng(0).normal(size=(20, spec.T)).astype(np.float32)
logits = servable.predict(x)                 # B=20 -> bucket 32, sliced
print("predict(20 x 96) ->", logits.shape)
assert logits.shape == (20, spec.num_classes)

# bit-parity with the exporting process's jit
ref = jax.jit(fn)(params, jnp.asarray(x))
np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                           rtol=1e-5, atol=1e-6)
print("parity with in-process jit: OK")

stats = serve_bench(servable, x[:8], iters=5, warmup=2)
print(f"p50 latency at B=8: {stats['p50_ms']:.2f} ms")
