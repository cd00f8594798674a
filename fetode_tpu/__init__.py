"""fetode_tpu — a TPU-native neural-ODE framework for KAN-FET models.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
FET-ODE reference codebase (Kolmogorov-Arnold networks with
ferroelectric-hysteresis bases, integrated through neural-ODE solvers,
applied to system identification, time-series classification and
forecasting workloads).

Design pillars (TPU-first, not a port):

* all hot loops are `lax.scan` / `lax.while_loop` bodies compiled once by XLA;
* hysteresis state is an explicit pytree carried through calls (making every
  model `vmap`-able and mesh-shardable, where the reference serialised over
  the batch because its state lived in module buffers);
* parameters are plain pytrees; training steps are pure jitted functions;
* batch/data parallelism is `jax.sharding` over a named device mesh.

Subpackages
-----------
- ``ops``      basis-function and numeric primitives (B-splines, logistic,
               ferroelectric hysteresis, least-squares fits, interpolation)
- ``solvers``  ODE integrators (fixed-step scan RK, adaptive dopri5)
- ``nn``       neural building blocks (KANLinear, KAN, KANFET, cells, ...)
- ``models``   workload models (predator-prey NODE, ECG, forecasters, ...)
- ``data``     dataset loaders and windowing
- ``train``    jitted training-step builders and configs
- ``parallel`` device-mesh construction and sharding rules
- ``diag``     diagnostics: hysteresis sweeps, metrics logging, profiling
"""

__version__ = "0.5.0"

from fetode_tpu import ops, solvers  # noqa: F401
