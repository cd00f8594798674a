"""Library-level predator-prey training loop (~40 lines of user code).

The CLI (`fetode predprey`) wraps exactly this: generate the
Lotka-Volterra ground truth, build the KANFET NODE flagship spec, and
take jitted Adam steps through the differentiable dopri5 solve.
Reference workload: train_kanfet_node_predprey.py (torchdiffeq + 10k
epochs); here the whole epoch is one compiled program.

Run:  python examples/01_predprey_train_loop.py [epochs]
"""

import sys

import jax
import jax.numpy as jnp
import optax

from fetode_tpu.models.predprey import (PredPreyNODE, PredPreyTask,
                                        generate_data, predprey_init,
                                        trajectory_loss)

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 200

task = PredPreyTask()                       # alpha=1.5 beta=1 gamma=3 delta=1
spec = PredPreyNODE.kanfet(max_steps=128)   # KANFET [2,10,2], dopri5 1e-7
ts, ts_learn, truth = generate_data(task)   # scipy ground truth, frozen
target = truth[: task.n_train]              # fit window t in [0, 3.5]
x0 = jnp.asarray([task.x0, task.y0], jnp.float32)

params = predprey_init(jax.random.PRNGKey(0), spec)
tx = optax.adam(2e-3)
opt_state = tx.init(params)


@jax.jit
def step(params, opt_state):
    loss, grads = jax.value_and_grad(trajectory_loss)(
        params, spec, x0, ts_learn, target)
    updates, opt_state = tx.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, loss


for epoch in range(EPOCHS):
    params, opt_state, loss = step(params, opt_state)
    if epoch % 50 == 0 or epoch == EPOCHS - 1:
        print(f"epoch {epoch:5d}  train MSE {float(loss):.6f}")

assert jnp.isfinite(loss)
print("done:", float(loss))
