"""Kuramoto-KAN MNIST front-end + symbolic-regression demo tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fetode_tpu.data.mnist import synthetic_digits
from fetode_tpu.models.kuramoto import (
    KuramotoSpec,
    kuramoto_features,
    kuramoto_init,
    kuramoto_kan_apply,
)
from fetode_tpu.models.symbolic import (
    SymbolicNetSpec,
    symbolic_net_apply,
    symbolic_net_init,
    target_fn,
    train_symbolic,
)


def test_kuramoto_features_shape_and_range(key):
    spec = KuramotoSpec(H=8, W=8, steps=4, num_classes=4, num_basis=3)
    p = kuramoto_init(key, spec, jnp.float64)
    x = jax.random.uniform(key, (5, 8, 8), jnp.float64)
    feat = kuramoto_features(p, spec, x)
    assert feat.shape == (5, 2 * 64)
    # cos/sin features live in [-1, 1]
    assert float(jnp.abs(feat).max()) <= 1.0 + 1e-6


def test_kuramoto_synchronization_drift(key):
    """With positive coupling, phase dispersion must not increase for a
    uniform-ish image (oscillators pull together)."""
    spec = KuramotoSpec(H=8, W=8, steps=8)
    p = kuramoto_init(key, spec, jnp.float64)
    x = 0.5 + 0.05 * jax.random.normal(key, (1, 8, 8), jnp.float64)

    feat0 = kuramoto_features(p, spec._replace(steps=0), x)
    featT = kuramoto_features(p, spec, x)

    def dispersion(f):
        c, s = f[:, :64], f[:, 64:]
        # order parameter R = |mean e^{i theta}|; higher = more synchronized
        return float(jnp.sqrt(c.mean() ** 2 + s.mean() ** 2))

    assert dispersion(featT) >= dispersion(feat0) - 1e-6


def test_kuramoto_classifier_learns(key):
    spec = KuramotoSpec(H=12, W=12, steps=3, num_classes=4, num_basis=3)
    params = kuramoto_init(key, spec)
    x, y = synthetic_digits(n=64, H=12, W=12, n_classes=4)

    import optax

    from fetode_tpu.train.loop import init_state, make_epoch_scanner
    from fetode_tpu.train.optim import make_optimizer

    tx = make_optimizer(3e-3, kind="adamw", weight_decay=1e-4, params=params)
    state = init_state(params, tx)

    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def loss_fn(p, x_, y_):
        logits = kuramoto_kan_apply(p, spec, x_)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y_).mean()

    scanner = make_epoch_scanner(loss_fn, tx, 30)
    state, losses = scanner(state, xj, yj)
    acc = float((jnp.argmax(kuramoto_kan_apply(state.params, spec, xj), -1)
                 == yj).mean())
    assert float(losses[-1]) < float(losses[0])
    assert acc > 0.5, acc


def test_symbolic_regression_fits(key):
    spec = SymbolicNetSpec(hidden=6, num_basis=4)
    params, losses = train_symbolic(spec, epochs=400, lr=1e-2, n_points=64)
    assert losses[-1] < losses[0] * 0.3, (losses[0], losses[-1])

    x = jnp.linspace(-2.5, 2.5, 32)[:, None]
    pred, _ = symbolic_net_apply(params, spec, x)
    mse = float(jnp.mean((pred - target_fn(x)) ** 2))
    assert mse < 0.5, mse
