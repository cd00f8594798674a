"""Tests for RNN cells, ferro layers (2D/conv), MLP heads, stateful solvers,
and the predprey model variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.nn import (
    DigitalRNNConfig,
    FerroConv2DConfig,
    FerroKANRNNConfig,
    KANRNNEncoderConfig,
    LogisticKANRNNConfig,
    MLPConfig,
    ResidualHeadConfig,
    digital_rnn_apply,
    digital_rnn_init,
    ferro_conv2d_apply,
    ferro_conv2d_init,
    ferro_conv2d_state,
    ferro_feature_basis,
    ferro_feature_init,
    ferro_feature_state,
    ferro_kan_rnn_apply,
    ferro_kan_rnn_init,
    kan_rnn_encoder_apply,
    kan_rnn_encoder_init,
    logistic_kan_rnn_apply,
    logistic_kan_rnn_init,
    mlp_apply,
    mlp_init,
    residual_head_apply,
    residual_head_init,
)
from fetode_tpu.solvers import integrate_final_stateful, odeint_fixed_stateful


# ------------------------------------------------------------------- RNNs


def test_logistic_kan_rnn_forward(key):
    cfg = LogisticKANRNNConfig(input_size=3, hidden_size=16, out_dim=2,
                               num_basis=4)
    p = logistic_kan_rnn_init(key, cfg, jnp.float64)
    x = jax.random.normal(key, (5, 7, 3), jnp.float64)
    y = logistic_kan_rnn_apply(p, cfg, x)
    assert y.shape == (5, 2)
    assert np.all(np.isfinite(np.asarray(y)))


def test_ferro_kan_rnn_classifier(key):
    cfg = FerroKANRNNConfig(input_size=1, hidden_size=8, num_classes=2,
                            num_basis=3)
    p = ferro_kan_rnn_init(key, cfg, jnp.float64)
    x = jax.random.normal(key, (4, 12), jnp.float64)
    logits = ferro_kan_rnn_apply(p, cfg, x)
    assert logits.shape == (4, 2)

    def loss(p):
        return jnp.sum(ferro_kan_rnn_apply(p, cfg, x) ** 2)

    g = jax.grad(loss)(p)
    assert float(jnp.abs(g["cell"]["input_basis"]["coef"]).sum()) > 0
    assert float(jnp.abs(g["head_weight"]).sum()) > 0


def test_ferro_rnn_hysteresis_carries_memory(key):
    """Same final input, different history -> different hidden state
    (memory flows through the hysteresis state)."""
    cfg = FerroKANRNNConfig(input_size=1, hidden_size=4, num_basis=3)
    p = ferro_kan_rnn_init(key, cfg, jnp.float64)
    up = jnp.linspace(-2, 2, 8, dtype=jnp.float64)[None, :]
    down = -up
    hist_a = jnp.concatenate([up, up[:, -1:]], axis=1)
    hist_b = jnp.concatenate([down, up[:, -1:]], axis=1)
    la = ferro_kan_rnn_apply(p, cfg, hist_a)
    lb = ferro_kan_rnn_apply(p, cfg, hist_b)
    assert not np.allclose(np.asarray(la), np.asarray(lb))


def test_kan_rnn_encoder(key):
    cfg = KANRNNEncoderConfig(num_features=7, hidden_size=16, latent_dim=5,
                              num_basis=4)
    p = kan_rnn_encoder_init(key, cfg, jnp.float64)
    z0 = kan_rnn_encoder_apply(p, cfg, jax.random.normal(key, (3, 9, 7),
                                                         jnp.float64))
    assert z0.shape == (3, 5)


def test_digital_rnn_bidirectional(key):
    cfg = DigitalRNNConfig(hidden_size=8, num_classes=2)
    p = digital_rnn_init(key, cfg, jnp.float64)
    y = digital_rnn_apply(p, cfg, jax.random.normal(key, (4, 10), jnp.float64))
    assert y.shape == (4, 2)


# --------------------------------------------------------------- ferro 2D


def test_ferro_feature_basis_shape_and_loop(key):
    p = ferro_feature_init(key, in_dim=2, num_basis=3, dtype=jnp.float64)
    s = ferro_feature_state((4,), 2, 3, jnp.float64)
    x = jax.random.normal(key, (4, 2), jnp.float64)
    w, s1 = ferro_feature_basis(p, s, x)
    assert w.shape == (4, 2, 3)
    np.testing.assert_allclose(np.asarray(s1.prev_x), np.asarray(x))


# ------------------------------------------------------------------- conv


@pytest.mark.parametrize("out_chunk", [0, 2])
def test_ferro_conv2d_shapes(key, out_chunk):
    cfg = FerroConv2DConfig(in_channels=2, out_channels=5, kernel_size=(3, 3),
                            num_basis=2, padding=1, out_chunk=out_chunk)
    p = ferro_conv2d_init(key, cfg, jnp.float64)
    x = jax.random.normal(key, (2, 2, 8, 8), jnp.float64)
    y, st = ferro_conv2d_apply(p, cfg, x)
    assert y.shape == (2, 5, 8, 8)
    assert st is None


def test_ferro_conv2d_chunked_matches_unchunked(key):
    cfg0 = FerroConv2DConfig(2, 6, (3, 3), num_basis=2, padding=1)
    cfg2 = cfg0._replace(out_chunk=4)
    p = ferro_conv2d_init(key, cfg0, jnp.float64)
    x = jax.random.normal(key, (1, 2, 6, 6), jnp.float64)
    y0, _ = ferro_conv2d_apply(p, cfg0, x)
    y2, _ = ferro_conv2d_apply(p, cfg2, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y2), atol=1e-10)


def test_ferro_conv2d_stateful_roundtrip(key):
    cfg = FerroConv2DConfig(1, 2, (2, 2), num_basis=2, stateful=True)
    p = ferro_conv2d_init(key, cfg, jnp.float64)
    x = jax.random.normal(key, (1, 1, 4, 4), jnp.float64)
    y1, st = ferro_conv2d_apply(p, cfg, x)
    assert st is not None
    y2, st2 = ferro_conv2d_apply(p, cfg, x, st)
    assert y2.shape == y1.shape
    # with history, the response differs from the fresh-state one
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


# ------------------------------------------------------------ MLP blocks


def test_residual_head_is_residual(key):
    cfg = ResidualHeadConfig(dim=2, bottleneck=8)
    p = residual_head_init(key, cfg, jnp.float64)
    y = jax.random.normal(key, (5, 2), jnp.float64)
    out = residual_head_apply(p, cfg, y)
    assert out.shape == (5, 2)
    # kaiming init keeps the head perturbative, not an identity killer
    assert float(jnp.abs(out - y).mean()) < float(jnp.abs(y).mean()) * 5


def test_mlp_out_scale(key):
    cfg = MLPConfig((3, 8, 2), activation="tanh", out_scale=0.0)
    p = mlp_init(key, cfg, jnp.float64)
    y = mlp_apply(p, cfg, jax.random.normal(key, (4, 3), jnp.float64))
    np.testing.assert_allclose(np.asarray(y), 0.0)


# ----------------------------------------------------- stateful solvers


def test_stateful_solver_threads_state():
    """State counts the number of solver intervals (advances once each)."""
    def f(t, y, s):
        return -y, s + 1

    ts = jnp.linspace(0.0, 1.0, 9, jnp.float64)
    y0 = jnp.asarray([1.0], jnp.float64)
    traj, s = odeint_fixed_stateful(f, y0, jnp.asarray(0), ts, method="rk4")
    assert int(s) == 8
    np.testing.assert_allclose(float(traj[-1, 0]), np.exp(-1.0), atol=1e-6)

    yT, s2 = integrate_final_stateful(f, y0, jnp.asarray(0), 0.0, 1.0,
                                      method="rk4", n_steps=8)
    assert int(s2) == 8
    np.testing.assert_allclose(np.asarray(yT), np.asarray(traj[-1]), atol=1e-12)


def test_stateful_solver_frozen_state():
    def f(t, y, s):
        return -y * s, s * 2.0

    ts = jnp.linspace(0.0, 1.0, 5, jnp.float64)
    traj, s = odeint_fixed_stateful(f, jnp.asarray([1.0], jnp.float64),
                                    jnp.asarray(1.0, jnp.float64), ts,
                                    method="rk4", advance_state=False)
    assert float(s) == 1.0
    np.testing.assert_allclose(float(traj[-1, 0]), np.exp(-1.0), atol=1e-4)


# -------------------------------------------------- predprey variants


def test_predprey_head_variants(key):
    from fetode_tpu.models.predprey import (
        PredPreyNODEWithHead,
        predict_with_head,
        predprey_head_init,
    )

    ts = jnp.linspace(0.0, 1.0, 7, jnp.float64)
    x0 = jnp.asarray([1.0, 1.0], jnp.float64)
    for inside in (False, True):
        spec = PredPreyNODEWithHead.make(head_inside=inside, method="rk4")
        p = predprey_head_init(key, spec, jnp.float64)
        traj = predict_with_head(p, spec, x0, ts)
        assert traj.shape == (7, 2)
        assert np.all(np.isfinite(np.asarray(traj)))


def test_predprey_rnn_rollout(key):
    from fetode_tpu.models.predprey import (
        PredPreyRNN,
        predprey_rnn_init,
        predprey_rnn_rollout,
    )

    spec = PredPreyRNN(seq_len=4, hidden_size=8, num_basis=3)
    p = predprey_rnn_init(key, spec, jnp.float64)
    t_grid = jnp.linspace(0.0, 1.0, 6, jnp.float64)
    traj = predprey_rnn_rollout(p, spec, jnp.asarray([1.0, 1.0], jnp.float64),
                                t_grid)
    assert traj.shape == (6, 2)
    np.testing.assert_allclose(np.asarray(traj[0]), [1.0, 1.0])


def test_hysteretic_logistic_persistence_and_loop(key):
    """Branch memory: stationary drive keeps the previous branch; an
    up-then-down sweep traces an open loop."""
    import jax.numpy as jnp

    from fetode_tpu.ops.logistic import (
        hysteretic_logistic_basis,
        hysteretic_logistic_init,
        hysteretic_logistic_state,
    )

    p = hysteretic_logistic_init(key, in_features=1, num_basis=1,
                                 dtype=jnp.float64)
    s0 = hysteretic_logistic_state((1,), 1, 1, jnp.float64)

    # sweep down far -> branch ~ 0; then hold the SAME x: branch persists ~0
    x_low = jnp.asarray([[-3.0]], jnp.float64)
    _, s = hysteretic_logistic_basis(p, s0, x_low)
    assert float(s.branch[0, 0, 0]) < 0.2
    _, s2 = hysteretic_logistic_basis(p, s, x_low)   # dx == 0
    assert float(s2.branch[0, 0, 0]) < 0.2, "stationary drive flipped branch"

    # open loop: up-sweep vs down-sweep values at x=0 differ
    import numpy as np
    xs = np.linspace(-3, 3, 41)

    def sweep(seq):
        s = hysteretic_logistic_state((1,), 1, 1, jnp.float64)
        vals = []
        for v in seq:
            phi, s = hysteretic_logistic_basis(
                p, s, jnp.asarray([[v]], jnp.float64))
            vals.append(float(phi[0, 0, 0]))
        return np.asarray(vals)

    rise = sweep(xs)
    fall = sweep(np.concatenate([xs, xs[::-1]]))[len(xs):][::-1]
    assert np.abs(rise - fall).max() > 1e-3, "no hysteresis opening"
