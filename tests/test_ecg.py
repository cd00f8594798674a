"""ECG family tests: loader contract, every model's forward/grad, a short
training run (accuracy must beat chance), noise comparison harness."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.data.ecg200 import batch_iterator, load_ecg200, synthetic_ecg200
from fetode_tpu.models.ecg import (
    KanFetMLPNODESpec,
    KanFetNODESpec,
    NodeRNNSpec,
    OdeRnnEncoderSpec,
    kanfet_mlp_node_apply,
    kanfet_mlp_node_init,
    kanfet_node_apply,
    kanfet_node_init,
    node_rnn_apply,
    node_rnn_init,
    ode_rnn_encode,
    ode_rnn_encoder_init,
)
from fetode_tpu.train.ecg_driver import ECGRun, compare_noise, train_ecg_model


def test_synthetic_data_contract():
    xtr, ytr, xte, yte = synthetic_ecg200()
    assert xtr.shape == (64, 96) and xte.shape == (32, 96)
    assert set(np.unique(ytr)) <= {0, 1}
    np.testing.assert_allclose(xtr.mean(1), 0.0, atol=1e-5)
    np.testing.assert_allclose(xtr.std(1), 1.0, atol=1e-2)


@pytest.mark.skipif(not os.path.exists("/root/reference/data/ECG200_TRAIN.txt"),
                    reason="real ECG200 files not available")
def test_real_ecg200_loads():
    xtr, ytr, xte, yte = load_ecg200()
    assert xtr.shape[1] == 96
    assert set(np.unique(np.concatenate([ytr, yte]))) == {0, 1}
    assert len(xtr) == 100 and len(xte) == 100


def test_batch_iterator_shapes():
    xtr, ytr, *_ = synthetic_ecg200()
    bx, by = batch_iterator(xtr, ytr, 8)
    assert bx.shape == (8, 8, 96) and by.shape == (8, 8)


def _small_data():
    return synthetic_ecg200(n_train=32, n_test=16, T=24)


def test_kanfet_node_forward_and_grad(key):
    spec = KanFetNODESpec(T=24, latent_dim=8, num_basis=3, ode_hidden=8,
                          max_steps=16)
    p = kanfet_node_init(key, spec, jnp.float64)
    x = jax.random.normal(key, (4, 24), jnp.float64)
    logits = kanfet_node_apply(p, spec, x)
    assert logits.shape == (4, 2)

    g = jax.grad(lambda p: kanfet_node_apply(p, spec, x).sum())(p)
    assert float(jnp.abs(g["encoder_w"]).sum()) > 0
    assert float(jnp.abs(g["proj_w"]).sum()) > 0


def test_kanfet_node_mlp_field(key):
    spec = KanFetNODESpec(T=24, latent_dim=8, num_basis=3, ode_hidden=8,
                          field="mlp", max_steps=16)
    p = kanfet_node_init(key, spec, jnp.float64)
    x = jax.random.normal(key, (3, 24), jnp.float64)
    logits = kanfet_node_apply(p, spec, x)
    assert logits.shape == (3, 2)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.parametrize("solver", ["dopri5", "euler", "rk4"])
def test_kanfet_mlp_node_batched(key, solver):
    spec = KanFetMLPNODESpec(T=24, latent_dim=8, num_basis=3, ode_hidden=8,
                             solver=solver, max_steps=16, n_steps=4)
    p = kanfet_mlp_node_init(key, spec, jnp.float64)
    x = jax.random.normal(key, (5, 24), jnp.float64)
    logits = kanfet_mlp_node_apply(p, spec, x)
    assert logits.shape == (5, 2)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_kanfet_mlp_node_noisy_needs_key(key):
    spec = KanFetMLPNODESpec(T=24, latent_dim=8, num_basis=3, ode_hidden=8,
                             solver="rk4", n_steps=2, noise_std=0.2)
    p = kanfet_mlp_node_init(key, spec, jnp.float64)
    x = jax.random.normal(key, (2, 24), jnp.float64)
    out = kanfet_mlp_node_apply(p, spec, x, noise_key=key)
    assert np.all(np.isfinite(np.asarray(out)))
    with pytest.raises(ValueError):
        kanfet_mlp_node_apply(p, spec, x)


def test_node_rnn_batched(key):
    spec = NodeRNNSpec(hidden_size=8, num_basis=3, n_steps=12)
    p = node_rnn_init(key, spec, jnp.float64)
    x = jax.random.normal(key, (3, 24), jnp.float64)
    logits = node_rnn_apply(p, spec, x)
    assert logits.shape == (3, 2)


def test_ode_rnn_encoder(key):
    spec = OdeRnnEncoderSpec(hidden_size=8, num_basis=3, n_steps=12)
    p = ode_rnn_encoder_init(key, spec, jnp.float64)
    x_seq = jax.random.normal(key, (24, 1), jnp.float64)
    h = ode_rnn_encode(p, spec, x_seq)
    assert h.shape == (8,)


def test_short_training_beats_chance():
    data = _small_data()
    spec = KanFetNODESpec(T=24, latent_dim=8, num_basis=4, ode_hidden=8,
                          solver="rk4")

    def init_fn(k):
        return kanfet_node_init(k, spec)

    def apply_fn(p, x, key):
        return kanfet_node_apply(p, spec, x)

    run = ECGRun(epochs=15, batch_size=8, log_every=100)
    best, hist = train_ecg_model(init_fn, apply_fn, data, run, log=None)
    assert hist["best_test_acc"] > 0.6, hist["test_acc"]
    assert hist["loss"][-1] < hist["loss"][0]


def test_noise_comparison_harness():
    data = _small_data()

    def make_model(std):
        spec = KanFetMLPNODESpec(T=24, latent_dim=8, num_basis=3, ode_hidden=8,
                                 solver="rk4", n_steps=4, noise_std=std)

        def init_fn(k):
            return kanfet_mlp_node_init(k, spec)

        def apply_fn(p, x, key):
            nk = key if std > 0 else None
            return kanfet_mlp_node_apply(p, spec, x, noise_key=nk)

        return init_fn, apply_fn

    results = compare_noise(make_model, data, noise_stds=(0.0, 0.2),
                            run=ECGRun(epochs=3, batch_size=8),
                            seeds=(0, 1), log=None)
    assert set(results) == {0.0, 0.2}
    for per_seed in results.values():
        assert set(per_seed) == {0, 1}
        for hist in per_seed.values():
            assert np.isfinite(hist["loss"]).all()


def test_device_noise_fresh_per_step():
    """Two training steps must observe DIFFERENT noise draws (the frozen-key
    bug regression test): with params held fixed, the noisy loss evaluated
    under the keys the epoch scanner feeds to step 0 and step 1 differs,
    while the same key reproduces bit-identically."""
    spec = KanFetMLPNODESpec(T=24, latent_dim=8, num_basis=3, ode_hidden=8,
                             solver="rk4", n_steps=4, noise_std=0.3)
    key = jax.random.PRNGKey(7)
    p = kanfet_mlp_node_init(key, spec)
    x = jax.random.normal(key, (4, 24))
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    out0 = kanfet_mlp_node_apply(p, spec, x, noise_key=k0)
    out0b = kanfet_mlp_node_apply(p, spec, x, noise_key=k0)
    out1 = kanfet_mlp_node_apply(p, spec, x, noise_key=k1)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out0b))
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_keyed_epoch_scanner_splits_keys():
    """make_minibatch_epoch(keyed=True) must feed a fresh key to every
    minibatch step — the per-step losses of a key-dependent loss must all
    differ."""
    import optax

    from fetode_tpu.train.loop import init_state, make_minibatch_epoch

    def loss_fn(p, key, xb, yb):
        return jnp.sum(p * 0.0) + jax.random.uniform(key, ())

    tx = optax.sgd(1e-3)
    params = jnp.zeros((2,))
    state = init_state(params, tx)
    epoch_fn = make_minibatch_epoch(loss_fn, tx, keyed=True)
    batches = (jnp.zeros((5, 3)), jnp.zeros((5, 3)))
    _, losses = epoch_fn(state, jax.random.PRNGKey(3), batches)
    assert len(set(np.asarray(losses).tolist())) == 5, losses


def test_bf16_state_dtype_knob():
    """state_dtype='bfloat16' must be honored in the hysteresis state and
    leave sequence-model outputs close to the f32-state reference (the
    branch state is bounded [-1,1] memory; compute stays in input dtype)."""
    from fetode_tpu.nn.rnn import (FerroKANRNNConfig, ferro_kan_cell_state,
                                   ferro_kan_rnn_apply, ferro_kan_rnn_init)

    key = jax.random.PRNGKey(5)
    cfg32 = FerroKANRNNConfig(hidden_size=8, num_basis=3)
    cfg_bf = FerroKANRNNConfig(hidden_size=8, num_basis=3,
                               state_dtype="bfloat16")
    st = ferro_kan_cell_state((2,), cfg_bf.cell, jnp.float32)
    assert st.input_state.branch.dtype == jnp.bfloat16
    p = ferro_kan_rnn_init(key, cfg32)
    x = jax.random.normal(key, (4, 24), jnp.float32)
    out32 = np.asarray(ferro_kan_rnn_apply(p, cfg32, x))
    outbf = np.asarray(ferro_kan_rnn_apply(p, cfg_bf, x))
    assert outbf.dtype == np.float32
    np.testing.assert_allclose(outbf, out32, rtol=0.05, atol=0.05)


def test_blocked_epochs_driver():
    """epochs_per_call > 1 (one dispatch per block of epochs) still
    converges, keeps per-block history, and handles a partial tail block."""
    data = _small_data()
    spec = KanFetNODESpec(T=24, latent_dim=8, num_basis=4, ode_hidden=8,
                          solver="rk4")

    def init_fn(k):
        return kanfet_node_init(k, spec)

    def apply_fn(p, x, key):
        return kanfet_node_apply(p, spec, x)

    run = ECGRun(epochs=15, batch_size=8, log_every=100, epochs_per_call=6)
    best, hist = train_ecg_model(init_fn, apply_fn, data, run, log=None)
    assert len(hist["loss"]) == 3            # blocks of 6, 6, 3
    assert hist["best_test_acc"] > 0.6, hist["test_acc"]
    assert hist["loss"][-1] < hist["loss"][0]


def test_device_noise_fresh_per_rhs_eval():
    """The ferro field is AUTONOMOUS except for device noise, so with keys
    fixed its value at two different times must differ iff per-eval noise
    is on — the reference's randn_like draws fresh noise at every RHS
    evaluation (train_noisy_ecg.py).  With ``per_eval_noise=False`` (the
    dopri5 path: adaptive error control cannot budget a white-noise RHS)
    the draw is frozen and the field is time-invariant again."""
    from fetode_tpu.models.ecg import kanfet_mlp_node_field
    from fetode_tpu.ops.ferro import ferro_state_init

    key = jax.random.PRNGKey(3)
    for std, per_eval, expect_differ in ((0.3, True, True),
                                         (0.3, False, False),
                                         (0.0, True, False)):
        spec = KanFetMLPNODESpec(T=24, latent_dim=8, num_basis=3,
                                 ode_hidden=8, noise_std=std)
        p = kanfet_mlp_node_init(key, spec)
        h = jax.random.normal(key, (4, 8))
        states = (ferro_state_init((4,), spec.fc1_cfg, h.dtype),
                  ferro_state_init((4,), spec.fc2_cfg, h.dtype))
        nkeys = jax.random.split(key) if std > 0 else None
        f1 = kanfet_mlp_node_field(p, spec, jnp.float32(0.25), h, states,
                                   nkeys, per_eval_noise=per_eval)
        f2 = kanfet_mlp_node_field(p, spec, jnp.float32(0.75), h, states,
                                   nkeys, per_eval_noise=per_eval)
        differs = not np.allclose(np.asarray(f1), np.asarray(f2))
        assert differs == expect_differ, (std, per_eval, differs)


def test_noisy_dopri5_solve_stays_converged():
    """Frozen-per-solve noise keeps the adaptive solve inside its step
    budget (per-eval noise measured: budget exhaustion + silent
    truncation at noise_std 0.2 with the preset budget)."""
    from fetode_tpu.models.ecg import kanfet_mlp_node_field
    from fetode_tpu.ops.ferro import ferro_state_init
    from fetode_tpu.solvers.dopri5 import odeint_dopri5

    spec = KanFetMLPNODESpec(T=24, noise_std=0.2)   # preset-sized field
    key = jax.random.PRNGKey(9)
    p = kanfet_mlp_node_init(key, spec)
    h0 = jax.random.normal(key, (4, spec.latent_dim))
    states = (ferro_state_init((4,), spec.fc1_cfg, h0.dtype),
              ferro_state_init((4,), spec.fc2_cfg, h0.dtype))
    nkeys = jax.random.split(key)
    traj, stats = odeint_dopri5(
        lambda t, h: kanfet_mlp_node_field(p, spec, t, h, states, nkeys,
                                           per_eval_noise=False),
        h0, jnp.asarray([0.0, 1.0]), rtol=spec.rtol, atol=spec.atol,
        max_steps=spec.max_steps, mode="while", full_output=True)
    assert bool(stats.success), (int(stats.n_accepted), int(stats.n_rejected))
    # and the apply() path routes dopri5 through exactly this frozen field
    out = kanfet_mlp_node_apply(p, spec, jax.random.normal(key, (4, 24)),
                                noise_key=key)
    assert np.isfinite(np.asarray(out)).all()


def test_noisy_node_rnn_runs_and_is_key_deterministic():
    """Regression: the noisy NODE_RNN previously crashed at the refinement
    cell (no key); it must run, reproduce per key, and vary across keys."""
    from fetode_tpu.models.ecg import NodeRNNSpec, node_rnn_apply, node_rnn_init

    spec = NodeRNNSpec(hidden_size=8, num_basis=3, n_steps=4, noise_std=0.3)
    key = jax.random.PRNGKey(5)
    p = node_rnn_init(key, spec)
    x = jax.random.normal(key, (4, 24))
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    out0 = node_rnn_apply(p, spec, x, noise_key=k0)
    out0b = node_rnn_apply(p, spec, x, noise_key=k0)
    out1 = node_rnn_apply(p, spec, x, noise_key=k1)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out0b))
    assert not np.allclose(np.asarray(out0), np.asarray(out1))
    assert np.isfinite(np.asarray(out0)).all()
