"""Population (vmapped-config) training: parity vs the sequential path.

The round-3 verdict's item 3: the 3-seed x 4-noise ECG robustness study
(`compare_noise_ecg.py:1250-1452` in the reference) ran as a Python loop
over full training runs, each <0.4% chip utilisation.  The population
trainer (`train/ecg_driver.py: train_ecg_population`) runs the whole grid
as ONE vmapped program; these tests pin that every member's curve matches
the sequential trainer with the same keys.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.models import ecg as M
from fetode_tpu.train.ecg_driver import (ECGRun, compare_noise_population,
                                         train_ecg_model,
                                         train_ecg_population)


def _tiny_data(seed=0, n=24, T=16, n_test=8):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n + n_test, T)).astype(np.float32)
    y = (x.mean(1) > 0).astype(np.int64)
    return x[:n], y[:n], x[n:], y[n:]


def _spec(T, noise_std=0.0):
    return M.KanFetMLPNODESpec(T=T, latent_dim=6, ode_hidden=6, num_basis=3,
                               solver="rk4", n_steps=2, noise_std=noise_std)


MEMBERS = [(0.0, 0), (0.3, 0), (0.3, 1)]


@pytest.fixture(scope="module")
def runs():
    data = _tiny_data()
    T = data[0].shape[1]
    run = ECGRun(epochs=4, batch_size=4, epochs_per_call=2,
                 eval_noise_draws=2, log_every=1000)

    # Sequential: one train_ecg_model per (std, seed), noise key passed
    # only when the member is noisy (the compare_noise make_model shape).
    seq = []
    for std, seed in MEMBERS:
        spec = _spec(T, noise_std=std)
        init_fn = lambda k, s=spec: M.kanfet_mlp_node_init(k, s)
        apply_fn = (lambda p, x, key, s=spec, sd=std:
                    M.kanfet_mlp_node_apply(
                        p, s, x, noise_key=key if sd > 0 else None))
        _, hist = train_ecg_model(init_fn, apply_fn, data,
                                  dataclasses.replace(run, seed=seed),
                                  log=None)
        seq.append(hist)

    # Population: one spec, std traced per member.
    spec = _spec(T, noise_std=0.0)
    init_fn = lambda k: M.kanfet_mlp_node_init(k, spec)
    apply_fn = lambda p, x, key, std: M.kanfet_mlp_node_apply(
        p, spec, x, noise_key=key, noise_std=std)
    best, pop = train_ecg_population(init_fn, apply_fn, data, run, MEMBERS,
                                     log=None)
    return seq, pop, best


@pytest.mark.slow
def test_population_curves_match_sequential(runs):
    seq, pop, _ = runs
    for (std, seed), h_seq, h_pop in zip(MEMBERS, seq, pop):
        for key in ("loss", "train_acc", "test_acc"):
            np.testing.assert_allclose(
                np.asarray(h_pop[key]), np.asarray(h_seq[key]),
                rtol=0, atol=5e-6,
                err_msg=f"member (std={std}, seed={seed}) curve {key!r}")
        assert abs(h_pop["best_test_acc"] - h_seq["best_test_acc"]) < 1e-6


@pytest.mark.slow
def test_population_members_differ(runs):
    """Different seeds / noise levels genuinely produce different runs
    (the vmap axis is not broadcasting one member)."""
    _, pop, _ = runs
    losses = [np.asarray(h["loss"]) for h in pop]
    assert not np.allclose(losses[0], losses[1])   # clean vs noisy, same seed
    assert not np.allclose(losses[1], losses[2])   # same std, different seed


@pytest.mark.slow
def test_population_best_params_stacked(runs):
    _, pop, best = runs
    leaves = jax.tree_util.tree_leaves(best)
    assert all(leaf.shape[0] == len(MEMBERS) for leaf in leaves)


@pytest.mark.slow
def test_compare_noise_population_shape():
    data = _tiny_data()
    T = data[0].shape[1]
    spec = _spec(T)
    run = ECGRun(epochs=2, batch_size=4, epochs_per_call=2,
                 eval_noise_draws=1, log_every=1000)
    res = compare_noise_population(
        lambda k: M.kanfet_mlp_node_init(k, spec),
        lambda p, x, key, std: M.kanfet_mlp_node_apply(
            p, spec, x, noise_key=key, noise_std=std),
        data, noise_stds=(0.0, 0.2), run=run, seeds=(0, 1), log=None)
    assert set(res) == {0.0, 0.2}
    assert set(res[0.0]) == {0, 1}
    assert all("best_test_acc" in h for d in res.values()
               for h in d.values())


def test_population_aot_cache_roundtrip(tmp_path):
    """The vmapped population program round-trips through the AOT cache
    (its remote compile measured ~20 min at P=12 on the tunnel — the
    cache is the mitigation) and reproduces the curve."""
    data = _tiny_data()
    spec = _spec(data[0].shape[1])
    from fetode_tpu.serve import config_hash

    run = ECGRun(epochs=2, batch_size=4, epochs_per_call=2,
                 eval_noise_draws=1, log_every=1000,
                 aot_cache=str(tmp_path / "aot"), aot_tag=config_hash(spec))
    mk = lambda: train_ecg_population(  # noqa: E731
        lambda k: M.kanfet_mlp_node_init(k, spec),
        lambda p, x, key, std: M.kanfet_mlp_node_apply(
            p, spec, x, noise_key=key, noise_std=std),
        data, run, MEMBERS, log=None)
    _, h1 = mk()
    import os
    assert os.path.isdir(str(tmp_path / "aot"))
    _, h2 = mk()
    np.testing.assert_array_equal(h1[0]["loss"], h2[0]["loss"])
    with pytest.raises(ValueError, match="aot_tag"):
        train_ecg_population(
            lambda k: M.kanfet_mlp_node_init(k, spec),
            lambda p, x, key, std: M.kanfet_mlp_node_apply(
                p, spec, x, noise_key=key, noise_std=std),
            data, dataclasses.replace(run, aot_tag=""), MEMBERS, log=None)


def test_population_rejects_unsupported_options():
    data = _tiny_data()
    spec = _spec(data[0].shape[1])
    pop_args = (
        lambda k: M.kanfet_mlp_node_init(k, spec),
        lambda p, x, key, std: M.kanfet_mlp_node_apply(
            p, spec, x, noise_key=key, noise_std=std),
        data)
    # population axis must divide over the data mesh (P=3 over 2)
    with pytest.raises(ValueError, match="divide"):
        train_ecg_population(*pop_args, ECGRun(epochs=1, mesh_devices=2),
                             MEMBERS, log=None)
    # tensor-sharding the members makes no sense
    with pytest.raises(ValueError, match="mesh_model"):
        train_ecg_population(*pop_args,
                             ECGRun(epochs=1, mesh_devices=2, mesh_model=2),
                             MEMBERS, log=None)


def test_population_mesh_sharded_matches_unsharded():
    """mesh_devices shards the POPULATION axis over 'data': each device
    trains P/n members with zero collectives, and the curves match the
    unsharded vmapped program (8 virtual CPU devices via conftest)."""
    data = _tiny_data()
    spec = _spec(data[0].shape[1])
    members = [(std, seed) for std in (0.0, 0.3)
               for seed in range(4)]                       # P = 8
    run = ECGRun(epochs=2, batch_size=4, epochs_per_call=2,
                 eval_noise_draws=1, log_every=1000)
    pop_args = (
        lambda k: M.kanfet_mlp_node_init(k, spec),
        lambda p, x, key, std: M.kanfet_mlp_node_apply(
            p, spec, x, noise_key=key, noise_std=std),
        data)
    _, h_u = train_ecg_population(*pop_args, run, members, log=None)
    _, h_s = train_ecg_population(
        *pop_args, dataclasses.replace(run, mesh_devices=8), members,
        log=None)
    for (std, seed), hu, hs in zip(members, h_u, h_s):
        for key in ("loss", "test_acc"):
            np.testing.assert_allclose(
                np.asarray(hs[key]), np.asarray(hu[key]), rtol=0, atol=5e-6,
                err_msg=f"member (std={std}, seed={seed}) curve {key!r}")


def test_traced_noise_std_on_pallas_needs_key():
    spec = _spec(16)._replace(solver="dopri5", solver_mode="pallas")
    params = M.kanfet_mlp_node_init(jax.random.PRNGKey(0), spec)
    with pytest.raises(ValueError, match="noise_key"):
        M.kanfet_mlp_node_apply(params, spec, jnp.ones((2, 16)),
                                noise_std=jnp.float32(0.1))


def test_traced_noise_std_pallas_matches_xla_and_static():
    """Round-5: the traced per-member noise scale rides into the
    whole-solve kernel via pre-scaled noise operands
    (ops/pallas_ferro_node.py: frozen_solve_noise), so the population
    study can run its entire grid on the kernel path.  Pin the kernel's
    traced-std output to (a) the XLA dopri5 path with the same key/std
    and (b) the kernel with the std baked statically into the spec."""
    base = _spec(16)._replace(solver="dopri5", solver_mode="pallas",
                              max_steps=32)
    params = M.kanfet_mlp_node_init(jax.random.PRNGKey(0), base)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    nk = jax.random.PRNGKey(2)
    std = 0.3

    traced = M.kanfet_mlp_node_apply(params, base, x, noise_key=nk,
                                     noise_std=jnp.float32(std))
    static = M.kanfet_mlp_node_apply(params, base._replace(noise_std=std),
                                     x, noise_key=nk)
    xla = M.kanfet_mlp_node_apply(params, base._replace(solver_mode="scan"),
                                  x, noise_key=nk, noise_std=jnp.float32(std))
    np.testing.assert_allclose(np.asarray(traced), np.asarray(static),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(traced), np.asarray(xla),
                               rtol=2e-4, atol=2e-5)
    # std=0 through the noisy kernel == the clean kernel (zero operands)
    clean_traced = M.kanfet_mlp_node_apply(params, base, x, noise_key=nk,
                                           noise_std=jnp.float32(0.0))
    clean = M.kanfet_mlp_node_apply(params, base, x)
    np.testing.assert_allclose(np.asarray(clean_traced), np.asarray(clean),
                               rtol=0, atol=1e-6)


@pytest.mark.slow
def test_population_pallas_path_matches_scan_path():
    """The vmapped population grid on the kernel path: member curves
    tolerance-match the XLA ('auto') population path (the VERDICT r4
    item-5 contract)."""
    data = _tiny_data()
    T = data[0].shape[1]
    run = ECGRun(epochs=2, batch_size=4, epochs_per_call=1,
                 eval_noise_draws=2, log_every=1000)

    def run_mode(mode):
        spec = _spec(T)._replace(solver="dopri5", solver_mode=mode,
                                 max_steps=32)
        init_fn = lambda k: M.kanfet_mlp_node_init(k, spec)   # noqa: E731
        apply_fn = (lambda p, x, key, std:                    # noqa: E731
                    M.kanfet_mlp_node_apply(p, spec, x, noise_key=key,
                                            noise_std=std))
        _, hists = train_ecg_population(init_fn, apply_fn, data, run,
                                        MEMBERS, log=None)
        return hists

    h_auto = run_mode("auto")
    h_pal = run_mode("pallas")
    for (std, seed), ha, hp in zip(MEMBERS, h_auto, h_pal):
        np.testing.assert_allclose(
            np.asarray(hp["loss"]), np.asarray(ha["loss"]),
            rtol=5e-3, atol=5e-4,
            err_msg=f"member (std={std}, seed={seed}) loss curve")


def test_tanh_gates_rejected_on_pallas_path():
    """The whole-solve kernel implements the sigmoid gate form; the
    gate_impl override must fail loudly rather than silently diverge."""
    spec = _spec(16)._replace(solver="dopri5", solver_mode="pallas",
                              gate_impl="tanh")
    params = M.kanfet_mlp_node_init(jax.random.PRNGKey(0), spec)
    with pytest.raises(ValueError, match="gate_impl"):
        M.kanfet_mlp_node_apply(params, spec, jnp.ones((2, 16)))


def test_eval_chunk_matches_unchunked_noiseless():
    """eval_chunk bounds the kernel-path eval VMEM; for a noiseless
    model chunking must be numerically a no-op."""
    data = _tiny_data()
    T = data[0].shape[1]
    spec = _spec(T)
    init_fn = lambda k: M.kanfet_mlp_node_init(k, spec)       # noqa: E731
    apply_fn = (lambda p, x, key:                             # noqa: E731
                M.kanfet_mlp_node_apply(p, spec, x))
    kw = dict(epochs=2, batch_size=4, epochs_per_call=1, log_every=1000)
    _, h_full = train_ecg_model(init_fn, apply_fn, data,
                                ECGRun(**kw), log=None)
    _, h_chunk = train_ecg_model(init_fn, apply_fn, data,
                                 ECGRun(**kw, eval_chunk=3), log=None)
    for key in ("loss", "train_acc", "test_acc"):
        np.testing.assert_allclose(np.asarray(h_chunk[key]),
                                   np.asarray(h_full[key]),
                                   rtol=0, atol=1e-6, err_msg=key)
