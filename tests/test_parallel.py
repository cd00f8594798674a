"""Mesh/sharding tests on the virtual 8-device CPU mesh: dp and dp x tp
training steps must match the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fetode_tpu.models.predprey import (PredPreyNODE, PredPreyTask,
                                        predict, predprey_init)
from fetode_tpu.parallel import (
    batch_sharding,
    kan_stack_param_specs,
    make_mesh,
    shard_params,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_make_mesh_shapes():
    m = make_mesh(8)
    assert dict(m.shape) == {"data": 8, "model": 1}
    m2 = make_mesh(8, model=2)
    assert dict(m2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(8, model=3)


def test_param_specs_cover_tree(key):
    spec = PredPreyNODE.kanfet(layers_hidden=(2, 4, 2), ferro_num_basis=2)
    params = predprey_init(key, spec)
    specs = kan_stack_param_specs(params)
    # same tree structure when flattened against params
    jax.tree_util.tree_map(lambda a, b: None, params, specs,
                           is_leaf=lambda x: isinstance(x, P))
    assert specs[0]["base_weight"] == P("model", None)
    assert specs[0]["ferro"]["coef"] == P(None, "model", None)


def test_sharded_forward_matches_unsharded(key):
    spec = PredPreyNODE.kanfet(layers_hidden=(2, 4, 2), ferro_num_basis=2,
                               method="rk4")
    params = predprey_init(key, spec)
    ts = jnp.linspace(0.0, 1.0, 5, jnp.float32)
    x0s = jax.random.uniform(key, (16, 2), jnp.float32, 0.5, 2.0)

    ref = jax.vmap(lambda x0: predict(params, spec, x0, ts))(x0s)

    mesh = make_mesh(8, model=2)
    p_sh = shard_params(params, mesh, kan_stack_param_specs(params))
    x_sh = jax.device_put(x0s, batch_sharding(mesh))

    with mesh:
        out = jax.jit(
            lambda p, x: jax.vmap(lambda x0: predict(p, spec, x0, ts))(x)
        )(p_sh, x_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sharded_train_step_matches_unsharded(key):
    import optax

    from fetode_tpu.train.optim import make_optimizer

    spec = PredPreyNODE.kanfet(layers_hidden=(2, 4, 2), ferro_num_basis=2,
                               method="rk4")
    params = predprey_init(key, spec)
    ts = jnp.linspace(0.0, 1.0, 5, jnp.float32)
    x0s = jax.random.uniform(key, (16, 2), jnp.float32, 0.5, 2.0)
    targets = jnp.ones((16, 5, 2), jnp.float32)

    tx = make_optimizer(1e-3, kind="adam", params=params)

    def loss_fn(p, x0s, tg):
        preds = jax.vmap(lambda x0: predict(p, spec, x0, ts))(x0s)
        return jnp.mean((preds - tg) ** 2)

    def step(p, opt_state, x0s, tg):
        loss, grads = jax.value_and_grad(loss_fn)(p, x0s, tg)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), loss

    # single-device reference
    p_ref, loss_ref = jax.jit(step)(params, tx.init(params), x0s, targets)

    # dp x tp sharded
    mesh = make_mesh(8, model=2)
    p_sh = shard_params(params, mesh, kan_stack_param_specs(params))
    opt_sh = tx.init(p_sh)
    with mesh:
        p_new, loss_sh = jax.jit(step)(p_sh, opt_sh,
                                       jax.device_put(x0s, batch_sharding(mesh)),
                                       jax.device_put(targets,
                                                      batch_sharding(mesh)))
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_new),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (35, 2)
    g.dryrun_multichip(8)


def test_traj_parallel_training_reduces_loss():
    """Trajectory-parallel driver: short batched training on a tiny config
    must reduce the population loss."""
    from fetode_tpu.train.traj_driver import TrajParallelRun, train_traj_parallel

    task = PredPreyTask(n_train=8, tf_learn=1.0, tf=2.0, n_t=16)
    spec = PredPreyNODE.kanfet(layers_hidden=(2, 4, 2), ferro_num_basis=2,
                               method="rk4")
    run = TrajParallelRun(task=task, spec=spec, n_traj=16, epochs=40,
                          epochs_per_call=20)
    params, hist = train_traj_parallel(run, log=None)
    assert hist["train"][-1] < hist["train"][0]
    assert hist["traj_epochs_per_sec"] > 0


@pytest.mark.slow
def test_traj_parallel_sharded_matches_single_device():
    """dp x tp sharded batched training step == unsharded (bitwise-close):
    the GSPMD partition of the trajectory-parallel train loop is a pure
    layout change."""
    from fetode_tpu.train.traj_driver import TrajParallelRun, train_traj_parallel

    task = PredPreyTask(n_train=6, tf_learn=0.8, tf=1.6, n_t=12)
    spec = PredPreyNODE.kanfet(layers_hidden=(2, 4, 2), ferro_num_basis=2,
                               method="rk4")
    kw = dict(task=task, spec=spec, n_traj=16, epochs=20, epochs_per_call=10)

    _, hist_ref = train_traj_parallel(TrajParallelRun(**kw), log=None)
    _, hist_sh = train_traj_parallel(
        TrajParallelRun(**kw, n_devices=8, model_axis=2), log=None)
    np.testing.assert_allclose(hist_sh["train"], hist_ref["train"],
                               rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_shooting_segments_sharded_matches_single_device():
    """Parallel-in-time: multiple-shooting segments sharded over the mesh
    'data' axis (shooting_devices) must train identically to the
    unsharded segment vmap — the partition is a pure layout change.

    The persistent compilation cache is disabled for this test:
    serializing the sharded shooting executable for the cache segfaults
    jaxlib when it runs late in the full suite (reproduced twice at the
    same frame, compilation_cache.put_executable_and_time; the same
    compile passes standalone).  The cache write is the only casualty —
    correctness is unaffected.
    """
    from fetode_tpu.train.predprey_driver import PredPreyRun, train_predprey

    task = PredPreyTask(n_train=13, tf_learn=1.2, tf=2.4, n_t=26)
    spec = PredPreyNODE.kanfet(layers_hidden=(2, 4, 2), ferro_num_basis=2,
                               max_steps=64)
    kw = dict(task=task, spec=spec, epochs=20, epochs_per_call=10,
              shooting_points=4)            # 12 intervals -> 4 segments

    # is_cache_used() latches its decision once per process, so flipping
    # the flag alone is a no-op mid-suite — reset_cache() un-latches it.
    from jax._src import compilation_cache as _cc

    prior = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    _cc.reset_cache()
    try:
        _, hist_ref = train_predprey(PredPreyRun(**kw), log=None)
        _, hist_sh = train_predprey(PredPreyRun(**kw, shooting_devices=4),
                                    log=None)
    finally:
        jax.config.update("jax_enable_compilation_cache", prior)
        _cc.reset_cache()
    np.testing.assert_allclose(hist_sh["train"], hist_ref["train"],
                               rtol=2e-4, atol=1e-6)


def test_shooting_devices_requires_shooting():
    from fetode_tpu.train.predprey_driver import PredPreyRun, train_predprey

    with pytest.raises(ValueError, match="shooting_devices"):
        train_predprey(PredPreyRun(shooting_devices=4), log=None)


def test_multislice_mesh_and_global_sharding():
    """On single-slice CPU hosts make_multislice_mesh degrades to dcn=1;
    global_batch_sharding spans (dcn, data) and round-trips a batch."""
    from fetode_tpu.parallel.multihost import (
        global_batch_sharding,
        make_multislice_mesh,
    )

    mesh = make_multislice_mesh(model=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.shape["dcn"] == 1 and mesh.shape["model"] == 2
    sh = global_batch_sharding(mesh)
    x = jnp.arange(8.0 * 3).reshape(8, 3)
    xs = jax.device_put(x, sh)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_tree_size():
    from fetode_tpu.utils.trees import tree_size

    assert tree_size({"a": jnp.zeros((2, 3)), "b": [jnp.zeros(4)]}) == 10


def test_parse_mesh_flag():
    from fetode_tpu.parallel import parse_mesh_flag

    assert parse_mesh_flag("data=4,model=2") == (8, 2)
    assert parse_mesh_flag("8") == (8, 1)
    assert parse_mesh_flag("auto") == (len(jax.devices()), 1)


def test_shard_batch_leaves_handles_ragged():
    from fetode_tpu.parallel import make_mesh, shard_batch_leaves

    mesh = make_mesh(8)
    tree = {"even": jnp.zeros((4, 16, 3)),    # 16 % 8 == 0 -> sharded
            "ragged": jnp.zeros((4, 10, 3)),  # 10 % 8 != 0 -> replicated
            "keys": jnp.zeros((4, 2), jnp.uint32)}
    out = shard_batch_leaves(tree, mesh, batch_axis=1)
    assert not out["even"].sharding.is_fully_replicated
    assert out["ragged"].sharding.is_fully_replicated
    assert out["keys"].sharding.is_fully_replicated


def _tiny_ecg_data(rng, n_train=16, n_test=8, T=12):
    x_tr = rng.normal(size=(n_train, T)).astype(np.float32)
    y_tr = (rng.random(n_train) > 0.5).astype(np.int32)
    x_te = rng.normal(size=(n_test, T)).astype(np.float32)
    y_te = (rng.random(n_test) > 0.5).astype(np.int32)
    return x_tr, y_tr, x_te, y_te


def test_ecg_driver_mesh_matches_single_device(rng):
    """ECG trainer with mesh_devices=8 (scan path, GSPMD DP) must produce
    the same loss curve as the single-device run (VERDICT r2 item 1)."""
    from fetode_tpu.models import ecg as M
    from fetode_tpu.train.ecg_driver import ECGRun, train_ecg_model

    data = _tiny_ecg_data(rng)
    spec = M.KanFetMLPNODESpec(T=12, latent_dim=8, ode_hidden=8, num_basis=2,
                               max_steps=8)
    init_fn = lambda k: M.kanfet_mlp_node_init(k, spec)
    apply_fn = lambda p, x, key: M.kanfet_mlp_node_apply(p, spec, x)

    kw = dict(epochs=2, batch_size=8, log_every=100)
    _, h_ref = train_ecg_model(init_fn, apply_fn, data,
                               ECGRun(**kw), log=None)
    _, h_dp = train_ecg_model(init_fn, apply_fn, data,
                              ECGRun(**kw, mesh_devices=8), log=None)
    np.testing.assert_allclose(h_dp["loss"], h_ref["loss"],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(h_dp["test_acc"], h_ref["test_acc"])


def test_ecg_driver_mesh_pallas_sharded(rng):
    """The pallas whole-solve path under the mesh (shard_map per-device
    kernels) trains and matches the scan-path losses to solver tolerance."""
    from fetode_tpu.models import ecg as M
    from fetode_tpu.parallel import make_mesh
    from fetode_tpu.train.ecg_driver import ECGRun, train_ecg_model

    data = _tiny_ecg_data(rng)
    spec = M.KanFetMLPNODESpec(T=12, latent_dim=8, ode_hidden=8, num_basis=2,
                               max_steps=8, solver_mode="pallas")
    mesh = make_mesh(8)
    init_fn = lambda k: M.kanfet_mlp_node_init(k, spec)
    apply_fn = lambda p, x, key: M.kanfet_mlp_node_apply(p, spec, x,
                                                         mesh=mesh)
    run = ECGRun(epochs=2, batch_size=8, log_every=100, mesh_devices=8)
    _, hist = train_ecg_model(init_fn, apply_fn, data, run, log=None)
    assert np.isfinite(hist["loss"]).all()

    spec_scan = spec._replace(solver_mode="scan")
    apply_scan = lambda p, x, key: M.kanfet_mlp_node_apply(p, spec_scan, x)
    _, h_scan = train_ecg_model(init_fn, apply_scan, data,
                                ECGRun(epochs=2, batch_size=8, log_every=100),
                                log=None)
    np.testing.assert_allclose(hist["loss"], h_scan["loss"],
                               rtol=1e-3, atol=1e-5)


def test_model_param_specs_rule():
    """Column-parallel placement rule: float leaves with ndim>=2 and a
    divisible leading dim shard over 'model'; everything else replicates."""
    from jax.sharding import PartitionSpec as P

    from fetode_tpu.parallel import make_mesh, model_param_specs

    mesh = make_mesh(8, model=2)
    tree = {"w": jnp.zeros((16, 3)),          # -> P('model', None)
            "w3": jnp.zeros((4, 2, 5)),       # -> P('model', None, None)
            "bias": jnp.zeros((16,)),         # 1-D -> replicated
            "odd": jnp.zeros((3, 3)),         # 3 % 2 != 0 -> replicated
            "ints": jnp.zeros((8, 2), jnp.int32)}   # non-float -> replicated
    specs = model_param_specs(tree, mesh)
    assert specs["w"] == P("model", None)
    assert specs["w3"] == P("model", None, None)
    assert specs["bias"] == P()
    assert specs["odd"] == P()
    assert specs["ints"] == P()
    # model=1 mesh: everything replicates (no 1-way "sharding" noise)
    specs1 = model_param_specs(tree, make_mesh(8, model=1))
    assert all(s == P() for s in jax.tree_util.tree_leaves(
        specs1, is_leaf=lambda x: isinstance(x, P)))


@pytest.mark.slow
def test_ecg_driver_mesh_tensor_parallel_matches_single_device(rng):
    """dp x tp (data=4, model=2): column-parallel param placement must
    leave the training math unchanged (GSPMD inserts the collectives) —
    loss curve matches the single-device run."""
    from fetode_tpu.models import ecg as M
    from fetode_tpu.train.ecg_driver import ECGRun, train_ecg_model

    data = _tiny_ecg_data(rng)
    spec = M.KanFetMLPNODESpec(T=12, latent_dim=8, ode_hidden=8, num_basis=2,
                               max_steps=8)
    init_fn = lambda k: M.kanfet_mlp_node_init(k, spec)
    apply_fn = lambda p, x, key: M.kanfet_mlp_node_apply(p, spec, x)

    kw = dict(epochs=2, batch_size=8, log_every=100)
    _, h_ref = train_ecg_model(init_fn, apply_fn, data,
                               ECGRun(**kw), log=None)
    _, h_tp = train_ecg_model(init_fn, apply_fn, data,
                              ECGRun(**kw, mesh_devices=8, mesh_model=2),
                              log=None)
    np.testing.assert_allclose(h_tp["loss"], h_ref["loss"],
                               rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_forecast_driver_mesh_matches_single_device(rng):
    from fetode_tpu.models.forecasting import LatentODEForecasterSpec
    from fetode_tpu.train.forecast_driver import (ForecastRun,
                                                  train_point_forecaster)

    X = rng.normal(size=(220, 3)).astype(np.float32)
    y = rng.normal(size=220).astype(np.float32)
    spec = LatentODEForecasterSpec(num_features=3, context_len=12, pred_len=4,
                                   latent_dim=8)
    kw = dict(context_len=12, pred_len=4, batch_size=16, epochs=2,
              log_every=100)
    _, h_ref = train_point_forecaster(spec, X, y, ForecastRun(**kw), log=None)
    _, h_dp = train_point_forecaster(spec, X, y,
                                     ForecastRun(**kw, mesh_devices=8),
                                     log=None)
    np.testing.assert_allclose(h_dp["train"], h_ref["train"],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(h_dp["test_mse"], h_ref["test_mse"],
                               rtol=2e-3)


def test_cond_diffusion_driver_mesh_matches_single_device(rng):
    from fetode_tpu.models.cond_diffusion import make_denoiser_spec
    from fetode_tpu.train.cond_diffusion_driver import (
        CondDiffusionRun, train_conditional_diffusion)

    def windows(n):
        return (rng.normal(size=(n, 12, 3)).astype(np.float32),
                rng.normal(size=(n, 4, 3)).astype(np.float32))

    data = {"train": windows(32), "val": windows(16), "test": windows(16)}
    spec = make_denoiser_spec("mlp", d_in=3, pred_len=4, seq_len=12,
                              cond_dim=16, time_dim=16, hidden=32)
    kw = dict(seq_len=12, pred_len=4, diff_T=8, epochs=2, batch_size=16,
              log_every=100)
    _, h_ref = train_conditional_diffusion(spec, data,
                                           CondDiffusionRun(**kw), log=None)
    _, h_dp = train_conditional_diffusion(
        spec, data, CondDiffusionRun(**kw, mesh_devices=8), log=None)
    np.testing.assert_allclose(h_dp["train"], h_ref["train"],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(h_dp["val"], h_ref["val"],
                               rtol=2e-4, atol=1e-6)


def test_kuramoto_pallas_mesh_matches_single_device(key):
    """The whole-rollout Kuramoto kernel under GSPMD data parallelism
    (the `mnist --mesh data=8 --rollout pallas` path) must reproduce the
    single-device epoch losses."""
    import optax

    from fetode_tpu.models.kuramoto import (KuramotoSpec, kuramoto_init,
                                            kuramoto_kan_apply)
    from fetode_tpu.parallel import shard_batch_leaves
    from fetode_tpu.train.loop import init_state, make_minibatch_epoch
    from fetode_tpu.train.optim import make_optimizer

    spec = KuramotoSpec(H=8, W=8, steps=3, rollout="pallas")
    params = kuramoto_init(key, spec)
    imgs = jax.random.uniform(key, (2, 16, 8, 8), jnp.float32)
    labels = jax.random.randint(jax.random.fold_in(key, 1), (2, 16), 0, 10)

    def loss_fn(p, x, y):
        logits = kuramoto_kan_apply(p, spec, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    tx = make_optimizer(1e-3, kind="adamw", weight_decay=1e-4,
                        params=params)
    epoch_fn = make_minibatch_epoch(loss_fn, tx)
    _, l_ref = epoch_fn(init_state(params, tx), (imgs, labels))

    mesh = make_mesh(8)
    batch = shard_batch_leaves((imgs, labels), mesh, batch_axis=1)
    _, l_dp = epoch_fn(init_state(params, tx), batch)
    np.testing.assert_allclose(np.asarray(l_dp), np.asarray(l_ref),
                               rtol=2e-4, atol=1e-6)
