"""Command-line entry point: ``python -m fetode_tpu.cli <workload> [--k v]``.

The reference imports argparse in six scripts but never wires it
(SURVEY.md L5); this is the real CLI: one subcommand per workload, preset
hyper-parameters from ``fetode_tpu.config`` with ``--key value`` overrides,
artifacts (loss curves, forecasts, hysteresis loops, metrics jsonl) under
``--out-dir``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _parse(argv):
    p = argparse.ArgumentParser(prog="fetode_tpu", description=__doc__)
    from fetode_tpu import __version__
    p.add_argument("--version", action="version",
                   version=f"fetode-tpu {__version__}")
    p.add_argument("workload", choices=["predprey", "ecg", "ett",
                                        "cond_diffusion", "timemmd", "mnist",
                                        "symbolic", "serve"])
    p.add_argument("--out-dir", default="runs/latest")
    p.add_argument("--plots", action="store_true", help="save plot artifacts")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="pin the jax platform (env vars alone cannot "
                        "override a registered TPU plugin; this sets the "
                        "jax_platforms config flag before device init)")
    p.add_argument("--mesh", default=None,
                   help="train over a ('data','model') device mesh: "
                        "'data=N[,model=M]', a device count, or 'auto' "
                        "(all devices, pure DP). The batch axis shards "
                        "over 'data'; model>1 additionally column-shards "
                        "output features of every weight matrix over "
                        "'model' (GSPMD collectives). Supported by the "
                        "ecg/ett/cond_diffusion/timemmd/mnist workloads "
                        "(predprey uses --shooting-devices / the traj "
                        "driver)")
    args, unknown = p.parse_known_args(argv)
    overrides = {}
    key = None
    for tok in unknown:
        if tok.startswith("--"):
            if key is not None:          # previous flag had no value: boolean
                overrides[key] = "true"
            key = tok[2:].replace("-", "_")
        elif key is not None:
            overrides[key] = tok
            key = None
        else:
            p.error(f"unexpected argument {tok!r}")
    if key is not None:                  # trailing valueless flag
        overrides[key] = "true"
    return args, overrides


def run_predprey(cfg, out_dir, plots):
    from fetode_tpu.diag.logging import MetricLogger
    from fetode_tpu.models.predprey import PredPreyNODE
    from fetode_tpu.train.predprey_driver import PredPreyRun, train_predprey

    spec = PredPreyNODE.kanfet(layers_hidden=cfg.layers, grid_size=cfg.grid_size,
                               ferro_num_basis=cfg.ferro_num_basis,
                               method=cfg.method, rtol=cfg.rtol, atol=cfg.atol,
                               max_steps=cfg.max_steps,
                               solver_mode=cfg.solver_mode)
    run = PredPreyRun(spec=spec, lr=cfg.lr, epochs=cfg.epochs,
                      epochs_per_call=cfg.epochs_per_call, seed=cfg.seed,
                      consistent_time_base=cfg.consistent_time_base,
                      shooting_points=cfg.shooting_points,
                      shooting_devices=cfg.shooting_devices,
                      ckpt_dir=cfg.ckpt_dir, ckpt_every=cfg.ckpt_every,
                      resume=cfg.resume, aot_cache=cfg.aot_cache)
    logger = MetricLogger(os.path.join(out_dir, "metrics.jsonl"))
    params, hist = train_predprey(run, log=lambda m: print(m, flush=True))
    for i, (ep, tr) in enumerate(zip(hist["epoch"], hist["train"])):
        logger.log(ep, train=tr, test=hist["test"][i] if hist["test"] else None)
    if plots:
        import jax.numpy as jnp

        from fetode_tpu.diag.plots import plot_losses, plot_trajectory
        from fetode_tpu.models.predprey import (PredPreyTask, generate_data,
                                                predict)

        task = PredPreyTask()
        ts, _, truth = generate_data(task)
        pred = predict(params, spec._replace(solver_mode="while",
                                             max_steps=4 * spec.max_steps),
                       jnp.asarray([task.x0, task.y0]), ts)
        plot_trajectory(ts, truth, pred,
                        os.path.join(out_dir, "trajectory.png"),
                        train_cut=task.tf_learn)
        plot_losses({"train": hist["train"], "test": hist["test"]},
                    os.path.join(out_dir, "loss.png"))
    return {"epochs_per_sec": hist["epochs_per_sec"],
            "final_train": hist["train"][-1]}


def _load_ecg_data():
    from fetode_tpu.data.ecg200 import load_ecg200, synthetic_ecg200

    try:
        return load_ecg200()
    except FileNotFoundError:
        print("ECG200 files not found; using synthetic stand-in")
        return synthetic_ecg200()


def run_ecg(cfg, out_dir, plots, data=None):
    from fetode_tpu.models import ecg as M
    from fetode_tpu.train.ecg_driver import ECGRun, train_ecg_model

    if data is None:
        data = _load_ecg_data()
    # --gate-impl is a KanFetMLPNODESpec field only (the ferro-op VPU
    # form, BASELINE.md round-4); every other ECG model — the
    # noise_study and 'all' composites included — would silently ignore
    # it, so refuse BEFORE their early returns rather than mislead.
    if cfg.gate_impl != "sigmoid" and cfg.model != "kanfet_mlp_node":
        raise SystemExit(
            f"--gate-impl {cfg.gate_impl!r} is only supported by "
            f"--model kanfet_mlp_node (model {cfg.model!r} has no "
            f"gate_impl field)")
    if cfg.model == "all":
        return _run_ecg_all(cfg, data, out_dir, plots)
    if cfg.model == "noise_study":
        return _run_ecg_noise_study(cfg, data, out_dir)
    T = data[0].shape[1]

    loops_fn = None   # ferro models: trained-params P-E loop extractor
    if cfg.model == "kanfet_node":
        spec = M.KanFetNODESpec(T=T, latent_dim=cfg.latent_dim,
                                num_basis=cfg.num_basis, solver=cfg.solver,
                                rtol=cfg.rtol, atol=cfg.atol,
                                field=cfg.field,
                                solver_mode=cfg.solver_mode)
        init_fn = lambda k: M.kanfet_node_init(k, spec)
        apply_fn = lambda p, x, key: M.kanfet_node_apply(p, spec, x)
    elif cfg.model == "kanfet_mlp_node":
        spec = M.KanFetMLPNODESpec(T=T, latent_dim=cfg.latent_dim,
                                   num_basis=cfg.num_basis, solver=cfg.solver,
                                   rtol=cfg.rtol, atol=cfg.atol,
                                   noise_std=cfg.noise_std,
                                   solver_mode=cfg.solver_mode,
                                   gate_impl=cfg.gate_impl)
        # The pallas whole-solve kernel is a custom call GSPMD cannot
        # partition; under --mesh it runs per-device via shard_map
        # (pallas_ferro_node_solve_sharded) — pass the mesh explicitly.
        mesh = None
        if cfg.mesh_devices and cfg.solver_mode == "pallas":
            from fetode_tpu.parallel import make_mesh
            mesh = make_mesh(cfg.mesh_devices, model=cfg.mesh_model)
        init_fn = lambda k: M.kanfet_mlp_node_init(k, spec)
        apply_fn = lambda p, x, key: M.kanfet_mlp_node_apply(
            p, spec, x, noise_key=key if cfg.noise_std > 0 else None,
            mesh=mesh)
        loops_fn = lambda p: [("fc1", p["fc1"], spec.fc1_cfg),
                              ("fc2", p["fc2"], spec.fc2_cfg)]
    elif cfg.model == "fepa_rnn":
        from fetode_tpu.nn.rnn import (FerroKANRNNConfig, ferro_kan_rnn_apply,
                                       ferro_kan_rnn_init)

        rcfg = FerroKANRNNConfig(hidden_size=cfg.latent_dim,
                                 num_basis=cfg.num_basis,
                                 noise_std=cfg.noise_std)
        init_fn = lambda k: ferro_kan_rnn_init(k, rcfg)
        apply_fn = lambda p, x, key: ferro_kan_rnn_apply(
            p, rcfg, x, noise_key=key if cfg.noise_std > 0 else None)
        loops_fn = lambda p: [
            ("cell_input", p["cell"]["input_basis"], rcfg.cell.input_cfg),
            ("cell_hidden", p["cell"]["hidden_basis"], rcfg.cell.hidden_cfg),
            ("head", p["head_basis"], rcfg.head_cfg)]
    elif cfg.model == "digital_rnn":
        from fetode_tpu.nn.rnn import (DigitalRNNConfig, digital_rnn_apply,
                                       digital_rnn_init)

        rcfg = DigitalRNNConfig(hidden_size=cfg.latent_dim)
        init_fn = lambda k: digital_rnn_init(k, rcfg)
        apply_fn = lambda p, x, key: digital_rnn_apply(p, rcfg, x)
    elif cfg.model == "node_rnn":
        spec = M.NodeRNNSpec(hidden_size=cfg.latent_dim,
                             num_basis=cfg.num_basis, noise_std=cfg.noise_std)
        init_fn = lambda k: M.node_rnn_init(k, spec)
        apply_fn = lambda p, x, key: M.node_rnn_apply(
            p, spec, x, noise_key=key if cfg.noise_std > 0 else None)
        loops_fn = lambda p: [
            ("basis", p["basis"], spec.basis_cfg),
            ("cell_input", p["cell"]["input_basis"], spec.cell_cfg.input_cfg),
            ("cell_hidden", p["cell"]["hidden_basis"], spec.cell_cfg.hidden_cfg)]
    else:
        raise SystemExit(f"unknown ECG model {cfg.model!r}")

    aot_tag = ""
    if cfg.aot_cache:
        # Program identity for the opaque-apply_fn trainer: the full
        # preset minus fields that do not shape the compiled program.
        import dataclasses as _dc

        from fetode_tpu.serve import config_hash

        aot_tag = config_hash(_dc.replace(cfg, ckpt_dir="", ckpt_every=0,
                                          resume=False, aot_cache=""))
    run = ECGRun(epochs=cfg.epochs, batch_size=cfg.batch_size, lr=cfg.lr,
                 weight_decay=cfg.weight_decay, seed=cfg.seed,
                 epochs_per_call=cfg.epochs_per_call,
                 mesh_devices=cfg.mesh_devices, mesh_model=cfg.mesh_model,
                 ckpt_dir=cfg.ckpt_dir, ckpt_every=cfg.ckpt_every,
                 resume=cfg.resume, aot_cache=cfg.aot_cache,
                 aot_tag=aot_tag)
    params, hist = train_ecg_model(init_fn, apply_fn, data, run)
    if plots:
        from fetode_tpu.diag.plots import plot_losses
        plot_losses({"loss": hist["loss"]}, os.path.join(out_dir, "loss.png"),
                    logy=False)
        if loops_fn is not None:
            # P-E hysteresis loops with the TRAINED device parameters (the
            # reference's visualisers, train_ecg.py:673-877).  Noisy runs
            # additionally emit the noisy-device panels
            # (compare_noise_ecg.py:398-513).
            import jax

            from fetode_tpu.diag.hysteresis import plot_loops
            from fetode_tpu.ops.ferro import FerroParams

            for li, (prefix, fp, fcfg) in enumerate(loops_fn(params)):
                plot_loops(FerroParams(**fp), fcfg,
                           os.path.join(out_dir, "hysteresis"),
                           max_panels=6, prefix=prefix)
                if cfg.noise_std > 0:
                    # independent device noise per layer: fold the layer
                    # index (same-shaped layers must not share draws)
                    plot_loops(FerroParams(**fp), fcfg,
                               os.path.join(out_dir, "hysteresis"),
                               max_panels=6, prefix=f"{prefix}_noisy",
                               noise_key=jax.random.fold_in(
                                   jax.random.PRNGKey(cfg.seed), li))
    return {"best_test_acc": hist["best_test_acc"],
            "test_acc_curve": [float(a) for a in hist["test_acc"]]}


def _run_ecg_noise_study(cfg, data, out_dir):
    """The reference's clean-vs-noisy device study
    (``compare_noise_ecg.py:1250-1452``) as ONE vmapped population
    dispatch: every (noise_std, seed) grid member trains as a lane of a
    single program (``train/ecg_driver.py: compare_noise_population``)
    instead of the reference's sequential one-run-at-a-time loop.

    Uses the ferro KanFet-MLP-NODE (the study's model) with noise_std
    TRACED per member.  ``--solver-mode pallas`` puts the whole grid on
    the whole-solve in-kernel adjoint (round 5: the traced scale rides
    in via pre-scaled noise operands — measured 6.69x the XLA path per
    steady train block, ``ecg200_population_study.json``).
    """
    import dataclasses as _dc
    import json

    from fetode_tpu.models import ecg as M
    from fetode_tpu.train.ecg_driver import ECGRun, compare_noise_population

    T = data[0].shape[1]
    stds = tuple(float(s) for s in str(cfg.noise_stds).split(",") if s)
    seeds = tuple(int(s) for s in str(cfg.noise_seeds).split(",") if s)
    # Solve-path choice for the vmapped grid:
    #   "auto" — scan under the training grad, while-mode for the
    #     no-grad eval passes (a no-grad checkpointed scan compiles
    #     pathologically — the dopri5 auto-mode rationale,
    #     solvers/dopri5.py);
    #   "pallas" — the whole-solve in-kernel adjoint for EVERY member:
    #     the traced per-member noise_std rides in via pre-scaled noise
    #     operands (ops/pallas_ferro_node.py: frozen_solve_noise), so
    #     std-0 members share the same program.
    # "scan" is remapped to "auto" (reported below); anything else the
    # path cannot use is refused rather than silently dropped.
    solver_mode = cfg.solver_mode if cfg.solver_mode != "scan" else "auto"
    if cfg.solver_mode == "scan":
        print("[noise_study] --solver-mode scan runs as 'auto' here "
              "(no-grad eval passes through a checkpointed scan compile "
              "pathologically)", flush=True)
    if cfg.mesh_model > 1:
        raise SystemExit("[noise_study] --mesh model>1 is not supported: "
                         "the study shards the POPULATION axis over "
                         "'data' (train/ecg_driver.py)")
    spec = M.KanFetMLPNODESpec(T=T, latent_dim=cfg.latent_dim,
                               num_basis=cfg.num_basis, solver=cfg.solver,
                               rtol=cfg.rtol, atol=cfg.atol,
                               solver_mode=solver_mode)
    # Kernel path: bound the eval batch — full-split eval through the
    # vmapped noisy kernel stacks frozen (B, out, in*K) noise operands
    # past the 128 MB VMEM cap (measured +18 MB over at B=100 x P=12);
    # lax.map'd chunks keep every launch at the training working set.
    eval_chunk = 2 * cfg.batch_size if solver_mode == "pallas" else 0
    run = ECGRun(epochs=cfg.epochs, batch_size=cfg.batch_size, lr=cfg.lr,
                 weight_decay=cfg.weight_decay, seed=cfg.seed,
                 epochs_per_call=max(1, cfg.epochs_per_call),
                 eval_noise_draws=4, aot_cache=cfg.aot_cache,
                 mesh_devices=cfg.mesh_devices, eval_chunk=eval_chunk)
    if run.aot_cache:
        from fetode_tpu.serve import config_hash
        run = _dc.replace(run, aot_tag=config_hash(
            spec, run.epochs, run.epochs_per_call, stds, seeds))
    init_fn = lambda k: M.kanfet_mlp_node_init(k, spec)    # noqa: E731
    apply_fn = (lambda p, x, key, std:                     # noqa: E731
                M.kanfet_mlp_node_apply(p, spec, x, noise_key=key,
                                        noise_std=std))
    results = compare_noise_population(
        init_fn, apply_fn, data, noise_stds=stds, run=run, seeds=seeds,
        log=lambda m: print(m, flush=True))
    summary = {
        str(std): {
            "mean_best_test_acc": float(
                sum(h["best_test_acc"] for h in per_seed.values())
                / len(per_seed)),
            "per_seed": {str(s): float(h["best_test_acc"])
                         for s, h in per_seed.items()},
        }
        for std, per_seed in results.items()
    }
    with open(os.path.join(out_dir, "noise_study.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    return {"noise_study": summary}


# The reference's end-of-run multi-model comparison (train_ecg.py:1418-1463:
# Digital RNN vs FEPA-RNN vs KanFet models on one chart) plus the
# clean-vs-noisy study (compare_noise_ecg.py:1250-1452) as ONE invocation:
# ``ecg --model all [--plots]``.
_ECG_ALL_MODELS = ("digital_rnn", "fepa_rnn", "kanfet_node",
                   "kanfet_mlp_node")


def _run_ecg_all(cfg, data, out_dir, plots):
    import dataclasses

    variants = [(m, 0.0) for m in _ECG_ALL_MODELS]
    # Noisy ferro device variant (NoisyFerroelectricBasis default std 0.2,
    # ferro_class.py:238) — the clean-vs-noisy panel pair.
    variants.append(("kanfet_mlp_node",
                     cfg.noise_std if cfg.noise_std > 0 else 0.2))
    curves, table = {}, {}
    for name, noise in variants:
        label = f"{name}_noisy" if noise > 0 else name
        mcfg = dataclasses.replace(cfg, model=name, noise_std=noise)
        sub = os.path.join(out_dir, label)
        os.makedirs(sub, exist_ok=True)
        print(f"[ecg all] training {label}", flush=True)
        res = run_ecg(mcfg, sub, plots, data=data)
        curves[label] = res["test_acc_curve"]
        table[label] = res["best_test_acc"]
        print(f"[ecg all] {label}: best test acc {res['best_test_acc']:.4f}",
              flush=True)
    if plots:
        from fetode_tpu.diag.plots import plot_model_comparison

        plot_model_comparison(curves,
                              os.path.join(out_dir, "model_comparison.png"))
    with open(os.path.join(out_dir, "accuracy_table.json"), "w") as f:
        json.dump(table, f, indent=2)
    print("model".ljust(26), "best test acc")
    for label, acc in sorted(table.items(), key=lambda kv: -kv[1]):
        print(label.ljust(26), f"{acc:.4f}")
    return {"best_test_acc": table}


def run_ett(cfg, out_dir, plots):
    from fetode_tpu.data.timeseries import load_ett_csv, synthetic_series
    from fetode_tpu.models.forecasting import (DiffusionForecasterSpec,
                                               LatentODEForecasterSpec)
    from fetode_tpu.train.forecast_driver import (ForecastRun,
                                                  train_diffusion_forecaster,
                                                  train_point_forecaster)

    try:
        X, y, _ = load_ett_csv(name=cfg.dataset, target_col=cfg.target)
    except FileNotFoundError:
        print("ETT csv not found; using synthetic stand-in")
        X, y = synthetic_series(n=2000, n_features=6)

    run = ForecastRun(context_len=cfg.context_len, pred_len=cfg.pred_len,
                      batch_size=cfg.batch_size, epochs=cfg.epochs,
                      lr=cfg.lr, weight_decay=cfg.weight_decay,
                      eval_samples=cfg.eval_samples, seed=cfg.seed,
                      mesh_devices=cfg.mesh_devices,
                      mesh_model=cfg.mesh_model, ckpt_dir=cfg.ckpt_dir,
                      ckpt_every=cfg.ckpt_every, resume=cfg.resume,
                      aot_cache=cfg.aot_cache)
    if cfg.model == "point":
        spec = LatentODEForecasterSpec(num_features=X.shape[1],
                                       context_len=cfg.context_len,
                                       pred_len=cfg.pred_len,
                                       latent_dim=cfg.latent_dim,
                                       solver_mode=cfg.solver_mode)
        params, hist = train_point_forecaster(spec, X, y, run)
    else:
        enc = {"diffusion": "mlp", "kan_diffusion": "kan",
               "kan_fet_diffusion": "kanrnn"}[cfg.model]
        spec = DiffusionForecasterSpec(num_features=X.shape[1],
                                       context_len=cfg.context_len,
                                       pred_len=cfg.pred_len,
                                       latent_dim=cfg.latent_dim,
                                       diff_T=cfg.diff_t, encoder=enc,
                                       solver_mode=cfg.solver_mode)
        params, hist = train_diffusion_forecaster(spec, X, y, run)
    if plots:
        from fetode_tpu.diag.plots import plot_forecast, plot_losses
        plot_losses({"train": hist["train"], "val": hist["val"]},
                    os.path.join(out_dir, "loss.png"))
        plot_forecast(y, hist["final_forecast"],
                      os.path.join(out_dir, "forecast.png"))
    return {"test_mse": hist["test_mse"]}


def run_cond_diffusion(cfg, out_dir, plots):
    import jax
    import numpy as np

    from fetode_tpu.data.timeseries import load_ett_csv, make_windows, \
        split_time_series, standardize_fit, synthetic_series
    from fetode_tpu.models.cond_diffusion import make_denoiser_spec
    from fetode_tpu.train.cond_diffusion_driver import (CondDiffusionRun,
                                                        train_conditional_diffusion)

    try:
        X, y, _ = load_ett_csv(name=cfg.dataset)
    except FileNotFoundError:
        print("ETT csv not found; using synthetic stand-in")
        X, y = synthetic_series(n=1500, n_features=6)

    tr, va, te = split_time_series(len(X))
    s = standardize_fit(X[tr])
    Xs = s.apply(X)
    data = {}
    from fetode_tpu.data.native import window_gather
    for name, sl in (("train", tr), ("val", va), ("test", te)):
        past, _ = make_windows(Xs[sl], Xs[sl][:, -1], cfg.seq_len, cfg.pred_len)
        starts = np.arange(len(past), dtype=np.int64) + cfg.seq_len
        fut = window_gather(Xs[sl], starts, cfg.pred_len)
        data[name] = (past, fut)

    spec = make_denoiser_spec(cfg.denoiser, d_in=Xs.shape[1],
                              pred_len=cfg.pred_len, seq_len=cfg.seq_len,
                              solver_mode=cfg.solver_mode)
    run = CondDiffusionRun(seq_len=cfg.seq_len, pred_len=cfg.pred_len,
                           diff_T=cfg.diff_t, epochs=cfg.epochs,
                           batch_size=cfg.batch_size, lr=cfg.lr,
                           eval_samples=cfg.eval_samples, seed=cfg.seed,
                           mesh_devices=cfg.mesh_devices,
                           mesh_model=cfg.mesh_model,
                           ckpt_dir=cfg.ckpt_dir,
                           ckpt_every=cfg.ckpt_every, resume=cfg.resume,
                           aot_cache=cfg.aot_cache)
    params, hist = train_conditional_diffusion(spec, data, run)
    # Sampling-based test forecast MSE/MAE (the reference's
    # evaluate_forecast_samples protocol, kan_diffusion_ett.py:764-865);
    # chunk the test split so the reverse chain stays memory-bounded.
    from fetode_tpu.train.cond_diffusion_driver import evaluate_forecast
    past_te, fut_te = data["test"]
    n_eval = min(len(past_te), 256)
    ev = evaluate_forecast(params, spec, run, past_te[:n_eval],
                           fut_te[:n_eval], jax.random.PRNGKey(cfg.seed + 1))
    return {"final_val": hist["val"][-1], "test_mse": ev["mse"],
            "test_mae": ev["mae"]}


def run_timemmd(cfg, out_dir, plots):
    from fetode_tpu.data.paths import locate
    from fetode_tpu.data.timeseries import load_timemmd_csv, synthetic_series
    from fetode_tpu.models.forecasting import DiffusionForecasterSpec
    from fetode_tpu.train.forecast_driver import (ForecastRun,
                                                  train_diffusion_forecaster)

    csv = locate(f"../Time_MMD/numerical/{cfg.domain}/{cfg.domain}.csv") or \
        locate(f"Time_MMD/numerical/{cfg.domain}/{cfg.domain}.csv")
    if csv:
        X, y, df = load_timemmd_csv(csv, target_col="OT")
        if cfg.multimodal:
            from fetode_tpu.data.multimodal import fuse_features
            if "text" in df.columns:
                n_train = int(len(X) * 0.7)
                X, _ = fuse_features(X, df["text"].tolist(), n_train,
                                     embed_dim=cfg.text_embed_dim,
                                     max_features=cfg.tfidf_max_features)
    else:
        print(f"Time-MMD {cfg.domain} csv not found; using synthetic stand-in")
        # n=1200 keeps every chronological split (10% val) longer than
        # the preset's context_len+pred_len window (50+12).
        X, y = synthetic_series(n=1200, n_features=4)
        if cfg.multimodal:
            # Synthetic report texts so the TF-IDF+SVD fusion path is
            # exercised end to end even without the real dataset.
            from fetode_tpu.data.multimodal import fuse_features
            texts = [f"report level {int(v * 7) % 11} trend "
                     f"{'up' if i % 3 else 'down'}" for i, v in enumerate(y)]
            X, _ = fuse_features(X, texts, int(len(X) * 0.7),
                                 embed_dim=cfg.text_embed_dim,
                                 max_features=cfg.tfidf_max_features)

    run = ForecastRun(context_len=cfg.context_len, pred_len=cfg.pred_len,
                      batch_size=cfg.batch_size, epochs=cfg.epochs, lr=cfg.lr,
                      seed=cfg.seed, mesh_devices=cfg.mesh_devices,
                      mesh_model=cfg.mesh_model, ckpt_dir=cfg.ckpt_dir,
                      ckpt_every=cfg.ckpt_every, resume=cfg.resume,
                      aot_cache=cfg.aot_cache)
    spec = DiffusionForecasterSpec(num_features=X.shape[1],
                                   context_len=cfg.context_len,
                                   pred_len=cfg.pred_len, encoder="kanrnn")
    params, hist = train_diffusion_forecaster(spec, X, y, run)
    return {"test_mse": hist["test_mse"]}


def run_symbolic(cfg, out_dir, plots):
    """The reference's symbolic-regression demo (smooth_test_KAN_ferro.py):
    fit y = sin x + 0.1 x^2 with a 2-layer ferro-KAN, save the trained
    params (its `torch.save` of KAN_ferro_SR_trained.pth) and, with
    --plots, the per-basis P-E hysteresis loops it visualises."""
    import numpy as np

    from fetode_tpu.models.symbolic import SymbolicNetSpec, train_symbolic

    spec = SymbolicNetSpec(hidden=cfg.hidden, num_basis=cfg.num_basis,
                           l1_coef=cfg.l1_coef)
    params, losses = train_symbolic(spec, epochs=cfg.epochs, lr=cfg.lr,
                                    n_points=cfg.n_points, seed=cfg.seed,
                                    log=lambda m: print(m, flush=True))
    np.savez(os.path.join(out_dir, "symbolic_trained.npz"),
             **{f"{layer}.{k}": np.asarray(v)
                for layer, d in params.items() for k, v in d.items()})
    if plots:
        from fetode_tpu.diag.hysteresis import plot_loops
        from fetode_tpu.diag.plots import plot_losses
        from fetode_tpu.ops.ferro import FerroParams

        plot_losses({"loss": losses}, os.path.join(out_dir, "loss.png"))
        for name, cfg_l in (("l1", spec.l1_cfg), ("l2", spec.l2_cfg)):
            plot_loops(FerroParams(**params[name]), cfg_l,
                       os.path.join(out_dir, "hysteresis"),
                       max_panels=6, prefix=name)
    return {"final_loss": float(losses[-1]) if len(losses) else None,
            "initial_loss": float(losses[0]) if len(losses) else None}


def run_mnist(cfg, out_dir, plots):
    import jax
    import jax.numpy as jnp
    import optax

    from fetode_tpu.data.mnist import load_mnist, synthetic_digits
    from fetode_tpu.models.kuramoto import (KuramotoSpec, kuramoto_init,
                                            kuramoto_kan_apply)
    from fetode_tpu.train.loop import init_state, make_minibatch_epoch
    from fetode_tpu.train.optim import make_optimizer

    try:
        x_train, y_train = load_mnist("train")
        x_test, y_test = load_mnist("test")
    except FileNotFoundError:
        try:
            # The reference snapshot ships only the t10k images; use a
            # documented 80/20 split of the REAL test set rather than
            # falling back to synthetic digits.
            x_all, y_all = load_mnist("test")
            n_tr = int(0.8 * len(x_all))
            x_train, y_train = x_all[:n_tr], y_all[:n_tr]
            x_test, y_test = x_all[n_tr:], y_all[n_tr:]
            print(f"MNIST train images not found; using a {n_tr}/"
                  f"{len(x_all) - n_tr} split of the real t10k set")
        except FileNotFoundError:
            print("MNIST files not found; using synthetic digits")
            x_train, y_train = synthetic_digits(n=512)
            x_test, y_test = synthetic_digits(seed=1, n=128)

    rollout = cfg.rollout
    if rollout == "auto":
        # TPU-first default: the whole-rollout kernel measures 1.5-1.6x
        # the scan on v5e (BASELINE.md Kuramoto rows); off-TPU the kernel
        # would run in interpret mode, so the scan is the right default.
        rollout = "pallas" if jax.default_backend() == "tpu" else "scan"
    spec = KuramotoSpec(H=x_train.shape[1], W=x_train.shape[2],
                        steps=cfg.kuramoto_steps, dt=cfg.dt,
                        num_basis=cfg.num_basis, rollout=rollout)
    params = kuramoto_init(jax.random.PRNGKey(cfg.seed), spec)
    _shard = lambda tree, batch_axis: tree       # noqa: E731
    if cfg.mesh_devices:
        from fetode_tpu.parallel import (make_mesh, model_param_specs,
                                         shard_batch_leaves, shard_params)

        mesh = make_mesh(cfg.mesh_devices, model=cfg.mesh_model)
        specs = (model_param_specs(params, mesh)
                 if cfg.mesh_model > 1 else None)
        params = shard_params(params, mesh, specs)
        _shard = lambda tree, batch_axis: shard_batch_leaves(  # noqa: E731
            tree, mesh, batch_axis=batch_axis)
    tx = make_optimizer(cfg.lr, kind="adamw", weight_decay=1e-4, params=params)
    state = init_state(params, tx)

    def loss_fn(p, x, y):
        logits = kuramoto_kan_apply(p, spec, x)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    epoch_fn = make_minibatch_epoch(loss_fn, tx)

    import numpy as np

    def eval_acc(p):
        logits = kuramoto_kan_apply(p, spec, jnp.asarray(x_test))
        return float((jnp.argmax(logits, -1) == jnp.asarray(y_test)).mean())

    bs = min(cfg.batch_size, len(x_train))
    acc = None
    for ep in range(cfg.epochs):
        rng = np.random.default_rng(cfg.seed + ep)
        idx = rng.permutation(len(x_train))[: (len(x_train) // bs) * bs]
        bx = x_train[idx].reshape(-1, bs, *x_train.shape[1:])
        by = y_train[idx].reshape(-1, bs)
        state, losses = epoch_fn(
            state, _shard((jnp.asarray(bx), jnp.asarray(by)), 1))
        acc = eval_acc(state.params)
        print(f"epoch {ep}: loss {float(losses.mean()):.4f} test acc {acc:.4f}")
    if acc is None:  # epochs == 0: report untrained accuracy
        acc = eval_acc(state.params)
    return {"test_acc": acc}


def _serve_ckpt_params(ckpt_dir):
    """best_params from a DurableLoop checkpoint (raw orbax restore)."""
    from fetode_tpu.train.checkpoint import CheckpointManager

    saved = CheckpointManager(ckpt_dir).restore()
    for keys in (("best_params",), ("state", "params")):
        node = saved
        try:
            for k in keys:
                node = node[k]
            return node
        except (KeyError, TypeError):
            continue
    raise ValueError(f"no params found in checkpoint at {ckpt_dir!r} "
                     f"(top-level keys: {list(saved)})")


def run_serve(cfg, out_dir, plots):
    """Export a serving bundle (AOT executables per bucket) and bench it."""
    import jax
    import jax.numpy as jnp

    from fetode_tpu.serve import export_servable, load_servable, serve_bench

    key = jax.random.PRNGKey(cfg.seed)
    if cfg.source == "ecg":
        from fetode_tpu.models import ecg as M

        spec = M.KanFetNODESpec(T=cfg.t_len, latent_dim=cfg.latent_dim,
                                num_basis=cfg.num_basis, rtol=cfg.rtol,
                                atol=cfg.atol, field=cfg.field,
                                solver_mode=cfg.solver_mode)
        params = M.kanfet_node_init(key, spec)
        fn = lambda p, x: M.kanfet_node_apply(p, spec, x)
        example = jnp.zeros((1, cfg.t_len), jnp.float32)
    elif cfg.source == "ett":
        from fetode_tpu.models.forecasting import (
            LatentODEForecasterSpec,
            latent_ode_forecast,
            latent_ode_forecaster_init,
        )

        spec = LatentODEForecasterSpec(num_features=cfg.num_features,
                                       context_len=cfg.context_len,
                                       pred_len=cfg.pred_len,
                                       latent_dim=cfg.latent_dim)
        params = latent_ode_forecaster_init(key, spec)
        fn = lambda p, x: latent_ode_forecast(p, spec, x)
        example = jnp.zeros((1, cfg.context_len, cfg.num_features),
                            jnp.float32)
    elif cfg.source == "predprey":
        from fetode_tpu.models.predprey import (PredPreyNODE, predict,
                                                predprey_init)

        spec = PredPreyNODE.kanfet()
        params = predprey_init(key, spec)
        ts = jnp.linspace(0.0, cfg.horizon, cfg.n_points, dtype=jnp.float32)
        if cfg.solver_mode == "pallas":
            # Batched whole-solve inference kernel (ops/pallas_node.py,
            # 140.8k traj/s at B=2048) — the production serving path.
            from fetode_tpu.ops.pallas_node import pallas_kanfet_solve

            fn = lambda p, x0s: pallas_kanfet_solve(
                p, spec.kan, x0s, ts, rtol=spec.rtol, atol=spec.atol,
                max_steps=spec.max_steps)
        else:
            eval_spec = spec._replace(solver_mode=cfg.solver_mode)
            fn = lambda p, x0s: jax.vmap(
                lambda x0: predict(p, eval_spec, x0, ts))(x0s)
        example = jnp.ones((1, 2), jnp.float32)
    elif cfg.source == "ddpm":
        # The production diffusion eval path: n-sample averaged reverse
        # chains through the whole-chain Pallas kernel (ops/pallas_ddpm.py,
        # folded multi-sample; 92-120k samples/s on v5e) — the reference's
        # worst self-reported hotspot runs val sampling per train step
        # (kan_diffusion_ett.py:749).  Serving PRNG is fixed: the bundle's
        # forecast is the deterministic n_samples Monte-Carlo mean.
        from fetode_tpu.models.forecasting import (
            DiffusionForecasterSpec,
            diffusion_forecaster_init,
            diffusion_forecaster_sample,
        )
        from fetode_tpu.nn.diffusion import make_schedule

        spec = DiffusionForecasterSpec(num_features=cfg.num_features,
                                       context_len=cfg.context_len,
                                       pred_len=cfg.pred_len,
                                       latent_dim=cfg.latent_dim)
        sched = make_schedule(cfg.diff_t)
        params = diffusion_forecaster_init(key, spec)
        sample_key = jax.random.PRNGKey(cfg.seed + 1)
        fn = lambda p, x: diffusion_forecaster_sample(
            p, spec, sched, x, sample_key, n_samples=cfg.n_samples).mean(0)
        example = jnp.zeros((1, cfg.context_len, cfg.num_features),
                            jnp.float32)
    elif cfg.source == "cond_diffusion":
        # Conditional-diffusion forecaster (kan_diffusion_ett.py family):
        # n-sample averaged reverse chains with the past conditioning
        # hoisted OUT of the chain (the reference re-encodes inside every
        # denoiser call, kan_diffusion_ett.py:432-444).  Deterministic
        # Monte-Carlo-mean forecast under a fixed serving PRNG.
        from fetode_tpu.models.cond_diffusion import (cond_denoiser_init,
                                                      make_denoiser_spec)
        from fetode_tpu.nn.diffusion import make_schedule
        from fetode_tpu.train.cond_diffusion_driver import sample_forecasts

        spec = make_denoiser_spec(cfg.denoiser, d_in=cfg.num_features,
                                  pred_len=cfg.pred_len,
                                  seq_len=cfg.context_len)
        sched = make_schedule(cfg.diff_t)
        params = cond_denoiser_init(key, spec)
        sample_key = jax.random.PRNGKey(cfg.seed + 1)
        fn = lambda p, past: sample_forecasts(
            p, spec, sched, past, sample_key,
            n_samples=cfg.n_samples).mean(0)
        example = jnp.zeros((1, cfg.context_len, cfg.num_features),
                            jnp.float32)
    elif cfg.source == "mnist":
        from fetode_tpu.models.kuramoto import (KuramotoSpec, kuramoto_init,
                                                kuramoto_kan_apply)

        spec = KuramotoSpec(rollout=cfg.rollout)
        params = kuramoto_init(key, spec)
        fn = lambda p, x: kuramoto_kan_apply(p, spec, x)
        example = jnp.zeros((1, spec.H, spec.W), jnp.float32)
    else:
        raise ValueError(f"unknown serve source {cfg.source!r}")

    if cfg.ckpt_dir:
        params = _serve_ckpt_params(cfg.ckpt_dir)
        print(f"serving params restored from {cfg.ckpt_dir}")

    bundle = cfg.bundle_dir or os.path.join(out_dir, "bundle")
    import time

    t0 = time.perf_counter()
    meta = export_servable(bundle, fn, params, example, buckets=cfg.buckets)
    export_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sv = load_servable(bundle)
    load_s = time.perf_counter() - t0
    print(f"bundle {bundle}: export {export_s:.1f}s (compiles included), "
          f"load {load_s:.2f}s (compile-free)")

    bench = []
    for b in meta["buckets"]:
        x = jnp.broadcast_to(example, (b,) + example.shape[1:])
        row = serve_bench(sv, x, iters=cfg.iters)
        print(f"  bucket {b}: p50 {row['p50_ms']:.2f} ms  "
              f"p99 {row['p99_ms']:.2f} ms  "
              f"{row['throughput_sps']:.0f} samples/s")
        bench.append(row)
    return {"source": cfg.source, "bundle": bundle,
            "buckets": meta["buckets"], "export_s": export_s,
            "load_s": load_s, "bench": bench}


RUNNERS = {
    "predprey": run_predprey,
    "ecg": run_ecg,
    "ett": run_ett,
    "cond_diffusion": run_cond_diffusion,
    "timemmd": run_timemmd,
    "mnist": run_mnist,
    "symbolic": run_symbolic,
    "serve": run_serve,
}


def main(argv=None):
    from fetode_tpu.config import make_config

    args, overrides = _parse(argv if argv is not None else sys.argv[1:])
    cfg = make_config(args.workload, overrides)
    if args.mesh and not hasattr(cfg, "mesh_devices"):
        raise SystemExit(f"--mesh is not supported by the "
                         f"{args.workload!r} workload")
    os.makedirs(args.out_dir, exist_ok=True)
    print(f"workload={args.workload} config={cfg}")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from fetode_tpu.utils.debug import device_init_watchdog, enable_compile_cache

    enable_compile_cache()
    disarm = device_init_watchdog(
        float(os.environ.get("FETODE_DEVICE_TIMEOUT", "300")))
    jax.devices()
    disarm()
    if args.mesh:
        from fetode_tpu.parallel import parse_mesh_flag

        cfg.mesh_devices, cfg.mesh_model = parse_mesh_flag(args.mesh)
        print(f"mesh: {cfg.mesh_devices} devices "
              f"(model axis {cfg.mesh_model})")
    result = RUNNERS[args.workload](cfg, args.out_dir, args.plots)
    with open(os.path.join(args.out_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return result


def console_main(argv=None):
    """Console-script entry (`fetode` on PATH): setuptools wraps the
    target in ``sys.exit(...)``, so returning :func:`main`'s result dict
    would turn every successful run into exit code 1."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
