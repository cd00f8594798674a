"""CLI smoke tests for the remaining workloads (synthetic data paths)."""

import os

import numpy as np
import pytest

from fetode_tpu.cli import main


def test_cli_ecg_noise_study(tmp_path):
    """--model noise_study: the clean-vs-noisy grid as one vmapped
    population dispatch (rk4 keeps the vmapped-program compile small)."""
    r = main(["ecg", "--out-dir", str(tmp_path), "--model", "noise_study",
              "--solver", "rk4", "--epochs", "2", "--epochs-per-call", "2",
              "--latent-dim", "8", "--num-basis", "4",
              "--noise-stds", "0,0.2", "--noise-seeds", "0"])
    study = r["noise_study"]
    assert set(study) == {"0.0", "0.2"}
    for row in study.values():
        assert 0.0 <= row["mean_best_test_acc"] <= 1.0
    assert os.path.exists(tmp_path / "noise_study.json")


def test_cli_ett_point(tmp_path):
    r = main(["ett", "--out-dir", str(tmp_path), "--dataset", "nonexistent",
              "--model", "point", "--context-len", "12", "--pred-len", "4",
              "--epochs", "2", "--batch-size", "32", "--latent-dim", "8"])
    assert np.isfinite(r["test_mse"])


def test_cli_ett_diffusion(tmp_path):
    r = main(["ett", "--out-dir", str(tmp_path), "--dataset", "nonexistent",
              "--model", "kan_fet_diffusion", "--context-len", "12",
              "--pred-len", "4", "--epochs", "1", "--batch-size", "32",
              "--latent-dim", "8", "--diff-t", "4", "--eval-samples", "2"])
    assert np.isfinite(r["test_mse"])


def test_cli_cond_diffusion(tmp_path):
    r = main(["cond_diffusion", "--out-dir", str(tmp_path),
              "--dataset", "nonexistent", "--denoiser", "mlp",
              "--seq-len", "12", "--pred-len", "4", "--diff-t", "4",
              "--epochs", "1", "--batch-size", "32"])
    assert np.isfinite(r["final_val"])


def test_cli_timemmd_synthetic(tmp_path):
    r = main(["timemmd", "--out-dir", str(tmp_path), "--domain", "Nonexistent",
              "--context-len", "10", "--pred-len", "3", "--epochs", "1",
              "--batch-size", "32"])
    assert np.isfinite(r["test_mse"])


@pytest.mark.slow
def test_cli_mnist_synthetic(tmp_path):
    r = main(["mnist", "--out-dir", str(tmp_path), "--epochs", "1",
              "--kuramoto-steps", "2", "--batch-size", "64",
              "--num-basis", "3"])
    assert 0.0 <= r["test_acc"] <= 1.0
    # --mesh rides the same runner (virtual-8 data-parallel)
    r8 = main(["mnist", "--out-dir", str(tmp_path), "--epochs", "1",
               "--kuramoto-steps", "2", "--batch-size", "64",
               "--num-basis", "3", "--mesh", "8"])
    np.testing.assert_allclose(r8["test_acc"], r["test_acc"])
    # boolean-style flag parsing (regression for the silent-drop bug)
    from fetode_tpu.cli import _parse

    args, ov = _parse(["timemmd", "--multimodal", "--epochs", "5"])
    assert ov == {"multimodal": "true", "epochs": "5"}


def test_cli_timemmd_multimodal_synthetic(tmp_path):
    """--multimodal on the synthetic fallback exercises TF-IDF+SVD fusion
    end to end (synthetic report texts)."""
    r = main(["timemmd", "--out-dir", str(tmp_path), "--domain", "Nonexistent",
              "--multimodal", "true", "--context-len", "10", "--pred-len", "3",
              "--text-embed-dim", "3", "--epochs", "1", "--batch-size", "32"])
    assert np.isfinite(r["test_mse"])


def test_cli_serve_ett(tmp_path):
    r = main(["serve", "--out-dir", str(tmp_path), "--source", "ett",
              "--buckets", "8", "--iters", "2", "--context-len", "12",
              "--pred-len", "4", "--latent-dim", "8", "--num-features", "3"])
    assert r["buckets"] == [8]
    assert os.path.exists(os.path.join(r["bundle"], "meta.json"))
    assert r["bench"][0]["p50_ms"] > 0


def test_cli_serve_ddpm(tmp_path):
    """The diffusion sampler (whole-chain kernel, n-sample mean) serves —
    the reference's worst hotspot gets a serving row (round-3 verdict 7)."""
    r = main(["serve", "--out-dir", str(tmp_path), "--source", "ddpm",
              "--buckets", "8", "--iters", "2", "--context-len", "12",
              "--pred-len", "4", "--latent-dim", "8", "--num-features", "3",
              "--n-samples", "2", "--diff-t", "8"])
    assert r["source"] == "ddpm" and r["bench"][0]["throughput_sps"] > 0
    assert os.path.exists(os.path.join(r["bundle"], "meta.json"))


def test_cli_serve_cond_diffusion(tmp_path):
    """Conditional-diffusion forecaster serves (hoisted conditioning,
    n-sample Monte-Carlo-mean forecast)."""
    r = main(["serve", "--out-dir", str(tmp_path), "--source",
              "cond_diffusion", "--denoiser", "mlp", "--buckets", "8",
              "--iters", "2", "--context-len", "12", "--pred-len", "4",
              "--num-features", "3", "--n-samples", "2", "--diff-t", "8"])
    assert r["source"] == "cond_diffusion"
    assert r["bench"][0]["throughput_sps"] > 0
    assert os.path.exists(os.path.join(r["bundle"], "meta.json"))


def test_cli_serve_cond_diffusion_kan(tmp_path):
    """The kan-net denoiser serves through the additive-hoisted chain
    (cond_denoiser_kan_sample_loop routes inside sample_forecasts)."""
    r = main(["serve", "--out-dir", str(tmp_path), "--source",
              "cond_diffusion", "--denoiser", "kan", "--buckets", "8",
              "--iters", "2", "--context-len", "12", "--pred-len", "4",
              "--num-features", "3", "--n-samples", "2", "--diff-t", "8"])
    assert r["source"] == "cond_diffusion"
    assert r["bench"][0]["throughput_sps"] > 0


def test_cli_serve_mnist(tmp_path):
    """Kuramoto classifier serves through the fused rollout+head kernel
    (interpret mode on CPU)."""
    r = main(["serve", "--out-dir", str(tmp_path), "--source", "mnist",
              "--buckets", "8", "--iters", "2"])
    assert r["source"] == "mnist" and r["bench"][0]["p50_ms"] > 0


@pytest.mark.slow
def test_cli_serve_predprey_from_ckpt(tmp_path):
    ck = str(tmp_path / "ck")
    main(["predprey", "--out-dir", str(tmp_path / "train"), "--epochs", "20",
          "--epochs-per-call", "10", "--max-steps", "16", "--method", "rk4",
          "--ckpt-dir", ck, "--ckpt-every", "10"])
    r = main(["serve", "--out-dir", str(tmp_path / "serve"),
              "--source", "predprey", "--buckets", "8", "--iters", "2",
              "--n-points", "5", "--ckpt-dir", ck])
    assert r["source"] == "predprey" and r["bench"][0]["throughput_sps"] > 0
