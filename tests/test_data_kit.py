"""Tests for the Informer-style data kit, time features, metrics,
and the multimodal text-fusion pipeline."""

import os

import numpy as np
import pandas as pd
import pytest

from fetode_tpu.data import (
    assert_feature_dim,
    dataset_custom,
    dataset_ett_hour,
    dataset_pred,
    fuse_features,
    merge_with_text,
    metric,
    time_features,
)

HAVE_ETT = os.path.exists("/root/reference/data/ETT/ETTh1.csv")


def _toy_frame(n=400, freq="h"):
    dates = pd.date_range("2020-01-01", periods=n, freq=freq)
    rng = np.random.default_rng(0)
    return pd.DataFrame({
        "date": dates,
        "A": np.sin(np.arange(n) / 24),
        "B": rng.standard_normal(n),
        "OT": np.cos(np.arange(n) / 24),
    })


def test_time_features_modes():
    df = _toy_frame(48)[["date"]]
    f0 = time_features(df, timeenc=0, freq="h")
    f1 = time_features(df, timeenc=1, freq="h")
    assert f0.shape == (48, 4)
    assert f1.shape == (48, 4)
    assert f1.min() >= -0.5 and f1.max() <= 0.5
    # raw mode hours are integers 0..23
    assert set(np.unique(f0[:, 3])) <= set(range(24))


def test_dataset_custom_windows():
    df = _toy_frame(400)
    win, scaler = dataset_custom(flag="train", size=(48, 12, 12),
                                 features="S", target="OT", df_raw=df)
    assert win.seq_x.shape[1:] == (48, 1)
    assert win.seq_y.shape[1:] == (24, 1)       # label 12 + pred 12
    assert win.seq_x_mark.shape[1:] == (48, 4)
    # label part of seq_y overlaps the tail of seq_x
    np.testing.assert_allclose(win.seq_y[0, :12, 0], win.seq_x[0, -12:, 0],
                               atol=1e-6)
    # val split is shorter
    win_val, _ = dataset_custom(flag="val", size=(48, 12, 12), features="S",
                                target="OT", df_raw=df)
    assert len(win_val.seq_x) < len(win.seq_x)


def test_dataset_pred_tail_window():
    df = _toy_frame(300)
    seq_x, sxm, sym, scaler = dataset_pred(size=(48, 12, 12), features="S",
                                           target="OT", df_raw=df)
    assert seq_x.shape == (1, 48, 1)
    assert sym.shape[1] == 12 + 12


@pytest.mark.skipif(not HAVE_ETT, reason="ETTh1.csv not available")
def test_dataset_ett_hour_real():
    win, scaler = dataset_ett_hour(flag="train", size=(96, 48, 24),
                                   features="M")
    assert win.seq_x.shape[1:] == (96, 7)
    assert len(win.seq_x) == 12 * 30 * 24 - 96 - 24 + 1
    win_te, _ = dataset_ett_hour(flag="test", size=(96, 48, 24), features="M")
    assert len(win_te.seq_x) == 4 * 30 * 24 - 24 + 1


def test_metrics_sane():
    pred = np.asarray([[1.0, 2.0], [3.0, 4.0]])
    true = np.asarray([[1.0, 2.0], [3.0, 5.0]])
    m = metric(pred, true)
    assert m[0] == pytest.approx(0.25)      # MAE
    assert m[1] == pytest.approx(0.25)      # MSE
    assert np.isfinite(m).all()


def test_multimodal_fusion_pipeline():
    n = 60
    dates = pd.date_range("2021-01-01", periods=n, freq="W")
    numeric = pd.DataFrame({
        "start_date": dates,
        "end_date": dates + pd.Timedelta(days=6),
        "OT": np.sin(np.arange(n) / 5.0),
        "val": np.arange(n, dtype=float),
    })
    texts = pd.DataFrame({
        "start_date": dates,
        "end_date": dates + pd.Timedelta(days=6),
        "fact": [f"heavy drought week {i} in region alpha" for i in range(n)],
        "preds": [f"forecast says rain {i}" for i in range(n)],
    })
    merged = merge_with_text(numeric, texts, texts)
    assert "text" in merged.columns and len(merged) == n
    assert merged["text"].str.contains("REPORT_FACT").all()

    X_num = merged[["OT", "val"]].values.astype(np.float32)
    X, aux = fuse_features(X_num, merged["text"].tolist(), train_end=40,
                           embed_dim=5)
    assert X.shape == (n, 2 + 5)
    assert np.isfinite(X).all()

    assert_feature_dim(7, X)
    with pytest.raises(ValueError):
        assert_feature_dim(9, X)


def test_dataset_ett_minute_borders(tmp_path):
    """Minute-level Informer borders are 4x the hour borders (15-min
    sampling: 12/4/4 month splits, data_loader.py:101-185); exercised on
    a synthetic ETTm-sized frame since ETTm1.csv is absent here."""
    import pandas as pd

    from fetode_tpu.data.informer import dataset_ett_minute

    n = (12 * 30 * 24 + 8 * 30 * 24) * 4          # test-border end
    dates = pd.date_range("2016-07-01", periods=n, freq="15min")
    rng = np.random.default_rng(0)
    df = pd.DataFrame({"date": dates.astype(str),
                       "feat": rng.normal(size=n).astype(np.float32),
                       "OT": rng.normal(size=n).astype(np.float32)})
    csv = tmp_path / "ETTm1.csv"
    df.to_csv(csv, index=False)

    win, scaler = dataset_ett_minute(flag="train", size=(16, 8, 8),
                                     data_path=str(csv))
    assert len(win.seq_x) == 12 * 30 * 24 * 4 - 16 - 8 + 1
    assert win.seq_x.shape[1:] == (16, 1)          # 'S' mode: target only
    win_te, _ = dataset_ett_minute(flag="test", size=(16, 8, 8),
                                   data_path=str(csv))
    assert len(win_te.seq_x) == 4 * 30 * 24 * 4 - 8 + 1
    # scaler fit on the train slice only
    tr = df["OT"].values[: 12 * 30 * 24 * 4].astype(np.float32)
    np.testing.assert_allclose(float(scaler.mu.ravel()[-1]), tr.mean(),
                               atol=1e-4)


def test_cubic_hermite_exact_on_cubics():
    """The Hermite interpolant must reproduce a cubic exactly from
    endpoint values + slopes."""
    from fetode_tpu.ops.interp import cubic_hermite

    def f(t):
        return 2.0 * t ** 3 - t ** 2 + 3.0 * t - 1.0

    def fp(t):
        return 6.0 * t ** 2 - 2.0 * t + 3.0

    t0, t1 = 0.5, 2.0
    for t in (0.5, 0.9, 1.3, 2.0):
        out = cubic_hermite(t0, f(t0), fp(t0), t1, f(t1), fp(t1), t)
        np.testing.assert_allclose(float(out), f(t), rtol=1e-6)


def test_plot_model_comparison(tmp_path):
    from fetode_tpu.diag.plots import plot_model_comparison

    out = str(tmp_path / "cmp.png")
    plot_model_comparison({"a": [1.0, 0.5], "b": [0.9, 0.4]}, out)
    import os
    assert os.path.exists(out)


def test_masking_parity_with_torch_formulas():
    """causal_mask / prob_mask match the reference's torch constructions
    (data/utils/masking.py:3-24) bit-for-bit."""
    import torch

    from fetode_tpu.data import apply_mask, causal_mask, prob_mask

    B, H, L, n_top = 2, 3, 7, 4
    ref_causal = torch.triu(torch.ones([B, 1, L, L], dtype=torch.bool),
                            diagonal=1).numpy()
    np.testing.assert_array_equal(np.asarray(causal_mask(B, L)), ref_causal)

    rng = np.random.default_rng(0)
    index_np = rng.integers(0, L, size=(B, H, n_top))
    scores_np = rng.standard_normal((B, H, n_top, L)).astype(np.float32)
    index, scores = torch.as_tensor(index_np), torch.as_tensor(scores_np)
    _mask = torch.ones(L, scores.shape[-1], dtype=torch.bool).triu(1)
    _mask_ex = _mask[None, None, :].expand(B, H, L, scores.shape[-1])
    ref_prob = _mask_ex[torch.arange(B)[:, None, None],
                        torch.arange(H)[None, :, None],
                        index, :].view(scores.shape).numpy()
    ours = np.asarray(prob_mask(index_np, scores_np, L))
    np.testing.assert_array_equal(ours, ref_prob)

    filled = np.asarray(apply_mask(scores_np, ours))
    assert np.isneginf(filled[ours]).all()
    np.testing.assert_array_equal(filled[~ours], scores_np[~ours])
