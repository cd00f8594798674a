"""Native data-runtime tests: build, bindings, parity with numpy."""

import os

import numpy as np
import pytest

from fetode_tpu.data import native


def test_native_builds_and_loads():
    assert native.available(), "g++ build of the native runtime failed"
    assert os.path.exists(native._SO)


def test_parse_csv(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("date,a,b\n2020-01-01,1.5,2\nx,3.25,-4\n")
    arr = native.parse_csv(str(p))
    assert arr.shape == (2, 3)
    assert np.isnan(arr[0, 0]) and np.isnan(arr[1, 0])
    np.testing.assert_allclose(arr[:, 1:], [[1.5, 2], [3.25, -4]])


def test_window_gather_matches_numpy():
    X = np.random.default_rng(0).standard_normal((50, 4)).astype(np.float32)
    starts = np.asarray([0, 3, 17, 38], np.int64)
    out = native.window_gather(X, starts, ctx=12)
    ref = X[starts[:, None] + np.arange(12)[None, :]]
    np.testing.assert_allclose(out, ref)


def test_znorm_rows_matches_numpy():
    x = np.random.default_rng(1).standard_normal((8, 30)).astype(np.float32)
    out = native.znorm_rows(x)
    mu = x.mean(1, keepdims=True)
    sd = x.std(1, keepdims=True) + 1e-8
    np.testing.assert_allclose(out, (x - mu) / sd, atol=2e-5)


def test_shuffle_deterministic_permutation():
    a = native.shuffled_indices(100, seed=42)
    b = native.shuffled_indices(100, seed=42)
    c = native.shuffled_indices(100, seed=43)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert sorted(a.tolist()) == list(range(100))


@pytest.mark.skipif(not os.path.exists("/root/reference/data/ETT/ETTh1.csv"),
                    reason="ETTh1 not available")
def test_parse_csv_real_ett_matches_pandas():
    import pandas as pd

    path = "/root/reference/data/ETT/ETTh1.csv"
    arr = native.parse_csv(path)
    df = pd.read_csv(path)
    assert arr.shape == (len(df), len(df.columns))
    np.testing.assert_allclose(arr[:, 1:], df.values[:, 1:].astype(np.float32),
                               rtol=1e-5)
    assert np.isnan(arr[:, 0]).all()  # date column
