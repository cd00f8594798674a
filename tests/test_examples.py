"""Runnable examples (VERDICT r4 item 7): each example executes
end-to-end on CPU.  Subprocess-driven so the examples stay plain
scripts a user can copy."""

import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parents[1] / "examples"
ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu"}


def _run(name, *args, timeout=900):
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / name), *args],
        capture_output=True, text=True, timeout=timeout, env=ENV,
        cwd=EXAMPLES.parent)
    assert out.returncode == 0, (out.stdout[-800:], out.stderr[-2000:])
    return out.stdout


def test_example_files_exist():
    found = sorted(p.name for p in EXAMPLES.glob("*.py"))
    assert found == ["01_predprey_train_loop.py",
                     "02_custom_field_kernel.py",
                     "03_serving_bundle.py",
                     "04_custom_dataset_forecast.py"]


def test_predprey_train_loop_example():
    out = _run("01_predprey_train_loop.py", "30")
    assert "done:" in out


def test_custom_field_kernel_example():
    out = _run("02_custom_field_kernel.py")
    assert "forward + adjoint verified" in out


@pytest.mark.slow
def test_serving_bundle_example(tmp_path):
    out = _run("03_serving_bundle.py", str(tmp_path / "bundle"))
    assert "parity with in-process jit: OK" in out


@pytest.mark.slow
def test_custom_dataset_forecast_example():
    out = _run("04_custom_dataset_forecast.py")
    assert "test MSE" in out
