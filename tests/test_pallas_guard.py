"""One Pallas backend guard everywhere (VERDICT r4 item 6).

History: the interpret-mode guard was written ``jax.default_backend() ==
"cpu"`` in several kernel modules, so a non-cpu non-tpu backend (gpu)
took the compiled Mosaic TPU path and died in lowering with an opaque
error.  The single helper ``interpret_default()`` (`!= "tpu"`) replaces
every site; this test covers the gpu case and greps the package so a
regressed literal guard fails loudly.
"""

import os
import pathlib

import jax

from fetode_tpu.ops.pallas_node_common import interpret_default

OPS_DIR = pathlib.Path(__file__).resolve().parents[1] / "fetode_tpu"


def test_interpret_default_per_backend(monkeypatch):
    for backend, expect in [("cpu", True), ("gpu", True), ("tpu", False)]:
        monkeypatch.setattr(jax, "default_backend", lambda b=backend: b)
        assert interpret_default() is expect, backend


def test_no_literal_backend_guards_left():
    offenders = []
    for path in OPS_DIR.rglob("*.py"):
        text = path.read_text()
        for lineno, line in enumerate(text.splitlines(), 1):
            if ('default_backend() == "cpu"' in line
                    or "default_backend() == 'cpu'" in line):
                offenders.append(f"{path}:{lineno}")
            # interpret guards must go through the helper; "!= 'tpu'" is
            # only allowed in node_common itself (the helper's body)
            if (('default_backend() != "tpu"' in line
                 or "default_backend() != 'tpu'" in line)
                    and path.name != "pallas_node_common.py"):
                offenders.append(f"{path}:{lineno}")
    assert not offenders, offenders
