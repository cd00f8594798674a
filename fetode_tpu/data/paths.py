"""Dataset location resolution.

Nothing is vendored into this repo: loaders resolve files from
``$FETODE_DATA_DIR`` falling back to the read-only reference checkout's
``data/`` directory.  Synthetic generators are provided for tests and CI
so no workload hard-requires the files.
"""

from __future__ import annotations

import os

_DEFAULT_CANDIDATES = (
    os.environ.get("FETODE_DATA_DIR", ""),
    "/root/reference/data",
    os.path.join(os.path.dirname(__file__), "..", "..", "datasets"),
)


def locate(relpath: str) -> str | None:
    """Return the first existing path for ``relpath`` among the data roots."""
    for root in _DEFAULT_CANDIDATES:
        if not root:
            continue
        p = os.path.join(root, relpath)
        if os.path.exists(p):
            return p
    return None
