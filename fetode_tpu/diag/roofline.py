"""Roofline / MFU accounting for benchmark rows.

The reference publishes no performance numbers at all (SURVEY.md §0:
``README.md:1-3`` is two lines); BASELINE.md's rows previously reported
epochs/sec and ratios only, with compute-vs-bandwidth claims asserted
rather than quantified.  This module turns a timed bench row into a
roofline statement:

* **FLOPs / bytes per unit of work** — from XLA's own cost model
  (``Compiled.cost_analysis()``) for XLA-compiled programs, which counts
  exactly what the compiled program executes (including the masked
  wasted iterations of fixed-budget ``lax.scan`` solvers — the honest
  hardware-work number), or from a documented analytic estimate for
  Pallas whole-solve kernels (Mosaic custom calls are opaque to XLA's
  cost model, so their interiors report zero).
* **Achieved GFLOP/s and GB/s** — work per unit x measured units/sec.
* **% of chip peak** — against the published MXU bf16 peak and HBM
  bandwidth of the detected device generation (jax-ml.github.io/
  scaling-book numbers; f32 arithmetic runs below the bf16 MXU peak, so
  %-of-peak for f32-dominated rows is an optimistic upper bound on
  headroom, i.e. a conservative utilisation statement).
* **Bound classification** — ``compute`` / ``bandwidth`` by roofline
  position (arithmetic intensity vs the ridge point), demoted to
  ``latency`` when the achieved fraction of BOTH peaks is under 2%:
  tiny sequential ODE solves are limited by serial op latency and
  dispatch, not by either roofline resource, and claiming otherwise
  would be the exact overstatement this module exists to prevent.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

# Published per-chip peaks (dense matmul peak, HBM bandwidth).  Sources:
# the public "How to Scale Your Model" hardware tables / Google Cloud TPU
# system-architecture docs.  Keys are matched as substrings of
# jax.Device.device_kind (lowercased).
DEVICE_PEAKS = {
    "v5 lite": {"name": "TPU v5e", "peak_flops": 197e12,
                "peak_hbm_Bps": 819e9},
    "v5e": {"name": "TPU v5e", "peak_flops": 197e12, "peak_hbm_Bps": 819e9},
    "v5p": {"name": "TPU v5p", "peak_flops": 459e12, "peak_hbm_Bps": 2765e9},
    "v6 lite": {"name": "TPU v6e", "peak_flops": 918e12,
                "peak_hbm_Bps": 1640e9},
    "v6e": {"name": "TPU v6e", "peak_flops": 918e12, "peak_hbm_Bps": 1640e9},
    "v4": {"name": "TPU v4", "peak_flops": 275e12, "peak_hbm_Bps": 1228e9},
    "v3": {"name": "TPU v3", "peak_flops": 123e12, "peak_hbm_Bps": 900e9},
}

# Below this fraction of BOTH peaks the row is not meaningfully sitting
# on either roofline: serial dependencies / dispatch dominate.
_LATENCY_FRACTION = 0.02


def device_peaks(device=None) -> Optional[Dict[str, Any]]:
    """Peak table entry for ``device`` (default: jax.devices()[0]);
    None when unknown (e.g. CPU) — callers then report absolute numbers
    without %-of-peak."""
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", str(device)).lower()
    for key, peaks in DEVICE_PEAKS.items():
        if key in kind:
            return dict(peaks)
    return None


def xla_cost(compiled_or_jitted, *args) -> Dict[str, float]:
    """{'flops': f, 'bytes': b} for one invocation of a jitted function
    (XLA's cost model over the optimized HLO).  Pass either an already-
    ``.lower(...).compile()``-ed object (args ignored) or a jitted
    function plus its example args."""
    compiled = compiled_or_jitted
    if hasattr(compiled, "lower"):
        compiled = compiled.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):     # older jax returned [dict]
        ca = ca[0]
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0))}


def roofline_row(flops_per_unit: float, bytes_per_unit: float,
                 units_per_sec: float, *, device=None,
                 flop_source: str = "xla_cost_analysis") -> Dict[str, Any]:
    """One roofline record for a bench row.

    ``units_per_sec`` is the row's measured throughput in whatever unit
    the FLOP/byte counts are per (epochs, samples, trajectories...).
    """
    achieved_flops = flops_per_unit * units_per_sec
    achieved_Bps = bytes_per_unit * units_per_sec
    intensity = (flops_per_unit / bytes_per_unit) if bytes_per_unit else None
    row = {
        "flops_per_unit": flops_per_unit,
        "hbm_bytes_per_unit": bytes_per_unit,
        "achieved_gflops": round(achieved_flops / 1e9, 3),
        "achieved_gbps": round(achieved_Bps / 1e9, 3),
        "arithmetic_intensity_flops_per_byte":
            round(intensity, 3) if intensity is not None else None,
        "flop_source": flop_source,
    }
    peaks = device_peaks(device)
    if peaks is None:
        row["bound"] = "unknown (no peak table for this device)"
        return row
    pf = achieved_flops / peaks["peak_flops"]
    pb = achieved_Bps / peaks["peak_hbm_Bps"]
    ridge = peaks["peak_flops"] / peaks["peak_hbm_Bps"]
    row.update({
        "device": peaks["name"],
        "pct_peak_flops": round(100 * pf, 4),
        "pct_peak_hbm": round(100 * pb, 4),
        "ridge_flops_per_byte": round(ridge, 1),
    })
    if max(pf, pb) < _LATENCY_FRACTION:
        row["bound"] = ("latency (serial/dispatch dominated: "
                        f"<{100 * _LATENCY_FRACTION:.0f}% of both peaks)")
    elif intensity is not None and intensity < ridge:
        row["bound"] = "bandwidth"
    else:
        row["bound"] = "compute"
    return row
