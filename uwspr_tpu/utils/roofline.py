"""Roofline/MFU accounting for compiled decode programs (SURVEY §7.1.9).

XLA's own HLO cost analysis supplies per-program FLOPs and HBM bytes
(``compiled.cost_analysis()``); dividing by a measured wall time and the
chip's peaks turns a stage time into an attribution — MXU-bound,
HBM-bound, or dispatch/latency-bound — so perf work aims at the actual
limiter. bench.py prints the whole-program line every run;
scripts/perf_stages_batch.py emits the per-stage breakdown.

Peaks are the public TPU v5e (v5 lite) numbers: 197 TFLOP/s bf16 MXU
(half for f32), 819 GB/s HBM.
"""

from __future__ import annotations

from dataclasses import dataclass

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9


@dataclass
class Roofline:
    flops: float                 # program total (XLA cost analysis)
    bytes_accessed: float
    seconds: float               # measured wall time per execution
    flops_per_s: float
    bytes_per_s: float
    mxu_util: float              # vs bf16 peak
    hbm_util: float
    bound: str                   # "MXU" | "HBM" | "dispatch/latency"

    def line(self) -> str:
        return (f"{self.flops / 1e9:.2f} GFLOP, "
                f"{self.bytes_accessed / 1e6:.1f} MB @ {self.seconds * 1e3:.2f} ms"
                f" -> {self.flops_per_s / 1e12:.2f} TFLOP/s "
                f"({self.mxu_util * 100:.1f}% MXU), "
                f"{self.bytes_per_s / 1e9:.1f} GB/s "
                f"({self.hbm_util * 100:.1f}% HBM) [{self.bound}-bound]")


def cost_of(compiled) -> tuple[float, float]:
    """(flops, bytes) from a jax compiled object (0.0 when the backend
    does not expose cost analysis, e.g. some remote runtimes)."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return 0.0, 0.0
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    if not ca:
        return 0.0, 0.0
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def analyze(flops: float, bytes_accessed: float, seconds: float,
            *, peak_flops: float = V5E_PEAK_BF16_FLOPS,
            peak_bytes: float = V5E_PEAK_HBM_BYTES) -> Roofline:
    """Classify a measured interval. 'bound' is the larger utilization;
    if both are under 10% the interval is dominated by neither — small
    ops, kernel launches, or serialized scalar work (dispatch/latency)."""
    fps = flops / max(seconds, 1e-12)
    bps = bytes_accessed / max(seconds, 1e-12)
    mxu = fps / peak_flops
    hbm = bps / peak_bytes
    if max(mxu, hbm) < 0.10:
        bound = "dispatch/latency"
    elif mxu >= hbm:
        bound = "MXU"
    else:
        bound = "HBM"
    return Roofline(flops, bytes_accessed, seconds, fps, bps, mxu, hbm,
                    bound)


__all__ = ["Roofline", "cost_of", "analyze",
           "V5E_PEAK_BF16_FLOPS", "V5E_PEAK_HBM_BYTES"]
