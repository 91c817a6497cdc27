#!/usr/bin/env python3
"""SWEEP_r05.json — decode-rate curves at UNTOUCHED r5 serving defaults.

VERDICT r4 item 1's done-criterion: the all-device engine at pure
``with_serving_defaults`` (no hand-sized caps) must match the hybrid
engine point-for-point at every SNR, with zero Fano overflow — the r5
never-drop chunked Fano (jit_decoder._compact_fano) replaces the r4
fano_compact_lanes=2048 hand sizing. Also covered:

  hybrid_serving    device pre-Fano pipeline + native host Fano (the
                    parity oracle; host Fano never had a lane cap)
  device_serving    all-device engine, untouched serving defaults
                    (2x-batch caps + chunked never-drop Fano)
  wideband_device   halfbandwidth=187 full passband at the r5 wideband
                    serving defaults (16x-batch caps, bounded 512) —
                    all-device, single-signal scene

Trial windows are identical across curves (same seed). Run on TPU:

    nohup timeout 14400 python scripts/sweep_r05_artifact.py &
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402,F401

from uwspr_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402

from uwspr_tpu.config import (  # noqa: E402
    CoarseConfig,
    PipelineConfig,
    with_serving_defaults,
)
from uwspr_tpu.pipeline.sweep import snr_sweep  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parents[1]
TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 50
SNRS = list(range(-15, -32, -1))


def main():
    nb = with_serving_defaults(PipelineConfig(), TRIALS)
    wb = with_serving_defaults(
        PipelineConfig(coarse=CoarseConfig(halfbandwidth=187,
                                           maxfreqs=200)), TRIALS)
    curves = {}
    for name, engine, cfg in [
        ("hybrid_serving", "hybrid", nb),
        ("device_serving", "device", nb),
        ("wideband_device", "device", wb),
    ]:
        t0 = time.time()
        print(f"--- {name} ({engine}) ---", file=sys.stderr, flush=True)
        r = snr_sweep(SNRS, trials=TRIALS, engine=engine, seed=1,
                      config=cfg,
                      progress=lambda s, t, ok: print(
                          f"  snr={s} trial={t} ok={ok}",
                          file=sys.stderr, flush=True)
                      if t == TRIALS - 1 else None)
        curves[name] = {
            "engine": engine,
            "halfbandwidth": cfg.coarse.halfbandwidth,
            "stft_impl": cfg.coarse.stft_impl,
            "demod": {
                "probe_dtype": cfg.demod.probe_dtype,
                "cand_compact_lanes": cfg.demod.cand_compact_lanes,
                "refine_max_lanes": cfg.demod.refine_max_lanes,
                "fano_compact_lanes": cfg.demod.fano_compact_lanes,
                "fano_impl": cfg.demod.fano_impl,
            },
            "decode_rate": r.as_dict(),
            "seconds": round(time.time() - t0, 1),
        }
        print(json.dumps(curves[name]["decode_rate"]), file=sys.stderr,
              flush=True)

    dev = curves["device_serving"]["decode_rate"]
    hyb = curves["hybrid_serving"]["decode_rate"]
    art = {
        "harness": "scripts/sweep_r05_artifact.py",
        "trials": TRIALS,
        "seed": 1,
        "backend": jax.default_backend(),
        "callsign": "VE3EMB", "grid": "FN25", "power": 30,
        "snr_convention": "2500 Hz reference bandwidth",
        "randomized": "freq offset +/-5 Hz, start 0..2 s per trial",
        "serving_config": "UNTOUCHED config.with_serving_defaults (r5: "
                          "column-windowed matmul_bf16 STFT, bf16 probes, "
                          "2x-batch compaction caps, chunked NEVER-DROP "
                          "Fano; wideband 16x-batch caps bounded 512)",
        "device_matches_hybrid": dev == hyb,
        "reference_floor": "reference practical floor ~-28 dB "
                           "(-7 dB in 6 Hz WSPR bandwidth, "
                           "lib/FDR_impl.cc:134-137)",
        "curves": curves,
    }
    out = ROOT / "SWEEP_r05.json"
    out.write_text(json.dumps(art, indent=1) + "\n")
    print(f"wrote {out}; device_matches_hybrid={art['device_matches_hybrid']}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
