#!/usr/bin/env python3
"""Deep-SNR decode/false-valid rates for the ALL-DEVICE engine
-> SWEEP_OSD_DEVICE_r04.json (judge r2 item 5).

The host-path artifact (SWEEP_OSD_r02.json) quantified the order-4 host
OSD; this one measures the serving path users actually get on TPU: the
batched DeviceDecoder with the on-device order-3 OSD rescue
(fec/osd_jax.py), quality screen osd_min_quality, and the host-egress
protocol-unpack re-screen in spots(). Per SNR point it reports

  fano_rate        device engine, osd_depth=0 (the reference algorithm)
  osd_rate         device engine, osd_depth=3 (on-device rescue)
  false_valid_rate windows where an OSD-tagged WRONG message survived
                   the egress unpack screen — the number consumers need
                   for known-callsign screening policy below -30 dB

All trials of one SNR point decode as ONE batched device program.
Runs on the default backend (TPU when available; rates are
platform-independent).

    nohup timeout 5400 python scripts/sweep_osd_device_artifact.py &
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from uwspr_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402

from uwspr_tpu.config import DemodConfig, PipelineConfig  # noqa: E402
from uwspr_tpu.demod.finesync import complex_to_ri  # noqa: E402
from uwspr_tpu.io.channel import awgn  # noqa: E402
from uwspr_tpu.pipeline.jit_decoder import DeviceDecoder  # noqa: E402
from uwspr_tpu.protocol.modulate import synthesize_frame  # noqa: E402

TRIALS = 25
SNRS = [-28.0, -29.0, -30.0, -31.0, -32.0]
MSG = "VE3EMB FN25 30"
import os

DEPTH = int(os.environ.get("OSD_DEVICE_DEPTH", "3"))  # <= 4 (fec/osd_jax.py r5)
OUT = os.environ.get("OSD_DEVICE_OUT", "SWEEP_OSD_DEVICE_r04.json")


def make_batch(snr: float) -> np.ndarray:
    wins = []
    for t in range(TRIALS):
        rng = np.random.default_rng(31000 + t)   # same seeds as the host
        f = float(rng.uniform(-5, 5))            # artifact for comparability
        start = int(rng.integers(0, 750))
        z = awgn(synthesize_frame("VE3EMB", "FN25", 30,
                                  start_sample=start, freq_offset=f),
                 snr, rng=rng)
        wins.append(complex_to_ri(z))
    return np.stack(wins)


def main():
    # the TPU serving configuration (bench defaults) + the OSD fallback
    demod = dict(probe_dtype="bf16", refine_max_lanes=2 * TRIALS,
                 fano_compact_lanes=2 * TRIALS)
    base = DeviceDecoder(PipelineConfig(demod=DemodConfig(**demod)))
    deep = DeviceDecoder(PipelineConfig(demod=DemodConfig(
        osd_depth=DEPTH, **demod)))
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rows = []
    for snr in SNRS:
        t0 = time.time()
        ri = make_batch(snr)
        ob = base.unpack_output(np.asarray(base.decode_windows_ri(ri)))
        od = deep.unpack_output(np.asarray(deep.decode_windows_ri(ri)))
        n_fano = n_osd = n_false = 0
        for w in range(TRIALS):
            n_fano += MSG in base.messages(ob.window(w))
            spots = deep.spots(od.window(w))
            n_osd += MSG in {s.message for s in spots}
            n_false += any(s.osd and s.message != MSG for s in spots)
        rows.append({
            "snr_db": snr,
            "fano_rate": n_fano / TRIALS,
            "osd_rate": n_osd / TRIALS,
            "false_valid_rate": n_false / TRIALS,
            "seconds": round(time.time() - t0, 1),
        })
        print(rows[-1], flush=True)

    out = {
        "harness": "scripts/sweep_osd_device_artifact.py",
        "engine": "all-device DeviceDecoder (batched), on-device OSD",
        "backend": jax.default_backend(),
        "trials": TRIALS,
        "seeds": f"31000..{31000 + TRIALS - 1} (same as SWEEP_OSD host "
                 "artifact for comparability)",
        "osd_depth": DEPTH,
        "acceptance": ("quality >= 0.6 AND (cross-jiggle payload "
                       "agreement OR list-decoding margin >= 0.02) "
                       "(r4 calibrated rule, fec/osd_jax.py + "
                       "OSD_CALIB.json) + host-egress protocol unpack"),
        "snr_convention": "2500 Hz reference bandwidth",
        "note": ("false_valid_rate counts OSD-tagged wrong messages that "
                 "survive every screen — the residual risk consumers "
                 "see. Spots remain tagged Spot.osd."),
        "results": rows,
    }
    path = (pathlib.Path(__file__).resolve().parents[1]
            / OUT)
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
