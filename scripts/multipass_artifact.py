#!/usr/bin/env python3
"""Multipass unmasking-rate artifact -> MULTIPASS_r02.json.

Measures the decode rate of a weak frame sitting inside a strong frame's
~6 Hz occupied bandwidth, with and without successive interference
cancellation (pipeline/multipass.py). The single-pass rate is what the
reference (one decode per window, candidates handled independently)
can achieve; the multipass rate is this framework's.

Decode rates are platform-independent (the host engine is bit-exact vs
the device engines, tests/test_device.py); run anywhere:

    nohup timeout 3600 python scripts/multipass_artifact.py &
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from uwspr_tpu.io.channel import awgn
from uwspr_tpu.pipeline.decoder import WindowDecoder
from uwspr_tpu.pipeline.multipass import multipass_spots
from uwspr_tpu.protocol.modulate import synthesize_frame

TRIALS = 25
STRONG_SNR = -13.0          # 2500 Hz ref bandwidth
SEP_HZ = 1.5
WEAK_REL_DB = [-6.0, -9.0, -12.0]
STRONG_MSG = "VE3EMB FN25 30"
WEAK_MSG = "K1ABC FN42 37"


def main():
    dec = WindowDecoder()
    rows = []
    for rel in WEAK_REL_DB:
        n_single = n_multi = n_strong = 0
        t0 = time.time()
        for t in range(TRIALS):
            rng = np.random.default_rng(1000 + t)
            strong = synthesize_frame(
                "VE3EMB", "FN25", 30,
                start_sample=int(rng.integers(500, 2500)), freq_offset=0.0)
            weak = synthesize_frame(
                "K1ABC", "FN42", 37,
                start_sample=int(rng.integers(500, 2500)),
                freq_offset=SEP_HZ)
            z = awgn(strong + 10.0 ** (rel / 20.0) * weak, STRONG_SNR,
                     rng=rng)
            spots = multipass_spots(z, lambda w: dec(w).spots, dec.config,
                                    passes=2)
            by = {s.message: s for s in spots}
            n_strong += STRONG_MSG in by
            if WEAK_MSG in by:
                n_multi += 1
                n_single += by[WEAK_MSG].pass_index == 0
        rows.append({
            "weak_rel_db": rel,
            "weak_snr_db": STRONG_SNR + rel,
            "strong_rate": n_strong / TRIALS,
            "weak_rate_single_pass": n_single / TRIALS,
            "weak_rate_multipass": n_multi / TRIALS,
            "seconds": round(time.time() - t0, 1),
        })
        print(rows[-1], flush=True)

    out = {
        "harness": "scripts/multipass_artifact.py",
        "trials": TRIALS,
        "seeds": f"1000..{1000 + TRIALS - 1}",
        "scene": {
            "strong": {"message": STRONG_MSG, "freq_hz": 0.0,
                       "snr_db_2500hz": STRONG_SNR},
            "weak": {"message": WEAK_MSG, "freq_hz": SEP_HZ,
                     "relative_db": "per row"},
            "starts": "independent uniform 500..2500 samples",
        },
        "engine": "host (bit-exact vs device/hybrid)",
        "passes": 2,
        "note": ("weak_rate_single_pass is what one decode of the window "
                 "yields (the reference's capability); weak_rate_multipass "
                 "adds successive interference cancellation "
                 "(pipeline/multipass.py)."),
        "results": rows,
    }
    path = pathlib.Path(__file__).resolve().parents[1] / "MULTIPASS_r02.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
