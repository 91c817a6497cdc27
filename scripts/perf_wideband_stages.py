#!/usr/bin/env python3
"""Wideband (hb=187, maxfreqs=200) stage attribution at the serving point.

The compaction ladder prices refine by accepted lanes, so the wideband
row's residual cost must sit in the shared head (STFT/peaks, coarse conv,
select_best over 200 static slots) or the compacted tail. Truncated
programs measure the head; full-minus-head is the compacted tail.

    timeout 3600 python scripts/perf_wideband_stages.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from uwspr_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax

from uwspr_tpu.config import CoarseConfig, DemodConfig, PipelineConfig
from uwspr_tpu.demod.finesync import complex_to_ri
from uwspr_tpu.io.channel import noise_sigma
from uwspr_tpu.pipeline.jit_decoder import DeviceDecoder
from uwspr_tpu.protocol.modulate import synthesize_frame

W = 32
CALLS = ["K1ABC", "W9XYZ", "N2AB", "VE3EMB", "G4CDE",
         "JA1FG", "VK2HI", "PY3JK", "ZS6LM", "OH2NP"]
GRIDS = ["FN42", "EM12", "FN31", "FN25", "IO91",
         "PM95", "QF56", "GF49", "KG33", "KP20"]


def make_batch(seed=3):
    rng = np.random.default_rng(seed)
    sigma = noise_sigma(-15.0)
    wins = []
    for w in range(W):
        z = (rng.normal(scale=sigma, size=45000)
             + 1j * rng.normal(scale=sigma, size=45000)).astype(np.complex64)
        base = np.linspace(-170, 170, 10)
        for k in range(10):
            z += synthesize_frame(
                CALLS[k], GRIDS[k], 30,
                start_sample=int(rng.integers(0, 2000)),
                freq_offset=float(base[k] + rng.uniform(-2, 2)),
                pad_to=45000)
        wins.append(z)
    return np.stack([complex_to_ri(z) for z in wins])


def timed(fn, ri, reps=3):
    np.asarray(fn(ri))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(ri)
    np.asarray(r)
    return (time.perf_counter() - t0) / reps


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    cfg = PipelineConfig(
        coarse=CoarseConfig(halfbandwidth=187, maxfreqs=200),
        demod=DemodConfig(probe_dtype="bf16", cand_compact_lanes=512,
                          refine_max_lanes=512, fano_compact_lanes=512))
    ri = make_batch()
    prev = 0.0
    for stage in ["post_peaks", "post_coarse", None]:
        dec = DeviceDecoder(cfg, truncate_stage=stage)
        t0 = time.perf_counter()
        np.asarray(dec.decode_windows_ri(ri))
        print(f"compile {stage}: {time.perf_counter() - t0:.1f} s",
              flush=True)
        t = timed(dec.decode_windows_ri, ri)
        print(f"{str(stage):>12}: {t * 1000 / W:7.3f} ms/win "
              f"(+{(t - prev) * 1000 / W:6.3f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
