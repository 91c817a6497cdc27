#!/usr/bin/env python3
"""Per-stage cost structure of the device decoder on the real TPU.

Builds truncated variants of DeviceDecoder._decode_window that stop after
successive stages and return a small reduction (so XLA cannot DCE the
work), times each over the tunnel (d2h forces completion), and prints the
stage deltas. Standalone microbenchmarks are useless over the tunnel
(~30 ms fixed dispatch); truncation inside one program is the only
reliable probe (see CLAUDE.md).

Run: nohup timeout 3600 python scripts/perf_stages.py > /tmp/perf_stages.log 2>&1 &
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from uwspr_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from uwspr_tpu.config import PipelineConfig
from uwspr_tpu.demod.finesync import (
    complex_to_ri,
    make_shared_probe,
    probe_derotate,
    shared_probe_eval,
)
from uwspr_tpu.coarse.search import (
    coarse_score_grid,
    select_best,
    smoothed_snr_spectrum,
)
from uwspr_tpu.ops.stft import stft_power_core as stft_power
from uwspr_tpu.pipeline.jit_decoder import DeviceDecoder
from uwspr_tpu.io.channel import awgn
from uwspr_tpu.protocol.modulate import synthesize_frame


def make_window(seed=0):
    rng = np.random.default_rng(seed)
    z = synthesize_frame("VE3EMB", "FN25", 30, start_sample=1500,
                         freq_offset=2.0)
    return awgn(z, -18, rng=rng)


def timed(fn, ri, reps=10):
    out = fn(ri)
    np.asarray(out)                       # force d2h (block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(ri)
        np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    dec = DeviceDecoder(PipelineConfig())
    cfg = dec.config.coarse
    dcfg = dec.config.demod

    def upto(stage):
        def fn(ri):
            z = jax.lax.complex(ri[0], ri[1]).astype(jnp.complex64)
            C = cfg.maxfreqs
            cidx = jnp.arange(C)
            ps = stft_power(z, n_ffts=cfg.n_ffts, size=cfg.fft_size,
                            hop=cfg.spb // 2)
            sm = smoothed_snr_spectrum(ps, hpbm=cfg.hpbm,
                                       m=cfg.fft_size // 2)
            valid, if0, snr = dec._peaks(sm)
            if stage == "coarse_spectrum":
                return snr.sum()
            syncgrid = coarse_score_grid(ps, if0, dec._offsets, dec._sign)
            if stage == "score_grid":
                return syncgrid.sum()
            best, best_idx = select_best(syncgrid, dec._is_nl,
                                         threshold=float(cfg.threshold))
            if stage == "select_best":
                return best.sum() + best_idx.sum()
            Mdim = dec._offsets.shape[0]
            fi = best_idx // (26 * Mdim)
            k0 = (best_idx // Mdim) % 26
            mm = best_idx % Mdim
            m_half = cfg.fft_size // 2
            freq = ((if0 + fi - 2) - m_half) * jnp.float32(cfg.df)
            shift = (128 * k0).astype(jnp.int32)
            mode = jnp.where(jnp.asarray(dec._is_nl)[mm], 1, 0
                             ).astype(jnp.int32)
            drift = jnp.asarray(dec._model_drift)[mm]
            slm_params = jnp.asarray(dec._model_slm)[mm]
            f1 = freq.astype(jnp.float32)
            shift1 = shift
            dsym = dec._drift_offsets(mode, drift, slm_params)
            Amat, base = make_shared_probe(z, shift1)
            zd = probe_derotate(Amat, dsym)
            if stage == "shared_probe":
                return jnp.abs(zd).sum()
            lag_grid = shift1[:, None] + jnp.arange(-128, 129, 64)[None, :]
            s = shared_probe_eval(zd, base, lag_grid.astype(jnp.int32),
                                  f1[:, None], n_lags=5)
            if stage == "one_lag_stage":
                return s.sum()
            return None
        return jax.jit(fn)

    ri = jnp.asarray(complex_to_ri(make_window()))

    results = {}
    for stage in ["coarse_spectrum", "score_grid", "select_best",
                  "shared_probe", "one_lag_stage"]:
        t = timed(upto(stage), ri)
        results[stage] = t
        print(f"{stage:>18}: {t * 1000:7.1f} ms", flush=True)

    # full program
    t0 = time.perf_counter()
    np.asarray(dec.decode_window_ri(ri))      # packed (C, 23) array
    print(f"full compile+run: {time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        np.asarray(dec.decode_window_ri(ri))
    t_full = (time.perf_counter() - t0) / reps
    print(f"{'full':>18}: {t_full * 1000:7.1f} ms", flush=True)

    prev = 0.0
    print("\nstage deltas:")
    for k, v in results.items():
        print(f"{k:>18}: +{(v - prev) * 1000:6.1f} ms  (cum {v*1000:6.1f})")
        prev = v
    print(f"{'rest (probes 2-7 + fano + select)':>18}: "
          f"+{(t_full - prev) * 1000:6.1f} ms")


if __name__ == "__main__":
    main()
