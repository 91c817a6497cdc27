#!/usr/bin/env python3
"""Fine-grained tail breakdown: post_refine / pre_fano / post_fano / full
via DeviceDecoder(truncate_stage=...). Run on the real TPU:

    nohup timeout 3600 python scripts/perf_stages2.py > /tmp/perf2.log 2>&1 &
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from uwspr_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from uwspr_tpu.demod.finesync import complex_to_ri
from uwspr_tpu.io.channel import awgn
from uwspr_tpu.pipeline.jit_decoder import DeviceDecoder
from uwspr_tpu.protocol.modulate import synthesize_frame


def make_window(seed=0):
    rng = np.random.default_rng(seed)
    z = synthesize_frame("VE3EMB", "FN25", 30, start_sample=1500,
                         freq_offset=2.0)
    return awgn(z, -18, rng=rng)


def timed(fn, ri, reps=10):
    out = fn(ri)
    jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(ri)
        jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / reps


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    ri = jnp.asarray(complex_to_ri(make_window()))
    prev = 0.0
    for stage in ["post_refine", "pre_fano", "post_fano", None]:
        dec = DeviceDecoder(truncate_stage=stage)
        t0 = time.perf_counter()
        dec.decode_window_ri(ri)
        print(f"compile {stage}: {time.perf_counter() - t0:.1f} s",
              flush=True)
        t = timed(dec.decode_window_ri, ri)
        print(f"{str(stage):>12}: {t * 1000:7.1f} ms  (+{(t - prev) * 1000:6.1f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
