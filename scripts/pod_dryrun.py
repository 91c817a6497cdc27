#!/usr/bin/env python3
"""Reduced-shape pod-config dryrun -> DRYRUN_POD_r04.json (judge r3
item 5c).

BASELINE config 5 is "4096 channels streamed across N>=2 hosts". The
full shape cannot decode on this 4-core box, but its PROGRAM STRUCTURE
can: a (channel=8, time=1) mesh with channels-per-shard > 1 is exactly
the pod packing (each chip decodes a block of channels; the only
collective is the spot-count psum — SCALING_r04 analytic rows verify
the inventory is identical at 1 and 4 channels/shard). This harness
runs that program on an 8-virtual-device CPU mesh at a reduced channel
count, with decodable frames embedded in a subset of channels, and
asserts every embedded frame decodes.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
          timeout 2400 python scripts/pod_dryrun.py
(the script re-execs itself with the flag if unset)
"""

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]

FLAG = "--xla_force_host_platform_device_count=8"
if FLAG not in os.environ.get("XLA_FLAGS", ""):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + FLAG).strip()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from uwspr_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from uwspr_tpu.config import DemodConfig, PipelineConfig  # noqa: E402
from uwspr_tpu.io.channel import noise_sigma  # noqa: E402
from uwspr_tpu.parallel.mesh import ShardedDecoder, make_mesh  # noqa: E402
from uwspr_tpu.protocol.modulate import synthesize_frame  # noqa: E402

N_SHARDS = 8
CH_PER_SHARD = int(os.environ.get("POD_CPS", "4"))
CHANNELS = N_SHARDS * CH_PER_SHARD
FRAME_EVERY = 4          # embed a frame in every 4th channel


def main():
    cfg = PipelineConfig(demod=DemodConfig(maxcycles=512))
    dec = ShardedDecoder(cfg, make_mesh(N_SHARDS, 1))
    hop, halo, fl = dec.hop, dec.halo, dec.fl
    total = hop

    rng = np.random.default_rng(7)
    sigma = noise_sigma(-16.0)
    x = (rng.normal(scale=sigma, size=(CHANNELS, total + halo))
         + 1j * rng.normal(scale=sigma, size=(CHANNELS, total + halo))
         ).astype(np.complex64)
    embedded = list(range(0, CHANNELS, FRAME_EVERY))
    for c in embedded:
        z = np.asarray(synthesize_frame(
            "VE3EMB", "FN25", 30, start_sample=int(rng.integers(0, 400)),
            freq_offset=float(rng.uniform(-3, 3))))[:fl]
        m = min(len(z), total + halo)
        x[c, :m] += z[:m]
    stream, tail = x[:, :total], x[:, total:]

    t0 = time.time()
    out, n_spots = dec.decode(stream, tail)
    n_spots = int(np.asarray(n_spots))
    dt = time.time() - t0
    ok = n_spots == len(embedded)
    doc = {
        "harness": "scripts/pod_dryrun.py",
        "mesh": {"channel": N_SHARDS, "time": 1},
        "channels": CHANNELS,
        "channels_per_shard": CH_PER_SHARD,
        "frames_embedded": len(embedded),
        "spots": n_spots,
        "ok": ok,
        "seconds_including_compile": round(dt, 1),
        "note": ("shape-reduced stand-in for the 4096-channel pod "
                 "config: same sharded program structure (channel-"
                 "blocked shards, spot-count psum) at "
                 f"{CH_PER_SHARD} channels/shard on 8 virtual CPU "
                 "devices. The analytic extension to 4096 channels x "
                 "N>=2 hosts is SCALING_r04.json pod_4096ch; the "
                 "single-chip 4096-channel measurement is the "
                 "BENCH_MATRIX serve_4096ch row."),
    }
    (REPO / "DRYRUN_POD_r04.json").write_text(json.dumps(doc, indent=1)
                                              + "\n")
    print(json.dumps(doc, indent=1))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
