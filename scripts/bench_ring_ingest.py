#!/usr/bin/env python3
"""Host-fed ingest proof (r5, VERDICT item 5): measure the device-ring
serving engine with REAL host->device ingest against the same decode
program fed device-resident data, in ONE process.

Rows (all at the serving defaults, W = n_channels):
  device_resident  decode dispatched on a device-resident (C,2,fl) batch
                   (the bench.py methodology — zero steady-state h2d)
  ring_f32         DeviceRingDecoder steps: h2d = (C,2,hop) f32/step
                   (27 KB/channel, 13.3x less than full windows)
  ring_int16       same with int16 blocks + per-channel scale (13.5 KB)
  full_h2d         full (C,2,fl) windows shipped per step (the naive
                   h2d-per-batch alternative, 360 KB/channel)
  h2d_only         bare transfer time of the hop blocks (no compute)

Writes BENCH_RING_r05.json. Run on the real TPU:
    nohup timeout 3600 python scripts/bench_ring_ingest.py > /tmp/ring.log 2>&1 &
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from uwspr_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from uwspr_tpu.config import PipelineConfig, with_serving_defaults
from uwspr_tpu.io.channel import awgn
from uwspr_tpu.pipeline.device_ring import DeviceRingDecoder
from uwspr_tpu.protocol.modulate import synthesize_frame

C = int(sys.argv[1]) if len(sys.argv) > 1 else 128
HOPS = 13                     # steady-state steps measured = one full
                              # frame period (frames repeat every 13
                              # hops, so 1-2 of every 13 windows fully
                              # contain one; the decoded metric below
                              # checks the full period)
FL, HOP = 45000, 3375


def make_streams(seed=0):
    """(C, fl + (HOPS+4)*hop) continuous streams with a frame starting
    every 13 hops (43875 samples) per channel. A 45000-sample window
    fully contains a 41472-sample frame only when the frame starts
    within its first 3528 samples, so with this period 1-2 windows per
    13-step cycle decode on every channel — the others carry a partial
    frame (the reference's partial-window case). The decoded check spans
    the whole 13-step cycle."""
    rng = np.random.default_rng(seed)
    n = FL + (HOPS + 4) * HOP
    period = 13 * HOP                       # 43875
    out = np.zeros((C, n), np.complex64)
    for c in range(C):
        z = synthesize_frame("VE3EMB", "FN25", 30, start_sample=0,
                             freq_offset=float(rng.uniform(-4, 4)))
        z = z[:41472 + 256]                 # the frame proper
        s0 = int(rng.integers(0, 500))
        for s in range(s0, n, period):
            seg = min(len(z), n - s)
            out[c, s:s + seg] += z[:seg]
        out[c] = awgn(out[c], -18, rng=rng)
    return out


def complex_to_ri_block(b):
    return np.stack([b.real.astype(np.float32), b.imag.astype(np.float32)],
                    axis=-2)


def main():
    print("backend:", jax.default_backend(), jax.devices(), "C =", C,
          flush=True)
    streams = make_streams()
    results = {"harness": "scripts/bench_ring_ingest.py", "channels": C,
               "hops_measured": HOPS, "snr_db": -18,
               "backend": jax.default_backend(), "rows": {}}

    def report(name, dt_per_step, decoded, note=""):
        rate = C * FL / dt_per_step
        results["rows"][name] = {
            "seconds_per_step": round(dt_per_step, 4),
            "window_samples_per_s": round(rate, 1),
            "ms_per_window": round(dt_per_step / C * 1000, 4),
            "decoded": decoded, "note": note}
        print(f"{name:>16}: {dt_per_step*1000:8.1f} ms/step "
              f"{rate/1e6:8.1f}M samples/s decoded={decoded} {note}",
              flush=True)

    # --- ring engines (f32 + int16) ---
    for dtype in ("f32", "int16"):
        ring = DeviceRingDecoder(n_channels=C, ingest_dtype=dtype)
        # prefill from the stream head
        k = 0
        while ring.push_hop(streams[:, k * HOP:(k + 1) * HOP]) is None:
            k += 1
            if k * HOP + HOP > FL + HOP:
                break
        # warm the step program
        h = ring.push_hop(streams[:, k * HOP:(k + 1) * HOP])
        if h is not None:
            ring.fetch(h)
        # steady state, double-buffered: stage() starts each hop's h2d
        # up front (in production the next 9 s of samples arrive while
        # the current batch decodes), then the step chain runs on
        # staged device blocks; results fetched in order (d2h pipelines
        # under later steps' compute — the bench.py serving pattern,
        # transfer cost included in the measured window)
        blocks = [np.ascontiguousarray(complex_to_ri_block(
            streams[:, (k + 1 + i) * HOP:(k + 2 + i) * HOP]))
            for i in range(HOPS)]
        t0 = time.perf_counter()
        staged = [ring.stage(b) for b in blocks]
        handles = [ring.push_hop(s) for s in staged]
        outs = [ring.fetch(hh) for hh in handles]
        dt = (time.perf_counter() - t0) / HOPS
        per_step = [int(o.success.any(axis=-1).sum()) for o in outs]
        # over one full 13-step frame period every channel's frame
        # aligns with 1-2 windows: the peak step must decode all C
        decoded = max(per_step)
        report(f"ring_{dtype}", dt, decoded,
               note=f"h2d {(HOP*C*(4 if dtype=='int16' else 8))/1e6:.1f} "
                    f"MB/step; per-step decodes {per_step}")

    # --- multi-hop ring: K hops per dispatch (RPC amortization) ---
    ring = DeviceRingDecoder(n_channels=C, ingest_dtype="int16")
    k = 0
    while ring.push_hop(streams[:, k * HOP:(k + 1) * HOP]) is None:
        k += 1
    blocks = np.stack([np.ascontiguousarray(complex_to_ri_block(
        streams[:, (k + 1 + i) * HOP:(k + 2 + i) * HOP]))
        for i in range(HOPS)])
    t0 = time.perf_counter()
    out = ring.fetch(ring.push_hops(blocks))
    dt = (time.perf_counter() - t0 + 0) / HOPS
    per_step = [int(out.window(i).success.any(axis=-1).sum())
                for i in range(HOPS)]
    report("ring_multi13_cold", dt, max(per_step),
           note=f"ONE dispatch for {HOPS} hops incl. compile-check; "
                f"per-step decodes {per_step}")
    t0 = time.perf_counter()
    out = ring.fetch(ring.push_hops(blocks))        # warm repeat (same
    # content re-pushed: ring state advances but the scene repeats)
    dt = (time.perf_counter() - t0) / HOPS
    report("ring_multi13", dt,
           max(int(out.window(i).success.any(axis=-1).sum())
               for i in range(HOPS)),
           note=f"ONE dispatch/h2d/d2h for {HOPS} hops, warm")

    # --- device-resident batch (no steady-state h2d): bench methodology ---
    from uwspr_tpu.pipeline.jit_decoder import DeviceDecoder
    cfg = with_serving_defaults(PipelineConfig(), C)
    dec = DeviceDecoder(cfg)
    ri = np.stack([complex_to_ri_block(streams[:, :FL][c][None])[0]
                   for c in range(C)])           # (C, 2, fl)
    ri_dev = jnp.asarray(ri)
    np.asarray(dec.decode_windows_ri(ri_dev))    # warm
    t0 = time.perf_counter()
    pend = [dec.decode_windows_ri(ri_dev) for _ in range(HOPS)]
    out = dec.unpack_output(np.asarray(pend[-1]))
    dt = (time.perf_counter() - t0) / HOPS
    report("device_resident", dt, int(out.success.any(axis=-1).sum()))

    # --- full-window h2d per step (the naive alternative) ---
    t0 = time.perf_counter()
    pend = [dec.decode_windows_ri(jnp.asarray(ri)) for _ in range(HOPS)]
    out = dec.unpack_output(np.asarray(pend[-1]))
    dt = (time.perf_counter() - t0) / HOPS
    report("full_h2d", dt, int(out.success.any(axis=-1).sum()),
           note=f"h2d {C*FL*8/1e6:.0f} MB/step")

    # --- bare h2d of hop blocks ---
    blk = complex_to_ri_block(streams[:, :HOP])
    t0 = time.perf_counter()
    devs = [jnp.asarray(blk) for _ in range(HOPS)]
    np.asarray(devs[-1])
    dt = (time.perf_counter() - t0) / HOPS
    report("h2d_only", dt, -1, note=f"{C*HOP*8/1e6:.1f} MB/step")

    results["interpretation"] = (
        "The tunneled v5e's h2d link is ~3 orders slower than a local "
        "PCIe/DMA path; the ring rows measure THIS environment's real "
        "ingest-overlapped rate. The design point: ring ingest moves "
        f"{HOP*8} B/channel/step vs {FL*8} B full-window (13.3x; int16 "
        "27x) — on production PCIe (>10 GB/s) the hop h2d is "
        f"~{C*HOP*8/10e9*1e6:.0f} us/step against the measured compute, "
        "i.e. ingest-negligible.")
    out_path = pathlib.Path(__file__).resolve().parents[1] / \
        "BENCH_RING_r05.json"
    out_path.write_text(json.dumps(results, indent=1))
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
