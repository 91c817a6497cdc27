#!/usr/bin/env python3
"""Calibration study for OSD acceptance (judge r3 item 1).

For each SNR point (plus noise-only windows), runs the host pipeline up
to the Fano stage, then applies the instrumented OSD to every
Fano-failed worth lane and records per-decode statistics:

  correct   decoded payload == the transmitted payload
  unpack    payload survives protocol unpacking
  quality   reliability-weighted correlation of the winner (existing)
  margin    (2nd-best candidate score - best) / total reliability (new)
  sync2     the lane's fine-sync score
  agree2    payload of an OSD decode of the 2nd-best gated jiggle lane
            matches (cross-jiggle agreement), if such a lane exists

Output: OSD_CALIB.json with raw rows; a summary table on stdout.
Run on CPU:  python scripts/osd_calibrate.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from uwspr_tpu.config import DemodConfig, PipelineConfig
from uwspr_tpu.fec import fano_decode_batch
from uwspr_tpu.fec.osd import osd_decode
from uwspr_tpu.io.channel import awgn, noise_sigma
from uwspr_tpu.pipeline.decoder import WindowDecoder
from uwspr_tpu.protocol.constants import FANO_METTAB, deinterleave
from uwspr_tpu.protocol.fec_encode import bits_to_bytes
from uwspr_tpu.protocol.messages import pack_message, unpack_message
from uwspr_tpu.protocol.modulate import synthesize_frame

ORDER = int(sys.argv[1]) if len(sys.argv) > 1 else 3
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 25
SEED_BASE = int(sys.argv[3]) if len(sys.argv) > 3 else 31000
SNRS = [-29.0, -30.0, -31.0, -32.0]
TRUE_PAYLOAD = bytes(np.asarray(pack_message("VE3EMB", "FN25", 30))[:7])


def window_for(snr, t):
    rng = np.random.default_rng(SEED_BASE + t)
    if snr is None:
        sigma = noise_sigma(-10.0)
        return (rng.normal(scale=sigma, size=45000)
                + 1j * rng.normal(scale=sigma, size=45000)
                ).astype(np.complex64)
    f = float(rng.uniform(-5, 5))
    start = int(rng.integers(0, 750))
    return awgn(synthesize_frame("VE3EMB", "FN25", 30,
                                 start_sample=start, freq_offset=f),
                snr, rng=rng)


def failed_lanes(wd, z):
    """Replicates WindowDecoder.__call__ up to Fano; yields
    (c, j, j2, soft_best, soft_second, sync2[c]) per failed worth cand."""
    cfg = wd.config
    cands = wd.coarse(z)
    if cands.n == 0:
        return
    ref = wd.fine.refine(z, cands)
    if not ref.worth_a_try.any():
        return
    symbols, sync2, rms = wd.fine.soft_symbols(z, cands, ref)
    C, J, _ = symbols.shape
    gate = (ref.worth_a_try[:, None]
            & (sync2 > cfg.demod.minsync2)
            & (rms > cfg.demod.minrms))
    flat_syms = deinterleave(symbols.reshape(C * J, 162))
    active = gate.reshape(C * J)
    if not active.any():
        return
    success, *_ = fano_decode_batch(
        flat_syms, FANO_METTAB, active, backend=cfg.fano_backend,
        delta=cfg.demod.fano_delta, maxcycles=cfg.demod.maxcycles)
    success = success.reshape(C, J) & gate
    for c in range(C):
        if not ref.worth_a_try[c] or success[c].any() or not gate[c].any():
            continue
        order = np.argsort(np.where(gate[c], sync2[c], -np.inf))[::-1]
        j = int(order[0])
        j2 = int(order[1]) if len(order) > 1 and gate[c, order[1]] else -1
        yield (c, j, j2, flat_syms[c * J + j],
               flat_syms[c * J + j2] if j2 >= 0 else None,
               float(sync2[c, j]))


def main():
    wd = WindowDecoder(PipelineConfig(demod=DemodConfig()))
    rows = []
    for snr in SNRS + [None]:
        t0 = time.time()
        for t in range(TRIALS):
            z = window_for(snr, t)
            for c, j, j2, soft, soft2, s2 in failed_lanes(wd, z):
                r = osd_decode(soft, order=ORDER)
                pl = bytes(bits_to_bytes(r.info_bits)[:7])
                agree2 = None
                if soft2 is not None:
                    r2 = osd_decode(soft2, order=ORDER)
                    pl2 = bytes(bits_to_bytes(r2.info_bits)[:7])
                    agree2 = pl2 == pl
                rows.append({
                    "snr": snr, "trial": t, "cand": c,
                    "correct": pl == TRUE_PAYLOAD,
                    "unpack": unpack_message(pl) is not None,
                    "quality": round(r.quality, 4),
                    "margin": round(r.margin, 5),
                    "flips": r.flips,
                    "sync2": round(s2, 4),
                    "agree2": agree2,
                })
        n = sum(1 for x in rows if x["snr"] == snr)
        print(f"snr={snr}: {n} failed lanes, {time.time()-t0:.0f}s",
              flush=True)

    tag = "" if SEED_BASE == 31000 else f"_s{SEED_BASE}"
    name = (f"OSD_CALIB{tag}.json" if ORDER == 3
            else f"OSD_CALIB_o{ORDER}{tag}.json")
    out = pathlib.Path(__file__).resolve().parents[1] / name
    out.write_text(json.dumps({"order": ORDER, "rows": rows}, indent=0))

    # summary: quality/margin percentiles for correct vs wrong decodes
    for label, sel in [
        ("correct", [x for x in rows if x["correct"]]),
        ("wrong+unpack", [x for x in rows
                          if not x["correct"] and x["unpack"]]),
        ("wrong", [x for x in rows if not x["correct"]]),
    ]:
        if not sel:
            print(f"{label}: none")
            continue
        q = np.asarray([x["quality"] for x in sel])
        m = np.asarray([x["margin"] for x in sel])
        a = [x["agree2"] for x in sel if x["agree2"] is not None]
        print(f"{label}: n={len(sel)}  "
              f"quality p5/p50/p95 = {np.percentile(q, [5, 50, 95])}  "
              f"margin p5/p50/p95 = {np.percentile(m, [5, 50, 95])}  "
              f"agree2 = {np.mean(a) if a else float('nan'):.2f} "
              f"(of {len(a)})")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
