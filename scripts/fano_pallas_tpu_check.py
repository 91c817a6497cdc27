"""Validate the compiled (Mosaic) Pallas Fano kernel on the real TPU.

Checks, against the Python oracle:
  1. bit-exactness on a mixed batch (clean / noisy / hopeless lanes) at a
     small budget;
  2. bit-exactness of 128 clean lanes at the FULL reference budget
     (maxcycles=10000);
  3. worst case bounded: wall time of 128 ALL-TIMEOUT lanes at the full
     budget (the deep-SNR degenerate case that melts the lax.while_loop
     path) — must be seconds, not minutes.

Run: timeout 1800 python scripts/fano_pallas_tpu_check.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from uwspr_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from uwspr_tpu.fec.fano_pallas import fano_decode_batch_pallas  # noqa: E402
from uwspr_tpu.fec.fano_ref import fano_decode  # noqa: E402
from uwspr_tpu.protocol.constants import FANO_METTAB  # noqa: E402
from uwspr_tpu.protocol.fec_encode import encode_bits  # noqa: E402


def lanes(rng, n, sigma, scale=50.0):
    out = []
    for _ in range(n):
        bits = rng.integers(0, 2, size=50).astype(np.uint8)
        coded = encode_bits(np.concatenate([bits, np.zeros(31, np.uint8)]))
        soft = (np.where(coded == 1, 1.0, -1.0) * scale
                + rng.normal(0, sigma, 162) + 128)
        out.append(np.clip(soft, 0, 255).astype(np.uint8))
    return np.stack(out)


def run(symbols, maxcycles):
    t0 = time.time()
    out = fano_decode_batch_pallas(
        jnp.asarray(symbols, jnp.int32), jnp.asarray(FANO_METTAB),
        maxcycles=maxcycles, interpret=False)
    host = {k: np.asarray(v) for k, v in out.items()}   # force real d2h
    return host, time.time() - t0


def check(symbols, host, maxcycles, label):
    bad = 0
    for i in range(len(symbols)):
        r = fano_decode(symbols[i], FANO_METTAB, maxcycles=maxcycles)
        ok = (host["success"][i] == r.success
              and host["metric"][i] == r.metric
              and host["cycles"][i] == r.cycles
              and host["maxnp"][i] == r.maxnp
              and (not r.success
                   or (host["data"][i] == r.data).all()))
        bad += not ok
    print(f"{label}: {len(symbols)} lanes, mismatches={bad}")
    return bad


print("backend:", jax.default_backend(), jax.devices()[0])
rng = np.random.default_rng(42)

mixed = np.concatenate([
    lanes(rng, 40, sigma=12.0),
    lanes(rng, 40, sigma=48.0),
    rng.integers(0, 256, size=(48, 162)).astype(np.uint8),
])
host, dt = run(mixed, 120)     # compile + run
print(f"mixed batch (maxcycles=120): {dt:.2f}s incl compile")
bad = check(mixed, host, 120, "mixed/120")

clean = lanes(rng, 128, sigma=12.0)
host2, dt2 = run(clean, 10000)
print(f"clean batch (maxcycles=10000): {dt2:.2f}s incl compile")
bad += check(clean, host2, 10000, "clean/10000")

# warm repeat for steady-state timing
host2b, dt2b = run(lanes(rng, 128, sigma=12.0), 10000)
print(f"clean batch warm: {dt2b*1e3:.1f} ms")

hopeless = rng.integers(0, 256, size=(128, 162)).astype(np.uint8)
host3, dt3 = run(hopeless, 10000)
print(f"ALL-TIMEOUT 128 lanes, full budget: {dt3:.2f}s "
      f"(success={int(host3['success'].sum())}, "
      f"cycles[0]={host3['cycles'][0]})")
# oracle check on 4 lanes only (host oracle is slow at full budget)
bad += check(hopeless[:4], {k: v[:4] for k, v in host3.items()},
             10000, "timeout/10000[:4]")

print("RESULT:", "PASS" if bad == 0 else f"FAIL ({bad} mismatches)")
