"""Lockstep Fano sequential decoder as a Pallas TPU kernel.

Why this exists: the XLA ``lax.while_loop`` formulation (fec/fano_jax.py)
pays per-iteration kernel-launch + HBM round-trip cost for its ~100-op
body — a few ms per unrolled iteration on a v5e — so a deep-SNR lane that
exhausts the reference's full 10,000-cycle/bit budget
(lib/sync_and_demodulate_impl.cc:329) degrades the program from ~10 ms to
minutes and can trip remote-TPU watchdogs. Here the entire trellis state
lives in VMEM for the whole decode: one ``pallas_call`` runs the complete
sequential search to termination with zero HBM traffic per step, so a
primitive Fano step costs ~0.2 us for a 128-lane block instead of ~100 us,
and the full budget is bounded at well under a second even if every lane
times out. This makes the all-device engine safe (and fast) at deep SNR.

Layout: struct-of-planes, nodes on the sublane axis x lanes on the lane
axis. Per-lane node arrays (cumulative metric gamma, encoder state, sorted
branch metrics tm0/tm1, branch index) are (NN, LB) int32 planes; per-lane
scalars (node pointer k, threshold t, phase, cycle count, ...) are (1, LB)
vectors. Per-lane dynamic node indexing — the op XLA cannot vectorize —
becomes a masked row select/reduce against a broadcasted iota, which the
VPU executes at full width. The hot registers of the current node
(gamma[k], gamma[k-1], enc[k], tm[k], branch[k]) are carried explicitly so
a forward step needs only the 4 metric-row gathers of the node it expands.

The lane grid is blocked (LB=128): blocks run sequentially on the core and
each exits its while-loop as soon as its own lanes finish, so one
pathological lane only holds its block, not the whole batch.

Semantics are bit-exact with fec.fano_ref / fec.fano_jax / the native C++
backend (identical success/data/metric/cycles/maxnp), including the
reference's cycle accounting and finish-on-last-cycle-counts-as-timeout
quirk (lib/Fano.cc:110-252); see tests/test_fano_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uwspr_tpu.fec.fano_jax import branch_metrics
from uwspr_tpu.protocol.constants import N_CODED_BITS, POLY1, POLY2

# polynomials as int32 bit patterns (bitwise ops only; sign is irrelevant)
_P1 = int(np.int32(np.uint32(POLY1)))
_P2 = int(np.int32(np.uint32(POLY2)))

LANE_BLOCK = 128


def _parity(v: jnp.ndarray) -> jnp.ndarray:
    """Bit parity of int32 via xor-fold. The arithmetic >> smears sign bits
    into the high half, but each fold only reads bits below twice its
    range, which the previous fold computed correctly — bit 0 of the
    result is the xor of all 32 input bits regardless of shift type."""
    v = v ^ (v >> 16)
    v = v ^ (v >> 8)
    v = v ^ (v >> 4)
    v = v ^ (v >> 2)
    v = v ^ (v >> 1)
    return v & 1


def _branch_symbol(enc: jnp.ndarray) -> jnp.ndarray:
    """(poly1_parity << 1) | poly2_parity for int32 encoder states."""
    return (_parity(enc & _P1) << 1) | _parity(enc & _P2)


def _make_kernel(nbits: int, delta: int, maxcycles: int, NN: int, LB: int):
    tail = nbits - 31
    budget = maxcycles * nbits
    # every iteration advances each live lane by one primitive step:
    # forward look (<= budget+1 of them), back-step (each undoes one
    # forward move), or scan terminator (<= one per violated look) —
    # so 3*budget + slack bounds total steps even if every lane times out
    max_steps = 3 * budget + 16

    # per-lane register rows in the (16, LB) regs scratch
    K, T, PHASE, CYCLES, MAXNP, DONE, SUCCESS = range(7)
    GK, GPREV, ENCK, BRK, TM0K, TM1K = range(7, 13)

    def kernel(act_ref, met_ref, enc_ref, res_ref,
               gamma_ref, tm0_ref, tm1_ref, brp_ref, regs_ref):
        # The trellis state lives in VMEM scratch refs for the whole
        # decode; the while-loop carry is scalars only (a mixed
        # vector-layout carry fails Mosaic's scf.yield legalization, and
        # ~400 KB of carried planes would spill anyway). enc_ref doubles
        # as the working encoder-state plane and the harvest output.
        rows = jax.lax.broadcasted_iota(jnp.int32, (NN, LB), 0)
        active = act_ref[:] != 0                    # (1, LB)

        def gather(plane_ref, k):                   # (1, LB) row select
            return jnp.sum(jnp.where(rows == k, plane_ref[:], 0), axis=0,
                           keepdims=True)

        def scatter(plane_ref, k, val, mask):       # masked row write
            plane_ref[:] = jnp.where((rows == k) & mask, val, plane_ref[:])

        def expand(k, enc0):
            """Sorted branch metrics at node k whose 0-branch encoder
            state is enc0 (bit 0 clear). Returns (enc, tm0, tm1) — enc
            gains the low bit when the 1-branch is best (the reference's
            best-first ordering, lib/Fano.cc:120-133)."""
            lsym = _branch_symbol(enc0)
            kk = jnp.minimum(k, nbits - 1)
            m = [jnp.sum(jnp.where(rows == kk, met_ref[j], 0), axis=0,
                         keepdims=True) for j in range(4)]
            sel = lambda s: jnp.where(       # noqa: E731
                s == 0, m[0], jnp.where(s == 1, m[1],
                                        jnp.where(s == 2, m[2], m[3])))
            a = sel(lsym)
            b = sel(3 - lsym)                       # 3 ^ lsym for 0..3
            is_tail = k >= tail
            swap = (~is_tail) & (a <= b)
            enc = jnp.where(swap, enc0 + 1, enc0)
            return enc, jnp.where(swap, b, a), jnp.where(swap, a, b)

        def pack_regs(k, t, phase, cycles, maxnp, done, success,
                      gk, gprev, enck, brk, tm0k, tm1k):
            regs_ref[:] = jnp.concatenate([
                k, t, phase, cycles, maxnp,
                done.astype(jnp.int32), success.astype(jnp.int32),
                gk, gprev, enck, brk, tm0k, tm1k,
                jnp.zeros((3, LB), jnp.int32)], axis=0)

        # ---- initial state ------------------------------------------------
        z = jnp.zeros((1, LB), jnp.int32)
        row0 = rows == 0
        enck, tm0k, tm1k = expand(z, z)
        gamma_ref[:] = jnp.zeros((NN, LB), jnp.int32)
        enc_ref[:] = jnp.where(row0, enck, 0)
        tm0_ref[:] = jnp.where(row0, tm0k, 0)
        tm1_ref[:] = jnp.where(row0, tm1k, 0)
        brp_ref[:] = jnp.zeros((NN, LB), jnp.int32)
        pack_regs(z, z, z, z, z, ~active, active & False,
                  z, z, enck, z, tm0k, tm1k)

        def cond(c):
            step, alldone = c
            return (~alldone) & (step < max_steps)

        def body(c):
            step, _ = c
            r = regs_ref[:]
            k, t, phase = r[K:K+1], r[T:T+1], r[PHASE:PHASE+1]
            cycles, maxnp = r[CYCLES:CYCLES+1], r[MAXNP:MAXNP+1]
            done, success = r[DONE:DONE+1] != 0, r[SUCCESS:SUCCESS+1] != 0
            gk, gprev, enck = r[GK:GK+1], r[GPREV:GPREV+1], r[ENCK:ENCK+1]
            brk, tm0k, tm1k = r[BRK:BRK+1], r[TM0K:TM0K+1], r[TM1K:TM1K+1]

            fwd = (~done) & (phase == 0)
            bwd = (~done) & (phase == 1)

            # ---- forward look (one reference "cycle") -------------------
            timeout = fwd & (cycles >= budget)
            fwd = fwd & ~timeout
            maxnp = jnp.where(fwd, jnp.maximum(maxnp, k), maxnp)
            tmk = jnp.where(brk == 0, tm0k, tm1k)
            ngamma = gk + tmk
            move = fwd & (ngamma >= t)
            violate = fwd & ~move
            tighten = move & (gk < t + delta) & (ngamma >= t + delta)
            t = jnp.where(tighten, t + delta * ((ngamma - t) // delta), t)

            k_next = k + 1
            scatter(gamma_ref, k_next, ngamma, move)
            enc_shift = enck << 1
            complete = move & (k_next == nbits)
            expanding = move & (k_next != nbits)
            enck_e, tm0_e, tm1_e = expand(k_next, enc_shift)
            gprev = jnp.where(move, gk, gprev)
            gk = jnp.where(move, ngamma, gk)
            k = jnp.where(move, k_next, k)
            enck = jnp.where(move,
                             jnp.where(expanding, enck_e, enc_shift), enck)
            tm0k = jnp.where(expanding, tm0_e, tm0k)
            tm1k = jnp.where(expanding, tm1_e, tm1k)
            brk = jnp.where(expanding, 0, brk)
            scatter(enc_ref, k, enck, move)
            scatter(tm0_ref, k, tm0k, expanding)
            scatter(tm1_ref, k, tm1k, expanding)
            scatter(brp_ref, k, 0, expanding)

            cycles = jnp.where(fwd, cycles + 1, cycles)
            success = success | (complete & (cycles < budget))
            cycles = jnp.where(timeout, budget + 1, cycles)
            done = done | complete | timeout
            phase = jnp.where(violate, 1, phase)

            # ---- backward scan: exactly one step ------------------------
            relax = bwd & ((k == 0) | (gprev < t))
            step_back = bwd & ~relax
            t = jnp.where(relax, t - delta, t)
            revert = relax & (brk != 0)
            enck = jnp.where(revert, enck ^ 1, enck)
            scatter(enc_ref, k, enck, revert)
            scatter(brp_ref, k, 0, revert)
            brk = jnp.where(revert, 0, brk)
            phase = jnp.where(relax, 0, phase)

            k_new = k - 1                           # valid where step_back
            gprev_b = gather(gamma_ref, jnp.maximum(k_new - 1, 0))
            enck_b = gather(enc_ref, k_new)
            tm0_b = gather(tm0_ref, k_new)
            tm1_b = gather(tm1_ref, k_new)
            brk_b = gather(brp_ref, k_new)
            switch = step_back & (k_new < tail) & (brk_b != 1)
            enck_b = jnp.where(switch, enck_b ^ 1, enck_b)
            brk_b = jnp.where(switch, brk_b + 1, brk_b)
            scatter(enc_ref, k_new, enck_b, switch)
            scatter(brp_ref, k_new, brk_b, switch)
            phase = jnp.where(switch, 0, phase)
            gk = jnp.where(step_back, gprev, gk)    # gamma[k-1] register
            gprev = jnp.where(step_back, gprev_b, gprev)
            k = jnp.where(step_back, k_new, k)
            enck = jnp.where(step_back, enck_b, enck)
            brk = jnp.where(step_back, brk_b, brk)
            tm0k = jnp.where(step_back, tm0_b, tm0k)
            tm1k = jnp.where(step_back, tm1_b, tm1k)

            pack_regs(k, t, phase, cycles, maxnp, done, success,
                      gk, gprev, enck, brk, tm0k, tm1k)
            return step + 1, jnp.all(done)

        jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32),
                                        jnp.zeros((), jnp.bool_)))
        r = regs_ref[:]
        res_ref[:] = jnp.concatenate([
            r[SUCCESS:SUCCESS+1], r[CYCLES:CYCLES+1],
            r[MAXNP:MAXNP+1], r[GK:GK+1],           # GK = gamma[k] = metric
            jnp.zeros((4, LB), jnp.int32)], axis=0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("nbits", "delta", "maxcycles",
                                    "interpret"))
def fano_decode_batch_pallas(symbols: jnp.ndarray,
                             mettab: jnp.ndarray,
                             active: jnp.ndarray | None = None,
                             *, nbits: int = N_CODED_BITS, delta: int = 60,
                             maxcycles: int = 10000,
                             interpret: bool = False):
    """Drop-in replacement for fano_decode_batch_jax (same result dict).

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests); compiled mode requires a TPU backend.
    """
    symbols = symbols.astype(jnp.int32)
    L = symbols.shape[0]
    LB = LANE_BLOCK
    NN = -(-(nbits + 1) // 8) * 8                  # node rows, 8-aligned
    Lp = max(LB, -(-L // LB) * LB)

    metrics = branch_metrics(symbols, mettab, nbits)   # (L, nbits, 4)
    act = jnp.ones(L, bool) if active is None else active.astype(bool)
    met = jnp.zeros((4, NN, Lp), jnp.int32).at[:, :nbits, :L].set(
        metrics.transpose(2, 1, 0))
    actp = jnp.zeros((1, Lp), jnp.int32).at[0, :L].set(act.astype(jnp.int32))

    kernel = _make_kernel(nbits, delta, maxcycles, NN, LB)
    grid = Lp // LB
    enc_out, res = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, LB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, NN, LB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NN, LB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NN, Lp), jnp.int32),
            jax.ShapeDtypeStruct((8, Lp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NN, LANE_BLOCK), jnp.int32),   # gamma
            pltpu.VMEM((NN, LANE_BLOCK), jnp.int32),   # tm0
            pltpu.VMEM((NN, LANE_BLOCK), jnp.int32),   # tm1
            pltpu.VMEM((NN, LANE_BLOCK), jnp.int32),   # branch
            pltpu.VMEM((16, LANE_BLOCK), jnp.int32),   # per-lane registers
        ],
        interpret=interpret,
    )(actp, met)

    nbytes = nbits >> 3
    harvest = (enc_out[7::8][:nbytes, :L].T & 0xFF).astype(jnp.uint8)
    return {
        "success": res[0, :L] != 0,
        "data": harvest,
        "metric": res[3, :L],
        "cycles": res[1, :L] + 1,
        "maxnp": res[2, :L],
    }


def fano_decode_batch(symbols: np.ndarray, mettab: np.ndarray,
                      active: np.ndarray | None = None, *, delta: int = 60,
                      maxcycles: int = 10000, nbits: int = N_CODED_BITS,
                      interpret: bool | None = None):
    """NumPy wrapper; returns (success, data, metric, cycles, maxnp).
    interpret=None auto-selects the interpreter off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = fano_decode_batch_pallas(
        jnp.asarray(symbols, jnp.int32).reshape(-1, 2 * nbits),
        jnp.asarray(mettab),
        None if active is None else jnp.asarray(active, jnp.bool_),
        nbits=nbits, delta=delta, maxcycles=maxcycles, interpret=interpret)
    return (np.asarray(out["success"]), np.asarray(out["data"]),
            np.asarray(out["metric"]), np.asarray(out["cycles"]),
            np.asarray(out["maxnp"]))


__all__ = ["fano_decode_batch_pallas", "fano_decode_batch", "LANE_BLOCK"]
