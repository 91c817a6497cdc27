"""Pallas TPU kernel for the coarse-search model selection.

The reference's order-dependent best-model selection
(lib/FDR_impl.cc:344-405) is a sequential walk over the (freq, lag,
model) grid. The XLA formulation (coarse.search._select_best_grouped)
event-skips with a lax.while_loop, but each loop round costs ~15 kernel
launches — measured ~180 us/round, 0.034-0.038 ms/window at the W=128
serving point, the #1 stage of the r5 program. The actual work is
microscopic: ~5 event rounds per lane over a 13 x 130 x 126 grid.

This kernel runs the whole selection for one window INSIDE one Mosaic
program: the grid block lives in VMEM, the per-lane event walk is a
scalar-state lax.while_loop over vector ops on (M,) rows and (G,)
extreme tables — no per-round kernel launches at all.

Exact-semantics notes (same contracts as the XLA paths, oracle-tested
against select_best_scan in tests/test_select_pallas.py):

- linear-first model ordering required (build_drift_models order; the
  dispatcher in coarse.search routes other orderings to the XLA loop);
- linear segment resolves to the segment max at its FIRST occurrence
  (min-index over equality with the max — exact, the max is an element);
- nonlinear ratio acceptance v/best > threshold evaluated with the same
  f32 division (negative-best / signed-zero semantics preserved);
  in-group chains resolve up to 3 accepts, deeper residues revisit the
  group from past the chain position (still exact);
- NaNs never accept and are excluded from the extreme tables;
- jumps use per-group extreme values (lin max / nl max / nl min), a
  superset test — barren rescans possible, misses impossible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _kernel(grid_ref, nl_ref, best_ref, bidx_ref, *, C, G, Mdim, thr):
    """LOCKSTEP walk: all C lanes advance together, one while round per
    EVENT GROUP of the slowest lane (rounds = max over lanes ~ 5-25,
    not the sum ~ 70 a per-lane serial walk pays — measured 3x). Same
    masked body as coarse.search._select_best_grouped, with the grid
    and every per-round tensor VMEM-resident. All per-lane state is
    kept as (C, 1) tiles — Mosaic rejects 1-D vector broadcasts."""
    nl_row = nl_ref[0:1, :] != 0                      # (1, M)
    ninf, pinf = jnp.float32(-jnp.inf), jnp.float32(jnp.inf)
    thrf = jnp.float32(thr)
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (C, Mdim), 1)
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    BIG = jnp.int32(Mdim)

    # per-lane per-group extreme tables, (C, G) each
    g3_all = grid_ref[0]                              # (C, G, M)
    bad_all = jnp.isnan(g3_all)
    lin_max = jnp.max(jnp.where(nl_row[None] | bad_all, ninf, g3_all),
                      axis=2)
    nl_max = jnp.max(jnp.where(~nl_row[None] | bad_all, ninf, g3_all),
                     axis=2)
    nl_min = jnp.min(jnp.where(~nl_row[None] | bad_all, pinf, g3_all),
                     axis=2)

    def first_true_m(mask):                           # (C, M) -> (C, 1)
        return jnp.min(jnp.where(mask, iota_m, BIG), axis=1,
                       keepdims=True)

    def cond(s):
        return jnp.max(s[4]) > 0

    def body(s):
        best, bidx, g, off, acti = s                  # (C, 1) each
        act = acti > 0                                # bool is not a legal
                                                      # Mosaic loop carry
        # per-lane dynamic row loads (C static unroll, g[c, 0] traced)
        row = jnp.concatenate(
            [grid_ref[0, c, pl.dslice(g[c, 0], 1), :] for c in range(C)],
            axis=0)                                   # (C, M)
        bad = jnp.isnan(row)
        linv = jnp.where(nl_row | bad | (iota_m < off), ninf, row)
        lmax = jnp.max(linv, axis=1, keepdims=True)   # (C, 1)
        lidx = first_true_m(linv == lmax)             # first occurrence
        accL = act & (lmax > best)
        best = jnp.where(accL, lmax, best)
        bidx = jnp.where(accL, g * Mdim + lidx, bidx)
        prev = off - 1
        for _ in range(3):
            ok = (nl_row & (row / best > thrf) & (iota_m > prev) & act)
            c_ = first_true_m(ok)
            has = c_ < BIG
            v = jnp.sum(jnp.where(iota_m == c_, row, 0.0), axis=1,
                        keepdims=True)
            best = jnp.where(has, v, best)
            bidx = jnp.where(has, g * Mdim + c_, bidx)
            prev = jnp.where(has, c_, BIG)
        resid = jnp.any(nl_row & (row / best > thrf) & (iota_m > prev)
                        & act, axis=1, keepdims=True)
        rl = lin_max > best
        rn = ((nl_max / best) > thrf) | ((nl_min / best) > thrf)
        gmask = (rl | rn) & (iota_g > g)
        g_next = jnp.min(jnp.where(gmask, iota_g, jnp.int32(G)), axis=1,
                         keepdims=True)
        has_g = g_next < G
        off = jnp.where(resid, prev + 1, 0)
        g = jnp.where(act & ~resid & has_g, g_next, g)
        acti = (act & (resid | has_g)).astype(jnp.int32)
        return best, bidx, g, off, acti

    init = (jnp.full((C, 1), -1e30, jnp.float32),
            jnp.zeros((C, 1), jnp.int32), jnp.zeros((C, 1), jnp.int32),
            jnp.zeros((C, 1), jnp.int32), jnp.ones((C, 1), jnp.int32))
    best, bidx, _, _, _ = jax.lax.while_loop(cond, body, init)
    best_ref[:, :] = best
    bidx_ref[:, :] = bidx


@functools.partial(jax.jit,
                   static_argnames=("threshold", "interpret"))
def select_best_pallas(sync: jnp.ndarray, is_nonlinear: jnp.ndarray,
                       *, threshold: float, interpret: bool = False
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(C, 5, W, M) scores in evaluation order -> (best (C,), idx (C,)).

    Same contract as coarse.search.select_best (linear-first model
    banks). vmap adds leading window axes (pallas_call batching rule).
    """
    C = sync.shape[0]
    Mdim = sync.shape[3]
    g3 = sync.reshape(C, -1, Mdim)
    G = g3.shape[1]
    # candidate lanes are independent: chunk them over the pallas grid
    # so the per-program VMEM block stays ~1 MB (the monolithic C=200
    # wideband block measured a 26.8 MB scoped-VMEM compile OOM). Pad C
    # to the chunk width with NaN lanes — NaNs never accept, so padded
    # lanes terminate immediately with the init state.
    Cb = min(C, 16)
    Cp = -(-C // Cb) * Cb
    if Cp != C:
        g3 = jnp.concatenate(
            [g3, jnp.full((Cp - C, G, Mdim), jnp.nan, g3.dtype)])
    nl = jnp.asarray(is_nonlinear, jnp.int32)[None, :]        # (1, M)
    kern = functools.partial(_kernel, C=Cb, G=G, Mdim=Mdim,
                             thr=float(threshold))
    best, bidx = pl.pallas_call(
        kern,
        grid=(Cp // Cb,),
        in_specs=[
            pl.BlockSpec((1, Cb, G, Mdim), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((1, Mdim), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((Cb, 1), lambda i: (i, 0)),
            pl.BlockSpec((Cb, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Cp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Cp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(g3[None], nl)
    return best[:C, 0], bidx[:C, 0]


__all__ = ["select_best_pallas"]
