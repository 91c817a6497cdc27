"""Pallas TPU kernel: fused matched-filter probe-grid correlation.

This is the hot op of the demodulator (reference inner loop:
lib/sync_and_demodulate_impl.cc:163-233 — regenerate 4 tones per symbol,
correlate 256 samples, for every probed (lag, freq)). The XLA formulation
materializes a (C, 162*256) complex frame per probed lag in HBM (~66 MB per
lag, ~2.6 GB per window decode); this kernel keeps the whole zero-padded
45000-sample window resident in VMEM (~0.4 MB) and streams nothing to HBM
but the (C, L, 162, 4F) tone powers.

Alignment trick: Mosaic vector loads need 128-aligned lane offsets, but
probe lags are arbitrary integers. Each lag is split as
``lag = start0 + b`` with start0 256-aligned and b in [0, 256). The kernel
loads the aligned 163*256-sample superset, forms 512-wide per-symbol rows
(row k || row k+1), and restricts the correlation to the b-shifted
256-sample window by masking the correlation matrix rows to
[b, b+256). The derotation/tone phases are evaluated at the aligned index
j' = j + b instead of j, which multiplies every correlation by the unit
phasor exp(-i*w*b) — irrelevant, because only |corr| (tone power) is
consumed. Per (candidate, lag) the work is one stacked real
(162, 1024) @ (1024, 8F) MXU matmul.

Semantics are identical to demod.finesync._probe_powers_xla: the host
wrapper pads the window and zeroes sample 0, reproducing the reference's
0 < n < N correlation guard (impl.cc:205). Equality is tested in
interpret mode (tests/test_probe_pallas.py) and on hardware via the golden
decodes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from uwspr_tpu.protocol.constants import SAMPLE_RATE, TONE_SPACING

_DT = 1.0 / SAMPLE_RATE
_FRAME = 162 * 256
PAD = 4096                    # left pad (covers negative lags)


_W = 1024                     # per-symbol aligned working width (j' domain)


def _probe_kernel(lags_ref, zp_ref, drift_ref, freqs_ref, out_ref,
                  *, n_lags: int, F: int):
    """One candidate per grid step.

    lags_ref: (C, 1 + n_lags) int32 scalar-prefetch rows
    [start0, b_0, ..., b_{L-1}] — start0 is the 256-aligned base of the
    candidate's lag span, b_l = lag_l + PAD - start0 in [0, _W-256].
    zp_ref: (2, Np) f32 VMEM; drift_ref: (1, 1, 162) f32;
    freqs_ref: (1, 1, F) f32; out_ref: (1, n_lags, 162, 4*F) f32.

    All n_lags share one 4-block aligned load per plane: the frame of lag_l
    occupies aligned columns [b_l, b_l+256) of the (162, _W) window, and the
    b_l shift is applied by masking the correlation matrix rows — the phase
    error exp(-i*w*b_l) this introduces is magnitude-invariant and only
    |corr| is consumed.
    """
    import jax.experimental.pallas as pl

    cid = pl.program_id(0)
    jp = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)       # j' in [0,_W)
    jpf = jp.astype(jnp.float32)

    # derotation phasor at aligned index j': (162, _W)
    wd = (-2.0 * jnp.pi * _DT) * drift_ref[0, 0, :][:, None] * jpf
    Pr = jnp.cos(wd)
    Pi = jnp.sin(wd)

    # tone bank at aligned index j': stacked real (2*_W, 8F) correlation
    # matrix  [zdr zdi] @ [[Br, Bi], [-Bi, Br]] = [Re(corr) Im(corr)].
    # The (1, 4F) probe-frequency row is built with repeat + iota
    # arithmetic — Mosaic cannot shape-cast (F, 4) -> (1, 4F).
    from jax.experimental.pallas import tpu as pltpu

    # pltpu.repeat TILES ([f0..fF f0..fF ...]), so columns are tone-major:
    # column r = tone (r // F), freq (r % F); the wrapper restores the
    # (freq, tone) order.
    tone_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * F), 1) // F
    tones = (tone_idx.astype(jnp.float32) - 1.5) * jnp.float32(TONE_SPACING)
    frow = pltpu.repeat(freqs_ref[0], 4, axis=1)               # (1, 4F) tiled
    ft = frow + tones                                          # (1, 4F)
    jcol = jax.lax.broadcasted_iota(jnp.int32, (_W, 1), 0).astype(jnp.float32)
    wb = (-2.0 * jnp.pi * _DT) * jcol * ft                     # (_W, 4F)
    Br = jnp.cos(wb)
    Bi = jnp.sin(wb)
    B = jnp.concatenate([
        jnp.concatenate([Br, Bi], axis=1),
        jnp.concatenate([-Bi, Br], axis=1),
    ], axis=0)                                                 # (2_W, 8F)

    # one aligned load per 256-wide column block, shared by all lags
    start0 = pl.multiple_of(lags_ref[cid, 0], 256)
    planes = []
    for plane in range(2):
        blocks = [
            zp_ref[plane, pl.ds(start0 + 256 * i, _FRAME)].reshape(162, 256)
            for i in range(_W // 256)
        ]
        planes.append(jnp.concatenate(blocks, axis=1))         # (162, _W)
    fr, fi = planes
    zdr = fr * Pr - fi * Pi
    zdi = fr * Pi + fi * Pr
    A = jnp.concatenate([zdr, zdi], axis=1)                    # (162, 2_W)

    for l in range(n_lags):
        b = lags_ref[cid, 1 + l]
        # restrict to the b-shifted 256-sample symbol window
        mask = ((jp >= b) & (jp < b + 256)).astype(jnp.float32)
        m2 = jnp.concatenate([mask, mask], axis=1).reshape(2 * _W, 1)
        corr = jnp.dot(A, B * m2, preferred_element_type=jnp.float32)
        cr = corr[:, :4 * F]
        ci = corr[:, 4 * F:]
        out_ref[0, l] = jnp.sqrt(cr * cr + ci * ci)


@functools.partial(jax.jit, static_argnames=("n_lags", "interpret"))
def probe_powers_pallas(zp_ri: jnp.ndarray, lags: jnp.ndarray,
                        freqs: jnp.ndarray, drift_sym: jnp.ndarray,
                        *, n_lags: int, interpret: bool = False):
    """Tone powers for every (candidate, lag, symbol, freq, tone) probe.

    zp_ri: (2, N + pads) float32 pre-padded window from pad_window_ri;
    lags: (C, L) int32 (window-relative, may be negative);
    freqs: (C, F) float32; drift_sym: (C, 162) float32.
    Returns p (C, F, L, 162, 4) float32 — the layout eval_probe_grid uses.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, F = freqs.shape
    Np = zp_ri.shape[1]
    # per-candidate 256-aligned base of the lag span + per-lag offsets.
    # Callers keep each candidate's lag span <= _W - 512 (the staged grids
    # span at most 256 samples), so b fits in [0, _W-256).
    starts = jnp.clip(lags.astype(jnp.int32) + PAD, 0, Np - _FRAME - _W)
    base = (jnp.min(starts, axis=1) // 256) * 256              # (C,)
    b = jnp.clip(starts - base[:, None], 0, _W - 256)
    lag_rows = jnp.concatenate([base[:, None], b], axis=1)     # (C, 1+L)

    # Mosaic requires the last two dims of every block to be divisible by
    # (8, 128) or equal to the array dims — hence the singleton middle axis
    # on the per-candidate rows.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((2, Np), lambda c, lags: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 162), lambda c, lags: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda c, lags: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_lags, 162, 4 * F),
                               lambda c, lags: (c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_probe_kernel, n_lags=n_lags, F=F),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, n_lags, 162, 4 * F), jnp.float32),
        interpret=interpret,
    )(lag_rows, zp_ri, drift_sym[:, None, :], freqs[:, None, :])
    # kernel columns are tone-major: (C, L, 162, 4F) -> (C, F, L, 162, 4)
    p = out.reshape(C, n_lags, 162, 4, F)
    return jnp.transpose(p, (0, 4, 1, 2, 3))


def pad_window_ri(ri: jnp.ndarray) -> jnp.ndarray:
    """(2, N) float32 -> zero-padded copy with the n==0 sample zeroed
    (the reference's 0 < n < N guard). The total length is rounded up to a
    multiple of 256 for aligned vector loads."""
    n = ri.shape[1]
    right = PAD + (-(n + 2 * PAD) % 256)
    zp = jnp.pad(ri, ((0, 0), (PAD, right)))
    return zp.at[:, PAD].set(0.0)


__all__ = ["probe_powers_pallas", "pad_window_ri", "PAD"]
