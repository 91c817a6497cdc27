"""Pallas TPU kernel: fused matched-filter probe-grid correlation.

This is the hot op of the demodulator (reference inner loop:
lib/sync_and_demodulate_impl.cc:163-233 — regenerate 4 tones per symbol,
correlate 256 samples, for every probed (lag, freq)). The XLA formulation
materializes a (C, 162*256) complex frame per probed lag in HBM (~66 MB per
lag, ~2.6 GB per window decode); this kernel keeps the whole zero-padded
45000-sample window resident in VMEM (~0.4 MB) and streams nothing to HBM
but the (C, L, 162, 4F) tone powers.

Per grid step (one candidate):
  - drift phasor (162, 256) from the per-symbol drift row (VPU cos/sin);
  - tone bank (4F, 256) from the probe frequencies + the 4 WSPR tones;
  - per lag: slice the 41472-sample frame at lags[c, l] (VMEM dynamic
    slice), derotate by the phasor, and correlate via ONE stacked real
    matmul  [zdr zdi] (162, 512) @ [[br, bi], [-bi, br]] (512, 2*4F)
    on the MXU = the complex correlation's real/imag parts.

Semantics are identical to demod.finesync.eval_probe_grid_core: the host
wrapper pads the window and zeroes sample 0, reproducing the reference's
0 < n < N correlation guard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from uwspr_tpu.protocol.constants import (
    SAMPLE_RATE,
    TONE_OFFSETS,
    TONE_SPACING,
)

_DT = 1.0 / SAMPLE_RATE
_TONES_HZ = (TONE_OFFSETS * TONE_SPACING).astype(np.float32)   # (4,)
_FRAME = 162 * 256
PAD = 4096


def _probe_kernel(lags_ref, zp_ref, drift_ref, freqs_ref, out_ref,
                  *, n_lags: int, F: int):
    """One candidate per grid step.

    lags_ref: (C, n_lags) int32 scalar-prefetch; zp_ref: (2, Np) f32 VMEM;
    drift_ref: (1, 162) f32; freqs_ref: (1, F) f32;
    out_ref: (1, n_lags, 162, 4*F) f32.
    """
    import jax.experimental.pallas as pl

    cid = pl.program_id(0)
    k = jax.lax.broadcasted_iota(jnp.float32, (1, 256), 1)

    # drift phasor (162, 256)
    wd = (-2.0 * jnp.pi * _DT) * drift_ref[0, :][:, None] * k
    pr = jnp.cos(wd)
    pi = jnp.sin(wd)

    # tone bank (4F, 256) -> stacked (512, 8F) correlation matrix.
    # tones = (iota(4) - 1.5) * TONE_SPACING (constants cannot be captured
    # by a pallas kernel, so build them from iota).
    tones = (jax.lax.broadcasted_iota(jnp.float32, (1, 4), 1) - 1.5) \
        * jnp.float32(TONE_SPACING)
    ft = (freqs_ref[0, :][:, None] + tones).reshape(4 * F, 1)
    wb = (-2.0 * jnp.pi * _DT) * ft * k                     # (4F, 256)
    br = jnp.cos(wb).T                                      # (256, 4F)
    bi = jnp.sin(wb).T
    B = jnp.concatenate([
        jnp.concatenate([br, bi], axis=1),
        jnp.concatenate([-bi, br], axis=1),
    ], axis=0)                                              # (512, 8F)

    for l in range(n_lags):
        start = lags_ref[cid, l]
        fr = zp_ref[0, pl.ds(start, _FRAME)].reshape(162, 256)
        fi = zp_ref[1, pl.ds(start, _FRAME)].reshape(162, 256)
        zdr = fr * pr - fi * pi
        zdi = fr * pi + fi * pr
        A = jnp.concatenate([zdr, zdi], axis=1)             # (162, 512)
        corr = jnp.dot(A, B, preferred_element_type=jnp.float32)
        cr = corr[:, :4 * F]
        ci = corr[:, 4 * F:]
        out_ref[0, l] = jnp.sqrt(cr * cr + ci * ci)


@functools.partial(jax.jit, static_argnames=("n_lags", "interpret"))
def probe_powers_pallas(zp_ri: jnp.ndarray, lags: jnp.ndarray,
                        freqs: jnp.ndarray, drift_sym: jnp.ndarray,
                        *, n_lags: int, interpret: bool = False):
    """Tone powers for every (candidate, lag, symbol, freq, tone) probe.

    zp_ri: (2, N + 2*PAD) float32 pre-padded window with zp[:, PAD] == 0;
    lags: (C, L) int32 (window-relative, may be negative);
    freqs: (C, F) float32; drift_sym: (C, 162) float32.
    Returns p (C, F, L, 162, 4) float32 — the layout eval_probe_grid uses.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, F = freqs.shape
    Np = zp_ri.shape[1]
    starts = jnp.clip(lags.astype(jnp.int32) + PAD, 0, Np - _FRAME)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((2, Np), lambda c, lags: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 162), lambda c, lags: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda c, lags: (c, 0),
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
    )(starts, zp_ri, drift_sym, freqs)
    # (C, L, 162, 4F) -> (C, F, L, 162, 4)
    p = out.reshape(C, n_lags, 162, F, 4)
    return jnp.transpose(p, (0, 3, 1, 2, 4))


def pad_window_ri(ri: jnp.ndarray) -> jnp.ndarray:
    """(2, N) float32 -> (2, N + 2*PAD) with the n==0 sample zeroed
    (the reference's 0 < n < N guard)."""
    zp = jnp.pad(ri, ((0, 0), (PAD, PAD)))
    return zp.at[:, PAD].set(0.0)


__all__ = ["probe_powers_pallas", "pad_window_ri", "PAD"]
