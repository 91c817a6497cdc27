"""Batched STFT power spectrum for the coarse search.

The reference computes 348 windowed 512-point FFTs per 45000-sample window
with FFTW, one at a time (lib/FDR_impl.cc:222-254). Here the whole scan is
one batched XLA FFT: frame extraction is a reshape-free strided gather, the
half-sine window is a broadcast multiply, and the band reorder (DC at column
``size/2``) is an fftshift. Batches over leading dims (windows/channels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def half_sine_window(size: int) -> np.ndarray:
    """w[j] = sin(pi/(size-1) * j) — reference lib/FDR_impl.cc:100-105."""
    return np.sin(np.pi / (size - 1) * np.arange(size)).astype(np.float32)


def stft_power_core(z: jnp.ndarray, *, n_ffts: int = 348, size: int = 512,
                    hop: int = 128, impl: str = "fft",
                    col_window: tuple[int, int] | None = None) -> jnp.ndarray:
    """(..., fl) complex (traced, in-graph) -> (..., n_ffts, ncols) float32.

    Column layout matches the reference: column j holds frequency
    (j - size/2) * fs/size, i.e. DC at column size/2 (lib/FDR_impl.cc:246-253).

    impl="fft": XLA's batched FFT (f32-exact vs the NumPy oracle).
    impl="matmul_bf16": the 512-point DFT evaluated as four bf16 real
    matmuls against embedded cos/sin matrices with f32 accumulation —
    the MXU-native formulation (one 512x512 DFT is 0.5 MFLOP more
    FLOPs than the FFT but the MXU has ~50x the FLOP/s headroom of the
    HBM-bound FFT path; measured A/B in scripts/perf_stages_batch.py).
    bf16 mantissa rounding perturbs the power spectrum by ~1e-2
    relative — within the noise floor the 30th-percentile SNR
    normalization rides on; decode parity is pinned by the bench
    (128/128) and SWEEP artifacts, like the bf16 probe ladder.

    col_window=(lo, hi): return only output columns [lo, hi) — the
    narrowband device pipeline reads nothing outside the passband plus
    the conv-kernel/smoothing reach (~48 of 512 columns at the example
    config; see jit_decoder._coarse_stage). Each DFT output column is an
    independent dot product, so the matmul impl simply embeds the sliced
    cos/sin matrices (identical per-column math at ~1/10 the MXU work
    and output bytes); the FFT impl computes the full transform and
    slices (the FFT cannot subset columns), still saving every
    downstream byte.
    """
    w = jnp.asarray(half_sine_window(size))
    if size % hop == 0 and impl == "matmul_bf16":
        # hop divides size: frame i = rows i..i+size/hop-1 of the
        # (fl/hop, hop) reshape — STATIC slices + one concat instead of
        # an (n, size) advanced gather (TPU gathers are row-latency-
        # bound and materialize the full frame matrix before the window
        # multiply; the sliced form fuses into the DFT matmuls)
        k = size // hop                                    # 4
        n_rows = n_ffts + k - 1
        pad_to = n_rows * hop
        zp = jnp.pad(z, [(0, 0)] * (z.ndim - 1)
                     + [(0, pad_to - z.shape[-1])]) if pad_to > z.shape[-1] \
            else z[..., :pad_to]
        R = zp.reshape(zp.shape[:-1] + (n_rows, hop))
        frames = jnp.concatenate(
            [R[..., i:i + n_ffts, :] for i in range(k)], axis=-1)
        frames = frames * w                                # (..., n, size)
    else:
        starts = jnp.arange(n_ffts) * hop                  # (n,)
        idx = starts[:, None] + jnp.arange(size)[None, :]  # (n, size)
        frames = z[..., idx] * w                           # (..., n, size)
    if impl == "matmul_bf16":
        k = np.arange(size)
        ang = -2.0 * np.pi * np.outer(k, k) / size
        # fftshift folded into the matrices: output column j = bin
        # (j - size/2) mod size
        shift = np.roll(np.arange(size), size // 2)
        C = np.cos(ang)[:, shift].astype(np.float32)
        S = np.sin(ang)[:, shift].astype(np.float32)
        if col_window is not None:
            C = C[:, col_window[0]:col_window[1]]
            S = S[:, col_window[0]:col_window[1]]
        Cb, Sb = jnp.asarray(C, jnp.bfloat16), jnp.asarray(S, jnp.bfloat16)
        fr = jnp.real(frames).astype(jnp.bfloat16)
        fi = jnp.imag(frames).astype(jnp.bfloat16)
        f32 = jnp.float32
        re = (jnp.matmul(fr, Cb, preferred_element_type=f32)
              - jnp.matmul(fi, Sb, preferred_element_type=f32))
        im = (jnp.matmul(fr, Sb, preferred_element_type=f32)
              + jnp.matmul(fi, Cb, preferred_element_type=f32))
        return re * re + im * im
    spec = jnp.fft.fft(frames, axis=-1)
    spec = jnp.fft.fftshift(spec, axes=-1)
    ps = (spec.real * spec.real + spec.imag * spec.imag).astype(jnp.float32)
    if col_window is not None:
        ps = ps[..., col_window[0]:col_window[1]]
    return ps


@functools.partial(jax.jit, static_argnames=("n_ffts", "size", "hop"))
def _stft_power_ri(ri: jnp.ndarray, *, n_ffts: int, size: int, hop: int):
    return stft_power_core(jax.lax.complex(ri[..., 0, :], ri[..., 1, :]),
                           n_ffts=n_ffts, size=size, hop=hop)


def stft_power(z: np.ndarray, *, n_ffts: int = 348, size: int = 512,
               hop: int = 128) -> jnp.ndarray:
    """Host entry: complex samples -> power spectrum.

    Complex arrays cannot cross the host<->device boundary on all TPU
    runtimes, so the device ABI is a float32 (..., 2, fl) real/imag pair.
    """
    z = np.asarray(z)
    ri = np.stack([z.real.astype(np.float32), z.imag.astype(np.float32)],
                  axis=-2)
    return _stft_power_ri(jnp.asarray(ri), n_ffts=n_ffts, size=size, hop=hop)


__all__ = ["stft_power", "stft_power_core", "half_sine_window"]
