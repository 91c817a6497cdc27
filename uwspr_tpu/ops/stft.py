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
                    hop: int = 128) -> jnp.ndarray:
    """(..., fl) complex (traced, in-graph) -> (..., n_ffts, size) float32.

    Column layout matches the reference: column j holds frequency
    (j - size/2) * fs/size, i.e. DC at column size/2 (lib/FDR_impl.cc:246-253).
    """
    w = jnp.asarray(half_sine_window(size))
    starts = jnp.arange(n_ffts) * hop                      # (n,)
    idx = starts[:, None] + jnp.arange(size)[None, :]      # (n, size)
    frames = z[..., idx] * w                               # (..., n, size)
    spec = jnp.fft.fft(frames, axis=-1)
    spec = jnp.fft.fftshift(spec, axes=-1)
    return (spec.real * spec.real + spec.imag * spec.imag).astype(jnp.float32)


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
