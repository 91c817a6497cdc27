"""Fused Pallas STFT-power kernel — frames never touch HBM.

The XLA STFT path (ops/stft.py) materializes the (348, 512) frame
matrix and several successors in HBM (~41 MB/window accessed, measured
post_stft ladder row) for ~4 MB of natural data. This kernel fuses
frame assembly + half-sine window + 512-point DFT + |.|^2 inside one
`pallas_call`: each grid step loads a (2, F, 128) sample tile into
VMEM, assembles F frames by CONCATENATING four hop-shifted row blocks
(hop=128 divides size=512, so frame i is rows i..i+3 of the
(fl/hop, hop) reshape — no gather), applies the window, and runs the
DFT as four bf16 MXU matmuls with f32 accumulation against embedded
cos/sin matrices (fftshift folded into the matrix columns, exactly the
`stft_impl="matmul_bf16"` numerics; tests pin both against the FFT).

Per-window HBM traffic: 4 shifted input views (~0.7 MB) + the (348,
512) f32 power output (0.7 MB) — ~1.4 MB vs ~41 MB for the XLA path.

Reference behavior implemented: lib/FDR_impl.cc:222-254 (348 windowed
512-point FFTs, power spectrum, DC at column size/2).

v5e status (r4 measured): the kernel itself runs fine vmapped at
W=128 standalone (any block size), and the device engine decodes
through it at W<=64 (interleaved A/B ~3.7% faster than the FFT,
inside co-tenant noise). The FULL W=128 decode program with BOTH
Pallas kernels (this + the VMEM Fano) reproducibly crashes the
tunneled v5e worker — a server-side compiler/runtime limit, not a
kernel bug — so this kernel remains an experimental option. The
serving default (via with_serving_defaults) is the non-Pallas
"matmul_bf16" DFT in ops/stft.py; an explicit stft_impl="fft"
keeps the f32-exact XLA FFT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from uwspr_tpu.ops.stft import half_sine_window



@functools.lru_cache(maxsize=4)
def _dft_mats(size: int):
    k = np.arange(size)
    ang = -2.0 * np.pi * np.outer(k, k) / size
    shift = np.roll(np.arange(size), size // 2)   # fftshift in-columns
    C = np.cos(ang)[:, shift].astype(np.float32)
    S = np.sin(ang)[:, shift].astype(np.float32)
    return C, S


def _kernel(r0, r1, r2, r3, c_ref, s_ref, o_ref, *, hop):
    """rk: (2, F, hop) bf16 windowed sample tiles (window pre-applied on
    the host side of the call — it fuses into the shift-slice writes).
    Frame f's 512 samples are [r0[f] | r1[f] | r2[f] | r3[f]]; instead
    of concatenating lanes, the DFT contracts each hop-chunk against
    its own 128-row block of the cos/sin matrices and accumulates:
    re = sum_k rk @ C[k*hop:(k+1)*hop]."""
    f32 = jnp.float32
    re = None
    im = None
    for k, r in enumerate((r0, r1, r2, r3)):
        Ck = c_ref[k * hop:(k + 1) * hop, :]
        Sk = s_ref[k * hop:(k + 1) * hop, :]
        fr = r[0]
        fi = r[1]
        re_k = (jnp.dot(fr, Ck, preferred_element_type=f32)
                - jnp.dot(fi, Sk, preferred_element_type=f32))
        im_k = (jnp.dot(fr, Sk, preferred_element_type=f32)
                + jnp.dot(fi, Ck, preferred_element_type=f32))
        re = re_k if re is None else re + re_k
        im = im_k if im is None else im + im_k
    o_ref[...] = re * re + im * im


def stft_power_pallas(z: jnp.ndarray, *, n_ffts: int = 348,
                      size: int = 512, hop: int = 128,
                      block_frames: int = 88,
                      interpret: bool = False) -> jnp.ndarray:
    """(fl,) complex (traced) -> (n_ffts, size) f32 power spectrum.

    vmap adds leading batch axes (pallas_call has a batching rule), so
    the vmapped device pipeline uses this unchanged. Requires
    hop | size; n_ffts is padded up to a multiple of block_frames
    (Mosaic wants the sublane block dim divisible by 8 — padded frames
    read zeros and their rows are sliced off the output)."""
    assert size % hop == 0 and block_frames % 8 == 0
    k = size // hop
    # _kernel hardcodes exactly four shifted-view refs (r0..r3); other
    # size/hop ratios would fail inside pallas_call with an opaque
    # arity error, so reject them up front
    assert k == 4, (
        f"stft_power_pallas requires size // hop == 4 (got size={size}, "
        f"hop={hop}): the fused kernel hardcodes 4 shifted frame views")
    n_blocks = -(-n_ffts // block_frames)
    n_pad = n_blocks * block_frames                 # 352 for the default
    n_rows = n_pad + k - 1
    pad_to = n_rows * hop
    zr = jnp.real(z).astype(jnp.float32)
    zi = jnp.imag(z).astype(jnp.float32)
    ri = jnp.stack([zr, zi])                        # (2, fl)
    ri = (jnp.pad(ri, ((0, 0), (0, pad_to - ri.shape[-1])))
          if pad_to > ri.shape[-1] else ri[:, :pad_to])
    R = ri.reshape(2, n_rows, hop)
    win = half_sine_window(size).reshape(k, hop)
    # window folded into the shifted views: chunk i of frame f covers
    # window positions [i*hop, (i+1)*hop)
    shifts = [(R[:, i:i + n_pad, :] * win[i]).astype(jnp.bfloat16)
              for i in range(k)]                    # k x (2, n_pad, hop)
    C, S = _dft_mats(size)
    Cb = jnp.asarray(C, jnp.bfloat16)
    Sb = jnp.asarray(S, jnp.bfloat16)

    rk_spec = pl.BlockSpec((2, block_frames, hop), lambda b: (0, b, 0))
    mat_spec = pl.BlockSpec((size, size), lambda b: (0, 0))
    out_spec = pl.BlockSpec((block_frames, size), lambda b: (b, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, hop=hop),
        grid=(n_blocks,),
        in_specs=[rk_spec] * k + [mat_spec, mat_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, size), jnp.float32),
        interpret=interpret,
    )(*shifts, Cb, Sb)
    return out[:n_ffts]


__all__ = ["stft_power_pallas"]
