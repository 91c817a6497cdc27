"""Shared-slice XLA probe path == the direct per-lag-slice reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from uwspr_tpu.demod.finesync import (
    _probe_powers_xla,
    _probe_powers_xla_gather,
)
from uwspr_tpu.io.channel import awgn
from uwspr_tpu.protocol.modulate import synthesize_frame


@pytest.mark.parametrize("C,F,L", [(4, 1, 17), (3, 5, 1), (2, 1, 5)])
def test_shared_slice_matches_gather(C, F, L):
    rng = np.random.default_rng(0)
    z = synthesize_frame("VE3EMB", "FN25", 30, start_sample=700,
                         freq_offset=1.3)
    z = awgn(z, -15, rng=rng)
    zj = jnp.asarray(z)
    # lag grids shaped like the real stages (span <= 256 samples: stage
    # grids are +/-128 step 64, jiggles +/-64 step 8 — the shared-slice
    # path supports spans up to 512)
    step = 8 if L > 5 else (64 if L > 1 else 1)
    lags = np.stack([640 + np.arange(L) * step - 128 for _ in range(C)])
    lags += rng.integers(-5, 6, size=(C, 1))
    lags = lags.astype(np.int32)
    freqs = (1.3 + 0.25 * (np.arange(F) - F // 2)
             )[None, :].repeat(C, 0).astype(np.float32)
    drift = np.zeros((C, 162), np.float32)
    drift[1:] = np.linspace(-0.7, 0.7, 162)[None, :]

    p_new = _probe_powers_xla(zj, jnp.asarray(lags), jnp.asarray(freqs),
                              jnp.asarray(drift), n_lags=L)
    p_ref = _probe_powers_xla_gather(zj, jnp.asarray(lags),
                                     jnp.asarray(freqs), jnp.asarray(drift),
                                     n_lags=L)
    np.testing.assert_allclose(np.asarray(p_new), np.asarray(p_ref),
                               rtol=2e-4, atol=2e-2)


def test_shared_slice_edge_lags():
    """Negative and end-of-window lags read only zero padding."""
    rng = np.random.default_rng(1)
    z = (rng.normal(size=45000) + 1j * rng.normal(size=45000)
         ).astype(np.complex64)
    zj = jnp.asarray(z)
    for lagval in (-200, 0, 3400):
        lags = np.full((2, 3), lagval, np.int32) + np.arange(3)[None, :] * 16
        freqs = np.zeros((2, 1), np.float32)
        drift = np.zeros((2, 162), np.float32)
        p_new = _probe_powers_xla(zj, jnp.asarray(lags), jnp.asarray(freqs),
                                  jnp.asarray(drift), n_lags=3)
        p_ref = _probe_powers_xla_gather(zj, jnp.asarray(lags),
                                         jnp.asarray(freqs),
                                         jnp.asarray(drift), n_lags=3)
        np.testing.assert_allclose(np.asarray(p_new), np.asarray(p_ref),
                                   rtol=2e-4, atol=2e-2)


def test_make_shared_probe_lanes_matches_per_window():
    """The cross-window lane variant must reproduce make_shared_probe
    element-exactly for every (window, center) pair — it is the same
    block-row gather with a widx*nblk row offset."""
    import jax.numpy as jnp
    import numpy as np

    from uwspr_tpu.demod.finesync import (
        make_shared_probe,
        make_shared_probe_lanes,
    )

    rng = np.random.default_rng(3)
    B, N = 3, 46000
    z_all = (rng.normal(size=(B, N))
             + 1j * rng.normal(size=(B, N))).astype(np.complex64)
    centers = rng.integers(0, 26 * 128, size=9).astype(np.int32)
    widx = np.array([0, 1, 2, 2, 1, 0, 1, 2, 0], np.int32)

    A_l, base_l = make_shared_probe_lanes(
        jnp.asarray(z_all), jnp.asarray(widx), jnp.asarray(centers),
        reach=128, W=640, block=128)
    for b in range(B):
        lanes_b = np.flatnonzero(widx == b)
        A_w, base_w = make_shared_probe(
            jnp.asarray(z_all[b]), jnp.asarray(centers[lanes_b]),
            reach=128, W=640, block=128)
        np.testing.assert_array_equal(np.asarray(base_l)[lanes_b],
                                      np.asarray(base_w))
        np.testing.assert_array_equal(np.asarray(A_l)[lanes_b],
                                      np.asarray(A_w))


def test_make_shared_probe_bf16_matches_complex():
    """The bf16 real/imag-plane construction (pair-plane gather rows +
    overlap blocks) must equal the complex builder cast to bf16, element
    for element, for both the per-window and the cross-window-lane
    variants — the only difference is WHERE the bf16 rounding happens
    (before the gather), and gathers don't do arithmetic."""
    import jax.numpy as jnp
    import numpy as np

    from uwspr_tpu.demod.finesync import (
        make_shared_probe,
        make_shared_probe_lanes,
    )

    rng = np.random.default_rng(7)
    B, N = 2, 46000
    z_all = (rng.normal(size=(B, N))
             + 1j * rng.normal(size=(B, N))).astype(np.complex64)
    centers = rng.integers(0, 26 * 128, size=6).astype(np.int32)
    widx = np.array([0, 1, 1, 0, 1, 0], np.int32)

    # per-window
    A_c, base_c = make_shared_probe(
        jnp.asarray(z_all[0]), jnp.asarray(centers), reach=128, W=640,
        block=128)
    A_b, base_b = make_shared_probe(
        jnp.asarray(z_all[0]), jnp.asarray(centers), reach=128, W=640,
        block=128, dtype="bf16")
    assert A_b.dtype == jnp.bfloat16 and A_b.shape == (6, 2, 162, 640)
    np.testing.assert_array_equal(np.asarray(base_b), np.asarray(base_c))
    ref = np.stack([np.real(np.asarray(A_c)), np.imag(np.asarray(A_c))],
                   axis=1).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(A_b), ref)

    # cross-window lanes
    A_lc, base_lc = make_shared_probe_lanes(
        jnp.asarray(z_all), jnp.asarray(widx), jnp.asarray(centers),
        reach=96, W=640, block=128)
    A_lb, base_lb = make_shared_probe_lanes(
        jnp.asarray(z_all), jnp.asarray(widx), jnp.asarray(centers),
        reach=96, W=640, block=128, dtype="bf16")
    assert A_lb.shape == (6, 2, 162, 640)
    np.testing.assert_array_equal(np.asarray(base_lb), np.asarray(base_lc))
    ref = np.stack([np.real(np.asarray(A_lc)), np.imag(np.asarray(A_lc))],
                   axis=1).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(A_lb), ref)


def test_phasor_ramp_ri_matches_complex():
    """_phasor_ramp_ri == phasor_ramp up to one bf16 rounding per factor
    (same split-exponential evaluation; only the outer-product operands
    are pre-rounded)."""
    import jax.numpy as jnp
    import numpy as np

    from uwspr_tpu.demod.finesync import _phasor_ramp_ri, phasor_ramp

    rng = np.random.default_rng(9)
    theta = rng.uniform(-0.01, 0.01, size=(4, 162)).astype(np.float32)
    ref = np.asarray(phasor_ramp(jnp.asarray(theta), 640))
    cr, ci = _phasor_ramp_ri(jnp.asarray(theta), 640, jnp.bfloat16)
    assert cr.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(cr, np.float32), np.real(ref),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(ci, np.float32), np.imag(ref),
                               atol=2e-2)
