"""Pallas probe kernel == XLA probe grid (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from uwspr_tpu.demod.finesync import complex_to_ri, eval_probe_grid_core
from uwspr_tpu.io.channel import awgn
from uwspr_tpu.ops.probe_pallas import pad_window_ri, probe_powers_pallas
from uwspr_tpu.protocol.modulate import synthesize_frame


@pytest.mark.parametrize("C,F,L", [(3, 1, 5), (2, 5, 1), (2, 1, 3)])
def test_pallas_matches_xla(C, F, L):
    rng = np.random.default_rng(0)
    z = synthesize_frame("VE3EMB", "FN25", 30, start_sample=700,
                         freq_offset=1.3)
    z = awgn(z, -15, rng=rng)
    ri = jnp.asarray(complex_to_ri(z))

    lags = np.stack([700 + np.arange(L) * 64 - 64,
                     *[np.arange(L) * 32 + 600] * (C - 1)]).astype(np.int32)
    freqs = (1.3 + 0.25 * (np.arange(F) - F // 2)
             )[None, :].repeat(C, 0).astype(np.float32)
    drift = np.zeros((C, 162), np.float32)
    drift[1:] = np.linspace(-0.5, 0.5, 162)[None, :]

    zj = jnp.asarray(z)
    _, p_ref = eval_probe_grid_core(zj, jnp.asarray(lags), jnp.asarray(freqs),
                                    jnp.asarray(drift), n_lags=L,
                                    want_symbols=True)
    p_pal = probe_powers_pallas(pad_window_ri(ri), jnp.asarray(lags),
                                jnp.asarray(freqs), jnp.asarray(drift),
                                n_lags=L, interpret=True)
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref),
                               rtol=2e-4, atol=2e-2)


def test_pallas_edge_lags():
    """Negative and end-of-window lags read only zero padding."""
    rng = np.random.default_rng(1)
    z = (rng.normal(size=45000) + 1j * rng.normal(size=45000)
         ).astype(np.complex64)
    ri = jnp.asarray(complex_to_ri(z))
    lags = np.array([[-200], [3400]], np.int32)
    freqs = np.zeros((2, 1), np.float32)
    drift = np.zeros((2, 162), np.float32)
    zj = jnp.asarray(z)
    _, p_ref = eval_probe_grid_core(zj, jnp.asarray(lags), jnp.asarray(freqs),
                                    jnp.asarray(drift), n_lags=1,
                                    want_symbols=True)
    p_pal = probe_powers_pallas(pad_window_ri(ri), jnp.asarray(lags),
                                jnp.asarray(freqs), jnp.asarray(drift),
                                n_lags=1, interpret=True)
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref),
                               rtol=2e-4, atol=2e-2)
