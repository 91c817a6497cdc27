"""Drift-robustness decode tests: linear drift search (maxdrift > 0) and
the nonlinear straight-line-motion Doppler model (SLM trajectories).

Reference rig: c2file_source's drift_rate injector exercises the linear
search (c2file_source_impl.cc:117-133, grc/uwspr_c2file_source.xml), and
the SLM search exists for underwater vehicle trajectories
(lib/slm.cc:36-116, lib/FDR_impl.cc:376-405).
"""

import numpy as np
import pytest

from uwspr_tpu.config import CoarseConfig, PipelineConfig
from uwspr_tpu.io.c2file import apply_sim_drift
from uwspr_tpu.io.channel import apply_linear_drift, apply_slm_doppler, awgn
from uwspr_tpu.pipeline.decoder import WindowDecoder
from uwspr_tpu.protocol.modulate import synthesize_frame


def test_linear_drift_decode():
    """A frame with ~1 symbol of linear drift decodes when maxdrift=1."""
    rng = np.random.default_rng(0)
    z = synthesize_frame("K1ABC", "FN42", 37, start_sample=400, pad_to=None)
    z = apply_linear_drift(z, 1.4)        # ~1 tone-spacing over the frame
    w = np.zeros(45000, np.complex64)
    w[400:400 + len(z)] = z
    w = awgn(w, -18, rng=rng)
    dec = WindowDecoder(PipelineConfig(coarse=CoarseConfig(maxdrift=1)))
    r = dec(w)
    msgs = [s.message for s in r.spots]
    assert "K1ABC FN42 37" in msgs
    s = next(s for s in r.spots if s.message == "K1ABC FN42 37")
    assert s.mode == 0 and abs(s.drift) >= 0.5


def test_sim_drift_ramp_matches_reference_model():
    """The c2file drift injector's quadratic phase ramp."""
    z = np.ones(1000, np.complex64)
    out = apply_sim_drift(z, 2.0)
    n = np.arange(1000, dtype=np.float64)
    expect = np.exp(1j * np.pi * n * n * 2.0 / 375.0 ** 2)
    np.testing.assert_allclose(out, expect.astype(np.complex64), atol=1e-5)


def test_slm_doppler_decode():
    """A frame Doppler-shifted by an SLM trajectory decodes via the
    nonlinear search (one of the 125 generator trajectories)."""
    rng = np.random.default_rng(1)
    z = synthesize_frame("VE3EMB", "FN25", 30, start_sample=300, pad_to=None)
    # trajectory from the generator grid: V=(1,-2), p=(0,250)
    z = apply_slm_doppler(z, 1.0, -2.0, 0.0, 250.0, cf=1500.0)
    w = np.zeros(45000, np.complex64)
    w[300:300 + len(z)] = z
    w = awgn(w, -15, rng=rng)
    dec = WindowDecoder()
    r = dec(w)
    msgs = [s.message for s in r.spots]
    assert "VE3EMB FN25 30" in msgs


def test_slm_drift_magnitude():
    """SLM drift values match the reference's QA program setup
    (lib/slm_qa.cc:31-56: V=(1,-2), p=(0,50), cf=1500)."""
    from uwspr_tpu.models.slm import slm_frequency_drift
    t = np.arange(0, 120.0)
    d = slm_frequency_drift(1.0, -2.0, 0.0, 50.0, 1500.0, t)
    # drift is bounded by |V|*cf/c = sqrt(5)*1500/1500 = sqrt(5) Hz
    assert np.all(np.abs(d) <= np.sqrt(5) + 1e-9)
    # vehicle recedes (V2<0 dominates): drift starts negative-ish and
    # asymptotically approaches -|V|*cf/c
    assert d[-1] < d[0]
