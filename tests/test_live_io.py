"""Live-input plumbing: streaming downconversion, c2 repeat streaming,
and native-backend graceful degradation."""

import numpy as np
import pytest

import uwspr_tpu.fec as fec
from uwspr_tpu.fec import fano_decode_batch
from uwspr_tpu.frontend.downconvert import (
    Downconverter,
    StreamingDownconverter,
)
from uwspr_tpu.io.c2file import c2_stream, read_c2


def test_streaming_downconverter_matches_oneshot():
    """Pushing ragged chunks must equal the one-shot Downconverter output
    up to its fixed (num_taps//2)/decim-sample group delay."""
    rng = np.random.default_rng(0)
    t = np.arange(12000 * 4)
    audio = (np.sin(2 * np.pi * 1502.0 * t / 12000.0)
             + 0.1 * rng.normal(size=len(t))).astype(np.float32)
    ref = Downconverter()(audio)

    sdc = StreamingDownconverter()
    outs = []
    pos = 0
    for chunk in (1000, 37, 26000, 12345, len(audio)):
        end = min(pos + chunk, len(audio))
        outs.append(sdc.push(audio[pos:end]))
        pos = end
    got = np.concatenate(outs)
    delay = (len(sdc.taps) // 2) // sdc.cfg.decimation      # 4 samples
    n = len(ref) - delay
    assert len(got) == len(ref)
    np.testing.assert_allclose(got[delay:delay + n], ref[:n],
                               rtol=0, atol=2e-3)


def test_c2_stream_repeat(reference_examples):
    z = read_c2(reference_examples / "VE3EMB.c2").samples
    # non-repeat: exactly the file, in blocks
    blocks = list(c2_stream(reference_examples / "VE3EMB.c2", block=3375))
    np.testing.assert_array_equal(np.concatenate(blocks), z)
    # repeat: the stream tiles the file seamlessly
    gen = c2_stream(reference_examples / "VE3EMB.c2", repeat=True,
                    block=3375)
    got = np.concatenate([next(gen) for _ in range(20)])
    want = np.tile(z, 2)[:len(got)]
    np.testing.assert_array_equal(got, want)


def test_c2_stream_drift_accumulates(reference_examples):
    """The injected drift phase ramp must accumulate over the absolute
    stream index (reference keeps it in a static), not restart per block."""
    from uwspr_tpu.io.c2file import apply_sim_drift
    z = read_c2(reference_examples / "VE3EMB.c2").samples
    blocks = list(c2_stream(reference_examples / "VE3EMB.c2",
                            drift_rate=2.0, block=4000))
    np.testing.assert_allclose(np.concatenate(blocks),
                               apply_sim_drift(z, 2.0), atol=1e-5)


def test_fano_native_fallback(monkeypatch):
    """A broken native build must degrade to the pure-Python backend with
    a warning, not crash the default pipeline (fano_backend='native')."""
    import uwspr_tpu.fec.native as native

    def boom(*a, **k):
        raise OSError("simulated missing compiler")

    monkeypatch.setattr(native, "fano_decode_batch_native", boom)
    monkeypatch.setattr(fec, "_native_unavailable", None)
    from tests.test_fec import _golden_lanes
    payload, lanes = _golden_lanes(2, 0.0)
    with pytest.warns(RuntimeWarning, match="native fano backend"):
        success, data, *_ = fano_decode_batch(lanes, backend="native")
    assert success.all()
    assert np.array_equal(data[0, :7], payload[:7])
    # the flag is latched: a second call silently uses the fallback
    success2, *_ = fano_decode_batch(lanes, backend="native")
    assert success2.all()
    monkeypatch.setattr(fec, "_native_unavailable", None)
