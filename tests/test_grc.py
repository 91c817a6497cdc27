"""GRC flowgraph importer: parse + map the reference's .grc files, and run
the sender/receiver chains end-to-end through the CLI.

Reference surface: examples/AudioSourceDecode.grc (flagship live receiver),
examples/WaveFilePlusNoiseDecode.grc (closed-loop sim),
examples/c2ToWaveFile.grc / c2ToAudioSink.grc (sender/replay path).
"""

import pytest

from tests.test_cli import run_cli
from uwspr_tpu.grc import classify, describe, parse_grc, pipeline_config


@pytest.fixture
def examples(reference_examples):
    return reference_examples


def test_parse_audio_source_decode(examples):
    fg = parse_grc(examples / "AudioSourceDecode.grc")
    # variable blocks resolve, including cross-references
    assert fg.variables["Frame_Length"] == 45000
    assert fg.variables["Half_Bandwidth"] == 10
    kind, src, sink = classify(fg, str(examples))
    assert kind == "receiver" and src.kind == "audio" and sink is None
    cfg = pipeline_config(fg)
    assert cfg.coarse.fl == 45000
    assert cfg.coarse.maxfreqs == 200
    assert cfg.coarse.halfbandwidth == 10
    assert cfg.coarse.threshold == 10.0
    assert cfg.stream.shift == 9
    assert cfg.stream.capacity_windows == 2
    assert cfg.frontend.audio_rate == 12000
    assert cfg.frontend.center_freq == 1500.0
    assert cfg.frontend.decimation == 32


def test_parse_wave_plus_noise(examples):
    fg = parse_grc(examples / "WaveFilePlusNoiseDecode.grc")
    kind, src, sink = classify(fg, str(examples))
    assert kind == "receiver" and src.kind == "wav_mix"
    assert sorted(p.rsplit("/", 1)[-1] for p in src.files) == [
        "test_1500_Hz.wav", "whales_12000sps.wav"]
    # the flowgraph attenuates the WSPR wav to 0.1 and leaves whales at 1.0
    gains = dict(zip((p.rsplit("/", 1)[-1] for p in src.files), src.gains))
    assert gains["test_1500_Hz.wav"] == pytest.approx(0.1)
    assert gains["whales_12000sps.wav"] == pytest.approx(1.0)
    assert src.repeat
    # Max_Cand_Freqs variable flows into maxfreqs
    assert pipeline_config(fg).coarse.maxfreqs == 200


def test_parse_senders(examples):
    for name, sink_kind in [("c2ToWaveFile.grc", "wav"),
                            ("c2ToAudioSink.grc", "audio")]:
        fg = parse_grc(examples / name)
        kind, src, sink = classify(fg, str(examples))
        assert kind == "sender" and src.kind == "c2"
        assert src.files[0].endswith("VE3EMB.c2")
        assert sink.kind == sink_kind
        assert sink.rate == 12000
        assert "kind: sender" in describe(fg, str(examples))


def test_expression_evaluator_rejects_code():
    """Flowgraphs are untrusted input: only arithmetic over variables may
    evaluate; calls/attributes/subscripts must fall through as strings."""
    from uwspr_tpu.grc import _resolve
    names = {"a": 2}
    assert _resolve("a*3+1", names) == 7
    assert _resolve("-a", names) == -2
    assert _resolve("__import__('os')", names) == "__import__('os')"
    assert _resolve("firdes.WIN_HAMMING", names) == "firdes.WIN_HAMMING"
    assert _resolve('"blue"', names) == '"blue"'


@pytest.mark.slow
def test_grc_sender_roundtrip(examples, tmp_path):
    """c2ToWaveFile.grc -> wav -> decode recovers the golden message."""
    out = tmp_path / "test.wav"
    r = run_cli("grc", str(examples / "c2ToWaveFile.grc"), "-o", str(out))
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.stat().st_size > 2_000_000     # 120 s of 16-bit 12 kS/s
    r = run_cli("decode", str(out))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "VE3EMB FN25 30" in r.stdout


@pytest.mark.slow
def test_grc_live_audio_receiver(examples, tmp_path):
    """AudioSourceDecode.grc end-to-end: 12 kS/s s16 audio carrying one
    frame piped on stdin (the framework's soundcard transport) decodes."""
    import os
    import subprocess
    import sys

    import numpy as np

    from tests.test_cli import REPO
    from uwspr_tpu.frontend.downconvert import upconvert
    from uwspr_tpu.protocol.modulate import synthesize_frame

    z = np.asarray(synthesize_frame("VE3EMB", "FN25", 30, start_sample=750,
                                    freq_offset=1.5))
    audio = np.asarray(upconvert(z))                  # 12 kS/s float
    s16 = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    r = subprocess.run(
        [sys.executable, "-m", "uwspr_tpu.cli", "--platform", "cpu",
         "grc", str(examples / "AudioSourceDecode.grc")],
        input=s16, capture_output=True, timeout=420, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert b"VE3EMB FN25 30" in r.stdout


@pytest.mark.slow
def test_grc_receiver_decodes_through_interference(examples):
    """WaveFilePlusNoiseDecode.grc end-to-end: the WSPR wav at gain 0.1
    mixed with whale song at gain 1.0 must still decode (the reference's
    own closed-loop demonstration)."""
    r = run_cli("grc", str(examples / "WaveFilePlusNoiseDecode.grc"),
                "--windows", "16")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "VE3EMB FN25 30" in r.stdout


def test_unrecognized_topology_fails_loudly(tmp_path):
    """A .grc outside the mapped receiver/sender chain shapes must raise
    with the block inventory — never silently partially execute (the
    importer's documented coverage boundary)."""
    import pytest

    from uwspr_tpu.grc import classify, parse_grc

    p = tmp_path / "weird.grc"
    p.write_text("""<?xml version='1.0' encoding='utf-8'?>
<flow_graph>
  <block><key>blocks_null_source</key>
    <param><key>id</key><value>src0</value></param></block>
  <block><key>blocks_null_sink</key>
    <param><key>id</key><value>snk0</value></param></block>
  <connection><source_block_id>src0</source_block_id>
    <sink_block_id>snk0</sink_block_id>
    <source_key>0</source_key><sink_key>0</sink_key></connection>
</flow_graph>""")
    with pytest.raises(ValueError, match="unrecognized flowgraph topology"):
        classify(parse_grc(p))
