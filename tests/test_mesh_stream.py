"""Mesh streaming correctness: the sharded decode path must produce the
same spots as a single-device sliding-window decode of the same stream,
including frames that straddle time-shard and step boundaries.

These are the proof tests for the overlap-save halo exchange
(parallel.mesh.extend_with_halo): per-shard blocks are one or two 9 s
hops, while a WSPR frame is 111 s — every decoded frame necessarily spans
many shards, so a decode is only possible if the chained ppermute + tail
hands each shard exactly the right samples (the reference's windowing
contract, lib/sliding_window_stream_to_pdu_impl.cc:113-135).
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from uwspr_tpu.config import (
    CoarseConfig,
    DemodConfig,
    PipelineConfig,
    StreamConfig,
)
from uwspr_tpu.io.channel import noise_sigma
from uwspr_tpu.parallel.mesh import (
    ShardedStreamDecoder,
    extend_with_halo,
    make_mesh,
)
from uwspr_tpu.protocol.modulate import synthesize_frame


@pytest.mark.parametrize("n_ch,n_time,block_len,halo", [
    (2, 4, 6, 15),    # halo longer than block: 3 chained ppermute rounds
    (2, 4, 20, 15),   # halo shorter than block: 1 round
    (2, 1, 6, 15),    # single time shard: tail only
    (1, 8, 5, 23),    # deep chain across the full 8-device axis
])
def test_extend_with_halo_exact(n_ch, n_time, block_len, halo):
    """Each shard's extended row must equal the corresponding slice of
    concat(stream, tail) — element-exact."""
    if len(jax.devices()) < n_ch * n_time:
        pytest.skip("not enough virtual devices")
    mesh = make_mesh(n_ch, n_time, devices=jax.devices()[:n_ch * n_time])
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n_ch, 2, n_time * block_len)).astype(np.float32)
    tail = rng.normal(size=(n_ch, 2, halo)).astype(np.float32)

    def fn(x_ri, tail_ri):
        ext = extend_with_halo(x_ri, tail_ri, n_time=n_time,
                               block_len=block_len, halo=halo)
        return ext[None]

    out = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P("channel", None, "time"), P("channel", None, None)),
        out_specs=P("time", "channel", None, None)))(x, tail)
    out = np.asarray(out)                   # (n_time, n_ch, 2, block+halo)
    full = np.concatenate([x, tail], axis=2)
    for t in range(n_time):
        np.testing.assert_array_equal(
            out[t], full[:, :, t * block_len: t * block_len + block_len + halo])


def _spot_key(ch, w, spot):
    return (ch, w, spot.message)


@pytest.fixture(scope="module")
def stream_and_reference():
    """A 4-channel, 2-step continuous stream with frames placed across
    shard and step boundaries, plus the single-device reference decode."""
    from uwspr_tpu.pipeline.stream import StreamDecoder

    config = PipelineConfig(
        coarse=CoarseConfig(maxfreqs=4),
        demod=DemodConfig(maxcycles=128, n_jiggles=3),
        stream=StreamConfig(),
    )
    hop = config.stream.shift * config.stream.fs           # 3375
    fl = config.stream.fl                                  # 45000
    step_len = 4 * hop                                     # one (·,4) step
    total = 2 * step_len + (fl - hop)                      # 2 steps + tail
    rng = np.random.default_rng(7)
    sigma = noise_sigma(-16.0)
    x = (rng.normal(scale=sigma, size=(4, total))
         + 1j * rng.normal(scale=sigma, size=(4, total))).astype(np.complex64)
    frames = [
        (0, 500, "VE3EMB", "FN25", 30),      # window 0 (first shard + halo)
        (1, 3 * hop + 100, "K1ABC", "FN42", 37),   # window 3: its samples
        # come from step 1's last shard plus the *next step's* data (tail)
        (2, 6 * hop + 300, "W9XYZ", "EM48", 20),   # window 6, second step
    ]
    expected_msgs = set()
    for ch, start, call, grid, dbm in frames:
        f = synthesize_frame(call, grid, dbm, pad_to=None)
        x[ch, start:start + len(f)] += f
        expected_msgs.add(f"{call} {grid} {dbm}")

    ref = StreamDecoder(config, n_channels=4, engine="device")
    ref_spots = set()
    win_idx = [0, 0, 0, 0]
    for ch, r in ref.push(x):
        for s in r.spots:
            ref_spots.add(_spot_key(ch, win_idx[ch], s))
        win_idx[ch] += 1
    assert win_idx == [8, 8, 8, 8]           # (total - fl)//hop + 1 windows
    # every injected frame must actually decode in the reference
    assert expected_msgs <= {m for _, _, m in ref_spots}
    return config, x, ref_spots, expected_msgs


@pytest.mark.slow
@pytest.mark.parametrize("n_ch,n_time,wins_per_shard", [
    (2, 4, 1),
    (4, 2, 2),
])
def test_sharded_stream_matches_single_device(stream_and_reference,
                                              n_ch, n_time, wins_per_shard):
    config, x, ref_spots, expected_msgs = stream_and_reference
    if len(jax.devices()) < n_ch * n_time:
        pytest.skip("not enough virtual devices")
    mesh = make_mesh(n_ch, n_time, devices=jax.devices()[:n_ch * n_time])
    dec = ShardedStreamDecoder(config, mesh, n_channels=4,
                               wins_per_shard=wins_per_shard)
    # feed in uneven chunks to exercise host buffering across step edges
    got = []
    pos = 0
    for chunk in (10000, 25000, 7000, x.shape[1]):
        end = min(chunk + pos, x.shape[1])
        got.extend(dec.push(x[:, pos:end]))
        pos = end
    got.extend(dec.flush())                 # leftover == halo: no windows
    mesh_spots = {_spot_key(ch, w, s) for ch, w, s in got}
    assert mesh_spots == ref_spots
    assert expected_msgs <= {m for _, _, m in mesh_spots}
    assert dec.stats.windows == 8 * 4


@pytest.mark.slow
def test_sharded_stream_hybrid_matches_single_device(stream_and_reference):
    """engine="hybrid": each shard's XLA program stops at the sync/rms
    gates and the gathered prefano decodes through the native host Fano —
    the spot set must equal the all-device sharded engine (the host Fano
    is bit-exact, so identical gates imply identical spots)."""
    config, x, ref_spots, expected_msgs = stream_and_reference
    if len(jax.devices()) < 8:
        pytest.skip("not enough virtual devices")
    mesh = make_mesh(2, 4, devices=jax.devices()[:8])
    dec = ShardedStreamDecoder(config, mesh, n_channels=4, engine="hybrid")
    got = list(dec.push(x))
    got.extend(dec.flush())
    mesh_spots = {_spot_key(ch, w, s) for ch, w, s in got}
    assert mesh_spots == ref_spots
    assert expected_msgs <= {m for _, _, m in mesh_spots}


@pytest.mark.slow
@pytest.mark.parametrize("engine", ["hybrid", "device"])
def test_sharded_osd_fallback(engine):
    """Deep-SNR fallback on the mesh: a frame whose gated lanes all bust a
    crippled Fano budget must still decode via ordered-statistics decoding,
    tagged Spot.osd — through the host OSD (fec/osd.py) on the hybrid
    engine, and through the in-program device OSD (fec/osd_jax.py) on the
    all-device engine (both run the same shared batched program up to the
    Fano stage)."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    config = PipelineConfig(
        coarse=CoarseConfig(maxfreqs=4),
        demod=DemodConfig(maxcycles=1, n_jiggles=3, osd_depth=2),
        stream=StreamConfig(),
    )
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    dec = ShardedStreamDecoder(config, mesh, n_channels=2, engine=engine)
    hop, halo = dec.hop, dec.halo
    rng = np.random.default_rng(11)
    sigma = noise_sigma(-18.0)
    n = dec.step_len + halo
    x = (rng.normal(scale=sigma, size=(2, n))
         + 1j * rng.normal(scale=sigma, size=(2, n))).astype(np.complex64)
    f = synthesize_frame("VE3EMB", "FN25", 30, pad_to=None)
    x[0, 100:100 + len(f)] += f
    got = list(dec.push(x))
    got.extend(dec.flush())
    by = {(ch, s.message): s for ch, _, s in got}
    assert (0, "VE3EMB FN25 30") in by, sorted(by)
    assert by[(0, "VE3EMB FN25 30")].osd == 2


@pytest.mark.slow
def test_sharded_stream_checkpoint_resume(stream_and_reference):
    """Interrupting mid-stream and resuming from a checkpoint must yield
    the same spot set as an uninterrupted run."""
    config, x, ref_spots, _ = stream_and_reference
    if len(jax.devices()) < 8:
        pytest.skip("not enough virtual devices")
    import tempfile

    mesh = make_mesh(2, 4, devices=jax.devices()[:8])
    dec = ShardedStreamDecoder(config, mesh, n_channels=4)
    cut = 20000                              # mid-first-step
    got = list(dec.push(x[:, :cut]))
    with tempfile.TemporaryDirectory() as d:
        dec.save_checkpoint(d)
        dec2 = ShardedStreamDecoder(config, mesh, n_channels=4)
        dec2.dec = dec.dec                   # reuse the compiled step
        dec2.load_checkpoint(d)
    got.extend(dec2.push(x[:, cut:]))
    got.extend(dec2.flush())
    assert {_spot_key(ch, w, s) for ch, w, s in got} == ref_spots
