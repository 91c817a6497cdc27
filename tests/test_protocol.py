"""Protocol layer unit tests: tables, encoder, interleaver, messages."""

import numpy as np
import pytest

from uwspr_tpu.protocol import constants as C
from uwspr_tpu.protocol import fec_encode as enc
from uwspr_tpu.protocol import messages as msg
from uwspr_tpu.protocol.modulate import modulate_symbols, synthesize_frame


def test_parity_table():
    slow = np.array([bin(i).count("1") & 1 for i in range(256)], dtype=np.uint8)
    assert np.array_equal(C.PARITY8, slow)


def test_sync_vector_properties():
    s = C.SYNC_VECTOR
    assert s.shape == (162,)
    assert set(np.unique(s)) <= {0, 1}
    assert s.sum() == 63  # weight of the reference's sync vector
    assert list(s[:8]) == [1, 1, 0, 0, 0, 0, 0, 0]


def test_interleaver_is_permutation():
    p = C.INTERLEAVE_PERM
    assert sorted(p) == list(range(162))
    x = np.arange(162)
    assert np.array_equal(C.deinterleave(C.interleave(x)), x)
    assert np.array_equal(C.interleave(C.deinterleave(x)), x)
    # first kept bit-reversed indices: 0, 128, 64, 32, 160, 96, ...
    assert list(p[:6]) == [0, 128, 64, 32, 160, 96]


def test_metric_table():
    mt = C.FANO_METTAB
    assert mt.shape == (2, 256)
    assert np.array_equal(mt[1], mt[0][::-1])
    # spot values: mettab[0][0] = round(10*(0.9999-0.45)) = 5
    assert mt[0][0] == 5
    # last entry: round(10*(-13.2539-0.45)) = round(-137.039) = -137
    assert mt[0][255] == -137


def test_encoder_zero_and_impulse():
    assert np.array_equal(enc.encode_bits(np.zeros(10, np.uint8)),
                          np.zeros(20, np.uint8))
    # single 1 bit: state=1 -> sym1 = parity(1 & POLY1) = POLY1 bit0 = 1,
    # sym2 = parity(1 & POLY2) = POLY2 bit0 = 1
    out = enc.encode_bits(np.array([1], np.uint8))
    assert list(out) == [C.POLY1 & 1, C.POLY2 & 1]


def test_encoder_matches_bitwise_reimplementation():
    rng = np.random.default_rng(42)
    bits = rng.integers(0, 2, 81).astype(np.uint8)
    # independent scalar implementation straight from the code definition
    state = 0
    expect = []
    for b in bits:
        state = ((state << 1) | int(b)) & 0xFFFFFFFF
        expect.append(bin(state & C.POLY1).count("1") & 1)
        expect.append(bin(state & C.POLY2).count("1") & 1)
    assert list(enc.encode_bits(bits)) == expect


def test_channel_symbols_structure():
    bits = np.zeros(50, np.uint8)
    sym = enc.channel_symbols(bits)
    assert sym.shape == (162,)
    # all-zero info -> all coded bits 0 -> symbols equal the sync vector
    assert np.array_equal(sym, C.SYNC_VECTOR)


def test_hashlittle_published_vectors():
    # Published self-test vectors from Bob Jenkins' lookup3.c driver
    assert msg.nhash(b"", 0) == (0xDEADBEEF & 32767)
    k = b"Four score and seven years ago"
    assert _hashlittle_full(k, 0) == 0x17770551
    assert _hashlittle_full(k, 1) == 0xCD628161


def _hashlittle_full(key: bytes, initval: int) -> int:
    """nhash without the 15-bit mask, for checking published vectors."""
    U32 = 0xFFFFFFFF
    length = len(key)
    a = b = c = (0xDEADBEEF + length + initval) & U32
    if length == 0:
        return c
    pos, remaining = 0, length
    while remaining > 12:
        blk = key[pos:pos + 12]
        a = (a + int.from_bytes(blk[0:4], "little")) & U32
        b = (b + int.from_bytes(blk[4:8], "little")) & U32
        c = (c + int.from_bytes(blk[8:12], "little")) & U32
        a, b, c = msg._mix(a, b, c)
        pos += 12
        remaining -= 12
    blk = key[pos:pos + remaining] + b"\x00" * (12 - remaining)
    a = (a + int.from_bytes(blk[0:4], "little")) & U32
    b = (b + int.from_bytes(blk[4:8], "little")) & U32
    c = (c + int.from_bytes(blk[8:12], "little")) & U32
    return msg._final(a, b, c)


def test_nhash_matches_full_hash_masked():
    for key in (b"VE3EMB", b"K1JT", b"PA0SKT/2", b"A" * 25):
        assert msg.nhash(key) == _hashlittle_full(key, 146) & 32767


def test_pack_unpack_roundtrip_golden():
    payload = msg.pack_message("VE3EMB", "FN25", 30)
    u = msg.unpack_message(payload)
    assert u is not None
    assert u.text == "VE3EMB FN25 30"
    assert u.msg_type == 1 and not u.noprint


def test_pack_unpack_roundtrip_random():
    rng = np.random.default_rng(7)
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    for _ in range(50):
        call = (letters[rng.integers(26)] + letters[rng.integers(26)]
                + str(rng.integers(10)) + letters[rng.integers(26)]
                + letters[rng.integers(26)] + letters[rng.integers(26)])
        grid = (letters[rng.integers(18)] + letters[rng.integers(18)]
                + str(rng.integers(10)) + str(rng.integers(10)))
        power = int(rng.choice([0, 3, 7, 10, 13, 17, 20, 23, 27, 30, 33, 37]))
        u = msg.unpack_message(msg.pack_message(call, grid, power))
        assert u.text == f"{call} {grid} {power:2d}"


def test_pack_callsign_alignment():
    # 2-char prefix callsigns get a leading space so char 3 is the digit
    n = msg.pack_callsign("K1JT")
    assert msg.unpack_callsign(n) == "K1JT"


def test_grid_roundtrip_exhaustive():
    for ngrid in range(0, 32400, 379):
        g = msg.unpack_grid(ngrid << 7)
        assert msg.pack_grid(g) == ngrid


def test_hashtable_persistence(tmp_path):
    t = msg.HashTable()
    t.insert("VE3EMB")
    t.insert("K1JT")
    p = tmp_path / "hashtable.txt"
    t.save(p)
    t2 = msg.HashTable.load(p)
    assert t2.slots == t.slots
    ih = msg.nhash("VE3EMB")
    assert t2.lookup(ih) == "VE3EMB"


def _naive_demod(z: np.ndarray, lag: int) -> np.ndarray:
    """Noncoherent per-symbol argmax tone detector (numpy oracle)."""
    k = np.arange(256)
    tones = np.exp(-2j * np.pi * np.outer(C.TONE_OFFSETS * C.TONE_SPACING, k)
                   / C.SAMPLE_RATE)  # (4, 256)
    frames = z[lag:lag + 162 * 256].reshape(162, 256)
    p = np.abs(frames @ tones.T)     # (162, 4)
    return p.argmax(axis=1)


def test_modulator_naive_demod_roundtrip():
    payload = msg.pack_message("VE3EMB", "FN25", 30)
    bits = np.unpackbits(payload[:7])[:50]
    sym = enc.channel_symbols(bits)
    z = modulate_symbols(sym)
    assert np.array_equal(_naive_demod(z, 0), sym)


def test_golden_c2_channel_symbols(reference_examples):
    """The encode chain reproduces the reference capture's symbols.

    VE3EMB.c2 encodes "VE3EMB FN25 30" (README.md:37,43). A naive
    noncoherent demod of the clean capture must yield exactly the channel
    symbols our pack+encode+interleave+sync chain predicts.
    """
    from uwspr_tpu.io.c2file import read_c2
    c2 = read_c2(reference_examples / "VE3EMB.c2")
    payload = msg.pack_message("VE3EMB", "FN25", 30)
    bits = np.unpackbits(payload[:7])[:50]
    expect = enc.channel_symbols(bits)
    # the frame starts somewhere early in the file; find best lag coarsely
    best = None
    for lag in range(0, 45000 - 162 * 256, 128):
        got = _naive_demod(c2.samples, lag)
        score = (got == expect).mean()
        if best is None or score > best[1]:
            best = (lag, score)
    lag0 = best[0]
    for lag in range(max(0, lag0 - 128), lag0 + 129):
        if np.array_equal(_naive_demod(c2.samples, lag), expect):
            return
    pytest.fail(f"no lag reproduces the golden symbols (best {best})")


def test_synthesize_frame_padding():
    z = synthesize_frame("VE3EMB", "FN25", 30, start_sample=750)
    assert z.shape == (45000,)
    assert np.all(z[:750] == 0)
    assert np.all(np.abs(z[750:750 + 162 * 256]) > 0.99)
