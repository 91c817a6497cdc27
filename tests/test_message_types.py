"""Type-2 (compound callsign) and type-3 (hashed callsign + 6-char grid)
message unpacking, with the persistent hashtable flow
(reference: lib/helpers.cc:494-590, lib/WSPR_unpacker_impl.cc:121-139)."""

import numpy as np

from uwspr_tpu.protocol.messages import (
    HashTable,
    nhash,
    pack50,
    pack_callsign,
    unpack_message,
)


def _payload(n1: int, n2: int) -> bytes:
    return bytes(np.asarray(pack50(n1, n2), np.uint8)[:7])


def test_type2_prefix():
    """ntype=31 (nu=1 -> nadd=1), prefix '3D2' in base-37 -> '3D2/K1ABC 30'."""
    n3 = ((3 * 37 + 13) * 37 + 2)          # "3D2"
    n2 = n3 * 128 + (31 + 64)
    u = unpack_message(_payload(pack_callsign("K1ABC"), n2))
    assert u is not None
    assert u.msg_type == 2
    assert u.text == "3D2/K1ABC 30"
    assert u.power_dbm == 30
    assert not u.noprint


def test_type2_suffix():
    """nadd=2 path: n3 >= 60000 encodes a single-char suffix."""
    # want n3 = 60000 + nc with nc the suffix char; nc=7 -> '7'
    n3 = 60007
    n2 = (n3 - 32768) * 128 + ((30 + 2) + 64)   # ntype=32, nu=2 -> nadd=2
    u = unpack_message(_payload(pack_callsign("K1ABC"), n2))
    assert u is not None
    assert u.msg_type == 2
    assert u.text == "K1ABC/7 30"


def test_type3_hash_lookup_and_miss():
    """Type-3: callsign field carries the rotated 6-char locator; the 15-bit
    hash resolves against previously heard callsigns."""
    ht = HashTable()
    # hear K1ABC via a type-1 spot first (inserts into the table)
    grid6 = "FN25AB"
    rotated = grid6[1:] + grid6[0]               # unpack rotates right
    n1 = pack_callsign(rotated)
    ndbm = 27
    ntype = -(ndbm + 1)
    ihash = nhash("K1ABC")
    n2 = ihash * 128 + (ntype + 64)
    # miss: empty table
    u = unpack_message(_payload(n1, n2), HashTable())
    assert u.msg_type == 3 and u.text == f"<...> {grid6} {ndbm:2d}"
    # hit: after the table has heard K1ABC
    ht.insert("K1ABC")
    u = unpack_message(_payload(n1, n2), ht)
    assert u.text == f"<K1ABC> {grid6} {ndbm:2d}"
    assert u.grid == grid6
    assert not u.noprint


def test_type1_inserts_into_hashtable():
    from uwspr_tpu.protocol.messages import pack_message
    ht = HashTable()
    u = unpack_message(bytes(np.asarray(pack_message("VE3EMB", "FN25", 30),
                                        np.uint8)[:7]), ht)
    assert u.msg_type == 1
    assert ht.lookup(nhash("VE3EMB")) == "VE3EMB"


# ---------------------------------------------------------------------------
# Inverse pack (round 3): compound and hash frames synthesized from text
# ---------------------------------------------------------------------------


def test_pack_type2_prefix_roundtrip():
    from uwspr_tpu.protocol.messages import pack_message_type2
    for compound, dbm in [("3D2/K1ABC", 30), ("PJ4/W9XYZ", 37),
                          ("EA8/VE3EMB", 0), ("A/N2AB", 23),
                          ("4X/G4CDE", 60)]:
        u = unpack_message(bytes(pack_message_type2(compound, dbm)[:7]))
        assert u is not None and u.msg_type == 2
        assert u.callsign == compound
        assert u.power_dbm == dbm
        assert not u.noprint
        assert u.text == f"{compound} {dbm:2d}"


def test_pack_type2_suffix_roundtrip():
    from uwspr_tpu.protocol.messages import pack_message_type2
    for compound, dbm in [("K1ABC/7", 30), ("W9XYZ/P", 37),
                          ("VE3EMB/25", 10), ("N2AB/99", 47)]:
        u = unpack_message(bytes(pack_message_type2(compound, dbm)[:7]))
        assert u is not None and u.msg_type == 2
        assert u.callsign == compound
        assert u.power_dbm == dbm
        assert not u.noprint


def test_pack_type3_roundtrip_with_hashtable():
    from uwspr_tpu.protocol.messages import pack_message, pack_message_type3
    ht = HashTable()
    # the receiver must hear the call via type-1 first
    unpack_message(bytes(pack_message("K1ABC", "FN42", 37)[:7]), ht)
    u = unpack_message(bytes(pack_message_type3("K1ABC", "FN42AX", 27)[:7]),
                       ht)
    assert u is not None and u.msg_type == 3
    assert u.text == "<K1ABC> FN42AX 27"
    assert u.grid == "FN42AX"
    assert u.power_dbm == 27
    assert not u.noprint
    # unknown hash -> <...>
    u2 = unpack_message(
        bytes(pack_message_type3("ZS6LM", "KG33PQ", 33)[:7]), HashTable())
    assert u2.text == "<...> KG33PQ 33"


def test_pack_message_dispatch_and_validation():
    import pytest
    from uwspr_tpu.protocol.messages import pack_message
    # "/" selects type 2; 6-char grid selects type 3
    assert unpack_message(bytes(pack_message("PJ4/K1ABC", None, 30)[:7])
                          ).msg_type == 2
    assert unpack_message(bytes(pack_message("K1ABC", "FN42AX", 30)[:7])
                          ).msg_type == 3
    with pytest.raises(ValueError):
        pack_message("PJ4/K1ABC", "FN42", 30)   # type 2 carries no grid
    with pytest.raises(ValueError):
        pack_message("K1ABC", "FN42", 31)       # invalid power unit
    with pytest.raises(ValueError):
        pack_message("K1ABC/XY", None, 30)      # bad suffix (letters x2)


def test_type23_closed_loop_decode():
    """RF closed loop: a type-1 frame teaches the receiver the callsign,
    then type-2 and type-3 frames decode through the full pipeline
    (synthesize -> AWGN -> WindowDecoder) with correct message text —
    the end-to-end hashtable traffic the reference's flowgraphs carry
    (lib/WSPR_unpacker_impl.cc:121-139)."""
    import numpy as np
    from uwspr_tpu.config import CoarseConfig, DemodConfig, PipelineConfig
    from uwspr_tpu.io.channel import awgn
    from uwspr_tpu.pipeline.decoder import WindowDecoder
    from uwspr_tpu.protocol.modulate import synthesize_frame

    ht = HashTable()
    dec = WindowDecoder(PipelineConfig(
        coarse=CoarseConfig(maxfreqs=4),
        demod=DemodConfig(maxcycles=512, n_jiggles=3)), hashtable=ht)
    rng = np.random.default_rng(11)
    got = []
    for call, grid, dbm in [("K1ABC", "FN42", 37),        # type 1: teach
                            ("PJ4/K1ABC", None, 30),      # type 2
                            ("K1ABC", "FN42AX", 27)]:     # type 3
        z = synthesize_frame(call, grid, dbm, start_sample=800,
                             freq_offset=1.0)
        r = dec(awgn(z, -15, rng=rng))
        got.extend(s.message for s in r.spots)
    assert "K1ABC FN42 37" in got
    assert "PJ4/K1ABC 30" in got
    assert "<K1ABC> FN42AX 27" in got
