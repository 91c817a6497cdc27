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
