"""Input validation for message packing (silent-truncation guards)."""

import pytest

from uwspr_tpu.protocol.messages import pack_callsign, pack_grid, pack_message


def test_four_letter_suffix_rejected():
    with pytest.raises(ValueError, match="28-bit"):
        pack_callsign("N0CALL")


def test_grid_letters_beyond_r_rejected():
    with pytest.raises(ValueError, match="A-R"):
        pack_grid("ZZ99")


def test_valid_edges_accepted():
    assert pack_grid("AA00") >= 0
    assert pack_grid("RR99") >= 0
    pack_message("K1ABC", "FN42", 37)       # no raise
    pack_message("VE3EMB", "FN25", 30)


def test_bad_power_rejected():
    with pytest.raises(ValueError, match="power"):
        pack_message("K1ABC", "FN42", 31)   # not in the 0/3/7 unit set


def test_unpack_callsign_truncates_at_interior_space():
    """The reference NULs every space after left-justifying, so a
    (corrupted) field decoding to 'AB1 CD' reads back as 'AB1'
    (helpers.cc:385-396) — not 'AB1 CD'."""
    from uwspr_tpu.protocol.messages import unpack_callsign
    # t0..t5 = 'A','B','1',' ','C','D'
    n = 10
    n = n * 36 + 11
    n = n * 10 + 1
    n = n * 27 + 26
    n = n * 27 + 2
    n = n * 27 + 3
    assert unpack_callsign(n) == "AB1"


def test_spotlogger_jsonl_serializes_numpy_slm_params(tmp_path):
    """Nonlinear spots carry np.float32 slm_params; the JSONL sink must
    not crash on them (json can't serialize numpy scalars natively)."""
    import json

    import numpy as np

    from uwspr_tpu.pipeline.decoder import Spot
    from uwspr_tpu.utils.spotlog import SpotLogger
    path = tmp_path / "spots.jsonl"
    logger = SpotLogger(jsonl_path=str(path))
    logger.log(Spot(message="VE3EMB FN25 30", payload=b"\x00" * 7,
                    freq=1.0, snr=-20.0, sync=0.5, shift=750, drift=0.0,
                    mode=1,
                    slm_params=tuple(np.float32(v) for v in (1, -2, 0, 50))))
    logger.close()
    rec = json.loads(path.read_text().strip())
    assert rec["slm_params"] == [1.0, -2.0, 0.0, 50.0]
