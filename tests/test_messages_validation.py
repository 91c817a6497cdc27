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
