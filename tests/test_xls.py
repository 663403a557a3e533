"""Minimal BIFF2 .xls writer round-trip + structure checks."""

import struct

from roomnet_tpu.utils.xls import Workbook, read_labels_biff2


def test_roundtrip(tmp_path):
    wb = Workbook()
    sh = wb.add_sheet("classification_results")
    sh.write(0, 0, "IMAGE_NAME")
    sh.write(0, 1, "PREDICTED_LABEL")
    sh.write(1, 0, "kitchen photo 1.jpg")
    sh.write(1, 1, "Kitchen")
    sh.write(1, 2, "0.97")
    p = str(tmp_path / "out.xls")
    wb.save(p)
    cells = read_labels_biff2(p)
    assert cells[(0, 0)] == "IMAGE_NAME"
    assert cells[(1, 0)] == "kitchen photo 1.jpg"
    assert cells[(1, 2)] == "0.97"


def test_biff_stream_structure(tmp_path):
    wb = Workbook()
    sh = wb.add_sheet("s")
    sh.write(0, 0, "x")
    p = str(tmp_path / "o.xls")
    wb.save(p)
    raw = open(p, "rb").read()
    opcode, length = struct.unpack_from("<HH", raw, 0)
    assert opcode == 0x0009  # BOF first
    assert raw[-4:] == struct.pack("<HH", 0x000A, 0)  # EOF last


def test_long_strings_truncated(tmp_path):
    wb = Workbook()
    sh = wb.add_sheet("s")
    sh.write(0, 0, "a" * 1000)
    p = str(tmp_path / "o.xls")
    wb.save(p)
    assert read_labels_biff2(p)[(0, 0)] == "a" * 255


def test_max_row_saves_and_overflow_fails_fast(tmp_path):
    """Row 0xFFFE (the true BIFF2 cap: DIMENSIONS packs max_row+1 into a
    u16) must survive save(); row 0xFFFF must fail at write() time — not
    complete a whole run and then lose the workbook in save()."""
    import pytest

    wb = Workbook()
    sh = wb.add_sheet("s")
    sh.write(0xFFFE, 0, "last")
    p = str(tmp_path / "t.xls")
    wb.save(p)
    assert read_labels_biff2(p)[(0xFFFE, 0)] == "last"
    with pytest.raises(ValueError, match="out of BIFF2 range"):
        sh.write(0xFFFF, 0, "overflow")
