"""Dependency-free xlsx writer: structure + round-trip readability."""

import zipfile

import numpy as np


def test_xlsx_roundtrip(tmp_path):
    from qpp_fusion_rag_tpu.utils.xlsx import write_xlsx

    rows = [
        ["retriever", "nDCG@10", "ok?", "note"],
        ["bm25", 0.3044, True, "a & <b>"],
        ["splade", 0.5373, False, None],
    ]
    path = write_xlsx(tmp_path / "r.xlsx", {"results": rows, "extra": [[1, 2]]})
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml",
                "xl/worksheets/sheet1.xml", "xl/worksheets/sheet2.xml"} <= names
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
        assert "<v>0.3044</v>" in sheet
        assert "a &amp; &lt;b&gt;" in sheet          # escaping
        assert 'r="C2" t="b"' in sheet               # boolean cell
        wb = z.read("xl/workbook.xml").decode()
        assert 'name="results"' in wb and 'name="extra"' in wb
        # zip is fully readable (CRC check)
        assert z.testzip() is None


def test_xlsx_column_names():
    from qpp_fusion_rag_tpu.utils.xlsx import _col_name

    assert [_col_name(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA"]
