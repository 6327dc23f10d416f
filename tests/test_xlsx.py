"""Round-trip tests for the dependency-free xlsx writer (utils/xlsx.py).

The reference exports analysis tables as multi-sheet Excel via openpyxl
(reference run.py:340-343); this image lacks openpyxl, so write_report
falls back to our writer — these tests pin that the produced workbook is a
valid OOXML package holding the exact table contents.
"""

import math
import zipfile

import numpy as np
import pandas as pd
import pytest

from disentagled_multimodal_fusion_tpu.runners.common import write_report
from disentagled_multimodal_fusion_tpu.utils.xlsx import (
    _col_letter,
    read_xlsx,
    write_xlsx,
)


def test_col_letters():
    assert [_col_letter(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA",
    ]


def test_roundtrip_multisheet(tmp_path):
    df1 = pd.DataFrame(
        {
            "dataset": ["HandWritten", "CUB"],
            "fused_accuracy": [0.985, 0.925],
            "n": [2000, 600],
            "note": ["a<b&\"c\"", ""],
        }
    )
    df2 = pd.DataFrame({"x": [1.5, float("nan"), -3.0], "flag": [True, False, True]})
    path = tmp_path / "report.xlsx"
    write_xlsx(path, {"main_grouped": df1, "all/results:v2*": df2})

    sheets = read_xlsx(path)
    # sheet-name sanitization: []:*?/\ replaced
    assert set(sheets) == {"main_grouped", "all_results_v2_"}
    rows = sheets["main_grouped"]
    assert rows[0] == ["dataset", "fused_accuracy", "n", "note"]
    assert rows[1] == ["HandWritten", 0.985, 2000.0, 'a<b&"c"']
    assert rows[2][0] == "CUB" and rows[2][1] == 0.925
    r2 = sheets["all_results_v2_"]
    assert r2[1] == [1.5, True]
    # NaN cell omitted from the file; reader keeps column alignment via r=
    assert r2[2] == [None, False]
    assert r2[3] == [-3.0, True]


def test_package_is_valid_zip_with_required_parts(tmp_path):
    path = tmp_path / "r.xlsx"
    write_xlsx(path, {"s": pd.DataFrame({"a": [1]})})
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        assert zf.testzip() is None
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels", "xl/styles.xml",
            "xl/worksheets/sheet1.xml"} <= names


def test_write_report_produces_xlsx_and_csv(tmp_path):
    df = pd.DataFrame({"a": [1.0, 2.0], "b": ["x", "y"]})
    target = tmp_path / "logs" / "analysis.xlsx"
    write_report({"main_grouped": df, "all_results": df}, str(target))
    assert target.exists()
    assert (tmp_path / "logs" / "analysis_main_grouped.csv").exists()
    sheets = read_xlsx(target)
    assert set(sheets) == {"main_grouped", "all_results"}
    assert sheets["all_results"][2] == [2.0, "y"]


def test_duplicate_and_long_sheet_names(tmp_path):
    long = "x" * 40
    path = tmp_path / "d.xlsx"
    write_xlsx(path, {long: pd.DataFrame({"a": [1]}),
                      long + "y": pd.DataFrame({"a": [2]})})
    sheets = read_xlsx(path)
    assert len(sheets) == 2
    assert all(len(n) <= 31 for n in sheets)


def test_numeric_fidelity(tmp_path):
    vals = [1e-17, 123456789.123456, -0.1, 2**53 - 1.0, math.pi]
    path = tmp_path / "n.xlsx"
    write_xlsx(path, {"s": pd.DataFrame({"v": vals})})
    got = [r[0] for r in read_xlsx(path)["s"][1:]]
    np.testing.assert_allclose(got, vals, rtol=0, atol=0)
