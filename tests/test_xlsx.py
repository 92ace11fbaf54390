"""From-scratch XLSX IO (S8): round-trip, typing, determinism."""

import numpy as np
import pandas as pd

from pdf_extract_ray.sources.xlsx import (
    read_xlsx,
    write_two_sheet_report,
    write_xlsx,
)


def _df():
    return pd.DataFrame({
        "korean_sentence": ["난민 법원 판결.", "두 번째\xa0문장", "기호 <&> \"따옴표'"],
        "english_sentence": ["Court decision.", "second sentence", "symbols"],
        "word_count": [3, 2, 1],
        "ratio": [0.75, 1.5, np.nan],
        "potential_split": [True, False, True],
    })


def test_round_trip_types_and_values(tmp_path):
    p = str(tmp_path / "out.xlsx")
    df = _df()
    write_xlsx(p, {"Text": df})
    back = read_xlsx(p)["Text"]
    assert list(back.columns) == list(df.columns)
    assert back["korean_sentence"].tolist() == df["korean_sentence"].tolist()
    assert back["word_count"].tolist() == [3, 2, 1]
    assert back["ratio"][0] == 0.75 and pd.isna(back["ratio"][2])
    assert back["potential_split"].tolist() == [True, False, True]


def test_two_sheet_report_layout(tmp_path):
    p = str(tmp_path / "report.xlsx")
    write_two_sheet_report(p, _df(), _df().head(1))
    sheets = read_xlsx(p)
    assert list(sheets) == ["Text_Analyzed_Filtered", "Table_Filtered"]
    assert len(sheets["Text_Analyzed_Filtered"]) == 3
    assert len(sheets["Table_Filtered"]) == 1


def test_deterministic_bytes(tmp_path):
    a, b = str(tmp_path / "a.xlsx"), str(tmp_path / "b.xlsx")
    write_xlsx(a, {"S": _df()})
    write_xlsx(b, {"S": _df()})
    assert open(a, "rb").read() == open(b, "rb").read()


def test_empty_sheet_and_many_columns(tmp_path):
    p = str(tmp_path / "wide.xlsx")
    wide = pd.DataFrame({f"c{i}": [i] for i in range(30)})  # past column Z
    write_xlsx(p, {"Wide": wide, "Empty": pd.DataFrame({"only_header": []})})
    back = read_xlsx(p)
    assert back["Wide"].iloc[0].tolist() == list(range(30))
    assert list(back["Empty"].columns) == ["only_header"]
    assert len(back["Empty"]) == 0


def test_quality_output_to_report(ray_session, tmp_path):
    """The reference's end-of-pipeline artifact: quality output written as
    the two-sheet Excel report (metadata_generator.py:676-679)."""
    import ray.data as rd

    from pdf_extract_ray.pipelines.quality import quality_pairs

    rows = [{"doc_id": i, "kr_text": f"문서 문장 {i}.",
             "en_text": f"doc sentence {i}."} for i in range(10)]
    out = quality_pairs(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
    p = str(tmp_path / "metadata.xlsx")
    write_two_sheet_report(p, out, out.head(0))
    back = read_xlsx(p)["Text_Analyzed_Filtered"]
    assert len(back) == 10
    assert "kr_text_normalized" in back.columns


def test_sheet_name_with_quotes_and_error_cells(tmp_path):
    """Regression (round-2 review): double quotes in sheet names must be
    attribute-escaped; Excel error cells (t="e") read as missing."""
    import zipfile

    p = str(tmp_path / "q.xlsx")
    write_xlsx(p, {'He said "hi"': _df().head(1)})
    assert list(read_xlsx(p)) == ['He said "hi"']

    # splice an error cell into the sheet XML (as Excel would produce)
    p2 = str(tmp_path / "e.xlsx")
    write_xlsx(p2, {"S": _df().head(1)})
    with zipfile.ZipFile(p2) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    parts["xl/worksheets/sheet1.xml"] = parts["xl/worksheets/sheet1.xml"].replace(
        b"</sheetData>",
        b'<row r="3"><c r="A3" t="e"><v>#N/A</v></c></row></sheetData>')
    with zipfile.ZipFile(p2, "w") as z:
        for n, b in parts.items():
            z.writestr(n, b)
    back = read_xlsx(p2)["S"]
    assert len(back) == 2 and back.iloc[1]["korean_sentence"] is None


def test_cell_xml_numpy_scalars():
    """Raw numpy scalars must be boxed before type dispatch: np.int64 is
    not a Python int and numpy>=2 repr()s floats as 'np.float64(x)'
    (ADVICE r2)."""
    import numpy as np

    from pdf_extract_ray.sources.xlsx import _cell_xml

    assert _cell_xml("A", 1, np.int64(7)) == '<c r="A1"><v>7</v></c>'
    assert _cell_xml("A", 1, np.float64(2.5)) == '<c r="A1"><v>2.5</v></c>'
    assert _cell_xml("A", 1, np.bool_(True)) == '<c r="A1" t="b"><v>1</v></c>'
    assert _cell_xml("A", 1, np.float64("nan")) == '<c r="A1"/>'
    # Python scalars unchanged
    assert _cell_xml("B", 2, 3) == '<c r="B2"><v>3</v></c>'
    assert "inlineStr" in _cell_xml("B", 2, "x")
