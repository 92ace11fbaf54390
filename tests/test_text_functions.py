"""Unit tests for the scalar text rules (SURVEY.md §2.8)."""

from pdf_extract_ray.functions.text import (
    clean_pair_text,
    collapse_ws,
    has_hangul,
    nfkc,
    normalize_quotes,
    strip_dot_leaders,
    strip_leading_bullet,
    tidy_bracket_spacing,
)


def test_collapse_ws():
    assert collapse_ws("  a\t b\n\nc ") == "a b c"


def test_strip_dot_leaders():
    assert strip_dot_leaders("Title ..... 12") == "Title  12"
    assert strip_dot_leaders("v1.2.3 .... four dots stay") == "v1.2.3 .... four dots stay"
    assert strip_dot_leaders("..........") == ""


def test_normalize_quotes():
    assert normalize_quotes("“hi” ‘x’ `y") == "\"hi\" 'x' 'y"


def test_strip_leading_bullet():
    assert strip_leading_bullet("- item") == "item"
    assert strip_leading_bullet("• bullet") == "bullet"
    assert strip_leading_bullet("no bullet - here") == "no bullet - here"


def test_clean_pair_text_chain():
    assert clean_pair_text("- foo * bar --- baz ;") == "foo bar  baz"
    assert clean_pair_text("x (IGC Code 1.2) y") == "x y"
    assert clean_pair_text("“q”") == '"q"'


def test_nfkc():
    assert nfkc("ﬁle") == "file"
    assert nfkc("１２３") == "123"


def test_has_hangul():
    assert has_hangul("한국어 text")
    assert not has_hangul("english only")


def test_tidy_bracket_spacing():
    assert tidy_bracket_spacing("a ( text ) b") == "a (text) b"
    assert tidy_bracket_spacing("x [ y ]  z") == "x [y] z"


def test_remove_numbering_first_match_only():
    from pdf_extract_ray.functions.text import remove_numbering

    pats = (r"^\d+\.\s", r"^\(\d+\)\s", r"^[A-Z]\.\s")
    assert remove_numbering("1. item one", pats) == "item one"
    assert remove_numbering("(2) second", pats) == "second"
    assert remove_numbering("A. alpha 3. not this", pats) == "alpha 3. not this"
    assert remove_numbering("no numbering", pats) == "no numbering"
    assert remove_numbering("1. x", ()) == "1. x"  # default pack: no-op


def test_fmt_helpers():
    from pdf_extract_ray.functions.fmt import (
        estimate_remaining_s,
        format_duration,
        format_file_size,
        safe_filename,
    )

    assert format_file_size(512) == "512 B"
    assert format_file_size(2048) == "2.0 KB"
    assert format_duration(3725) == "1h 2m 5s"
    assert format_duration(65) == "1m 5s"
    assert safe_filename("a b/c:d.pdf") == "a_b_c_d.pdf"
    assert estimate_remaining_s(2, 6, 10.0) == 20.0


class TestSqlMirrorUnicodeWhitespace:
    """The DuckDB oracle mirrors must agree with the Python semantics on
    NON-ASCII whitespace (NBSP, thin/ideographic spaces, LS/PS): RE2's \\s
    and SQL trim() are ASCII-only, so the mirrors use the explicit Python
    whitespace class (__ray_entry__._PY_WS).  Frozen choice: Python
    .strip()/.split()/re-\\s semantics are authoritative."""

    CASES = [
        "\xa0hello world\xa0",          # NBSP edges
        "plain ascii text",
        "foo　bar baz",        # ideographic space + line sep
        " - bullet\xa0text ---",   # thin space + leading bullet
        "123,\xa0456.",                 # numbers + NBSP
        "\xa0+\xa0",                    # single symbol with NBSP edges
        "nan\xa0x",                     # 'nan' scrub interaction
        "\x85\x1c mixed\x1f controls ", # NEL + control whitespace
        "",
    ]

    @staticmethod
    def _sql_scalar(expr: str, text: str):
        import duckdb

        con = duckdb.connect()
        return con.execute(f"SELECT {expr} FROM (SELECT ? AS text) t",
                           [text]).fetchone()[0]

    def test_ws_class_is_exactly_pythons(self):
        import __ray_entry__ as entry

        for ch in entry._PY_WS:
            assert ch.isspace(), f"non-whitespace {ch!r} in _PY_WS"
        # every whitespace char in the BMP that str.split()/strip() honor
        py_ws = {chr(c) for c in range(0x10000) if chr(c).isspace()}
        assert py_ws == set(entry._PY_WS)

    def test_clean_sql_matches_clean_pair_text(self):
        import __ray_entry__ as entry
        from pdf_extract_ray.functions.text import clean_pair_text

        for t in self.CASES:
            got = self._sql_scalar(entry._clean_sql("coalesce(text,'')"), t)
            assert got == clean_pair_text(t), f"clean mismatch on {t!r}"

    def test_fingerprint_sql_matches_python(self):
        import pandas as pd

        import __ray_entry__ as entry
        from pdf_extract_ray.stages.textquality import fingerprint_batch

        for t in self.CASES:
            got = self._sql_scalar(entry._FP_SQL, t)
            exp = fingerprint_batch(pd.DataFrame({"text": [t]}))["fingerprint"][0]
            assert got == exp, f"fingerprint mismatch on {t!r}"

    def test_word_count_and_filters_match_python(self):
        import __ray_entry__ as entry
        from pdf_extract_ray.stages.filters import (
            is_numbers_only, is_symbol_or_single_alpha)

        for t in self.CASES:
            wc = self._sql_scalar(entry._word_count_sql("coalesce(text,'')"), t)
            assert wc == len(t.split()), f"word count mismatch on {t!r}"
            no = self._sql_scalar(entry._numbers_only_sql("coalesce(text,'')"), t)
            assert bool(no) == is_numbers_only(t), f"numbers_only mismatch on {t!r}"
            sy = self._sql_scalar(entry._single_sym_sql("coalesce(text,'')"), t)
            assert bool(sy) == is_symbol_or_single_alpha(t), f"symbol mismatch on {t!r}"

    def test_quality_class_sql_matches_python(self):
        import __ray_entry__ as entry
        from pdf_extract_ray.stages.analyzers import sentence_quality_class

        for k in self.CASES:
            for e in (self.CASES[0], self.CASES[2], ""):
                expr = entry._quality_class_sql("coalesce(text,'')", f"'{e}'")
                got = self._sql_scalar(expr, k)
                assert got == sentence_quality_class(k, e), \
                    f"quality class mismatch on {k!r} vs {e!r}"
