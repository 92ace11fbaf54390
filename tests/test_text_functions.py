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
