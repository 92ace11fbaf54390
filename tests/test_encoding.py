"""Charset sniffing (functions/encoding.py): BOMs, strict-UTF-8 fast
path, meta prescan with legacy codecs, lying-meta fallthrough, and the
frozen utf-8-replace fallback — plus legacy-encoded pages flowing
through the real extraction."""

import pytest

from pdf_extract_ray.functions.encoding import (
    decode_html_bytes,
    sniff_meta_charset,
)
from pdf_extract_ray.pipelines.extract import extract_document

KOREAN = "한국어 본문 문장입니다"
JAPANESE = "日本語のテキスト"


def test_utf8_fast_path():
    text, enc = decode_html_bytes("<p>plain utf-8 café</p>".encode())
    assert enc == "utf-8" and "café" in text


@pytest.mark.parametrize("enc,bom_enc", [
    ("utf-8-sig", "utf-8-sig"),
    ("utf-16-le", "utf-16-le"),
    ("utf-16-be", "utf-16-be"),
    ("utf-32-le", "utf-32-le"),
    ("utf-32-be", "utf-32-be"),
])
def test_bom_wins(enc, bom_enc):
    import codecs

    bom = {"utf-8-sig": codecs.BOM_UTF8, "utf-16-le": codecs.BOM_UTF16_LE,
           "utf-16-be": codecs.BOM_UTF16_BE, "utf-32-le": codecs.BOM_UTF32_LE,
           "utf-32-be": codecs.BOM_UTF32_BE}[bom_enc]
    payload = f"<p>{KOREAN}</p>"
    raw = bom + payload.encode(enc.replace("-sig", ""))
    text, used = decode_html_bytes(raw)
    assert used == bom_enc and KOREAN in text


@pytest.mark.parametrize("declared,codec,sample", [
    ("euc-kr", "euc-kr", KOREAN),
    ("EUC-KR", "euc-kr", KOREAN),
    ("shift_jis", "shift_jis", JAPANESE),
    ("windows-1252", "cp1252", "déjà vu"),
    ("gbk", "gbk", "中文文本"),
])
def test_meta_charset_decodes_legacy(declared, codec, sample):
    page = f'<html><head><meta charset="{declared}"></head><body><p>{sample}</p></body></html>'
    raw = page.encode(codec)
    text, used = decode_html_bytes(raw)
    assert sample in text, used


def test_meta_http_equiv_form():
    page = ('<head><meta http-equiv="Content-Type" '
            'content="text/html; charset=euc-kr"></head>'
            f"<p>{KOREAN}</p>")
    raw = page.encode("euc-kr")
    assert sniff_meta_charset(raw) == "euc-kr"
    text, used = decode_html_bytes(raw)
    assert KOREAN in text and used == "euc_kr"  # codecs canonical name


def test_lying_meta_falls_through_to_replace():
    # meta says ascii but the bytes aren't decodable as ascii
    raw = b'<meta charset="ascii"><p>\xff\xfe\xfd broken</p>'
    text, used = decode_html_bytes(raw)
    assert used == "utf-8-replace" and "broken" in text


def test_unknown_charset_name():
    raw = b'<meta charset="no-such-codec"><p>\xff body</p>'
    text, used = decode_html_bytes(raw)
    assert used == "utf-8-replace"


def test_utf16_meta_is_ignored():
    # a BOM-less meta claiming utf-16 is spec-invalid; falls back
    raw = b'<meta charset="utf-16"><p>\xff body</p>'
    assert decode_html_bytes(raw)[1] == "utf-8-replace"


def test_euc_kr_page_through_extraction():
    """A legacy-encoded crawl page yields real Korean sentences through
    the full extract path (previously: U+FFFD soup)."""
    page = ('<html><head><meta charset="euc-kr"><title>t</title></head>'
            f"<body><p>{KOREAN}.</p><p>두 번째 문장입니다.</p></body></html>")
    row = extract_document("http://k.example/", page.encode("euc-kr"),
                           None, "ko")
    assert row["status"] == "html"
    assert KOREAN in row["extracted_text"]
    assert "�" not in row["extracted_text"]


def test_utf8_extraction_unchanged():
    page = f"<html><body><p>{KOREAN}.</p></body></html>"
    via_bytes = extract_document("u", page.encode(), None, "ko")
    via_str = extract_document("u", page, None, "ko")
    assert via_bytes["extracted_text"] == via_str["extracted_text"]


def test_decode_shapes_for_charset_stats():
    # the five arithmetic shapes the charset_stats_docs oracle pins
    from pdf_extract_ray.functions.encoding import (
        decode_html_bytes,
        sniff_meta_charset,
    )

    cases = [
        (b"<html><body>plain ascii</body></html>", "utf-8", None),
        (b"\xef\xbb\xbf<html>bom utf8</html>", "utf-8-sig", None),
        (b'<meta charset="euc-kr"><html>\xb0\xa1</html>', "euc_kr",
         "euc-kr"),
        (b'<meta charset="windows-1252">caf\xe9', "cp1252",
         "windows-1252"),
        (b"<html>\x81\x82 broken</html>", "utf-8-replace", None),
    ]
    for data, enc, declared in cases:
        text, used = decode_html_bytes(data)
        assert used == enc, (data, used)
        assert sniff_meta_charset(data) == declared
    # the EUC-KR body decodes to the real hangul syllable
    assert "가" in decode_html_bytes(cases[2][0])[0]
