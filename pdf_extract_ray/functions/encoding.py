"""Charset detection for crawled HTML bytes — the decode step between a
Common-Crawl body and the extractor.  Real crawls are only ~90-95 %
UTF-8; the rest declare legacy encodings (EUC-KR, Shift_JIS, GBK,
windows-125x, ISO-8859-*) that the previous hard-coded
``decode("utf-8", "replace")`` turned into U+FFFD soup.

Algorithm (WHATWG encoding-sniffing shape, public spec; stdlib codecs
only — Python ships every legacy codec needed):

1. **BOM** wins (UTF-8 / UTF-16 / UTF-32, either endianness).
2. **Strict UTF-8** attempt — the overwhelmingly common case, one fast
   C-level pass, no allocation on failure.
3. **Meta prescan**: ``<meta charset=...>`` / ``http-equiv`` form in the
   first 4096 bytes (ASCII-compatible supersets only, so the byte-level
   regex is sound even before the encoding is known).  The declared
   name goes through ``codecs.lookup`` (alias-aware); ``utf-16/32``
   declarations are ignored per spec (a BOM-less meta claiming UTF-16
   is always wrong — the prescan itself found ASCII).  Used only if it
   decodes STRICTLY — a lying meta falls through.
4. Fallback: ``utf-8`` with ``errors="replace"`` — deliberately NOT the
   WHATWG windows-1252 default, preserving this engine's frozen
   behavior for undeclared non-UTF-8 bytes (documented deviation; the
   golden fixtures and oracle path share this function, so both sides
   agree byte-for-byte either way).

One call per document (T1-style: all regexes module-compiled); the
strict-UTF-8 fast path adds no measurable cost to the fused extraction.
"""

from __future__ import annotations

import codecs
import re

_BOMS: tuple[tuple[bytes, str], ...] = (
    # order matters: UTF-32 BOMs contain the UTF-16 BOMs as prefixes
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

_META_RE = re.compile(
    rb"""<meta\s[^>]{0,512}?charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]+)""",
    re.IGNORECASE | re.DOTALL,
)
_PRESCAN_BYTES = 4096


def sniff_meta_charset(data: bytes) -> str | None:
    """Declared charset name from the first 4096 bytes, or None."""
    m = _META_RE.search(data[:_PRESCAN_BYTES])
    if not m:
        return None
    return m.group(1).decode("ascii", "replace").strip().lower()


def decode_html_bytes(data: bytes) -> tuple[str, str]:
    """``(text, encoding_used)`` for one crawled HTML body."""
    for bom, enc in _BOMS:
        if data.startswith(bom):
            try:
                return data[len(bom):].decode(enc), enc
            except (UnicodeDecodeError, LookupError):
                break  # BOM on undecodable payload: fall through
    try:
        return data.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass
    declared = sniff_meta_charset(data)
    if declared and not declared.startswith(("utf-16", "utf-32")):
        try:
            info = codecs.lookup(declared)
            # canonical names include endianness variants (utf-16-le...)
            if not info.name.startswith(("utf-16", "utf-32")):
                return data.decode(info.name), info.name
        except (UnicodeDecodeError, LookupError):
            pass
    return data.decode("utf-8", errors="replace"), "utf-8-replace"
