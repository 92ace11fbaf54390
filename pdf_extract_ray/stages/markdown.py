"""HTML -> Markdown conversion — the structure-preserving sibling of the
plain-text extraction path (``stages/html_parser.py``): LLM training
corpora increasingly keep document STRUCTURE (headings, lists, links,
code) as lightweight Markdown instead of flat text.

Frozen subset (every rule deterministic, asserted by pytest and the
committed ``markdown_docs`` golden):

- ``<h1>``-``<h6>``  -> ``#``..``######`` heading lines
- ``<p>`` and stray top-level text -> paragraphs
- ``<ul>``/``<ol>`` + ``<li>`` -> ``- `` / ``1.``-numbered items,
  2-space indent per nesting level
- ``<blockquote>`` -> ``> `` per quote level, applied to every block
  line inside
- ``<pre>`` -> fenced code block (raw text preserved, no whitespace
  collapse)
- inline: ``<a href>`` -> ``[text](href)`` (``javascript:``/``data:``
  schemes dropped to bare text), ``<strong>/<b>`` -> ``**``,
  ``<em>/<i>`` -> ``*``, ``<code>`` -> `` ` ``, ``<img>`` ->
  ``![alt](src)``, ``<br>`` -> single space
- boilerplate chrome (``script style nav header footer aside template
  noscript``) is dropped entirely — the same chrome rule as the
  extraction path
- whitespace collapses per text segment (outside ``<pre>``); empty
  blocks vanish; blocks are separated by ONE blank line

Like ``html_parser``, the parser is stdlib-only and never raises on
malformed markup — at crawl scale one bad page must not kill a task.

Scale shape: one narrow per-document map, zero shuffles; the stateful
compiled parser lives per worker process.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd

from pdf_extract_ray.functions.encoding import decode_html_bytes
from pdf_extract_ray.functions.text import collapse_ws

_SKIP_TAGS = frozenset(
    "script style nav header footer aside template noscript title".split())
_HEADINGS = {f"h{i}": i for i in range(1, 7)}
_VOID = frozenset("br img hr meta link input".split())
_BAD_SCHEMES = ("javascript:", "data:", "vbscript:")


class _MdCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []       # finished block strings
        self._skip = 0                 # boilerplate depth
        self._pre = 0                  # <pre> depth
        self._quote = 0                # blockquote depth
        self._lists: list[list] = []   # stack of [marker, counter]
        self._parts: list[str] = []    # current block's inline parts
        self._prefix = ""              # current block's line prefix
        self._kind = "p"               # p | h | li | pre

    # -- block management ---------------------------------------------------
    def _flush(self) -> None:
        if self._kind == "pre":
            raw = "".join(self._parts)
            raw = raw.strip("\n")
            if raw.strip():
                body = "```\n" + raw + "\n```"
                q = "> " * self._quote
                self.out.append(
                    "\n".join(q + ln for ln in body.split("\n"))
                    if q else body)
        else:
            text = collapse_ws("".join(self._parts)).strip()
            if text:
                q = "> " * self._quote
                self.out.append(q + self._prefix + text)
        self._parts = []
        self._prefix = ""
        self._kind = "p"

    def _open_block(self, kind: str, prefix: str) -> None:
        self._flush()
        self._kind = kind
        self._prefix = prefix

    # -- tag handlers -------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        a = dict(attrs)
        if tag in _HEADINGS:
            self._open_block("h", "#" * _HEADINGS[tag] + " ")
        elif tag == "p":
            self._open_block("p", "")
        elif tag == "pre":
            self._flush()
            self._kind = "pre"
            self._pre += 1
        elif tag in ("ul", "ol"):
            self._flush()
            self._lists.append(["-" if tag == "ul" else "1", 0])
        elif tag == "li":
            indent = "  " * max(len(self._lists) - 1, 0)
            if self._lists and self._lists[-1][0] == "1":
                self._lists[-1][1] += 1
                marker = f"{self._lists[-1][1]}. "
            else:
                marker = "- "
            self._open_block("li", indent + marker)
        elif tag == "blockquote":
            self._flush()
            self._quote += 1
        elif tag in ("strong", "b"):
            self._parts.append("**")
        elif tag in ("em", "i"):
            self._parts.append("*")
        elif tag == "code" and not self._pre:
            self._parts.append("`")
        elif tag == "a":
            href = (a.get("href") or "").strip()
            ok = href and not any(
                href.lower().startswith(s) for s in _BAD_SCHEMES)
            self._parts.append("[" if ok else "")
            self._link = href if ok else None
        elif tag == "img":
            src = (a.get("src") or "").strip()
            if src and not any(
                    src.lower().startswith(s) for s in _BAD_SCHEMES):
                alt = collapse_ws(a.get("alt") or "").strip()
                self._parts.append(f"![{alt}]({src})")
        elif tag == "br":
            self._parts.append(" ")

    def handle_startendtag(self, tag, attrs):
        if tag in _VOID:
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(self._skip - 1, 0)
            return
        if self._skip:
            return
        if tag in _HEADINGS or tag in ("p", "li"):
            self._flush()
        elif tag == "pre":
            self._flush()
            self._pre = max(self._pre - 1, 0)
        elif tag in ("ul", "ol"):
            self._flush()
            if self._lists:
                self._lists.pop()
        elif tag == "blockquote":
            self._flush()
            self._quote = max(self._quote - 1, 0)
        elif tag in ("strong", "b"):
            self._parts.append("**")
        elif tag in ("em", "i"):
            self._parts.append("*")
        elif tag == "code" and not self._pre:
            self._parts.append("`")
        elif tag == "a":
            link = getattr(self, "_link", None)
            if link is not None:
                self._parts.append(f"]({link})")
                self._link = None

    def handle_data(self, data):
        if self._skip:
            return
        if self._kind == "pre":
            self._parts.append(data)
        elif data:
            self._parts.append(data)


def html_to_markdown(html: bytes | str | None) -> str:
    """One document's HTML -> Markdown under the frozen subset above.
    Never raises on malformed markup; bytes go through the same charset
    sniffing as the extraction path."""
    if html is None:
        return ""
    text = decode_html_bytes(bytes(html))[0] \
        if isinstance(html, (bytes, bytearray)) else html
    c = _MdCollector()
    try:
        c.feed(text)
        c.close()
    except Exception:
        pass
    c._flush()
    return "\n\n".join(c.out)


def to_markdown_batch(batch: pd.DataFrame, html_col: str = "html",
                      id_col: str = "url") -> pd.DataFrame:
    """``(id_col, markdown, n_md_chars)`` — per-document conversion,
    one narrow map, zero shuffles (the per-doc parse is the same
    inherent class as ``html_parser`` itself)."""
    md = [html_to_markdown(h) for h in batch[html_col]]
    return pd.DataFrame({
        id_col: batch[id_col].to_numpy(),
        "markdown": md,
        "n_md_chars": pd.Series([len(m) for m in md], dtype="int64"),
    })
