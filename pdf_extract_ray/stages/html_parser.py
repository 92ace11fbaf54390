"""HTML -> tagged text blocks: the DOM transposition of the reference's
per-page layout parse.

Reference semantics transposed (SURVEY.md §0): header/footer margin strip
(layout_analyzer.py:34-55) becomes boilerplate-chrome element removal
(<header>/<nav>/<footer>/<aside>/...); font-size/bold H1-H3/P tagging
(layout_analyzer.py:119-161) becomes <h1>-<h6> + bold-paragraph tagging;
two-column reading-order sort (layout_analyzer.py:57-66) becomes DOM
order; per-line whitespace collapse (layout_analyzer.py:88) is applied
per block.  Multi-page documents are encoded as
``<section data-page="N">`` wrappers (FIXTURES.md F1.7).

Pure Python (no bs4/lxml in the sandbox), and deliberately
tolerant: byte input goes through charset sniffing
(``functions/encoding.decode_html_bytes``: BOM -> strict UTF-8 -> meta
charset -> replace fallback) and malformed markup degrades to text
accumulation, never an exception — at 100 TB the parser must not die on
one bad page.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

from pdf_extract_ray.config import DEFAULT_CONFIG, ExtractConfig
from pdf_extract_ray.functions.encoding import decode_html_bytes
from pdf_extract_ray.functions.text import collapse_ws


@dataclass(slots=True)
class Block:
    page_no: int
    block_no: int          # DOM order within the page (reading order)
    tag: str               # H1 | H2 | H3 | P
    text: str
    is_bold: bool


class _BlockCollector(HTMLParser):
    """Streaming collector of text blocks in DOM order."""

    def __init__(self, cfg: ExtractConfig):
        super().__init__(convert_charrefs=True)
        self.cfg = cfg
        self.heading_map = dict(cfg.heading_map)
        self.block_tags = set(cfg.block_tags)
        self.boiler = set(cfg.boilerplate_tags)
        self.bold_tags = set(cfg.bold_inline_tags)

        self.blocks: list[Block] = []
        self.page_no = 1
        self._page_counters: dict[int, int] = {}
        self._boiler_depth = 0
        # stack of open block elements: [tag_kind, [text parts], bold_weighted_chars, total_chars]
        self._open: list[list] = []
        self._bold_depth = 0

    # -- element boundaries -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag == "section":
            for k, v in attrs:
                if k == "data-page" and v is not None:
                    try:
                        self.page_no = int(v)
                    except ValueError:
                        pass
        if tag in self.boiler:
            self._boiler_depth += 1
            return
        if self._boiler_depth:
            return
        if tag in self.bold_tags:
            self._bold_depth += 1
            return
        if tag in self.heading_map or tag in self.block_tags:
            # implied end tags (HTML5): a new same-name element closes the
            # open one (<li>...<li>), and ANY new block closes an open <p>
            # — both ubiquitous in crawl HTML
            while self._open and (self._open[-1][4] == tag
                                  or self._open[-1][4] == "p"):
                self._end_block()
            self._begin_block(
                self.heading_map.get(tag, "P"), tag
            )
        elif tag == "br" and self._open:
            self._open[-1][1].append(" ")

    def handle_startendtag(self, tag, attrs):
        # a self-closing element opens no scope: undo whatever the start
        # handler pushed (boilerplate depth, bold depth, or a block frame)
        self.handle_starttag(tag, attrs)
        tag = tag.lower()
        if tag in self.boiler:
            self._boiler_depth -= 1
        elif self._boiler_depth:
            pass
        elif tag in self.bold_tags:
            self._bold_depth = max(0, self._bold_depth - 1)
        elif tag in self.heading_map or tag in self.block_tags:
            self._end_block()

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in self.boiler:
            self._boiler_depth = max(0, self._boiler_depth - 1)
            return
        if self._boiler_depth:
            return
        if tag in self.bold_tags:
            self._bold_depth = max(0, self._bold_depth - 1)
            return
        if tag in self.heading_map or tag in self.block_tags:
            self._end_block()

    def handle_data(self, data):
        if self._boiler_depth or not data:
            return
        if self._open:
            frame = self._open[-1]
            frame[1].append(data)
            n = len(data.strip())
            frame[3] += n
            if self._bold_depth:
                frame[2] += n

    # -- block lifecycle ----------------------------------------------------
    def _begin_block(self, kind: str, src_tag: str = ""):
        self._open.append([kind, [], 0, 0, src_tag])

    def flush_open(self):
        """Emit blocks left open at end of input (implied end at EOF /
        truncated pages) — without this, crawl HTML relying on implied
        end tags loses its content entirely."""
        while self._open:
            self._end_block()

    def _end_block(self):
        if not self._open:
            return
        kind, parts, bold_chars, total_chars, _src = self._open.pop()
        text = collapse_ws("".join(parts))
        if not text:
            return
        # bold-paragraph rule: a P whose text is entirely bold is a heading
        # (DOM analogue of "bold -> H2", layout_analyzer.py:140-142)
        is_bold = total_chars > 0 and bold_chars == total_chars
        if kind == "P" and is_bold:
            kind = "H2"
        n = self._page_counters.get(self.page_no, 0)
        self._page_counters[self.page_no] = n + 1
        self.blocks.append(Block(self.page_no, n, kind, text, is_bold))
        # text inside this block must not leak into an outer open block
        # (nested <p>/<li> cases)


import re as _re
from html import unescape as _unescape

_START_TAG_RE = _re.compile(
    r"<([a-zA-Z][a-zA-Z0-9.:_-]*)"
    r"((?:\s+[^\s/>=]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>]*))?)*)"
    r"\s*(/?)>"
)
_END_TAG_RE = _re.compile(r"</\s*([a-zA-Z][a-zA-Z0-9.:_-]*)\s*>")
_DATA_PAGE_RE = _re.compile(
    r"""data-page\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", _re.IGNORECASE
)
_RAWTEXT_TAGS = ("script", "style")


def _tokenize_into(collector: _BlockCollector, html: str) -> None:
    """Fast HTML tokenizer driving the same collector events as the stdlib
    parser: start/end/self-closing tags, entity-decoded text, comment /
    declaration / PI skipping, rawtext handling for <script>/<style>.
    An unparseable '<' is treated as literal text (stdlib-compatible
    recovery).  ~3x faster than html.parser on typical pages."""
    n = len(html)
    pos = 0
    lower = None  # lazily lowercased copy for rawtext close-tag search
    emit_data = collector.handle_data
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            chunk = html[pos:]
            emit_data(_unescape(chunk) if "&" in chunk else chunk)
            break
        if lt > pos:
            chunk = html[pos:lt]
            emit_data(_unescape(chunk) if "&" in chunk else chunk)
        nxt = html[lt + 1] if lt + 1 < n else ""
        if nxt == "/":
            m = _END_TAG_RE.match(html, lt)
            if m:
                collector.handle_endtag(m.group(1).lower())
                pos = m.end()
                continue
        elif nxt == "!":
            if html.startswith("<!--", lt):
                end = html.find("-->", lt + 4)
                pos = n if end < 0 else end + 3
                continue
            end = html.find(">", lt + 2)
            pos = n if end < 0 else end + 1
            continue
        elif nxt == "?":
            end = html.find(">", lt + 2)
            pos = n if end < 0 else end + 1
            continue
        elif nxt.isalpha():
            m = _START_TAG_RE.match(html, lt)
            if m:
                name = m.group(1).lower()
                attrs_src = m.group(2)
                selfclose = m.group(3) == "/"
                attrs = []
                if name == "section" and attrs_src:
                    am = _DATA_PAGE_RE.search(attrs_src)
                    if am:
                        attrs = [("data-page",
                                  am.group(1) or am.group(2) or am.group(3))]
                collector.handle_starttag(name, attrs)
                pos = m.end()
                if selfclose:
                    if name in collector.boiler:
                        collector._boiler_depth -= 1
                    elif collector._boiler_depth:
                        pass
                    elif name in collector.bold_tags:
                        collector._bold_depth = max(0, collector._bold_depth - 1)
                    elif name in collector.heading_map or name in collector.block_tags:
                        collector._end_block()
                elif name in _RAWTEXT_TAGS:
                    # rawtext: skip to the matching close tag verbatim
                    if lower is None:
                        lower = html.lower()
                    close = lower.find("</" + name, pos)
                    if close < 0:
                        pos = n
                    else:
                        gt = html.find(">", close)
                        pos = n if gt < 0 else gt + 1
                        collector.handle_endtag(name)
                continue
        # unparseable '<': literal text char
        emit_data("<")
        pos = lt + 1


def parse_html(html: bytes | str | None, cfg: ExtractConfig = DEFAULT_CONFIG) -> list[Block]:
    """Parse one page's HTML into tagged blocks in reading (DOM) order.

    Returns ``[]`` for null/empty/non-HTML input — callers route those rows
    to the pre-extracted ``text`` fallback (reference "기존 형식" fallback,
    main.py:577-584) or to the reject side-channel (validity check analogue
    of main.py:1678-1727).
    """
    if html is None:
        return []
    if isinstance(html, bytes):
        html = decode_html_bytes(html)[0]
    if "<" not in html:
        return []
    p = _BlockCollector(cfg)
    try:
        _tokenize_into(p, html)
        p.flush_open()
    except Exception:
        # malformed beyond repair: salvage whatever blocks were collected
        pass
    return p.blocks


def parse_html_stdlib(html: bytes | str | None, cfg: ExtractConfig = DEFAULT_CONFIG) -> list[Block]:
    """stdlib html.parser-driven variant, kept as a cross-check oracle for
    the fast tokenizer on WELL-FORMED markup (tests assert identical blocks
    there).  On pathologically malformed tags the two recovery strategies
    deliberately differ: html.parser's tolerant regex can emit garbage tag
    names (e.g. a tag literally named "b<"), while the fast tokenizer — the
    frozen spec — treats an unparseable '<' as text."""
    if html is None:
        return []
    if isinstance(html, bytes):
        html = decode_html_bytes(html)[0]
    if "<" not in html:
        return []
    p = _BlockCollector(cfg)
    try:
        p.feed(html)
        p.close()
        p.flush_open()
    except Exception:
        pass
    return p.blocks


def fallback_blocks(text: str | None) -> list[Block]:
    """Build P blocks from the pre-extracted ``text`` column (one block per
    non-empty line), for rows whose html is missing or not parseable."""
    if not text:
        return []
    out = []
    for i, line in enumerate(t for t in (collapse_ws(l) for l in text.splitlines()) if t):
        out.append(Block(1, i, "P", line, False))
    return out
