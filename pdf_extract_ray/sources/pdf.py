"""Minimal from-scratch PDF text/span extractor (S1/M1: the reference's
actual input format — euaa_사례/pdf_to_json/layout_analyzer.py:15-161 pulls
(x0, y0, x1, y1, text, size, flags, color) spans out of PyMuPDF pages).

No PDF library exists in the sandbox, so this implements the subset needed
to turn digitally-born simple PDFs into the SAME span-line rows the
span-table layout path (stages/layout.tag_page_lines) already consumes,
using only stdlib (``re``, ``zlib``):

* object scan: every ``N G obj ... endobj`` found by regex — no xref
  parsing, so linearized/appended/mildly-corrupt files still yield their
  objects;
* dict/array/name/number/string/ref parser for object bodies;
* streams: plain or FlateDecode (zlib); other filters are skipped;
* content-stream text interpreter: BT/ET, Tf, Td/TD/Tm/T*/TL, Tj/TJ/'/",
  rg/g color; spans merged into baseline lines;
* page tree: /Type /Page objects with /MediaBox (inherited via /Parent)
  and /Contents (single ref or array);
* fonts: bold/italic flags inferred from /BaseFont name;
* composite (Type0/CID) fonts: decoded through their /ToUnicode CMap
  (bfchar + bfrange, incl. array form) — the layout modern exporters
  (and Korean-text PDFs like the reference corpus) actually emit; Type0
  fonts WITHOUT a ToUnicode map are skipped (codes are meaningless
  without the font program).

DOCUMENTED APPROXIMATIONS (the honest subset, asserted in tests):
* glyph widths are approximated as ``0.5 * size`` per char (no font
  metrics), so ``x1`` is approximate — the layout rules use x0/column
  position and sizes, not exact extents;
* simple-font strings decode as Latin-1 (== WinAnsi for the ASCII range);
* y coordinates are flipped to top-based to match the PyMuPDF-style rows
  the layout stage expects.

Everything degrades to "no spans" rather than an exception: at 100 TB the
reader must not die on one bad file.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


# ---------------------------------------------------------------------------
# object-body value parser
# ---------------------------------------------------------------------------

class _P:
    """Cursor over an object body for parsing one PDF value."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.i = pos

    def _skip_ws(self):
        d, n = self.d, len(self.d)
        while self.i < n:
            c = self.d[self.i]
            if c in _WS:
                self.i += 1
            elif c == 0x25:  # % comment
                j = d.find(b"\n", self.i)
                self.i = n if j < 0 else j + 1
            else:
                return

    def value(self):
        self._skip_ws()
        d, i = self.d, self.i
        if i >= len(d):
            return None
        c = d[i]
        if d.startswith(b"<<", i):
            return self._dict()
        if c == 0x3C:  # <hex string>
            j = d.find(b">", i + 1)
            h = re.sub(rb"[^0-9a-fA-F]", b"", d[i + 1 : j])
            if len(h) % 2:
                h += b"0"
            self.i = j + 1
            return bytes.fromhex(h.decode())
        if c == 0x28:  # (literal string)
            return self._string()
        if c == 0x2F:  # /Name
            j = i + 1
            while j < len(d) and d[j] not in _WS and d[j] not in _DELIM:
                j += 1
            self.i = j
            return ("name", d[i + 1 : j].decode("latin-1"))
        if c == 0x5B:  # [ array ]
            self.i = i + 1
            out = []
            while True:
                self._skip_ws()
                if self.i >= len(d) or d[self.i] == 0x5D:
                    self.i += 1
                    return out
                out.append(self.value())
        if d.startswith(b"true", i):
            self.i = i + 4
            return True
        if d.startswith(b"false", i):
            self.i = i + 5
            return False
        if d.startswith(b"null", i):
            self.i = i + 4
            return None
        m = re.match(rb"[+-]?\d*\.?\d+", d[i:])
        if m:
            # reference lookahead: "N G R"
            r = re.match(rb"(\d+)\s+(\d+)\s+R(?![A-Za-z])", d[i:])
            if r:
                self.i = i + r.end()
                return ("ref", int(r.group(1)))
            self.i = i + m.end()
            tok = m.group(0)
            return float(tok) if b"." in tok else int(tok)
        self.i = i + 1  # unknown byte: skip (tolerant)
        return None

    def _dict(self):
        self.i += 2
        out = {}
        d = self.d
        while True:
            self._skip_ws()
            if self.i >= len(d):
                return out
            if d.startswith(b">>", self.i):
                self.i += 2
                return out
            k = self.value()
            if not (isinstance(k, tuple) and k[0] == "name"):
                continue
            out[k[1]] = self.value()

    def _string(self):
        d = self.d
        i = self.i + 1
        depth = 1
        out = bytearray()
        while i < len(d):
            c = d[i]
            if c == 0x5C:  # backslash
                i += 1
                if i >= len(d):
                    break
                e = d[i]
                esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                       0x28: 40, 0x29: 41, 0x5C: 92}
                if e in esc:
                    out.append(esc[e])
                    i += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    j = i
                    while j < len(d) and j < i + 3 and 0x30 <= d[j] <= 0x37:
                        j += 1
                    out.append(int(d[i:j], 8) & 0xFF)
                    i = j
                elif e in (10, 13):  # line continuation
                    i += 1
                    if e == 13 and i < len(d) and d[i] == 10:
                        i += 1
                else:
                    out.append(e)
                    i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    i += 1
                    break
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        self.i = i
        return bytes(out)


def _parse_obj(body: bytes):
    """(value, stream_bytes_or_None) for one object body."""
    p = _P(body)
    val = p.value()
    m = _STREAM_RE.search(body)
    return val, (m.group(1) if m else None)


# ---------------------------------------------------------------------------
# document model
# ---------------------------------------------------------------------------

@dataclass
class _Doc:
    objs: dict[int, tuple] = field(default_factory=dict)  # num -> (value, stream)

    def resolve(self, v, depth: int = 0):
        while isinstance(v, tuple) and v and v[0] == "ref" and depth < 32:
            got = self.objs.get(v[1])
            if got is None:
                return None
            v = got[0]
            depth += 1
        return v

    def stream_of(self, num: int) -> bytes | None:
        got = self.objs.get(num)
        if got is None or got[1] is None:
            return None
        meta, raw = got
        meta = meta if isinstance(meta, dict) else {}
        length = self.resolve(meta.get("Length"))
        if isinstance(length, int) and 0 < length <= len(raw):
            raw = raw[:length]
        filt = self.resolve(meta.get("Filter"))
        filts = filt if isinstance(filt, list) else ([filt] if filt else [])
        data = raw
        for f in filts:
            f = self.resolve(f)
            name = f[1] if isinstance(f, tuple) else None
            if name == "FlateDecode":
                try:
                    data = zlib.decompress(data)
                except zlib.error:
                    return None
            elif name is not None:
                return None  # unsupported filter: skip content
        return data


def _load(data: bytes) -> _Doc:
    doc = _Doc()
    for m in _OBJ_RE.finditer(data):
        try:
            doc.objs[int(m.group(1))] = _parse_obj(m.group(3))
        except Exception:
            continue
    return doc


def _inherited(doc: _Doc, page: dict, key: str, depth: int = 0):
    v = page.get(key)
    if v is not None:
        return doc.resolve(v)
    parent = page.get("Parent")
    if depth < 32 and isinstance(parent, tuple) and parent[0] == "ref":
        pd_ = doc.resolve(parent)
        if isinstance(pd_, dict):
            return _inherited(doc, pd_, key, depth + 1)
    return None


# ---------------------------------------------------------------------------
# content-stream text interpreter
# ---------------------------------------------------------------------------

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEXPAIR_RE = re.compile(rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>")
_RANGE_RE = re.compile(
    rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*(<[0-9a-fA-F]+>|\[[^\]]*\])")
_CODESPACE_RE = re.compile(
    rb"begincodespacerange\s*<([0-9a-fA-F]+)>", re.DOTALL)


def _utf16be(hexs: bytes) -> str:
    try:
        return bytes.fromhex(hexs.decode()).decode("utf-16-be", "replace")
    except ValueError:
        return ""


def parse_tounicode_cmap(data: bytes) -> tuple[dict[int, str], int]:
    """/ToUnicode CMap -> ({code: text}, code_bytes).  Handles bfchar,
    bfrange with scalar or array destinations, and the codespace range
    (for the code byte-width; Identity-H is 2)."""
    cmap: dict[int, str] = {}
    m = _CODESPACE_RE.search(data)
    nbytes = max(1, len(m.group(1)) // 2) if m else 2
    for block in _BFCHAR_RE.finditer(data):
        for src, dst in _HEXPAIR_RE.findall(block.group(1)):
            cmap[int(src, 16)] = _utf16be(dst)
    for block in _BFRANGE_RE.finditer(data):
        for lo, hi, dst in _RANGE_RE.findall(block.group(1)):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if hi_i - lo_i > 65535:
                continue  # malformed guard
            if dst.startswith(b"["):
                items = re.findall(rb"<([0-9a-fA-F]+)>", dst)
                for off, d in enumerate(items):
                    cmap[lo_i + off] = _utf16be(d)
            else:
                base = int(dst[1:-1], 16)
                for off in range(hi_i - lo_i + 1):
                    # last code unit increments (PDF spec bfrange rule)
                    cmap[lo_i + off] = _utf16be(
                        f"{base + off:0{len(dst) - 2}x}".encode())
    return cmap, nbytes


_TOKEN_RE = re.compile(
    rb"\("                          # literal string opener: the FULL string
                                    # parser takes over from here (nested
                                    # parens are legal inside PDF strings)
    rb"|<<|>>|<[0-9a-fA-F\s]*>"
    rb"|\[|\]"
    rb"|/[^\s()<>\[\]{}/%]*"
    rb"|[+-]?\d*\.?\d+"
    rb"|[A-Za-z'\"][A-Za-z0-9*'\"]*"
)


def _font_flags(base_font: str) -> int:
    name = (base_font or "").lower()
    flags = 0
    if "bold" in name:
        flags |= 16
    if "italic" in name or "oblique" in name:
        flags |= 2
    return flags


def _spans_from_content(content: bytes, fonts: dict[str, int]) -> list[dict]:
    """Interpret text operators; returns raw spans (PDF bottom-up y)."""
    spans: list[dict] = []
    # text state
    tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
    tlm = list(tm)
    size = 12.0
    flags = 0
    leading = 0.0
    color = 0
    in_cid = False
    cmap: tuple[dict[int, str], int] | None = None
    stack: list = []

    def emit(raw: bytes):
        if in_cid or not raw:
            return
        if cmap is not None:
            table, nb = cmap
            chars = []
            for j in range(0, len(raw) - nb + 1, nb):
                code = int.from_bytes(raw[j : j + nb], "big")
                chars.append(table.get(code, ""))
            text = "".join(chars).replace("\x00", "")
        else:
            text = raw.decode("latin-1").replace("\x00", "")
        if not text.strip():
            return
        eff = size * max(abs(tm[3]), 1e-9)
        spans.append({
            "x": tm[4], "y": tm[5], "size": eff, "flags": flags,
            "color": color, "text": text,
            "w": 0.5 * eff * len(text),  # approx width (no font metrics)
        })

    def td(tx: float, ty: float):
        nonlocal tm, tlm
        # translate applied to the LINE matrix
        tlm = [tlm[0], tlm[1], tlm[2], tlm[3],
               tlm[4] + tx * tlm[0] + ty * tlm[2],
               tlm[5] + tx * tlm[1] + ty * tlm[3]]
        tm = list(tlm)

    pos = 0
    n_content = len(content)
    while pos < n_content:
        m = _TOKEN_RE.search(content, pos)
        if m is None:
            break
        tok = m.group(0)
        c0 = tok[:1]
        if c0 == b"(":
            # re-parse with the full string parser (handles NESTED parens
            # and escapes) and resume the scan where IT ended — the regex
            # only matches one nesting level, and resuming at the regex
            # match end would tokenize the string tail as bogus operators
            p = _P(content, m.start())
            stack.append(p.value())
            pos = max(p.i, m.start() + 1)
            continue
        pos = m.end()
        if c0 == b"<" and tok != b"<<":
            h = re.sub(rb"[^0-9a-fA-F]", b"", tok[1:-1])
            if len(h) % 2:
                h += b"0"
            stack.append(bytes.fromhex(h.decode()))
        elif c0 == b"/":
            stack.append(("name", tok[1:].decode("latin-1")))
        elif tok in (b"<<", b">>", b"[", b"]"):
            # sentinel tuples: a literal string could equal b"]" and must
            # not be confused with the array delimiter in TJ collection
            stack.append(("delim", tok))
        elif c0.isdigit() or c0 in b"+-." or (len(tok) > 1 and tok[1:2].isdigit() and c0 in b"+-"):
            try:
                stack.append(float(tok))
            except ValueError:
                stack.append(0.0)
        else:
            op = tok
            try:
                if op == b"BT":
                    tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
                    tlm = list(tm)
                elif op == b"Tf" and len(stack) >= 2:
                    size = float(stack[-1])
                    fname = stack[-2]
                    if isinstance(fname, tuple):
                        f = fonts.get(fname[1])
                        flags = f if isinstance(f, int) else 0
                        cmap = fonts.get("__cmaps__", {}).get(fname[1])
                        in_cid = (cmap is None
                                  and fname[1] in fonts.get("__cidset__", set()))
                elif op == b"Td" and len(stack) >= 2:
                    td(float(stack[-2]), float(stack[-1]))
                elif op == b"TD" and len(stack) >= 2:
                    leading = -float(stack[-1])
                    td(float(stack[-2]), float(stack[-1]))
                elif op == b"TL" and stack:
                    leading = float(stack[-1])
                elif op == b"T*":
                    td(0.0, -leading)
                elif op == b"Tm" and len(stack) >= 6:
                    tm = [float(x) for x in stack[-6:]]
                    tlm = list(tm)
                elif op == b"Tj" and stack:
                    if isinstance(stack[-1], bytes):
                        emit(stack[-1])
                elif op in (b"'", b'"'):
                    td(0.0, -leading)
                    if stack and isinstance(stack[-1], bytes):
                        emit(stack[-1])
                elif op == b"TJ":
                    # collect string items back to the matching [
                    parts = []
                    j = len(stack) - 1
                    while j >= 0 and stack[j] != ("delim", b"["):
                        if isinstance(stack[j], bytes):
                            parts.append(stack[j])
                        j -= 1
                    emit(b"".join(reversed(parts)))
                elif op == b"rg" and len(stack) >= 3:
                    r, g, b = (float(x) for x in stack[-3:])
                    color = (int(r * 255) << 16) | (int(g * 255) << 8) | int(b * 255)
                elif op == b"g" and stack:
                    v = int(float(stack[-1]) * 255)
                    color = (v << 16) | (v << 8) | v
            except (TypeError, ValueError, IndexError):
                pass
            stack.clear()
    return spans


def _merge_lines(spans: list[dict], page_height: float) -> list[dict]:
    """Group spans by baseline into line rows (top-based y, layout schema)."""
    by_line: dict[float, list[dict]] = {}
    for s in spans:
        by_line.setdefault(round(s["y"], 1), []).append(s)
    lines = []
    for y, group in sorted(by_line.items(), key=lambda kv: -kv[0]):
        group.sort(key=lambda s: s["x"])
        size = max(s["size"] for s in group)
        fl = 0
        for s in group:
            fl |= s["flags"]
        # all-bold rule: a line is bold only if every span is (mirrors the
        # reference's span-level AND, layout_analyzer.py:119-161)
        if not all(s["flags"] & 16 for s in group):
            fl &= ~16
        color = next((s["color"] for s in group if s["color"]), 0)
        y_top = page_height - y
        lines.append({
            "x0": group[0]["x"],
            "y0": y_top - size,
            "x1": max(s["x"] + s["w"] for s in group),
            "y1": y_top,
            "text": " ".join(s["text"] for s in group),
            "size": size,
            "flags": fl,
            "color": color,
        })
    return lines


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def pdf_pages_spans(data: bytes | None) -> list[dict]:
    """PDF bytes -> [{"page_no", "width", "height", "lines": [...]}, ...].
    Returns [] for anything unparseable (never raises)."""
    if not data or not data.startswith(b"%PDF"):
        return []
    try:
        doc = _load(data)
    except Exception:
        return []

    # page order: walk the /Catalog -> /Pages -> /Kids tree (document
    # order per the spec); fall back to object-number order when the tree
    # is missing/broken (linearized or damaged files)
    def _walk_kids(node: dict, out: list, depth: int = 0):
        if depth > 64 or not isinstance(node, dict):
            return
        t = node.get("Type")
        tname = t[1] if isinstance(t, tuple) else None
        if tname == "Page":
            out.append(node)
            return
        kids = doc.resolve(node.get("Kids"))
        if isinstance(kids, list):
            for kid in kids:
                _walk_kids(doc.resolve(kid), out, depth + 1)

    page_objs: list[dict] = []
    for num in sorted(doc.objs):
        val = doc.objs[num][0]
        if isinstance(val, dict):
            t = val.get("Type")
            if isinstance(t, tuple) and t[1] == "Catalog":
                _walk_kids(doc.resolve(val.get("Pages")), page_objs)
                break
    if not page_objs:
        page_objs = [
            doc.objs[num][0] for num in sorted(doc.objs)
            if isinstance(doc.objs[num][0], dict)
            and isinstance(doc.objs[num][0].get("Type"), tuple)
            and doc.objs[num][0].get("Type")[1] == "Page"
        ]

    pages = []
    for val in page_objs:
        # malformed /MediaBox (short array, name entries) must not raise:
        # fall back to US Letter (the never-raises contract)
        try:
            mb = _inherited(doc, val, "MediaBox")
            mb = [float(doc.resolve(x) or 0) for x in mb]
            if len(mb) < 4:
                raise ValueError
        except (TypeError, ValueError):
            mb = [0.0, 0.0, 612.0, 792.0]
        width, height = mb[2] - mb[0], mb[3] - mb[1]

        # fonts: name -> style flags; composite (Type0) fonts decode via
        # their ToUnicode CMap, or are skipped when none exists
        fonts: dict = {"__cidset__": set(), "__cmaps__": {}}
        res = _inherited(doc, val, "Resources")
        if isinstance(res, dict):
            fdict = doc.resolve(res.get("Font"))
            if isinstance(fdict, dict):
                for fname, fref in fdict.items():
                    fobj = doc.resolve(fref)
                    if not isinstance(fobj, dict):
                        continue
                    bf = fobj.get("BaseFont")
                    fonts[fname] = _font_flags(
                        bf[1] if isinstance(bf, tuple) else "")
                    sub = fobj.get("Subtype")
                    if isinstance(sub, tuple) and sub[1] == "Type0":
                        tu = fobj.get("ToUnicode")
                        data_tu = (doc.stream_of(tu[1])
                                   if isinstance(tu, tuple) and tu[0] == "ref"
                                   else None)
                        if data_tu:
                            try:
                                fonts["__cmaps__"][fname] = parse_tounicode_cmap(data_tu)
                            except Exception:
                                fonts["__cidset__"].add(fname)
                        else:
                            fonts["__cidset__"].add(fname)

        contents = val.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        body = b""
        for ref in refs:
            if isinstance(ref, tuple) and ref[0] == "ref":
                part = doc.stream_of(ref[1])
                if part:
                    body += part + b"\n"
        try:
            spans = _spans_from_content(body, fonts) if body else []
        except Exception:
            spans = []
        pages.append({
            "page_no": len(pages) + 1,
            "width": width,
            "height": height,
            "lines": _merge_lines(spans, height),
        })
    return pages


def extract_pdf_document(url, pdf_bytes, cfg=None) -> dict:
    """Full per-document PDF extraction: spans -> layout tagging
    (tag_page_lines) -> merge -> sentence composition -> assembly — the
    same frozen chain as extract_document, with the PDF span path standing
    in for the HTML parse."""
    from pdf_extract_ray.config import DEFAULT_CONFIG
    from pdf_extract_ray.pipelines.extract import sentences_from_blocks
    from pdf_extract_ray.stages.assemble import assemble_sentences
    from pdf_extract_ray.stages.layout import tag_page_lines

    cfg = cfg or DEFAULT_CONFIG
    blocks = []
    pages = pdf_pages_spans(pdf_bytes)
    for p in pages:
        blocks.extend(tag_page_lines(p["lines"], p["width"], p["height"],
                                     p["page_no"], cfg))
    status = "pdf" if blocks else "rejected"
    sents = sentences_from_blocks(blocks, cfg)
    text, n_sents, n_pages = assemble_sentences(sents, cfg)
    return {"url": url, "status": status, "extracted_text": text,
            "sentences": sents, "n_sentences": n_sents, "n_pages": n_pages}


def build_simple_pdf(page_contents: list[str], compress: bool = False) -> bytes:
    """Minimal single-font-pair PDF writer (testing/corpus synthesis): one
    object per page content stream (plain or Flate), fonts /F1 Helvetica
    and /F2 Helvetica-Bold, correct xref.  Deterministic bytes."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font1 = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    font2 = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>")
    content_ids = []
    for content in page_contents:
        raw = content.encode("latin-1", errors="replace")
        if compress:
            data = zlib.compress(raw)
            meta = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = raw
            meta = f"<< /Length {len(data)} >>".encode()
        content_ids.append(add(meta + b"\nstream\n" + data + b"\nendstream"))
    pages_id = len(objs) + 1 + len(page_contents)
    page_ids = [
        add(f"<< /Type /Page /Parent {pages_id} 0 R /Contents {cid} 0 R "
            f"/Resources << /Font << /F1 {font1} 0 R /F2 {font2} 0 R >> >> "
            ">>".encode())
        for cid in content_ids
    ]
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    add(f"<< /Type /Pages /Kids [ {kids} ] /Count {len(page_ids)} "
        f"/MediaBox [ 0 0 612 792 ] >>".encode())
    catalog = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root {catalog} 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)


def _pdf_escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)"))


def document_to_pdf(title: str, text: str, *, compress: bool = False,
                    lines_per_page: int = 30, wrap: int = 70) -> bytes:
    """Render (title, body text) as a simple multi-page PDF: bold 18pt
    title, 11pt body lines, page breaks every ``lines_per_page`` lines."""
    words = (text or "").split()
    lines: list[str] = []
    cur = ""
    for w in words:
        if cur and len(cur) + 1 + len(w) > wrap:
            lines.append(cur)
            cur = w
        else:
            cur = f"{cur} {w}".strip()
    if cur:
        lines.append(cur)
    pages: list[str] = []
    i = 0
    first = True
    while first or i < len(lines):
        parts = []
        if first:
            parts.append(f"BT /F2 18 Tf 72 750 Td ({_pdf_escape(title)}) Tj ET")
            first = False
        chunk = lines[i : i + lines_per_page]
        i += lines_per_page
        parts.extend(
            f"BT /F1 11 Tf 1 0 0 1 72 {720 - 13 * j} Tm ({_pdf_escape(l)}) Tj ET"
            for j, l in enumerate(chunk))
        pages.append(" ".join(parts))
    return build_simple_pdf(pages or [""], compress=compress)


def extract_pdf_pages(ds, pdf_col: str = "pdf", url_col: str = "url", cfg=None):
    """Fused Ray plan over rows with a PDF binary column: one map_batches,
    zero shuffles (mirrors extract_pages_fused)."""
    import pyarrow as pa

    from pdf_extract_ray.config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG

    def run(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pylist()
        pdfs = batch[pdf_col].to_pylist()
        cols = {k: [] for k in ("url", "extracted_text", "n_sentences",
                                "n_pages", "status")}
        for url, data in zip(urls, pdfs):
            d = extract_pdf_document(url, data, cfg)
            cols["url"].append(url)
            cols["extracted_text"].append(d["extracted_text"])
            cols["n_sentences"].append(d["n_sentences"])
            cols["n_pages"].append(d["n_pages"])
            cols["status"].append(d["status"])
        return pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "extracted_text": pa.array(cols["extracted_text"], pa.large_string()),
            "n_sentences": pa.array(cols["n_sentences"], pa.int32()),
            "n_pages": pa.array(cols["n_pages"], pa.int32()),
            "status": pa.array(cols["status"], pa.string()),
        })

    return ds.map_batches(run, batch_format="pyarrow")


def extract_pdf_pages_staged(ds, pdf_col: str = "pdf", url_col: str = "url",
                             cfg=None, salt: int | None = None):
    """Staged PDF plan: explode each PDF into per-page BLOCK rows, then
    reuse the HTML staged plan's per-url bucketed assembly — the S2
    "splitter" analogue for huge PDFs (a 1000-page file's layout tagging
    parallelizes per input row, and the block rows flow through the same
    order-keyed shuffle as multi-row HTML documents).  Byte-identical to
    ``extract_pdf_pages`` (tested).  ``salt`` enables the same hot-key
    pre-compaction as ``extract_pages_staged``."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from pdf_extract_ray.config import DEFAULT_CONFIG
    from pdf_extract_ray.stages.agg import bucketed_group_apply
    from pdf_extract_ray.stages.layout import tag_page_lines

    cfg = cfg or DEFAULT_CONFIG

    def explode(batch: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("url", "warc_ts", "lang", "status", "page_no",
                                "block_no", "block_ord", "tag", "text")}
        for url, data in zip(batch[url_col].to_pylist(),
                             batch[pdf_col].to_pylist()):
            blocks = []
            for p in pdf_pages_spans(data):
                blocks.extend(tag_page_lines(
                    p["lines"], p["width"], p["height"], p["page_no"], cfg))
            status = "pdf" if blocks else "rejected"
            if not blocks:
                from pdf_extract_ray.stages.html_parser import Block
                blocks = [Block(0, 0, "P", "", False)]
            for ord_, b in enumerate(blocks):
                cols["url"].append(url)
                cols["warc_ts"].append(0)
                cols["lang"].append("")
                cols["status"].append(status)
                cols["page_no"].append(b.page_no)
                cols["block_no"].append(b.block_no)
                cols["block_ord"].append(ord_)
                cols["tag"].append(b.tag)
                cols["text"].append(b.text)
        return pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
            "lang": pa.array(cols["lang"], pa.string()),
            "status": pa.array(cols["status"], pa.string()),
            "page_no": pa.array(cols["page_no"], pa.int32()),
            "block_no": pa.array(cols["block_no"], pa.int32()),
            "block_ord": pa.array(cols["block_ord"], pa.int32()),
            "tag": pa.array(cols["tag"], pa.string()),
            "text": pa.array(cols["text"], pa.large_string()),
        })

    from pdf_extract_ray.pipelines.extract import _assemble_bucket

    blocks = ds.map_batches(explode, batch_format="pyarrow")

    def assemble(bucket: pd.DataFrame) -> pd.DataFrame:
        out = _assemble_bucket(bucket, cfg)
        return out[["url", "extracted_text", "n_sentences", "n_pages",
                    "status"]]

    if salt and salt > 1:
        # reuse the hot-key two-phase shape via the extract module's plan:
        # compact per (url, salt-of-block_ord) then rebuild + assemble
        def add_salt(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__salt"] = (pd.util.hash_pandas_object(b["block_ord"], index=False)
                           % np.uint64(salt)).astype("int64")
            return b

        def compact(bucket: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for (url, s), g in bucket.groupby(["url", "__salt"], sort=False):
                g = g.sort_values(["block_ord"], kind="mergesort")
                rows.append({
                    "url": url,
                    "warc_us": g["warc_ts"].astype("int64").tolist(),
                    "lang": g["lang"].tolist(),
                    "status": g["status"].tolist(),
                    "page_no": g["page_no"].tolist(),
                    "block_no": g["block_no"].tolist(),
                    "block_ord": g["block_ord"].tolist(),
                    "tag": g["tag"].tolist(),
                    "text": g["text"].tolist(),
                })
            return pd.DataFrame(rows)

        def rebuild(bucket: pd.DataFrame) -> pd.DataFrame:
            import itertools

            def flat(col):
                return list(itertools.chain.from_iterable(bucket[col]))

            counts = [len(x) for x in bucket["text"]]
            df = pd.DataFrame({
                "url": np.repeat(bucket["url"].to_numpy(), counts),
                "warc_ts": np.array(flat("warc_us"), dtype="int64")
                             .astype("datetime64[us]"),
                "lang": flat("lang"),
                "status": flat("status"),
                "page_no": np.array(flat("page_no"), dtype="int32"),
                "block_no": np.array(flat("block_no"), dtype="int32"),
                "block_ord": np.array(flat("block_ord"), dtype="int32"),
                "tag": flat("tag"),
                "text": flat("text"),
            })
            return assemble(df)

        salted = blocks.map_batches(add_salt, batch_format="pandas")
        compacted = bucketed_group_apply(salted, ["url", "__salt"], compact)
        return bucketed_group_apply(compacted, ["url"], rebuild)

    return bucketed_group_apply(blocks, ["url"], assemble)
