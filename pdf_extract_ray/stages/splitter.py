"""Rule-based sentence composer/splitter — the deterministic automaton that
replaces the reference's LLM composition step.

The reference delegates this to Gemini, but states the rules explicitly in
its prompt (reference: euaa_사례/sentence_composer.py:354-404); those rules,
plus the driver behavior around them (sentence_composer.py:440-537), are
the spec implemented here:

1. MERGE: read P fragments in order, joining with a single space, until the
   accumulated text is a *complete* unit: it ends with terminal punctuation
   (. ? !) AND all brackets ( ) [ ] are balanced.
2. SPLIT: a complete unit containing several complete sentences is split at
   each terminal-punctuation position that sits at bracket depth 0 and is
   followed by whitespace.
3. CLEANUP (applied to composed sentences only): whitespace runs collapse
   to one space; ``( text )`` -> ``(text)``.
4. BYPASS: headers pass through verbatim (sentence_composer.py:515-524);
   a section whose P-count is exactly 1 passes its P through verbatim, no
   cleanup (sentence_composer.py:533-537 "P가 1개만 있으면 LLM 처리 없이
   직접 추가").
5. FLUSH: a trailing incomplete buffer at section end is emitted as-is
   (analogue of the failed-batch raw fallback, sentence_composer.py:476-478).

Frozen decisions beyond the prompt's letter (SURVEY.md §7.4.5): a terminal
punct char ends a sentence only at bracket depth 0 and only when followed
by whitespace or end-of-buffer (so ``3.5`` and ``C-550/16`` never split);
quotes are not tracked; bracket depth never goes negative (stray closers
are ignored for balance).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pdf_extract_ray.config import DEFAULT_CONFIG, ExtractConfig
from pdf_extract_ray.functions.text import tidy_bracket_spacing
from pdf_extract_ray.stages.merge import Fragment


_INTERESTING_CACHE: dict[tuple[str, str, str], "re.Pattern"] = {}


def _interesting_re(cfg: ExtractConfig):
    key = (cfg.terminal_punct, cfg.open_brackets, cfg.close_brackets)
    rx = _INTERESTING_CACHE.get(key)
    if rx is None:
        rx = _INTERESTING_CACHE[key] = re.compile(
            "[" + re.escape(key[0] + key[1] + key[2]) + "]"
        )
    return rx


@dataclass(slots=True)
class Sentence:
    page_no: int
    frag_id: int           # fragment the sentence STARTED in
    sent_no: int           # 0-based within the document
    text: str
    source_type: str       # H1 | H2 | H3 | P


def _is_complete(text: str, cfg: ExtractConfig) -> bool:
    """Ends with terminal punctuation and brackets balanced."""
    t = text.rstrip()
    if not t or t[-1] not in cfg.terminal_punct:
        return False
    return _bracket_depth(t, cfg) == 0


def _bracket_depth(text: str, cfg: ExtractConfig) -> int:
    depth = 0
    for ch in text:
        if ch in cfg.open_brackets:
            depth += 1
        elif ch in cfg.close_brackets and depth > 0:
            depth -= 1
    return depth


def split_complete(text: str, cfg: ExtractConfig = DEFAULT_CONFIG) -> list[str]:
    """Split a text into complete sentences at depth-0 terminal punctuation
    followed by whitespace.  The final piece may be incomplete."""
    pieces: list[str] = []
    depth = 0
    start = 0
    n = len(text)
    for i, ch in enumerate(text):
        if ch in cfg.open_brackets:
            depth += 1
        elif ch in cfg.close_brackets and depth > 0:
            depth -= 1
        elif ch in cfg.terminal_punct and depth == 0:
            if i + 1 >= n or text[i + 1].isspace():
                piece = text[start : i + 1].strip()
                if piece:
                    pieces.append(piece)
                start = i + 1
    tail = text[start:].strip()
    if tail:
        pieces.append(tail)
    return pieces


def compose_paragraphs(p_texts: list[str], cfg: ExtractConfig = DEFAULT_CONFIG) -> list[str]:
    """Compose a section's P fragments (>=2 of them) into complete sentences.

    Semantics (unchanged, frozen): after each fragment append, every
    leading complete sentence (depth-0 terminal punct followed by
    whitespace/end) is emitted tidied; the incomplete tail keeps
    accumulating; a trailing incomplete buffer flushes as-is.

    Implementation is an INCREMENTAL scan: each appended character is
    scanned exactly once (bracket depth carried across appends), instead of
    re-splitting the whole buffer per fragment — the composer was ~45% of
    extraction CPU before this."""
    out: list[str] = []
    buf = ""
    scan = 0        # chars of buf already scanned (no unemitted boundary within)
    depth = 0       # bracket depth at position `scan`
    term, op, cl = cfg.terminal_punct, cfg.open_brackets, cfg.close_brackets

    for frag in p_texts:
        if buf:
            pre = f"{buf} {frag}"
            buf = pre.strip()
            scan -= len(pre) - len(pre.lstrip())  # leading-ws strip shifts positions
            if scan < 0:
                scan = 0
        else:
            buf = frag
            scan, depth = 0, 0

        n = len(buf)
        boundaries: list[int] = []
        # scan only the "interesting" chars (brackets + terminal punct) via
        # the C regex engine; plain text is skipped without Python bytecode
        for m in _interesting_re(cfg).finditer(buf, scan):
            i = m.start()
            ch = buf[i]
            if ch in op:
                depth += 1
            elif ch in cl:
                if depth > 0:
                    depth -= 1
            elif depth == 0 and (i + 1 >= n or buf[i + 1].isspace()):
                boundaries.append(i)

        if boundaries:
            start = 0
            for b in boundaries:
                piece = buf[start : b + 1].strip()
                if piece:
                    out.append(tidy_bracket_spacing(piece))
                start = b + 1
            buf = buf[start:].strip()
        scan = len(buf)

    if buf:
        out.append(buf)  # trailing incomplete: emit as-is (raw fallback)
    return out


def compose_document(frags: list[Fragment], cfg: ExtractConfig = DEFAULT_CONFIG) -> list[Sentence]:
    """Run the composer per section over a document's fragments; headers and
    singleton-P sections bypass untouched."""
    out: list[Sentence] = []
    sent_no = 0

    def emit(page_no: int, frag_id: int, text: str, source_type: str):
        nonlocal sent_no
        out.append(Sentence(page_no, frag_id, sent_no, text, source_type))
        sent_no += 1

    # group fragments by section (fragments arrive in document order)
    i = 0
    n = len(frags)
    while i < n:
        sec = frags[i].section_id
        j = i
        while j < n and frags[j].section_id == sec:
            j += 1
        section = frags[i:j]
        headers = [f for f in section if f.tag != "P"]
        ps = [f for f in section if f.tag == "P"]
        for h in headers:
            emit(h.page_no, h.frag_id, h.text, h.tag)
        if len(ps) == 1:
            emit(ps[0].page_no, ps[0].frag_id, ps[0].text, "P")
        elif ps:
            first = ps[0]
            for text in compose_paragraphs([p.text for p in ps], cfg):
                emit(first.page_no, first.frag_id, text, "P")
        i = j
    return out
