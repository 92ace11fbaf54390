"""Mojibake repair — undo the classic "UTF-8 bytes decoded as cp1252"
corruption that litters real web crawls (the core trick of the public
`ftfy` library, Speer 2019; reimplemented from scratch as a FROZEN
substitution table so the SQL oracle can mirror it exactly).

How the corruption arises: a page is encoded as UTF-8, but a careless
consumer decodes the bytes as cp1252 (Windows Latin-1).  Every
non-ASCII character then shows up as 2-3 garbage characters — é (UTF-8
``C3 A9``) becomes ``Ã©``, the right single quote ’ (``E2 80 99``)
becomes ``â€™``, and so on.

This module repairs a frozen subset: the table below lists the target
characters; each mojibake key is DERIVED at import time by encoding the
target to UTF-8 and decoding byte-by-byte with "sloppy cp1252" (cp1252
where defined, Latin-1 for the five undefined bytes — exactly how real
decoders leak the bytes through).  Repair = one ordered chain of
literal global replacements; the DuckDB oracle is the same chain as
nested ``replace()`` calls, so parity is by construction.

The keys are 2-3 chars starting with ``Ã``/``â``/``Â``/``Å``/``Ÿ``,
pairwise non-substring, and plain ASCII passes through untouched.
Chain-order quirk (frozen, identical in both engines): a repair output
can complete a LATER key — e.g. ``Å`` + mojibake ``â€™`` repairs to
``Å’`` which the later ``Œ`` rule then repairs again; that is the
double-encoded case, and repairing it twice is the desired behavior.

Scale shape: ONE narrow ``map_batches`` (chained C-level
``Series.str.replace`` literals), zero shuffles, no state.
"""

from __future__ import annotations

import pandas as pd

# Frozen target repertoire: the high-frequency Latin-script accents and
# Windows punctuation seen in crawled text.  Order is part of the
# frozen rule (3-byte keys listed before 2-byte keys that share no
# prefix anyway; kept stable for byte-parity across versions).
_TARGETS = (
    # Windows punctuation (3-byte UTF-8, E2 80 xx)
    "’‘“”–—…• "
    # Latin-1 accents (2-byte UTF-8, C3 xx)
    "éèêëáàâäãåíìîïóòôöõúùûüñçýÿ"
    "ÉÈÊËÁÀÂÄÃÅÍÌÎÏÓÒÔÖÕÚÙÛÜÑÇ"
    # other 2-byte commons
    "ß«»°±·×÷¿¡µ€ŒœŠšŽžŸ"
)


def _sloppy_cp1252(byte: int) -> str:
    """Decode one byte the way lenient real-world decoders do: cp1252
    where defined, Latin-1 (C1 control) for the 5 undefined bytes."""
    b = bytes([byte])
    try:
        return b.decode("cp1252")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _build_table() -> list[tuple[str, str]]:
    pairs = []
    for ch in _TARGETS:
        moji = "".join(_sloppy_cp1252(b) for b in ch.encode("utf-8"))
        pairs.append((moji, ch))
    return pairs


#: the frozen (mojibake, repaired) chain, applied in order
MOJIBAKE_TABLE: list[tuple[str, str]] = _build_table()


def repair_series(t: pd.Series) -> pd.Series:
    """The repair chain over one text Series (chained literal replaces,
    all C-level pandas kernels — no per-row Python).  Shared by the
    standalone batch op and the fused webtext-pipeline flag."""
    fixed = t.fillna("").astype(str)
    for moji, ch in MOJIBAKE_TABLE:
        fixed = fixed.str.replace(moji, ch, regex=False)
    return fixed


def repair_mojibake_batch(
    batch: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Narrow map: repaired text + a changed flag."""
    t = batch[text_col].fillna("").astype(str)
    fixed = repair_series(t)
    return pd.DataFrame({
        id_col: batch[id_col].to_numpy(),
        "text_fixed": fixed,
        "changed": (fixed != t).to_numpy(),
    })


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def mojibake_oracle_sql(
    source_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror: the same ordered chain as nested ``replace()``."""
    expr = f"coalesce({text_col}, '')"
    for moji, ch in MOJIBAKE_TABLE:
        expr = f"replace({expr}, {_sql_lit(moji)}, {_sql_lit(ch)})"
    return (
        f"SELECT {id_col}, {expr} AS text_fixed, "
        f"{expr} != coalesce({text_col}, '') AS changed "
        f"FROM ({source_sql})")


# ---------------------------------------------------------------------------
# control-character sanitization (the other ubiquitous web-crawl repair:
# Dolma/CCNet-style cleanup strips non-printable bytes before any
# tokenizer sees them)
# ---------------------------------------------------------------------------

# Frozen class: C0 controls except \t \n \r, DEL, and the C1 block —
# the characters no tokenizer should ever ingest.  \t\n\r are KEPT
# (they are structure: the line/paragraph operators key on them).
_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\x80-\x9f]"
_CONTROL_RE_SQL = (
    r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\x{80}-\x{9f}]")


def sanitize_controls_batch(batch: pd.DataFrame, text_col: str = "text",
                            id_col: str = "doc_id") -> pd.DataFrame:
    """``(id_col, text_clean, n_control, control_frac)`` — strip the
    frozen control-char class and report how much was stripped (a high
    ``control_frac`` flags binary-in-text / transfer-mangled documents
    for rejection rather than repair).

    One narrow vectorized map (a single C-level regex replace), zero
    shuffles; Python ``re`` and DuckDB/RE2 agree on every character in
    the frozen class, so the SQL oracle is exact.  ``control_frac`` =
    stripped / max(len, 1), rounded to 4."""
    import numpy as np

    from pdf_extract_ray.util import round_half_away

    t = batch[text_col].fillna("").astype(str)
    clean = t.str.replace(_CONTROL_RE, "", regex=True)
    n0 = t.str.len().to_numpy(np.int64)
    n1 = clean.str.len().to_numpy(np.int64)
    return pd.DataFrame({
        id_col: batch[id_col].to_numpy(),
        "text_clean": clean.to_numpy(),
        "n_control": n0 - n1,
        "control_frac": round_half_away((n0 - n1) / np.maximum(n0, 1), 4),
    })


def sanitize_controls_oracle_sql(table: str = "documents",
                                 text_expr: str = "text",
                                 id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`sanitize_controls_batch` (RE2 spells the
    C1 range ``\\x{80}-\\x{9f}``; the class is otherwise identical)."""
    return f"""
WITH b AS (SELECT {id_col}, coalesce({text_expr}, '') AS t FROM {table}),
c AS (SELECT {id_col}, t,
             regexp_replace(t, '{_CONTROL_RE_SQL}', '', 'g') AS text_clean
      FROM b)
SELECT {id_col}, text_clean,
       CAST(length(t) - length(text_clean) AS BIGINT) AS n_control,
       round((length(t) - length(text_clean))
             / CAST(greatest(length(t), 1) AS DOUBLE), 4) AS control_frac
FROM c
"""


# frozen typographic-normalization map: curly quotes -> ASCII quotes,
# dashes -> hyphen, exotic spaces -> space, ellipsis -> "...", soft
# hyphen -> removed.  Code points listed once here; both engines derive
# from this table.
_TYPO_MAP: list[tuple[int, str]] = [
    (0x2018, "'"), (0x2019, "'"), (0x201A, "'"), (0x201B, "'"),
    (0x201C, '"'), (0x201D, '"'), (0x201E, '"'), (0x201F, '"'),
    (0x2013, "-"), (0x2014, "-"), (0x2015, "-"),
    (0x00A0, " "), (0x2007, " "), (0x202F, " "),
    (0x2026, "..."),
    (0x00AD, ""),
]
_TYPO_CLASS_RE = "[" + "".join(chr(cp) for cp, _ in _TYPO_MAP) + "]"


def normalize_typography_batch(batch: pd.DataFrame, text_col: str = "text",
                               id_col: str = "doc_id") -> pd.DataFrame:
    """``(id_col, text_typo, n_typo)`` — fold typographic Unicode
    (curly quotes, en/em dashes, NBSP-family spaces, ellipsis, soft
    hyphen) to their ASCII training-text forms via the frozen
    ``_TYPO_MAP``; ``n_typo`` counts replaced characters (a
    normalization-pressure signal: high counts flag word-processor /
    PDF-flow text).

    One vectorized count + one ``str.translate`` pass over the frozen
    codepoint table, zero shuffles; the SQL mirror applies the same
    table as chained ``replace()`` calls, so parity is exact."""
    t = batch[text_col].fillna("").astype(str)
    n_typo = t.str.count(_TYPO_CLASS_RE).to_numpy("int64")
    table = {cp: rep for cp, rep in _TYPO_MAP}
    return pd.DataFrame({
        id_col: batch[id_col].to_numpy(),
        "text_typo": t.str.translate(table).to_numpy(),
        "n_typo": n_typo,
    })


def normalize_typography_oracle_sql(table: str = "documents",
                                    text_expr: str = "text",
                                    id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`normalize_typography_batch` — the same
    frozen table as chained ``replace(..., chr(cp), ...)``; ``n_typo``
    sums per-codepoint length deltas (every source is one char)."""
    norm = "t"
    for cp, rep in _TYPO_MAP:
        norm = f"replace({norm}, chr({cp}), {_sql_lit(rep)})"
    counts = " + ".join(
        f"(length(t) - length(replace(t, chr({cp}), '')))"
        for cp, _ in _TYPO_MAP)
    return (
        f"WITH b AS (SELECT {id_col}, coalesce({text_expr}, '') AS t "
        f"FROM {table}) "
        f"SELECT {id_col}, {norm} AS text_typo, "
        f"CAST({counts} AS BIGINT) AS n_typo FROM b")


# presentation-form ligatures PDF extractors leak into text when the
# font encodes "fi" as one glyph (U+FB00..FB06 alphabetic presentation
# forms + the Latin digraph/ OE family) — frozen fold table, SQL-
# mirrorable as chained replace(chr(cp))
_LIGATURES = (
    (0xFB00, "ff"), (0xFB01, "fi"), (0xFB02, "fl"), (0xFB03, "ffi"),
    (0xFB04, "ffl"), (0xFB05, "st"), (0xFB06, "st"),
    (0x0132, "IJ"), (0x0133, "ij"), (0x0152, "OE"), (0x0153, "oe"),
)

_DEHYPH_RE = r"([A-Za-z])-\n([a-z])"


def pdf_text_cleanup_batch(batch: pd.DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> pd.DataFrame:
    """``(id_col, text_clean, n_ligatures, n_dehyphenated)`` — PDF
    text-flow repair, the post-extraction cleanup step every
    PDF-sourced corpus needs:

    * fold presentation-form ligatures to their letter sequences
      (frozen ``_LIGATURES`` table, applied FIRST);
    * join end-of-line hyphenations — a letter, ``-``, newline, then a
      LOWERCASE letter collapse to the two letters (the lowercase gate
      keeps true compounds like "self-\\nAssembly" intact; frozen rule
      ``_DEHYPH_RE``).

    One ``str.translate`` + one compiled-regex pass, zero shuffles;
    the SQL mirror applies the identical tables/regex, so parity is
    exact (each de-hyphenation removes exactly ``-\\n``, making the
    SQL count a length delta / 2 — integer-exact)."""
    t = batch[text_col].fillna("").astype(str)
    lig_class = "[" + "".join(chr(cp) for cp, _ in _LIGATURES) + "]"
    n_lig = t.str.count(lig_class).to_numpy("int64")
    folded = t.str.translate({cp: rep for cp, rep in _LIGATURES})
    n_deh = folded.str.count(_DEHYPH_RE).to_numpy("int64")
    clean = folded.str.replace(_DEHYPH_RE, r"\1\2", regex=True)
    return pd.DataFrame({
        id_col: batch[id_col].to_numpy(),
        "text_clean": clean.to_numpy(),
        "n_ligatures": n_lig,
        "n_dehyphenated": n_deh,
    })


def pdf_text_cleanup_oracle_sql(table: str = "documents",
                                text_expr: str = "text",
                                id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`pdf_text_cleanup_batch`."""
    folded = "t"
    for cp, rep in _LIGATURES:
        folded = f"replace({folded}, chr({cp}), {_sql_lit(rep)})"
    lig_count = " + ".join(
        f"(length(t) - length(replace(t, chr({cp}), '')))"
        for cp, _ in _LIGATURES)
    rx = "([A-Za-z])-" + "' || chr(10) || '" + "([a-z])"
    return f"""
WITH b AS (SELECT {id_col}, coalesce({text_expr}, '') AS t FROM {table}),
f AS (SELECT {id_col}, t, {folded} AS ft FROM b),
r AS (SELECT {id_col}, t, ft,
             regexp_replace(ft, '{rx}', '\\1\\2', 'g') AS ct
      FROM f)
SELECT {id_col}, ct AS text_clean,
       CAST({lig_count} AS BIGINT) AS n_ligatures,
       CAST((length(ft) - length(ct)) // 2 AS BIGINT) AS n_dehyphenated
FROM r
"""
