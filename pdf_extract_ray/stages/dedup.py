"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference only has exact first-wins dedup on normalized pair text
(reference: euaa_사례/sentences/metadata_generator.py:618-622); at 100 TB a
training-data engine needs the full near-dup family, so these are
first-class operators here (SURVEY.md §2.7).

Scale design notes:
* exact dedup: hash-partition by content fingerprint, keep the min
  order-key row per group — "first" is redefined deterministically as the
  smallest ``(order_col)`` (SURVEY.md §7.4.2), never arrival order.
* MinHash/LSH: ALL hashing is vectorized — tokens are hashed once per
  batch with pandas' C siphash (``hash_pandas_object``, the same stable
  family the bucketed shuffle uses), k-shingles are rolling-polynomial
  mixes over the token-hash array, signatures come from one
  ``minimum.reduceat`` over the permuted matrix, and band keys are an
  FNV-style fold over the signature matrix.  No per-row Python hashing
  anywhere (round-1 bench: the md5 loops were 61% of total wall).
* universal-hash exactness: permutation params draw from the FULL
  [1, M) family over the Mersenne prime and ``(a*x + b) mod M`` is
  computed exactly via 31-bit limb arithmetic (``_mulmod_mersenne``;
  2^61 === 1 folds).  Round-1 wrapped silently mod 2^64; the obvious
  small-parameter fix is exact but statistically broken (see
  ``_hash_perm_params``).
* the all-to-all steps shuffle only the tiny ``(band_hash, id)`` rows,
  candidate pairs and one copy of each signature — never the documents;
  candidate verification joins signatures, not texts.
* candidate buckets are CAPPED (``max_band_freq`` / ``max_bucket``): a
  degenerate corpus (one boilerplate repeated 10^6 times) would otherwise
  create a single O(b^2) bucket.  Dropped buckets are logged, never
  silent — exact duplicates remain the exact-dedup operator's job.
* SimHash: 64-bit signatures; near-dup buckets via banded keys
  (Hamming distance <= max_hamming guarantees one identical band).
* embedding near-dup: random-hyperplane LSH buckets with Hamming-1
  multi-probe by default (scale path); ``num_buckets=1`` is the exact
  all-pairs mode used by the SQL oracle on small inputs.

Everything emits plain Arrow-friendly columns (pyarrow handles uint64
natively).
"""

from __future__ import annotations

import logging
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset

logger = logging.getLogger("pdf_extract_ray.dedup")

# ---------------------------------------------------------------------------
# exact dedup (D1)
# ---------------------------------------------------------------------------

def dedup_exact(ds: Dataset, key_col: str, order_col: str,
                keep: str = "first") -> Dataset:
    """Keep one row per ``key_col``: ``keep="first"`` = minimal
    ``order_col`` (the reference's first-occurrence rule, SURVEY.md
    §7.4.2), ``keep="last"`` = maximal ``order_col`` (the crawl-refresh
    rule: a url revisited across snapshots keeps the FRESHEST copy).
    Deterministic at any parallelism either way.

    One coarse hash shuffle on the key, then a VECTORIZED
    sort+drop_duplicates per bucket (per-group Python would cost ~0.15 ms
    x #distinct-keys; see stages/agg.py).

    DETERMINISM CONTRACT: ``order_col`` must order rows uniquely within a
    key (doc ids and (url, frag_id) keys do); rows tied on both key and
    order fall back to arrival order, which a shuffle does not fix."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")

    def keep_rule(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.sort_values(order_col, kind="mergesort").drop_duplicates(
            subset=[key_col], keep=keep
        )

    return bucketed_group_apply(ds, [key_col], keep_rule)


def dedup_keep_best(ds: Dataset, key_col: str, score_col: str,
                    order_col: str) -> Dataset:
    """Keep the BEST row per ``key_col``: maximal ``score_col``, ties
    broken by minimal ``order_col`` — canonical-copy selection when a
    content fingerprint groups near-identical copies and a quality
    signal (length, NB score, compression ratio) says which one to
    train on.  Same one-coarse-hash-shuffle plan as :func:`dedup_exact`;
    deterministic at any parallelism (``(key, order)`` must be unique).
    """
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    def keep_rule(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(
            [key_col, score_col, order_col],
            ascending=[True, False, True], kind="mergesort")
        return g.drop_duplicates(subset=[key_col], keep="first")

    return bucketed_group_apply(ds, [key_col], keep_rule)


def dedup_against_reference(ds: Dataset, ref: Dataset, key_col: str,
                            *, id_col: str = "doc_id") -> Dataset:
    """Cross-corpus anti-dedup: drop every ``ds`` row whose ``key_col``
    appears ANYWHERE in ``ref`` — the "new snapshot minus everything
    already ingested" step when merging crawl dumps (RefinedWeb / Dolma
    dedup new CC snapshots against the previous ones; eval-set removal
    by content hash is the same shape).  Returns the surviving
    ``(id_col, key_col)`` rows of ``ds`` — narrow on purpose; join
    bodies back by id downstream so they never ride the shuffle.

    Scale shape: both sides are reduced to ``(id, key, __ref)`` rows
    (the reference side pre-deduplicated per batch — map-side shrink),
    then ONE bucketed cogroup on the key; membership inside a bucket is
    a vectorized ``isin`` against that bucket's reference keys.  No
    broadcast of the reference key set (it can be another 100 TB
    corpus), no driver materialization.

    ``ref`` must also carry ``id_col`` (any values — only its keys are
    read; the column keeps the union schema Arrow-typed, never
    all-null)."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    def corpus_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            key_col: b[key_col].to_numpy(),
            "__ref": np.int8(0),
        })

    def ref_rows(b: pd.DataFrame) -> pd.DataFrame:
        k = b[[id_col, key_col]].drop_duplicates(subset=[key_col])
        return pd.DataFrame({
            id_col: k[id_col].to_numpy(),
            key_col: k[key_col].to_numpy(),
            "__ref": np.int8(1),
        })

    tagged = ds.map_batches(corpus_rows, batch_format="pandas").union(
        ref.map_batches(ref_rows, batch_format="pandas"))

    def rule(bucket: pd.DataFrame) -> pd.DataFrame:
        is_ref = bucket["__ref"].to_numpy() == 1
        bad = bucket.loc[is_ref, key_col].unique()
        keep = (~is_ref) & (~bucket[key_col].isin(bad).to_numpy())
        return bucket.loc[keep, [id_col, key_col]]

    return bucketed_group_apply(tagged, [key_col], rule)


def semi_join_reference(ds: Dataset, ref: Dataset, key_col: str,
                        *, id_col: str = "doc_id") -> Dataset:
    """SEMI join against a reference corpus: keep every ``ds`` row whose
    ``key_col`` appears anywhere in ``ref`` — the mirror image of
    :func:`dedup_against_reference` (anti), for "restrict this crawl to
    urls we have labels for" / "keep only pages whose host passed the
    curation list" when the reference is itself too big to broadcast.

    Same scale shape as the anti op: both sides reduce to narrow
    ``(id, key)`` rows (reference pre-deduped per batch), ONE bucketed
    cogroup, vectorized in-bucket ``isin``; returns the surviving
    ``(id_col, key_col)`` rows of ``ds``."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    def corpus_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            key_col: b[key_col].to_numpy(),
            "__ref": np.int8(0),
        })

    def ref_rows(b: pd.DataFrame) -> pd.DataFrame:
        k = b[[id_col, key_col]].drop_duplicates(subset=[key_col])
        return pd.DataFrame({
            id_col: k[id_col].to_numpy(),
            key_col: k[key_col].to_numpy(),
            "__ref": np.int8(1),
        })

    tagged = ds.map_batches(corpus_rows, batch_format="pandas").union(
        ref.map_batches(ref_rows, batch_format="pandas"))

    def rule(bucket: pd.DataFrame) -> pd.DataFrame:
        is_ref = bucket["__ref"].to_numpy() == 1
        good = bucket.loc[is_ref, key_col].unique()
        keep = (~is_ref) & bucket[key_col].isin(good).to_numpy()
        return bucket.loc[keep, [id_col, key_col]]

    return bucketed_group_apply(tagged, [key_col], rule)


def semi_join_reference_oracle_sql(corpus_sql: str, ref_sql: str,
                                   key_col: str,
                                   id_col: str = "doc_id") -> str:
    """DuckDB semi-join mirror of :func:`semi_join_reference`."""
    return f"""
SELECT c.{id_col}, c.{key_col}
FROM ({corpus_sql}) c
WHERE EXISTS (SELECT 1 FROM ({ref_sql}) r
              WHERE r.{key_col} = c.{key_col})
"""


def levenshtein(a: str, b: str) -> int:
    """Unweighted edit distance over UTF-8 BYTES (insert/delete/
    substitute cost 1) — exactly DuckDB's ``levenshtein()``, which is
    byte-oriented (probed: levenshtein('héllo','hello') = 2, the é is
    two bytes).  Row DP with the running-min trick so the inner loop
    is numpy: the insert recurrence ``cur[j] = min over j' <= j of
    (cand[j'] + (j - j'))`` becomes one ``np.minimum.accumulate``."""
    if a == b:
        return 0
    ab = a.encode("utf-8")
    bbts = b.encode("utf-8")
    la, lb = len(ab), len(bbts)
    if la == 0 or lb == 0:
        return la or lb
    bb = np.frombuffer(bbts, dtype=np.uint8)
    idx = np.arange(lb + 1, dtype=np.int64)
    prev = idx.copy()
    cand = np.empty(lb + 1, dtype=np.int64)
    for i, ca in enumerate(ab, 1):
        cand[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (bb != np.uint8(ca)),
                   out=cand[1:])
        prev = np.minimum(cand, idx + np.minimum.accumulate(cand - idx))
    return int(prev[-1])


def _pairs_with_texts(
    pairs: Dataset,
    docs: Dataset,
    *,
    id_col: str,
    text_col: str,
    a_col: str,
    b_col: str,
) -> Dataset:
    """Ship each candidate pair its two member texts — the shared
    attach step behind every exact pair-refinement operator
    (:func:`refine_pairs_levenshtein`, :func:`prefix_filter_jaccard_pairs`).

    Output rows: ``(a_col, b_col, __role, __t)`` with ``__role`` 0 for
    the a-side text and 1 for the b-side; a downstream cogroup on
    ``(a_col, b_col)`` sees both sides of every pair together.

    Scale shape: two bucketed cogroups — shuffle 1 keys on the member
    id to attach texts (pair rows + text rows union into ONE shuffle),
    shuffle 2 (run by the caller) keys on the pair.  No acero joins;
    texts move once, only for ids that appear in some pair."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    def pair_rows(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates([a_col, b_col])
        a = b[a_col].to_numpy()
        bb = b[b_col].to_numpy()
        return pd.DataFrame({
            "__m": np.concatenate([a, bb]),
            a_col: np.concatenate([a, a]),
            b_col: np.concatenate([bb, bb]),
            "__role": np.repeat(np.array([0, 1], np.int8), len(a)),
            "__t": "",
        })

    def text_rows(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        return pd.DataFrame({
            "__m": ids,
            a_col: np.zeros(len(ids), dtype=ids.dtype),
            b_col: np.zeros(len(ids), dtype=ids.dtype),
            "__role": np.int8(2),
            "__t": b[text_col].fillna("").to_numpy(),
        })

    tagged = pairs.map_batches(pair_rows, batch_format="pandas").union(
        docs.map_batches(text_rows, batch_format="pandas"))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        is_text = g["__role"].to_numpy() == 2
        tmap = (g.loc[is_text].drop_duplicates("__m")
                .set_index("__m")["__t"])
        mem = g.loc[~is_text,
                    ["__m", a_col, b_col, "__role"]].copy()
        mem["__t"] = mem["__m"].map(tmap)
        return mem.dropna(subset=["__t"])[
            [a_col, b_col, "__role", "__t"]]

    return bucketed_group_apply(tagged, ["__m"], attach)


def refine_pairs_levenshtein(
    pairs: Dataset,
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "a",
    b_col: str = "b",
    max_dist: int | None = None,
) -> Dataset:
    """Verify candidate near-dup pairs by EXACT edit distance — the
    refinement step after a sketch (minhash/simhash/LSH) proposes
    candidates: sketches bound set overlap, edit distance certifies
    character-level closeness, and pairs above ``max_dist`` are cut.

    Output: ``(a, b, edit_distance, edit_sim)`` with ``edit_sim =
    round(1 - dist / max(bytes_a, bytes_b, 1), 4)`` — distances and
    lengths are both in UTF-8 bytes (the DuckDB levenshtein unit).

    Scale shape: two bucketed cogroups ship each pair its two texts
    (:func:`_pairs_with_texts`: shuffle 1 keys on the member id to
    attach texts, shuffle 2 keys on the pair to bring both sides
    together) — the repo's own cogroup machinery, no acero joins.
    Pairs are the SMALL candidate set by contract (never run this on
    the raw corpus: the DP is O(len_a x len_b) per pair); duplicate
    (a, b) pair rows collapse to one.  The DP itself is a numpy row
    recurrence."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply
    from pdf_extract_ray.util import round_half_away

    withtext = _pairs_with_texts(
        pairs, docs, id_col=id_col, text_col=text_col,
        a_col=a_col, b_col=b_col)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        p = (g.drop_duplicates([a_col, b_col, "__role"])
             .pivot_table(index=[a_col, b_col], columns="__role",
                          values="__t", aggfunc="first")
             .dropna(subset=[0, 1]))
        if not len(p):
            return pd.DataFrame({a_col: [], b_col: [],
                                 "edit_distance": [], "edit_sim": []})
        ta = p[0].tolist()
        tb = p[1].tolist()
        d = np.fromiter((levenshtein(x, y) for x, y in zip(ta, tb)),
                        np.int64, len(ta))
        ml = np.maximum(
            np.fromiter((len(x.encode("utf-8")) for x in ta),
                        np.int64, len(ta)),
            np.fromiter((len(y.encode("utf-8")) for y in tb),
                        np.int64, len(tb)))
        out = pd.DataFrame({
            a_col: p.index.get_level_values(0).to_numpy(),
            b_col: p.index.get_level_values(1).to_numpy(),
            "edit_distance": d,
            "edit_sim": round_half_away(1.0 - d / np.maximum(ml, 1), 4),
        })
        if max_dist is not None:
            out = out[out["edit_distance"] <= max_dist]
        return out

    return bucketed_group_apply(withtext, [a_col, b_col], score)


def jaro_winkler(a: str, b: str) -> float:
    """Jaro-Winkler similarity over UTF-8 BYTES — exactly DuckDB's
    ``jaro_winkler_similarity`` (probed A/B on 2,000 random cases incl.
    unicode, 0 mismatches): match window ``max(len)//2 - 1`` (floored
    at 0), transpositions halved, Winkler prefix boost (cap 4 bytes,
    p=0.1) applied only when jaro > 0.7, empty-side -> 0.0, equal
    strings -> 1.0.  The record-linkage scorer that tolerates typos and
    rewards shared prefixes — the classic refinement after
    :func:`sorted_neighborhood_pairs` blocking."""
    ab, bb = a.encode("utf-8"), b.encode("utf-8")
    la, lb = len(ab), len(bb)
    if la == 0 or lb == 0:
        return 0.0
    if ab == bb:
        return 1.0
    window = max(max(la, lb) // 2 - 1, 0)
    na = np.frombuffer(ab, dtype=np.uint8)
    nb = np.frombuffer(bb, dtype=np.uint8)
    mb = np.zeros(lb, dtype=bool)
    order = np.full(la, -1, dtype=np.int64)   # b-index matched by a[i]
    m = 0
    for i in range(la):
        lo2 = 0 if i < window else i - window
        hi2 = min(lb, i + window + 1)
        cand = np.nonzero((nb[lo2:hi2] == na[i]) & ~mb[lo2:hi2])[0]
        if len(cand):
            j = lo2 + int(cand[0])
            mb[j] = True
            order[i] = j
            m += 1
    if m == 0:
        return 0.0
    bs = np.sort(order[order >= 0])
    t = int((nb[bs] != na[order >= 0]).sum()) // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro > 0.7:
        pl = 0
        for x, y in zip(ab[:4], bb[:4]):
            if x != y:
                break
            pl += 1
        jaro = jaro + pl * 0.1 * (1.0 - jaro)
    return jaro


def refine_pairs_jaro_winkler(
    pairs: Dataset,
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "a",
    b_col: str = "b",
    min_sim: float | None = None,
) -> Dataset:
    """Score candidate pairs by Jaro-Winkler similarity — the
    record-linkage tail of the SNM pipeline (block with
    :func:`sorted_neighborhood_pairs`, certify here); pairs below
    ``min_sim`` are cut.

    Output: ``(a, b, jw_sim)`` — raw doubles; the kernel reproduces
    DuckDB's expression to the last ulp (probed), so the SQL oracle
    compares exactly under the driver's round(9).

    Scale shape: identical to :func:`refine_pairs_levenshtein` —
    :func:`_pairs_with_texts`' two bucketed cogroups ship each pair its
    texts; pairs are the SMALL candidate set by contract."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    withtext = _pairs_with_texts(pairs, docs, id_col=id_col,
                                 text_col=text_col, a_col=a_col,
                                 b_col=b_col)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        p = (g.drop_duplicates([a_col, b_col, "__role"])
             .pivot_table(index=[a_col, b_col], columns="__role",
                          values="__t", aggfunc="first")
             .dropna(subset=[0, 1]))
        if not len(p):
            return pd.DataFrame({a_col: pd.Series([], dtype=np.int64),
                                 b_col: pd.Series([], dtype=np.int64),
                                 "jw_sim": pd.Series([], dtype=np.float64)})
        sims = np.fromiter(
            (jaro_winkler(x, y) for x, y in zip(p[0], p[1])),
            np.float64, len(p))
        out = pd.DataFrame({
            a_col: p.index.get_level_values(0).to_numpy(),
            b_col: p.index.get_level_values(1).to_numpy(),
            "jw_sim": sims,
        })
        if min_sim is not None:
            out = out[out["jw_sim"] >= min_sim]
        return out.reset_index(drop=True)

    return bucketed_group_apply(withtext, [a_col, b_col], score)


def refine_pairs_jaro_winkler_oracle_sql(
    pairs_sql: str,
    docs_sql: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "a",
    b_col: str = "b",
    min_sim: float | None = None,
) -> str:
    """DuckDB mirror of :func:`refine_pairs_jaro_winkler`."""
    cut = (f"WHERE jaro_winkler_similarity(da.t, db.t) >= {min_sim!r}"
           if min_sim is not None else "")
    return f"""
WITH __jw_p AS (SELECT DISTINCT {a_col}, {b_col} FROM ({pairs_sql})),
__jw_d AS (SELECT {id_col} AS id, coalesce({text_col}, '') AS t
           FROM ({docs_sql}))
SELECT __jw_p.{a_col} AS {a_col}, __jw_p.{b_col} AS {b_col},
       jaro_winkler_similarity(da.t, db.t) AS jw_sim
FROM __jw_p
JOIN __jw_d da ON da.id = __jw_p.{a_col}
JOIN __jw_d db ON db.id = __jw_p.{b_col}
{cut}
"""


def refine_pairs_word_overlap(
    pairs: Dataset,
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "a",
    b_col: str = "b",
) -> Dataset:
    """Full word-set overlap REPORT for candidate pairs: sizes,
    intersection, Jaccard AND both containments — the asymmetric
    numbers Jaccard alone hides (a tweet quoted inside an article has
    containment_a ~= 1 with tiny Jaccard; quote/subset detection needs
    the directional ratio).  A scorer, not a filter: every pair whose
    ids carry a document comes back, zero-overlap included.

    Tokenization is the frozen corpus word rule (``[a-z0-9]+`` over
    lowered text).  Ratios are single IEEE divisions of exact ints
    (NULL when the denominator is 0), so the SQL mirror matches
    exactly.  CONTRACT: pair ids must exist in ``docs`` — pairs with a
    missing side are dropped (the oracle semijoins both sides).

    Output: ``(a, b, n_a, n_b, n_common, jaccard, containment_a,
    containment_b)``.  Scale shape: :func:`_pairs_with_texts`' two
    bucketed cogroups; pairs are the SMALL candidate set by contract."""
    import re

    from pdf_extract_ray.stages.agg import bucketed_group_apply

    tok_re = re.compile(_PJ_TOKEN_PAT)
    withtext = _pairs_with_texts(pairs, docs, id_col=id_col,
                                 text_col=text_col, a_col=a_col,
                                 b_col=b_col)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        p = (g.drop_duplicates([a_col, b_col, "__role"])
             .pivot_table(index=[a_col, b_col], columns="__role",
                          values="__t", aggfunc="first")
             .dropna(subset=[0, 1]))
        if not len(p):
            return pd.DataFrame({
                a_col: pd.Series([], dtype=np.int64),
                b_col: pd.Series([], dtype=np.int64),
                "n_a": pd.Series([], dtype=np.int64),
                "n_b": pd.Series([], dtype=np.int64),
                "n_common": pd.Series([], dtype=np.int64),
                "jaccard": pd.Series([], dtype=np.float64),
                "containment_a": pd.Series([], dtype=np.float64),
                "containment_b": pd.Series([], dtype=np.float64)})
        sa = [set(tok_re.findall(x.lower())) for x in p[0]]
        sb = [set(tok_re.findall(y.lower())) for y in p[1]]
        na = np.fromiter((len(x) for x in sa), np.int64, len(sa))
        nb = np.fromiter((len(y) for y in sb), np.int64, len(sb))
        nc = np.fromiter((len(x & y) for x, y in zip(sa, sb)),
                         np.int64, len(sa))
        union = na + nb - nc
        with np.errstate(invalid="ignore", divide="ignore"):
            jac = np.where(union > 0, nc / np.maximum(union, 1), np.nan)
            ca = np.where(na > 0, nc / np.maximum(na, 1), np.nan)
            cb = np.where(nb > 0, nc / np.maximum(nb, 1), np.nan)
        return pd.DataFrame({
            a_col: p.index.get_level_values(0).to_numpy(),
            b_col: p.index.get_level_values(1).to_numpy(),
            "n_a": na, "n_b": nb, "n_common": nc,
            "jaccard": jac, "containment_a": ca, "containment_b": cb,
        })

    return bucketed_group_apply(withtext, [a_col, b_col], score)


def refine_pairs_word_overlap_oracle_sql(
    pairs_sql: str,
    docs_sql: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "a",
    b_col: str = "b",
) -> str:
    """DuckDB mirror of :func:`refine_pairs_word_overlap`."""
    return f"""
WITH __wo_p AS (
  SELECT DISTINCT {a_col}, {b_col} FROM ({pairs_sql}) p0
  WHERE EXISTS (SELECT 1 FROM ({docs_sql}) dx
                WHERE dx.{id_col} = p0.{a_col})
    AND EXISTS (SELECT 1 FROM ({docs_sql}) dy
                WHERE dy.{id_col} = p0.{b_col})),
__wo_tok AS (
  SELECT {id_col} AS id,
         unnest(list_distinct(regexp_extract_all(
             lower(coalesce({text_col}, '')), '{_PJ_TOKEN_PAT}'))) AS tok
  FROM ({docs_sql})),
__wo_sz AS (SELECT id, count(*) AS n FROM __wo_tok GROUP BY id),
__wo_i AS (
  SELECT p.{a_col} AS a0, p.{b_col} AS b0, count(*) AS nc
  FROM __wo_p p
  JOIN __wo_tok ta ON ta.id = p.{a_col}
  JOIN __wo_tok tb ON tb.id = p.{b_col} AND tb.tok = ta.tok
  GROUP BY 1, 2)
SELECT p.{a_col} AS {a_col}, p.{b_col} AS {b_col},
       coalesce(sa.n, 0) AS n_a,
       coalesce(sb.n, 0) AS n_b,
       coalesce(i.nc, 0) AS n_common,
       CASE WHEN coalesce(sa.n, 0) + coalesce(sb.n, 0)
                 - coalesce(i.nc, 0) > 0
            THEN CAST(coalesce(i.nc, 0) AS DOUBLE)
                 / (coalesce(sa.n, 0) + coalesce(sb.n, 0)
                    - coalesce(i.nc, 0)) END AS jaccard,
       CASE WHEN coalesce(sa.n, 0) > 0
            THEN CAST(coalesce(i.nc, 0) AS DOUBLE) / sa.n
       END AS containment_a,
       CASE WHEN coalesce(sb.n, 0) > 0
            THEN CAST(coalesce(i.nc, 0) AS DOUBLE) / sb.n
       END AS containment_b
FROM __wo_p p
LEFT JOIN __wo_sz sa ON sa.id = p.{a_col}
LEFT JOIN __wo_sz sb ON sb.id = p.{b_col}
LEFT JOIN __wo_i i ON i.a0 = p.{a_col} AND i.b0 = p.{b_col}
"""


def refine_pairs_levenshtein_oracle_sql(
    pairs_sql: str,
    docs_sql: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "a",
    b_col: str = "b",
    max_dist: int | None = None,
) -> str:
    """DuckDB mirror of :func:`refine_pairs_levenshtein`."""
    cut = (f"WHERE levenshtein(da.t, db.t) <= {max_dist}"
           if max_dist is not None else "")
    return f"""
WITH __lev_p AS ({pairs_sql}),
__lev_d AS (SELECT {id_col} AS id, coalesce({text_col}, '') AS t
            FROM ({docs_sql}))
SELECT __lev_p.{a_col} AS {a_col}, __lev_p.{b_col} AS {b_col},
       CAST(levenshtein(da.t, db.t) AS BIGINT) AS edit_distance,
       round(1.0 - levenshtein(da.t, db.t)
             / CAST(greatest(strlen(da.t), strlen(db.t), 1) AS DOUBLE),
             4) AS edit_sim
FROM __lev_p
JOIN __lev_d da ON da.id = __lev_p.{a_col}
JOIN __lev_d db ON db.id = __lev_p.{b_col}
{cut}
"""


_PJ_TOKEN_PAT = "[a-z0-9]+"   # frozen, SQL-mirrorable (ASCII corpus contract)


def _pj_token_frame(b: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    """Per-document unique word tokens as flat ``(id_col, tok)`` rows —
    ``lower(text)`` + the frozen ``[a-z0-9]+`` extraction, identical to
    DuckDB ``list_distinct(regexp_extract_all(lower(text), ...))``.
    Python ``str.lower`` is Unicode-aware where DuckDB's is locale-free;
    parity is exact on ASCII input (the same caveat as text_density)."""
    toks = b[text_col].fillna("").str.lower().str.findall(_PJ_TOKEN_PAT)
    flat = pd.DataFrame({id_col: b[id_col], "tok": toks}).explode("tok")
    flat = flat.dropna(subset=["tok"])
    return flat.drop_duplicates([id_col, "tok"], ignore_index=True)


def prefix_filter_jaccard_pairs(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float,
    freq_cap: int = 65536,
    bucket_cap: int | None = None,
    num_buckets: int | None = None,
) -> Dataset:
    """EXACT word-set Jaccard join with PREFIX-FILTER blocking (the
    AllPairs/PPJoin candidate rule, Bayardo et al. WWW'07 / Chaudhuri
    et al. ICDE'06): all pairs of documents whose full unique-word-set
    Jaccard is >= ``threshold``, without the ``max_freq`` universe
    truncation :func:`set_jaccard_pairs` applies — the reported number
    is the Jaccard of the COMPLETE sets.

    Candidate rule: order every token by (doc-frequency, token) — a
    global total order; each document emits only its first
    ``p = n - max(1, floor(threshold*n)) + 1`` tokens (its prefix).
    Two documents with Jaccard >= t MUST share a token inside both
    prefixes (if all shared tokens sat past A's prefix, fewer than
    ceil(t*n_A) tokens could be shared — contradiction with
    |A∩B| >= t*|A∪B| >= t*n_A), so grouping prefix rows by token
    proposes a COMPLETE candidate set; exact verification re-tokenizes
    both texts per pair.  ``floor`` (not ceil) of ``threshold*n`` keeps
    the prefix one token longer whenever float rounding is ambiguous —
    extra candidates, never a lost pair.

    Output: ``(a, b, n_common, n_union, jaccard)`` with a < b and
    ``jaccard = n_common / n_union`` (one IEEE division of exact ints,
    bit-identical to the SQL mirror).

    Scale shape: ONE narrow (token, id) shuffle of prefix rows only —
    the frequency ordering puts the rarest tokens in prefixes, so
    token groups stay small where an unordered inverted index would
    bucket every stopword; texts move once, only for candidate pairs
    (:func:`_pairs_with_texts`).  The ordering table broadcast is
    capped at ``freq_cap`` tokens (the frequent ones — the only ranks
    that matter); absent tokens order first by a stable hash, which
    changes WHICH tokens form a prefix, never completeness.
    ``bucket_cap`` optionally drops candidate generation for token
    groups larger than the cap (adversarial stop-token guard; breaks
    the exactness contract, so the SQL-checked default is None)."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply, grouped_aggregate

    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")

    narrow = ds.select_columns([id_col, text_col])

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        flat = _pj_token_frame(b, id_col, text_col)
        vc = flat["tok"].value_counts()
        return pd.DataFrame({"tok": vc.index.to_numpy(),
                             "df": vc.to_numpy().astype(np.int64)})

    freq = grouped_aggregate(
        narrow.map_batches(df_partial, batch_format="pandas"),
        ["tok"], {"df": ("df", "sum")},
    ).sort("df", descending=True).limit(freq_cap).to_pandas()
    freq_ref = ray.put(dict(zip(freq["tok"], freq["df"].astype(np.int64))))

    def prefix_rows(b: pd.DataFrame) -> pd.DataFrame:
        flat = _pj_token_frame(b, id_col, text_col)
        if not len(flat):
            return pd.DataFrame({"tok": pd.Series([], dtype=object),
                                 id_col: pd.Series([], dtype=np.int64)})
        fmap = ray.get(freq_ref)
        dfv = flat["tok"].map(fmap)
        known = dfv.notna().to_numpy()
        # rare (non-broadcast) tokens order first by stable hash; the
        # hash is a deterministic function of the token, so the order
        # is globally consistent across workers
        h = pd.util.hash_pandas_object(flat["tok"], index=False).to_numpy()
        key = np.where(known, dfv.fillna(0).to_numpy().astype(np.float64),
                       h.astype(np.float64))
        flat = flat.assign(__known=known.astype(np.int8), __key=key)
        flat = flat.sort_values([id_col, "__known", "__key", "tok"],
                                kind="mergesort", ignore_index=True)
        n = flat.groupby(id_col, sort=False)["tok"].transform("size").to_numpy()
        pos = flat.groupby(id_col, sort=False).cumcount().to_numpy()
        minreq = np.maximum(1, np.floor(threshold * n).astype(np.int64))
        keep = pos < (n - minreq + 1)
        out = flat.loc[keep, ["tok", id_col]]
        return out.reset_index(drop=True)

    prefixes = narrow.map_batches(prefix_rows, batch_format="pandas")

    def cand_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in bucket.groupby("tok", sort=False):
            ids = np.unique(g[id_col].to_numpy())
            if len(ids) < 2 or (bucket_cap and len(ids) > bucket_cap):
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            outs.append(pd.DataFrame({"a": ids[iu], "b": ids[ju]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True).drop_duplicates(
            ignore_index=True)

    cands = bucketed_group_apply(prefixes, ["tok"], cand_pairs,
                                 num_buckets=num_buckets)

    withtext = _pairs_with_texts(cands, narrow, id_col=id_col,
                                 text_col=text_col, a_col="a", b_col="b")

    import re

    tok_re = re.compile(_PJ_TOKEN_PAT)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        p = (g.drop_duplicates(["a", "b", "__role"])
             .pivot_table(index=["a", "b"], columns="__role",
                          values="__t", aggfunc="first")
             .dropna(subset=[0, 1]))
        if not len(p):
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "n_common": pd.Series([], dtype=np.int64),
                                 "n_union": pd.Series([], dtype=np.int64),
                                 "jaccard": pd.Series([], dtype=np.float64)})
        sa = [set(tok_re.findall(x.lower())) for x in p[0]]
        sb = [set(tok_re.findall(y.lower())) for y in p[1]]
        inter = np.fromiter((len(x & y) for x, y in zip(sa, sb)),
                            np.int64, len(sa))
        union = np.fromiter((len(x | y) for x, y in zip(sa, sb)),
                            np.int64, len(sa))
        jac = inter / np.maximum(union, 1)
        out = pd.DataFrame({
            "a": p.index.get_level_values(0).to_numpy(),
            "b": p.index.get_level_values(1).to_numpy(),
            "n_common": inter,
            "n_union": union,
            "jaccard": jac,
        })
        return out[out["jaccard"] >= threshold].reset_index(drop=True)

    return bucketed_group_apply(withtext, ["a", "b"], score,
                                num_buckets=num_buckets)


def prefix_filter_jaccard_oracle_sql(
    docs_sql: str,
    *,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB brute-force mirror of :func:`prefix_filter_jaccard_pairs`
    — all-pairs over the identical tokenization, so it checks both the
    Jaccard arithmetic AND the prefix filter's completeness."""
    return f"""
WITH __pj_tok AS (
  SELECT {id_col} AS id,
         unnest(list_distinct(regexp_extract_all(
             lower(coalesce({text_col}, '')), '{_PJ_TOKEN_PAT}'))) AS tok
  FROM ({docs_sql})
),
__pj_sz AS (SELECT id, count(*) AS n FROM __pj_tok GROUP BY id),
__pj_i AS (
  SELECT a.id AS a, b.id AS b, count(*) AS n_common
  FROM __pj_tok a JOIN __pj_tok b ON b.tok = a.tok AND b.id > a.id
  GROUP BY 1, 2)
SELECT a, b, n_common, sa.n + sb.n - n_common AS n_union,
       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
FROM __pj_i
JOIN __pj_sz sa ON sa.id = a
JOIN __pj_sz sb ON sb.id = b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= {threshold}
"""


def sorted_neighborhood_pairs(
    ds: Dataset,
    cols: Sequence[str],
    *,
    window: int,
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> Dataset:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD'95):
    emit every pair of rows within ``window`` positions of each other
    in the global ``cols`` sort order — the classic record-linkage
    alternative to hash blocking when near-duplicates cluster under a
    sort key (length, normalized title, zip code) rather than an exact
    one.

    CONTRACT: ``cols`` must order rows uniquely (``global_rank``'s
    contract — append the id column as the final tie-break).

    Output: ``(a, b, rank_a, rank_b)`` with ``rank_a < rank_b <=
    rank_a + window`` — feed the pairs to
    :func:`refine_pairs_levenshtein` / exact Jaccard for verification.

    Scale shape: ranks come from :func:`agg.global_rank` (three
    bounded passes, ONE bucketed shuffle); then each narrow
    ``(id, rank)`` row is emitted into its own rank-block
    ``rank // window`` AND the next block (a one-block halo), so any
    pair within ``window`` shares a block; a pair materializes only in
    the block of its LARGER rank, which makes the output duplicate-free
    without a dedup shuffle.  Every row ships exactly twice, blocks
    hold <= 2*window rows."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply, global_rank

    if window < 1:
        raise ValueError("window must be >= 1")
    w = int(window)

    ranked = global_rank(ds, list(cols), out_col="__rank",
                         num_buckets=num_buckets)
    narrow = ranked.select_columns([id_col, "__rank"])

    def halo(b: pd.DataFrame) -> pd.DataFrame:
        r = b["__rank"].to_numpy()
        ids = b[id_col].to_numpy()
        blk = r // w
        return pd.DataFrame({
            "__blk": np.concatenate([blk, blk + 1]),
            "__r": np.concatenate([r, r]),
            id_col: np.concatenate([ids, ids]),
        })

    rows = narrow.map_batches(halo, batch_format="pandas")

    def body(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for blk, sub in g.groupby("__blk", sort=False):
            sub = sub.sort_values("__r", kind="mergesort")
            r = sub["__r"].to_numpy()
            ids = sub[id_col].to_numpy()
            for d in range(1, min(w, len(r) - 1) + 1):
                ra, rb = r[:-d], r[d:]
                # ranks are globally dense, so rb - ra == d inside a
                # block; the mask also pins each pair to the block of
                # its larger rank (duplicate-free across the halo)
                m = (rb - ra <= w) & (rb // w == blk)
                if m.any():
                    outs.append(pd.DataFrame({
                        "a": ids[:-d][m], "b": ids[d:][m],
                        "rank_a": ra[m], "rank_b": rb[m]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "rank_a": pd.Series([], dtype=np.int64),
                                 "rank_b": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(rows, ["__blk"], body,
                                num_buckets=num_buckets)


def sorted_neighborhood_oracle_sql(
    table_sql: str,
    cols: Sequence[str],
    *,
    window: int,
    id_col: str = "doc_id",
) -> str:
    """DuckDB window mirror of :func:`sorted_neighborhood_pairs`."""
    order = ", ".join(cols)
    return f"""
WITH __sn_r AS (
  SELECT {id_col} AS id,
         row_number() OVER (ORDER BY {order}) AS rk
  FROM ({table_sql}))
SELECT a.id AS a, b.id AS b, a.rk AS rank_a, b.rk AS rank_b
FROM __sn_r a JOIN __sn_r b
  ON b.rk > a.rk AND b.rk <= a.rk + {int(window)}
"""


def dedup_against_reference_oracle_sql(corpus_sql: str, ref_sql: str,
                                       key_col: str,
                                       id_col: str = "doc_id") -> str:
    """DuckDB anti-join mirror of :func:`dedup_against_reference`."""
    return f"""
SELECT c.{id_col}, c.{key_col}
FROM ({corpus_sql}) c
WHERE NOT EXISTS (SELECT 1 FROM ({ref_sql}) r
                  WHERE r.{key_col} = c.{key_col})
"""


def keep_best_oracle_sql(table_sql: str, key_col: str, score_col: str,
                         order_col: str) -> str:
    """DuckDB window mirror of :func:`dedup_keep_best`."""
    return (
        f"SELECT * EXCLUDE (__rn) FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {key_col} "
        f"ORDER BY {score_col} DESC, {order_col}) AS __rn "
        f"FROM ({table_sql})) WHERE __rn = 1")


# ---------------------------------------------------------------------------
# vectorized token / shingle hashing (shared by MinHash and SimHash)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_M64 = np.uint64(_MERSENNE)
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_C1 = np.uint64(0x9E3779B97F4A7C15)   # golden-ratio odd multiplier
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)   # xxhash-style odd multiplier
_FNV_BASIS = np.uint64(0xCBF29CE484222325)


def _hash_perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """a in [1, M), b in [0, M) — the FULL universal family over the
    Mersenne prime.  Small parameters are not an option: with a < 2^32 the
    product a*x wraps M only a handful of times, leaving each
    "permutation" monotonic in x over long segments, so the same elements
    attain the minimum for most permutations and the Jaccard estimate
    collapses (measured: true 0.82 -> est 0.48).  The multiply is computed
    exactly by ``_mulmod_mersenne``."""
    rng = np.random.RandomState(seed)
    # compose 61-bit values from two 31-bit draws (RandomState caps at 2^32)
    hi = rng.randint(0, 1 << 30, size=num_perm, dtype=np.uint64)
    lo = rng.randint(0, 1 << 31, size=num_perm, dtype=np.uint64)
    a = ((hi << np.uint64(31)) | lo) % _M64
    a = np.where(a == 0, np.uint64(1), a)
    hi2 = rng.randint(0, 1 << 30, size=num_perm, dtype=np.uint64)
    lo2 = rng.randint(0, 1 << 31, size=num_perm, dtype=np.uint64)
    b = ((hi2 << np.uint64(31)) | lo2) % _M64
    return a, b


_MASK31 = np.uint64((1 << 31) - 1)
_MASK61 = np.uint64((1 << 61) - 1)


def _mod_m(v: np.ndarray) -> np.ndarray:
    """v mod M for v < 2^63 (one fold + conditional subtract; 2^61 === 1)."""
    v = (v >> np.uint64(61)) + (v & _MASK61)
    return np.where(v >= _M64, v - _M64, v)


def _mulmod_mersenne(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a[:,None] * x[None,:]) mod M computed EXACTLY in uint64 via 31-bit
    limb arithmetic (a, x < M = 2^61-1; 2^62 === 2, 2^61 === 1 mod M).
    a*x = a1*x1*2^62 + (a1*x0 + a0*x1)*2^31 + a0*x0.  In-place ops keep
    the temporary count at 2 matrices (the kernel is memory-bound)."""
    with np.errstate(over="ignore"):
        a1 = (a >> np.uint64(31))[:, None]                # < 2^30
        a0 = (a & _MASK31)[:, None]
        x1 = (x >> np.uint64(31))[None, :]                # < 2^30
        x0 = (x & _MASK31)[None, :]
        s = a1 * x0
        s += a0 * x1                                      # < 2^62
        # fold s, then s*2^31 === (s >> 30) + ((s & (2^30-1)) << 31)
        np.add(s >> np.uint64(61), s & _MASK61, out=s)    # < 2^61 + 2
        v = a1 * x1
        v <<= np.uint64(1)                                # 2*a1*x1 < 2^61
        v += s >> np.uint64(30)
        s &= np.uint64((1 << 30) - 1)
        s <<= np.uint64(31)
        v += s
        v += a0 * x0                                      # < 2^63 + eps
        np.add(v >> np.uint64(61), v & _MASK61, out=v)    # < 2^61 + 8
        np.subtract(v, _M64, out=v, where=v >= _M64)
        return v


def _token_hashes_flat(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Lowercased whitespace tokens of every text, hashed to uint64 in ONE
    vectorized pass (pandas siphash — stable across processes, the family
    stages/agg.py's bucketing already relies on).  Returns the flat hash
    array plus per-document token counts."""
    toks = [(t or "").lower().split() for t in texts]
    lens = np.fromiter((len(x) for x in toks), dtype=np.int64, count=len(toks))
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64), lens
    flat = np.empty(total, dtype=object)
    i = 0
    for x in toks:
        flat[i : i + len(x)] = x
        i += len(x)
    h = pd.util.hash_pandas_object(pd.Series(flat), index=False)
    return h.to_numpy().astype(np.uint64), lens


def _kgram_hashes(th: np.ndarray, lens: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling polynomial k-gram hashes over the flat token-hash array.
    One value per window fully inside a document; documents with 1..k-1
    tokens contribute ONE value over all their tokens (parity with
    whole-text shingling of short texts).  Returns (values, doc_index),
    sorted by doc_index (stable)."""
    n = len(lens)
    big_n = len(th)
    with np.errstate(over="ignore"):
        did = np.repeat(np.arange(n, dtype=np.int64), lens)
        vals_parts, docs_parts = [], []
        if big_n >= k:
            acc = np.zeros(big_n - k + 1, dtype=np.uint64)
            for j in range(k):
                acc = (acc + th[j : big_n - k + 1 + j]) * _C1
            ok = did[: big_n - k + 1] == did[k - 1 :]
            vals_parts.append(acc[ok])
            docs_parts.append(did[: big_n - k + 1][ok])
        short = np.flatnonzero((lens > 0) & (lens < k))
        if len(short):
            ends = np.cumsum(lens)
            starts = ends - lens
            sv = np.empty(len(short), dtype=np.uint64)
            for i, d in enumerate(short):
                a = np.uint64(0)
                for hv in th[starts[d] : ends[d]]:
                    a = (a + hv) * _C1
                sv[i] = a
            vals_parts.append(sv)
            docs_parts.append(short.astype(np.int64))
    if not vals_parts:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    vals = np.concatenate(vals_parts)
    docs = np.concatenate(docs_parts)
    if len(docs_parts) > 1:  # short-doc values appended out of order
        order = np.argsort(docs, kind="stable")
        vals, docs = vals[order], docs[order]
    return vals, docs


def shingle_set(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles of one text hashed to uint64 (vectorized; stable
    across processes).  Duplicates are kept — min/set consumers are
    unaffected."""
    th, lens = _token_hashes_flat([text])
    vals, _ = _kgram_hashes(th, lens, k)
    return vals


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide MinHash signature of one shingle set (vectorized,
    exact (a*x+b) mod Mersenne via limb arithmetic)."""
    if len(shingles) == 0:
        return np.full(len(a), _U64_MAX, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = _mod_m(shingles.astype(np.uint64))
        vals = _mod_m(_mulmod_mersenne(a, x) + b[:, None])
    return vals.min(axis=1)


def minhash_signatures(
    texts: list, a: np.ndarray, b: np.ndarray, k: int = 3
) -> np.ndarray:
    """(n_docs, num_perm) MinHash signature matrix for a whole batch in one
    vectorized pass: permute ALL shingles at once, per-doc minima via
    ``minimum.reduceat`` (chunked so the permuted matrix stays ~16 MB).
    Docs with no tokens get the all-max sentinel signature."""
    n = len(texts)
    num_perm = len(a)
    sig = np.full((n, num_perm), _U64_MAX, dtype=np.uint64)
    th, lens = _token_hashes_flat(texts)
    vals, docs = _kgram_hashes(th, lens, k)
    if len(vals) == 0:
        return sig
    with np.errstate(over="ignore"):
        x = _mod_m(vals)
    counts = np.bincount(docs, minlength=n)
    ends = np.cumsum(counts)
    starts = ends - counts
    nz = np.flatnonzero(counts)
    chunk_shingles = max(1, 2_000_000 // num_perm)
    i = 0
    while i < len(nz):
        j, tot = i, 0
        while j < len(nz) and (j == i or tot + counts[nz[j]] <= chunk_shingles):
            tot += counts[nz[j]]
            j += 1
        dsel = nz[i:j]
        lo, hi = starts[dsel[0]], ends[dsel[-1]]
        seg = x[lo:hi]
        with np.errstate(over="ignore"):
            pv = _mod_m(_mulmod_mersenne(a, seg) + b[:, None])
        offs = (starts[dsel] - lo).astype(np.int64)
        sig[dsel] = np.minimum.reduceat(pv, offs, axis=1).T
        i = j
    return sig


def minhash_band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 band keys: FNV-style fold of each signature
    band plus a band-index salt (vectorized; one multiply-xor per band
    row, never per document)."""
    n, num_perm = sig.shape
    r = num_perm // bands
    s3 = sig[:, : bands * r].reshape(n, bands, r)
    with np.errstate(over="ignore"):
        acc = np.full((n, bands), _FNV_BASIS, dtype=np.uint64)
        for j in range(r):
            acc = (acc ^ s3[:, :, j]) * _C2
        salt = np.arange(bands, dtype=np.uint64) * _C1
        acc = (acc ^ salt[None, :]) * _C2
    return acc


class MinHashStage:
    """map_batches stage: doc -> (id, minhash signature as list<uint64>)."""

    def __init__(self, id_col: str, text_col: str, num_perm: int = 128, k: int = 3):
        self.id_col, self.text_col, self.k = id_col, text_col, k
        self.num_perm = num_perm
        self.a, self.b = _hash_perm_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sig = minhash_signatures(texts, self.a, self.b, self.k)
        n = len(texts)
        offsets = pa.array(
            np.arange(0, (n + 1) * self.num_perm, self.num_perm, dtype=np.int32)
        )
        col = pa.ListArray.from_arrays(offsets, pa.array(sig.ravel()))
        return pa.table({self.id_col: batch[self.id_col].combine_chunks(), "minhash": col})


def minhash_lsh_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 128,
    bands: int = 32,
    k: int = 3,
    jaccard_threshold: float = 0.8,
    max_band_freq: int = 1000,
    persist: str | None = "memory",
    sig_batch_size: int = 4096,
    concurrency=None,
) -> Dataset:
    """MinHash+LSH near-duplicate pairs with signature-estimated
    Jaccard >= threshold.  Returns (id_a, id_b, jaccard), id_a < id_b,
    globally unique.

    Scale shape: the all-to-all steps move only (band_hash, id) rows,
    (id_a, id_b) candidate pairs and one copy of each signature — never
    documents; signatures rejoin candidates via an actor-free union +
    bucketed repartition join (long-lived hash-join aggregator actors on
    top of the other stages can deadlock a small CPU budget).  Candidate
    generation is bucketed (stages/agg.py) so band-bucket count doesn't
    appear in task count; band buckets larger than ``max_band_freq`` are
    dropped WITH a log line (degenerate boilerplate corpora would
    otherwise build one O(b^2) bucket — exact duplicates are exact
    dedup's job).

    ``persist``: the signature dataset feeds two branches (banding and
    verification); "memory" pins it once via ``materialize()`` (default —
    n_docs x num_perm x 8 bytes in the object store, which spills to disk
    if needed), a path string round-trips it through parquet (for
    clusters where the object store should stay free), ``None`` recomputes
    the signatures per branch (no pinning, 2x compute).

    Batch sizes are set explicitly on the narrow-row map stages: small
    inputs fragment into ~2x-CPU tiny blocks at the read, and per-call
    kernel overhead + all-to-all input-block count would otherwise
    dominate (the ``sig_batch_size=4096`` signature matrix is 4 MB —
    bounded at any corpus size)."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply
    from pdf_extract_ray.util import round_half_away

    def compute_sigs(batch: pa.Table) -> pa.Table:
        # stateless tasks with per-worker cached permutation state
        stage = getattr(compute_sigs, "_s", None)
        if stage is None:
            stage = compute_sigs._s = MinHashStage(id_col, text_col, num_perm, k)
        return stage(batch)

    sigs = ds.map_batches(compute_sigs, batch_format="pyarrow",
                          batch_size=sig_batch_size)
    if persist == "memory":
        sigs = sigs.materialize()
    elif persist:
        sigs.write_parquet(persist)
        sigs = ray.data.read_parquet(persist)
    return lsh_pairs_from_signatures(
        sigs, id_col=id_col, num_perm=num_perm, bands=bands,
        jaccard_threshold=jaccard_threshold, max_band_freq=max_band_freq,
        sig_batch_size=sig_batch_size)


def lsh_pairs_from_signatures(
    sigs: Dataset,
    *,
    id_col: str,
    num_perm: int = 128,
    bands: int = 32,
    jaccard_threshold: float = 0.8,
    max_band_freq: int = 1000,
    sig_batch_size: int = 4096,
    new_col: str | None = None,
) -> Dataset:
    """The banding/candidate/verify tail of :func:`minhash_lsh_pairs`
    over a PRECOMPUTED signature dataset ``(id_col, minhash
    list<uint64>)`` — the entry point the signature-store delta dedup
    reuses so stored signatures are never recomputed.

    ``new_col``: optional bool column marking increment rows; when set,
    only pairs with AT LEAST ONE new side are emitted (old-old pairs
    were already found when the store was built — recomputing them is
    the waste delta dedup exists to avoid).  Candidate filtering happens
    INSIDE the band buckets (the origin flag rides the band shuffle
    rows), so no id-set broadcast and no extra join."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply
    from pdf_extract_ray.util import round_half_away

    def explode_bands(batch: pa.Table) -> pa.Table:
        # (band_hash, id[, is_new]) only — the shuffle stays tiny
        arr = batch.column("minhash").combine_chunks()
        sig = arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, num_perm)
        keys = minhash_band_keys(sig, bands)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cols = {
            "band_hash": pa.array(keys.ravel()),
            id_col: pa.array(np.repeat(ids, bands)),
        }
        if new_col is not None:
            flags = batch.column(new_col).to_numpy(zero_copy_only=False)
            cols["_is_new"] = pa.array(np.repeat(flags.astype(bool), bands))
        return pa.table(cols)

    bands_ds = sigs.map_batches(explode_bands, batch_format="pyarrow",
                                batch_size=sig_batch_size)

    def cand_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        dup = bucket[bucket.duplicated("band_hash", keep=False)]
        out_a, out_b = [], []
        dropped = 0
        for _, g in dup.groupby("band_hash", sort=False):
            if len(g) > max_band_freq:
                dropped += 1
                continue
            if new_col is not None:
                g = g.sort_values(id_col, kind="mergesort")
                ids = g[id_col].to_numpy()
                flags = g["_is_new"].to_numpy(dtype=bool)
                iu, ju = np.triu_indices(len(ids), k=1)
                keep = flags[iu] | flags[ju]
                out_a.extend(ids[iu[keep]])
                out_b.extend(ids[ju[keep]])
            else:
                ids = np.sort(g[id_col].to_numpy())
                iu, ju = np.triu_indices(len(ids), k=1)
                out_a.extend(ids[iu])
                out_b.extend(ids[ju])
        if dropped:
            logger.warning(
                "minhash_lsh_pairs: dropped %d band buckets larger than "
                "max_band_freq=%d (degenerate/boilerplate content)",
                dropped, max_band_freq,
            )
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    # default pre-batching here: the sort's output-partition count follows
    # its input blocks, and the per-bucket pair loop needs that parallelism
    cands = bucketed_group_apply(bands_ds, ["band_hash"], cand_pairs)

    # --- attach signatures to both pair sides: union + bucketed
    # repartition join on `key` (reduce-side join without join actors).
    # Duplicate candidates from different bands carry identical
    # (key, id_a, id_b) rows and are deduplicated inside the attach
    # buckets — no separate global-dedup shuffle needed. ---
    def pair_memberships(b: pa.Table) -> pa.Table:
        ida = b["id_a"].to_pylist()
        idb = b["id_b"].to_pylist()
        return pa.table(
            {
                "key": pa.array(ida + idb),
                "id_a": pa.array(ida + ida),
                "id_b": pa.array(idb + idb),
                "sig": pa.array([b""] * (2 * len(ida)), pa.binary()),
            }
        )

    def sig_rows(b: pa.Table) -> pa.Table:
        # signatures travel as packed little-endian uint64 bytes: fixed-width
        # binary survives pandas<->arrow round-trips in the shuffle
        n = b.num_rows
        arr = b.column("minhash").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype("<u8")
        packed = [flat[i * num_perm : (i + 1) * num_perm].tobytes() for i in range(n)]
        return pa.table(
            {
                "key": b[id_col],
                "id_a": pa.nulls(n, b[id_col].type),
                "id_b": pa.nulls(n, b[id_col].type),
                "sig": pa.array(packed, pa.binary()),
            }
        )

    unioned = cands.map_batches(
        pair_memberships, batch_format="pyarrow", batch_size=65536
    ).union(
        sigs.map_batches(sig_rows, batch_format="pyarrow", batch_size=sig_batch_size)
    )

    def attach(bucket: pd.DataFrame) -> pd.DataFrame:
        is_sig = bucket["id_a"].isna()
        sig_map = dict(zip(bucket.loc[is_sig, "key"], bucket.loc[is_sig, "sig"]))
        mem = bucket[~is_sig].drop_duplicates(["key", "id_a", "id_b"])
        out = mem[["id_a", "id_b", "key"]].copy()
        out["sig"] = [sig_map.get(k, b"") for k in mem["key"]]
        # the union's sig-row nulls upcast int id columns to float: restore
        # (string ids pass through object dtype untouched)
        for c in ("id_a", "id_b"):
            if pd.api.types.is_float_dtype(out[c]):
                out[c] = out[c].astype("int64")
        return out.drop(columns=["key"])

    attached = bucketed_group_apply(unioned, ["key"], attach)

    def verify(bucket: pd.DataFrame) -> pd.DataFrame:
        # each (id_a, id_b) group now holds exactly two rows: the signature
        # of each side (attached per membership row above)
        g = bucket.sort_values(["id_a", "id_b"], kind="mergesort")
        ids_a = g["id_a"].to_numpy()
        ids_b = g["id_b"].to_numpy()
        sig_arr = [np.frombuffer(s, dtype="<u8") for s in g["sig"]]
        out = {"id_a": [], "id_b": [], "jaccard": []}
        i = 0
        n = len(g)
        while i < n:
            j = i + 1
            while j < n and ids_a[j] == ids_a[i] and ids_b[j] == ids_b[i]:
                j += 1
            if j - i == 2 and len(sig_arr[i]) and len(sig_arr[i]) == len(sig_arr[i + 1]):
                jac = float(round_half_away(
                    (sig_arr[i] == sig_arr[i + 1]).mean(), 4))
                if jac >= jaccard_threshold:
                    out["id_a"].append(ids_a[i])
                    out["id_b"].append(ids_b[i])
                    out["jaccard"].append(jac)
            i = j
        return pd.DataFrame(out)

    return bucketed_group_apply(attached, ["id_a", "id_b"], verify)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(texts: list) -> np.ndarray:
    """Vectorized 64-bit SimHash per text: one siphash pass over all
    tokens, bit matrix via shifts, per-doc +/-1 voting via
    ``add.reduceat`` (chunked ~200k tokens so the bit matrix stays small).
    Empty/whitespace-only texts hash to 0."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    th, lens = _token_hashes_flat(texts)
    if len(th) == 0:
        return out
    shifts = np.arange(64, dtype=np.uint64)
    powers = np.left_shift(np.uint64(1), shifts)
    ends = np.cumsum(lens)
    starts = ends - lens
    nz = np.flatnonzero(lens)
    chunk_tokens = 200_000
    i = 0
    while i < len(nz):
        j, tot = i, 0
        while j < len(nz) and (j == i or tot + lens[nz[j]] <= chunk_tokens):
            tot += lens[nz[j]]
            j += 1
        dsel = nz[i:j]
        lo, hi = starts[dsel[0]], ends[dsel[-1]]
        seg = th[lo:hi]
        bits = ((seg[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
        offs = (starts[dsel] - lo).astype(np.int64)
        votes = np.add.reduceat(bits * 2 - 1, offs, axis=0)  # (n_docs_chunk, 64)
        out[dsel] = ((votes > 0).astype(np.uint64) * powers[None, :]).sum(axis=1)
        i = j
    return out


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit population count (SWAR; numpy<2 has no
    bitwise_count)."""
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + \
            ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (scalar convenience wrapper
    around the vectorized batch kernel — both paths always agree)."""
    return int(simhash_signatures([text])[0])


def simhash_batch(batch: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    out = pd.DataFrame()
    out[id_col] = batch[id_col]
    out["simhash"] = simhash_signatures(batch[text_col].fillna("").tolist())
    return out


def simhash_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> Dataset:
    """Near-dup pairs with Hamming(simhash) <= max_hamming: the simhash
    signature map followed by the generic 64-bit Hamming-LSH banding
    stage (``hamming_lsh_pairs``, which holds the frozen banding /
    ownership / bucket-cap semantics)."""
    sigs = ds.map_batches(
        lambda b: simhash_batch(b, id_col, text_col), batch_format="pandas",
        batch_size=4096,
    )
    return hamming_lsh_pairs(sigs, id_col, hash_col="simhash",
                             max_hamming=max_hamming, max_bucket=max_bucket)


def hamming_lsh_pairs(
    sigs: Dataset,
    id_col: str,
    *,
    hash_col: str = "simhash",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> Dataset:
    """Near-dup pairs with Hamming(``hash_col``) <= max_hamming over ANY
    64-bit signature column — text simhash, image dHash
    (stages/multimodal.image_dup_pairs), audio fingerprints.

    Banding guarantee (pigeonhole): with ``max_hamming + 1`` bands, any
    pair within the distance budget shares at least one identical band.
    Larger budgets mean narrower bands -> bigger candidate buckets; the
    classic 4x16-bit layout corresponds to the default max_hamming=3.

    Candidate buckets larger than ``max_bucket`` are dropped with a log
    line (mirror of minhash's ``max_band_freq``): a degenerate corpus
    where thousands of boilerplate documents share one simhash would
    otherwise form a single O(b^2) bucket.  NOTE the documented
    interaction with first-band ownership: a pair whose FIRST equal band
    lands in a dropped bucket is lost entirely, even if another (small)
    band bucket also contains it — surviving buckets skip non-owned
    pairs.  This is the frozen semantics (the single-process golden
    mirrors it); near-cap corpora trade those tail pairs for the skew
    bound."""
    n_bands = max_hamming + 1
    if n_bands > 64:
        raise ValueError("max_hamming must be < 64")
    width = 64 // n_bands
    masks = []
    pos = 0
    for b in range(n_bands):
        w = width + (1 if b < 64 % n_bands else 0)
        masks.append((pos, (1 << w) - 1))
        pos += w

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch[hash_col].to_numpy().astype(np.uint64)
        ids = batch[id_col].to_numpy()
        n = len(h)
        keys = np.concatenate(
            [(h >> np.uint64(shift)) & np.uint64(mask) for shift, mask in masks]
        )
        return pd.DataFrame(
            {
                "band": np.repeat(np.arange(n_bands, dtype=np.int64), n),
                "band_key": keys,
                id_col: np.tile(ids, n_bands),
                "simhash": np.tile(h, n_bands),
            }
        )

    def bucket_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        # bucket holds many (band, band_key) sub-buckets; only sub-buckets
        # with >=2 members can produce pairs.  Pair generation is fully
        # vectorized: triu index pairs, SWAR popcount, and first-band
        # ownership via one xor/mask pass per band.
        dup = bucket[bucket.duplicated(["band", "band_key"], keep=False)]
        frames = []
        dropped = 0
        for (band_no, _), g in dup.groupby(["band", "band_key"], sort=False):
            if len(g) > max_bucket:
                dropped += 1
                continue
            g = g.sort_values(id_col, kind="mergesort")
            ids = g[id_col].to_numpy()
            hs = g["simhash"].to_numpy().astype(np.uint64)
            iu, ju = np.triu_indices(len(ids), k=1)
            x = hs[iu] ^ hs[ju]
            d = _popcount64(x).astype(np.int64)
            keep = d <= max_hamming
            if not keep.any():
                continue
            x, d, iu, ju = x[keep], d[keep], iu[keep], ju[keep]
            # first band with identical bits owns the pair (dedups across
            # bands without a shuffle)
            first = np.full(len(x), int(band_no), dtype=np.int64)
            undecided = np.ones(len(x), dtype=bool)
            for b, (shift, mask) in enumerate(masks):
                hit = undecided & (
                    (x >> np.uint64(shift)) & np.uint64(mask) == 0)
                first[hit] = b
                undecided &= ~hit
            own = first == int(band_no)
            if own.any():
                frames.append(pd.DataFrame({
                    "id_a": ids[iu[own]], "id_b": ids[ju[own]],
                    "hamming": d[own],
                }))
        if dropped:
            logger.warning(
                "hamming_lsh_pairs: dropped %d candidate buckets larger than "
                "max_bucket=%d (degenerate/boilerplate content)",
                dropped, max_bucket,
            )
        if not frames:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        return pd.concat(frames, ignore_index=True)

    from pdf_extract_ray.stages.agg import bucketed_group_apply

    return bucketed_group_apply(
        sigs.map_batches(explode, batch_format="pandas"),
        ["band", "band_key"],
        bucket_pairs,
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (exact, for candidate pairs / small groups)
# ---------------------------------------------------------------------------

def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    from pdf_extract_ray.functions.fingerprint import set_jaccard

    return set_jaccard(
        set(shingle_set(a, k).tolist()), set(shingle_set(b, k).tolist()),
        empty_value=1.0,
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(
    ds: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
    num_buckets: int = 1,
    multiprobe: bool = True,
    probe_radius: int = 1,
) -> Dataset:
    """Pairs with cosine >= threshold.

    Default is the EXACT all-pairs mode (``num_buckets=1``) — approximate
    recall must be opted into, never defaulted into silently.

    Scale path (``num_buckets>1``): random-hyperplane LSH into
    ``num_buckets`` buckets with Hamming-1 MULTI-PROBE — each vector is also scored in
    every bucket one sign-flip away, so near-identical vectors that
    straddle a single hyperplane are still compared (single-probe misses
    them); duplicate pairs arising from shared probes are removed by a
    tiny bucketed dedup over the candidate pairs only.  Comparisons stay
    within buckets — never an all-pairs matmul over the corpus.

    ``probe_radius=2`` adds the C(bits, 2) two-flip probes — the recall
    lever for LOWER thresholds (wider angles flip more hyperplanes); it
    multiplies each vector's bucket copies from 1+bits to
    1+bits+C(bits,2), so use it deliberately.

    The exact mode is quadratic per input block: it is what the SQL
    oracle checks on small inputs, and the recall baseline the bucketed
    path is tested against (tests/test_dedup_similarity.py)."""
    bits = max(1, int(np.log2(num_buckets))) if num_buckets > 1 else 0

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        if bits == 0:
            batch = batch.copy()
            batch["bucket"] = 0
            return batch
        rng = np.random.RandomState(11)
        vecs = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        planes = rng.standard_normal((vecs.shape[1], bits))
        code = ((vecs @ planes) > 0).dot(1 << np.arange(bits)).astype(np.int64)
        if not multiprobe:
            batch = batch.copy()
            batch["bucket"] = code
            return batch
        def tag(b, bucket):
            # the code column feeds the radius-1 owner filter only; at
            # radius>=2 it would be pure shuffle overhead on every copy
            return (b.assign(bucket=bucket, code=code) if owner_filter
                    else b.assign(bucket=bucket))

        copies = [tag(batch, code)]
        for i in range(bits):  # Hamming-1 probes: flip each hyperplane sign
            copies.append(tag(batch, code ^ (1 << i)))
        if probe_radius >= 2:  # two-flip probes
            for i in range(bits):
                for j in range(i + 1, bits):
                    copies.append(tag(batch, code ^ (1 << i) ^ (1 << j)))
        return pd.concat(copies, ignore_index=True)

    from pdf_extract_ray.util import round_half_away

    owner_filter = bool(bits) and multiprobe and probe_radius == 1

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        v = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vn = v / norms
        sim = vn @ vn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = sim[iu, ju] >= threshold
        iu, ju = iu[mask], ju[mask]
        cos = sim[iu, ju] if len(iu) else np.empty(0)
        if owner_filter and len(iu):
            # PAIR OWNERSHIP instead of a global dedup shuffle: each pair
            # is emitted only from the MINIMUM bucket both sides probe,
            # computable from the two codes (radius 1 => the pair's code
            # distance is <= 2 inside any shared bucket)
            bkt = int(group["bucket"].iloc[0])
            codes = g["code"].to_numpy()
            ca, cb = codes[iu], codes[ju]
            x = ca ^ cb
            d = _popcount64(x.astype(np.uint64)).astype(np.int64)
            flips = np.stack([ca ^ (1 << i) for i in range(bits)])
            owner_d0 = np.minimum(ca, flips.min(axis=0))
            owner_d1 = np.minimum(ca, cb)
            b1 = x & -x
            owner_d2 = np.minimum(ca ^ b1, ca ^ (x ^ b1))
            owner = np.select([d == 0, d == 1, d == 2],
                              [owner_d0, owner_d1, owner_d2], default=-1)
            keep2 = owner == bkt
            iu, ju, cos = iu[keep2], ju[keep2], cos[keep2]
        return pd.DataFrame(
            {
                "id_a": ids[iu],
                "id_b": ids[ju],
                "cosine": round_half_away(cos, 6) if len(iu) else cos,
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    if bits and multiprobe and not owner_filter:
        # radius >= 2: shared probes still produce duplicate rows; dedup
        # the tiny candidate-pair set, never the vectors
        from pdf_extract_ray.stages.agg import bucketed_group_apply

        out = bucketed_group_apply(
            out, ["id_a", "id_b"], lambda g: g.drop_duplicates(["id_a", "id_b"])
        )
    return out


def winnow_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    window: int = 4,
    overlap_threshold: float = 0.3,
    max_fp_freq: int = 200,
    spill_dir: str | None = None,
) -> Dataset:
    """Near-dup pairs by winnowing-fingerprint Jaccard >= threshold.

    Exact set-Jaccard over the FREQUENCY-FILTERED fingerprint universe,
    computed without moving texts: fingerprints appearing in more than
    ``max_fp_freq`` documents are dropped as non-discriminative (stop-phrase
    k-grams would explode candidate buckets at crawl scale), and BOTH the
    shared counts and the per-document totals are taken over the surviving
    universe — so the reported overlap is the true Jaccard of the filtered
    sets, never deflated by asymmetric filtering.

    The survivors intermediate (one row per (doc, kept fp) + candidate
    pairs) feeds two downstream branches; without pinning, Ray Data would
    re-execute the fingerprinting pass per branch.  ``spill_dir=None``
    (default) pins it in the object store via ``materialize()`` (spills to
    disk under pressure); pass a path to round-trip it through parquet
    instead, keeping the object store free for corpora where the
    intermediate exceeds it."""
    from pdf_extract_ray.functions.fingerprint import winnow_fingerprints

    def explode(batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            for fp in set(winnow_fingerprints(t or "", k, window)):
                ids.append(i)
                fps.append(fp)
        return pa.table({id_col: pa.array(ids), "val": pa.array(fps, pa.uint64())})

    fp_rows = ds.map_batches(explode, batch_format="pyarrow")
    return set_jaccard_pairs(
        fp_rows, id_col, threshold=overlap_threshold, max_freq=max_fp_freq,
        out_col="overlap", round_digits=4, spill_dir=spill_dir,
    )


def set_jaccard_pairs(
    fp_rows: Dataset,
    id_col: str,
    *,
    threshold: float,
    max_freq: int,
    out_col: str = "overlap",
    round_digits: int = 4,
    spill_dir: str | None = None,
) -> Dataset:
    """Exact set-Jaccard pairs from membership rows (id, "val") WITHOUT
    moving texts — the shared engine behind ``winnow_pairs`` (winnowed
    fingerprint sets) and ``ngram_jaccard_pairs`` (full word n-gram sets).

    Values appearing in more than ``max_freq`` documents are dropped as
    non-discriminative (stop-phrase elements would explode candidate
    buckets at crawl scale); BOTH the shared counts and the per-document
    totals are taken over the surviving universe, so the reported number
    is the true Jaccard of the filtered sets, never deflated by
    asymmetric filtering."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply, grouped_aggregate
    from pdf_extract_ray.util import round_half_away

    def per_fp(bucket: pd.DataFrame) -> pd.DataFrame:
        # one fp == one group; emit candidate pairs and kept memberships
        out = {"kind": [], "id_a": [], "id_b": [], "key": []}
        for _, g in bucket.groupby("val", sort=False):
            if len(g) > max_freq:
                continue  # non-discriminative fingerprint: drop entirely
            ids = np.sort(g[id_col].to_numpy())
            for i in ids:  # membership in the surviving universe
                out["kind"].append("keep")
                out["id_a"].append(-1)
                out["id_b"].append(-1)
                out["key"].append(i)
            iu, ju = np.triu_indices(len(ids), k=1)
            for a, b in zip(ids[iu], ids[ju]):
                out["kind"].append("pair")
                out["id_a"].append(a)
                out["id_b"].append(b)
                out["key"].append(-1)
        return pd.DataFrame(out)

    survivors = bucketed_group_apply(fp_rows, ["val"], per_fp)
    if spill_dir:
        survivors.write_parquet(spill_dir)
        survivors = ray.data.read_parquet(spill_dir)
    else:
        survivors = survivors.materialize()
    pair_rows = survivors.filter(expr="kind == 'pair'")
    keep_rows = survivors.filter(expr="kind == 'keep'")

    counts = grouped_aggregate(keep_rows, ["key"], {"n_fp": ("key", "count")})

    def count_shared(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby(["id_a", "id_b"], as_index=False).agg(
            shared=("id_a", "count"))

    shared = bucketed_group_apply(pair_rows, ["id_a", "id_b"], count_shared)

    # attach per-side surviving-fp counts (union repartition-join on key)
    def memberships(b: pd.DataFrame) -> pd.DataFrame:
        left = b.assign(key=b["id_a"], role=0)
        right = b.assign(key=b["id_b"], role=1)
        out = pd.concat([left, right], ignore_index=True)
        out["n_fp"] = -1
        return out[["key", "id_a", "id_b", "shared", "role", "n_fp"]]

    def count_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["key"], "id_a": -1, "id_b": -1, "shared": -1,
            "role": -1, "n_fp": b["n_fp"].astype("int64"),
        })

    unioned = shared.map_batches(memberships, batch_format="pandas").union(
        counts.map_batches(count_rows, batch_format="pandas")
    )

    def attach(bucket: pd.DataFrame) -> pd.DataFrame:
        lut = dict(zip(bucket.loc[bucket["role"] == -1, "key"],
                       bucket.loc[bucket["role"] == -1, "n_fp"]))
        mem = bucket[bucket["role"] != -1].copy()
        mem["n_fp"] = [lut.get(ky, 0) for ky in mem["key"]]
        return mem[["id_a", "id_b", "shared", "role", "n_fp"]]

    attached = bucketed_group_apply(unioned, ["key"], attach)

    def finish(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["id_a", "id_b"], as_index=False).agg(
            shared=("shared", "first"), n_total=("n_fp", "sum"),
            n_sides=("role", "count"))
        g = g[g["n_sides"] == 2]
        union = g["n_total"] - g["shared"]
        g[out_col] = round_half_away(
            np.where(union > 0, g["shared"] / union.replace(0, 1), 0.0),
            round_digits)
        g = g[g[out_col] >= threshold]
        return g[["id_a", "id_b", "shared", out_col]]

    return bucketed_group_apply(attached, ["id_a", "id_b"], finish)


def ngram_jaccard_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.4,
    max_df: int = 100,
    spill_dir: str | None = None,
) -> Dataset:
    """Near-dup pairs by EXACT word-n-gram set Jaccard >= threshold —
    the non-sketch baseline next to minhash (which estimates this very
    number).  Tokenization is SQL-mirrorable: ``lower(text)`` split on
    single spaces, n-grams joined by one space (DuckDB
    ``string_split`` + list slicing computes the identical sets, so the
    driver checks this against a pure-SQL oracle, not a golden).

    Scale shape: only (gram_hash, id) int rows shuffle; texts never move.
    Grams in more than ``max_df`` docs are dropped from the universe
    (both intersection AND totals — see ``set_jaccard_pairs``), which is
    the standard stop-phrase guard at crawl scale; a pair sharing ONLY
    such grams is not a candidate by contract."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, grams = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            w = (t or "").lower().split(" ")
            gs = {" ".join(w[j : j + n]) for j in range(len(w) - n + 1)}
            ids.extend([i] * len(gs))
            grams.extend(gs)
        h = pd.util.hash_pandas_object(pd.Series(grams, dtype=object),
                                       index=False).to_numpy()
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "val": pa.array(h, pa.uint64())})

    gram_rows = ds.map_batches(explode, batch_format="pyarrow")
    return set_jaccard_pairs(
        gram_rows, id_col, threshold=threshold, max_freq=max_df,
        out_col="jaccard", round_digits=6, spill_dir=spill_dir,
    )


def pair_confusion_report(truth: Dataset, cand: Dataset) -> pd.DataFrame:
    """Confusion report between an EXACT near-dup pair set and a
    sketch/LSH candidate pair set — the "did my LSH parameters work"
    audit every dedup rollout needs before committing to a config
    (num_perm/bands trade recall for shuffle volume; this measures the
    trade on a real slice).

    Both inputs are ``(id_a, id_b, ...)`` pair datasets with
    ``id_a < id_b`` unique per side (the contract every pair operator
    in this module already guarantees).  Output: ONE row
    ``(n_truth, n_cand, n_common, precision, recall)`` where
    ``precision = n_common / n_cand`` and ``recall = n_common /
    n_truth`` (round 6; NULL when the denominator is 0).

    Scale shape: each side maps to narrow ``(id_a, id_b, flag)`` int
    rows, ONE grouped merge co-locates the two flags per pair, then
    additive per-batch count partials (3 ints per batch) reach the
    driver — pair payloads (jaccard, shared, ...) never move, and the
    audit is meant to run on a SAMPLED slice: the truth side is the
    quadratic-exact operator, which is only affordable on a sample at
    corpus scale (document the sample rule next to the numbers)."""
    from pdf_extract_ray.stages.agg import grouped_aggregate

    def tag(flag_t: int, flag_c: int):
        def m(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "id_a": b["id_a"].to_numpy(np.int64),
                "id_b": b["id_b"].to_numpy(np.int64),
                "t": np.full(len(b), flag_t, dtype=np.int64),
                "c": np.full(len(b), flag_c, dtype=np.int64),
            })
        return m

    both = truth.map_batches(tag(1, 0), batch_format="pandas").union(
        cand.map_batches(tag(0, 1), batch_format="pandas"))
    flags = grouped_aggregate(both, ["id_a", "id_b"],
                              {"t": ("t", "sum"), "c": ("c", "sum")})

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        t = b["t"].to_numpy(np.int64) > 0
        c = b["c"].to_numpy(np.int64) > 0
        return pd.DataFrame({
            "n_truth": [np.int64(t.sum())],
            "n_cand": [np.int64(c.sum())],
            "n_common": [np.int64((t & c).sum())],
        })

    from pdf_extract_ray.util import round_half_away

    part = flags.map_batches(counts, batch_format="pandas").to_pandas()
    if len(part) == 0:
        nt = nc = nm = 0
    else:
        nt, nc, nm = (int(part["n_truth"].sum()), int(part["n_cand"].sum()),
                      int(part["n_common"].sum()))
    return pd.DataFrame({
        "n_truth": pd.Series([nt], dtype="int64"),
        "n_cand": pd.Series([nc], dtype="int64"),
        "n_common": pd.Series([nm], dtype="int64"),
        "precision": [float(round_half_away(nm / nc, 6)) if nc else np.nan],
        "recall": [float(round_half_away(nm / nt, 6)) if nt else np.nan],
    })


# ---------------------------------------------------------------------------
# q-gram edit-distance similarity join (Gravano et al. 2001 "Approximate
# String Joins in a Database (Almost) for Free" / Ed-Join family — public
# papers): find ALL pairs within edit distance d without comparing all
# pairs — candidate generation by the q-gram prefix filter, exact DP
# verification by refine_pairs_levenshtein.
# ---------------------------------------------------------------------------

def _qgram_rows(b: pd.DataFrame, id_col: str, text_col: str,
                q: int) -> pd.DataFrame:
    """Distinct byte q-grams per row as flat ``(id, gram, nbytes)``
    rows — fully vectorized: one concatenated byte buffer, a sliding
    window view, boundary masking by repeat-count arithmetic, and an
    ``S{q}`` reinterpret for the gram keys (latin-1 round-trips every
    byte 1:1 into a string column)."""
    enc = b[text_col].fillna("").str.encode("utf-8")
    lens = enc.str.len().to_numpy(np.int64)
    ids = b[id_col].to_numpy(np.int64)
    counts = np.maximum(lens - q + 1, 0)
    total = int(counts.sum())
    cols = {id_col: np.int64, "gram": str, "nbytes": np.int64}
    if total == 0:
        return pd.DataFrame({k: [] for k in cols}).astype(cols)
    buf = np.frombuffer(b"".join(enc.tolist()), dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(buf, q)
    offs = np.cumsum(lens) - lens
    row_of = np.repeat(np.arange(len(b), dtype=np.int64), counts)
    # per-window local position within its row
    first = np.repeat(np.cumsum(counts) - counts, counts)
    local = np.arange(total, dtype=np.int64) - first
    starts = offs[row_of] + local
    grams = np.frombuffer(win[starts].tobytes(), dtype=f"S{q}")
    out = pd.DataFrame({
        id_col: ids[row_of],
        "gram": pd.Series(grams).str.decode("latin-1"),
        "nbytes": lens[row_of]})
    return out.drop_duplicates([id_col, "gram"], ignore_index=True)


def qgram_edit_join(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    q: int = 3,
    max_dist: int,
    pair_cap_per_gram: int = 20_000,
    num_buckets: int | None = None,
) -> Dataset:
    """All pairs with UTF-8-byte edit distance <= ``max_dist`` —
    ``(a, b, edit_distance, edit_sim)``, a < b by id.

    COMPLETENESS (the q-gram prefix lemma): one edit destroys at most
    ``q`` distinct q-grams, so strings within distance ``d`` share at
    least ``|Q(s)| - q·d`` of s's distinct grams; under ANY fixed total
    gram order, the ``q·d + 1`` smallest grams of each side must then
    intersect.  The frozen order here is (global document frequency
    asc, gram bytes) — rarest grams probe first, shrinking candidate
    buckets; correctness does not depend on the frequencies, only on
    the order being fixed.  The guarantee requires both strings to own
    more than ``q·d`` distinct grams (strings shorter than that emit
    ALL their grams — best effort, stated contract), and per-gram
    candidate buckets above ``pair_cap_per_gram`` pairs are dropped
    WITH A LOGGED WARNING (the minhash bucket-cap convention — never a
    silent truncation).

    Scale shape: one narrow gram-explode + one grouped df count
    (bounded by distinct q-grams; 256^q worst case, tiny for q=3 on
    real text) broadcast once; one bucketed gram cogroup emits
    candidate id pairs (ids + byte lengths only — texts never move
    here) with the |len_a - len_b| <= d filter applied in-bucket; one
    grouped pair dedup; then the exact DP verification ships each
    surviving pair its two texts (refine_pairs_levenshtein's two
    cogroups).  Intended for KEY-LIKE columns (urls, titles, names):
    the DP is O(len^2) per candidate pair."""
    import logging as _logging

    import ray

    from pdf_extract_ray.stages.agg import (
        bucketed_group_apply, grouped_aggregate)

    if max_dist < 0 or q < 1:
        raise ValueError("need max_dist >= 0 and q >= 1")
    prefix_n = q * max_dist + 1
    log = _logging.getLogger("pdf_extract_ray.dedup")

    grams = ds.map_batches(
        lambda b: _qgram_rows(b, id_col, text_col, q),
        batch_format="pandas").materialize()

    df_tbl = grouped_aggregate(
        grams.select_columns(["gram"]), ["gram"],
        {"df": ("gram", "count")}, num_buckets=num_buckets).to_pandas()
    df_ref = ray.put(pd.Series(df_tbl["df"].to_numpy(np.int64),
                               index=df_tbl["gram"].to_numpy()))

    def prefix(b: pd.DataFrame) -> pd.DataFrame:
        dfs = ray.get(df_ref)
        out = b.assign(__df=dfs.reindex(b["gram"].to_numpy())
                       .to_numpy(np.int64))
        out = out.sort_values([id_col, "__df", "gram"], kind="mergesort")
        return (out.groupby(id_col, sort=False).head(prefix_n)
                [[id_col, "gram", "nbytes"]])

    probe = grams.map_batches(prefix, batch_format="pandas")

    def pairs_body(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby("gram", sort=False):
            grp = grp.sort_values(id_col)
            ids = grp[id_col].to_numpy(np.int64)
            nb = grp["nbytes"].to_numpy(np.int64)
            m = len(ids)
            if m < 2:
                continue
            n_pairs = m * (m - 1) // 2
            if n_pairs > pair_cap_per_gram:
                log.warning(
                    "qgram_edit_join: gram bucket of %d ids (%d pairs) "
                    "exceeds pair_cap_per_gram=%d — DROPPED", m, n_pairs,
                    pair_cap_per_gram)
                continue
            ai, bi = np.triu_indices(m, k=1)
            keep = np.abs(nb[ai] - nb[bi]) <= max_dist
            outs.append(pd.DataFrame({"a": ids[ai][keep],
                                      "b": ids[bi][keep]}))
        if not outs:
            return pd.DataFrame({"a": [], "b": []}).astype(
                {"a": np.int64, "b": np.int64})
        return pd.concat(outs).drop_duplicates(ignore_index=True)

    cand = bucketed_group_apply(probe, ["gram"], pairs_body,
                                num_buckets=num_buckets)
    cand = grouped_aggregate(cand, ["a", "b"], {"__n": ("a", "count")},
                             num_buckets=num_buckets
                             ).drop_columns(["__n"])
    return refine_pairs_levenshtein(cand, ds, id_col=id_col,
                                    text_col=text_col,
                                    max_dist=max_dist)


def qgram_edit_join_oracle_sql(
    docs_sql: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int,
) -> str:
    """Brute-force all-pairs DuckDB mirror of :func:`qgram_edit_join` —
    independent of the candidate generation, so a green compare proves
    the prefix filter dropped NOTHING."""
    return f"""
WITH __qe_d AS (SELECT {id_col} AS id, coalesce({text_col}, '') AS t
                FROM ({docs_sql}))
SELECT a.id AS a, b.id AS b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_distance,
       round(1.0 - levenshtein(a.t, b.t)
             / CAST(greatest(strlen(a.t), strlen(b.t), 1) AS DOUBLE),
             4) AS edit_sim
FROM __qe_d a JOIN __qe_d b ON a.id < b.id
WHERE abs(strlen(a.t) - strlen(b.t)) <= {int(max_dist)}
  AND levenshtein(a.t, b.t) <= {int(max_dist)}
"""


def host_mirror_pairs(
    ds: Dataset,
    host_col: str,
    text_col: str,
    *,
    num_perm: int = 128,
    bands: int = 32,
    k: int = 3,
    jaccard_threshold: float = 0.8,
    max_band_freq: int = 1000,
    sig_batch_size: int = 4096,
    num_buckets: int | None = None,
) -> Dataset:
    """Mirror-site detection: host pairs whose UNION of document
    shingle sets is near-identical — the standard webtext move against
    wholesale mirrors (docs.foo.com == foo.github.io), which per-page
    dedup finds one page at a time but never names the host pair.

    The host signature is EXACT MinHash algebra, not a heuristic:
    minhash(union of sets) = elementwise min of the members'
    signatures, so a grouped elementwise-min over per-document
    signatures IS the signature of the host's whole content — same
    frozen permutation params, band fold and estimator as
    :func:`minhash_lsh_pairs` (the committed-golden determinism freeze
    covers the composition end to end).

    Scale shape: per-doc signatures (one narrow map) reduce to
    per-host signatures via map-side elementwise-min partials + ONE
    bucketed merge (the shuffle sees one num_perm-vector per (host,
    batch), never documents); the banding/verify tail is the shared
    :func:`lsh_pairs_from_signatures` over #hosts rows."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    stage_params = _hash_perm_params(num_perm)

    def doc_sigs(b: pd.DataFrame) -> pd.DataFrame:
        a, bb = stage_params
        sig = minhash_signatures(b[text_col].tolist(), a, bb, k)
        return pd.DataFrame({host_col: b[host_col].to_numpy(),
                             "minhash": list(sig)})

    def min_partial(b: pd.DataFrame) -> pd.DataFrame:
        hosts, sigs_out = [], []
        for h, g in b.groupby(host_col, sort=False):
            m = np.stack([np.asarray(v, dtype=np.uint64)
                          for v in g["minhash"]])
            hosts.append(h)
            sigs_out.append(m.min(axis=0))
        return pd.DataFrame({host_col: hosts, "minhash": sigs_out})

    per_doc = ds.map_batches(doc_sigs, batch_format="pandas",
                             batch_size=sig_batch_size)
    partials = per_doc.map_batches(min_partial, batch_format="pandas")
    host_min = bucketed_group_apply(
        partials, [host_col], min_partial, num_buckets=num_buckets)

    def listify(batch: pa.Table) -> pa.Table:
        # pandas object columns of equal-length numpy arrays arrive as
        # Ray's fixed-shape tensor extension; the shared banding tail
        # (lsh_pairs_from_signatures) expects plain list<uint64> — one
        # cheap rebuild over the #hosts-row table
        sig = np.stack([np.asarray(v, dtype=np.uint64)
                        for v in batch.column("minhash").to_pylist()])
        n = len(sig)
        offsets = pa.array(np.arange(0, (n + 1) * num_perm, num_perm,
                                     dtype=np.int32))
        col = pa.ListArray.from_arrays(offsets, pa.array(sig.ravel()))
        return pa.table({host_col: batch.column(host_col).combine_chunks(),
                         "minhash": col})

    host_sigs = host_min.map_batches(
        listify, batch_format="pyarrow").materialize()
    return lsh_pairs_from_signatures(
        host_sigs, id_col=host_col, num_perm=num_perm, bands=bands,
        jaccard_threshold=jaccard_threshold,
        max_band_freq=max_band_freq, sig_batch_size=sig_batch_size)


def syndicated_pairs(
    pairs: Dataset,
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    host_col: str = "url_host",
    a_col: str = "id_a",
    b_col: str = "id_b",
    num_buckets: int | None = None,
) -> Dataset:
    """Cross-host syndication detection: restrict a near-dup pair set
    to pairs whose members live on DIFFERENT hosts —
    ``(a, b, host_a, host_b)``.  Same-host near-dups are template
    noise the host-scoped cleaners already handle; a cross-host match
    is the wire-copy / scraped-content signal curation teams act on
    (pick one canonical host, downweight the mirrors).

    Scale shape: reuses :func:`_pairs_with_texts` with the host column
    as the payload — shuffle 1 attaches each member's host (ids +
    hosts only), shuffle 2 cogroups on the pair to pivot the two roles
    side-by-side; bodies never move."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    rows = _pairs_with_texts(pairs, docs, id_col=id_col,
                             text_col=host_col, a_col=a_col, b_col=b_col)

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["__role"] == 0][[a_col, b_col, "__t"]].rename(
            columns={"__t": "host_a"})
        b = g[g["__role"] == 1][[a_col, b_col, "__t"]].rename(
            columns={"__t": "host_b"})
        m = a.merge(b, on=[a_col, b_col])
        return m[m["host_a"] != m["host_b"]].reset_index(drop=True)

    return bucketed_group_apply(rows, [a_col, b_col], pivot,
                                num_buckets=num_buckets,
                                pre_batch_size=65536)
