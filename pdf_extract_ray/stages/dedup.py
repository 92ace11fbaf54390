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
* MinHash/LSH: signatures are computed vectorized per batch (one pass over
  the docs); the all-to-all step shuffles only the tiny
  ``(band, band_hash, id)`` rows, never the documents; candidate
  verification joins signatures, not texts.
* SimHash: 64-bit signatures; near-dup buckets via 4x16-bit band keys
  (Hamming distance <= 3 guarantees at least one identical band).
* embedding near-dup: cosine via normalized float64 matmul per-bucket.

Everything emits plain Arrow-friendly columns (uint64 as two uint32s where
needed is avoided — pyarrow handles uint64 natively).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data import Dataset

# ---------------------------------------------------------------------------
# exact dedup (D1)
# ---------------------------------------------------------------------------

def dedup_exact(ds: Dataset, key_col: str, order_col: str) -> Dataset:
    """Keep the first row per ``key_col`` where "first" = minimal
    ``order_col`` — deterministic at any parallelism (SURVEY.md §7.4.2).

    One coarse hash shuffle on the key, then a VECTORIZED
    sort+drop_duplicates per bucket (per-group Python would cost ~0.15 ms
    x #distinct-keys; see stages/agg.py).

    DETERMINISM CONTRACT: ``order_col`` must order rows uniquely within a
    key (doc ids and (url, frag_id) keys do); rows tied on both key and
    order fall back to arrival order, which a shuffle does not fix."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    def keep_first(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.sort_values(order_col, kind="mergesort").drop_duplicates(
            subset=[key_col], keep="first"
        )

    return bucketed_group_apply(ds, [key_col], keep_first)


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _hash_perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_set(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles hashed to uint64 (stable: md5-based, not Python
    hash())."""
    toks = text.lower().split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = np.uint64(
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
        )
    return out


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide MinHash signature of a shingle set (vectorized)."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (num_perm, n_shingles) permuted values mod Mersenne prime
    x = shingles.astype(np.uint64)
    vals = (np.outer(a, x) + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


class MinHashStage:
    """map_batches actor: doc -> (id, minhash signature as fixed list)."""

    def __init__(self, id_col: str, text_col: str, num_perm: int = 128, k: int = 3):
        self.id_col, self.text_col, self.k = id_col, text_col, k
        self.a, self.b = _hash_perm_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        sigs = [
            minhash_signature(shingle_set(t or "", self.k), self.a, self.b)
            for t in texts
        ]
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "minhash": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def minhash_lsh_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 128,
    bands: int = 32,
    k: int = 3,
    jaccard_threshold: float = 0.8,
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
    appear in task count."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply
    from pdf_extract_ray.util import round_half_away

    rows_per_band = num_perm // bands

    def compute_sigs(batch: pa.Table) -> pa.Table:
        # stateless tasks with per-worker cached permutation state
        stage = getattr(compute_sigs, "_s", None)
        if stage is None:
            stage = compute_sigs._s = MinHashStage(id_col, text_col, num_perm, k)
        return stage(batch)

    sigs = ds.map_batches(compute_sigs, batch_format="pyarrow")

    def explode_bands(batch: pa.Table) -> pa.Table:
        # (band_hash, id) only — the shuffle stays tiny
        ids = batch[id_col].to_pylist()
        sigs_l = batch["minhash"].to_pylist()
        out_hash, out_id = [], []
        for i, sig in zip(ids, sigs_l):
            for bnd in range(bands):
                chunk = tuple(sig[bnd * rows_per_band : (bnd + 1) * rows_per_band])
                out_hash.append(hashlib.md5(repr((bnd, chunk)).encode()).hexdigest())
                out_id.append(i)
        return pa.table(
            {"band_hash": pa.array(out_hash, pa.string()), id_col: pa.array(out_id)}
        )

    bands_ds = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def cand_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        dup = bucket[bucket.duplicated("band_hash", keep=False)]
        out_a, out_b = [], []
        for _, g in dup.groupby("band_hash", sort=False):
            ids = np.sort(g[id_col].to_numpy())
            iu, ju = np.triu_indices(len(ids), k=1)
            out_a.extend(ids[iu])
            out_b.extend(ids[ju])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    cands = bucketed_group_apply(bands_ds, ["band_hash"], cand_pairs)
    uniq = bucketed_group_apply(
        cands, ["id_a", "id_b"],
        lambda g: g.drop_duplicates(["id_a", "id_b"]),
    )

    # --- attach signatures to both pair sides: union + bucketed
    # repartition join on `key` (reduce-side join without join actors) ---
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
        packed = [np.asarray(s, dtype="<u8").tobytes() for s in b["minhash"].to_pylist()]
        return pa.table(
            {
                "key": b[id_col],
                "id_a": pa.nulls(n, b[id_col].type),
                "id_b": pa.nulls(n, b[id_col].type),
                "sig": pa.array(packed, pa.binary()),
            }
        )

    unioned = uniq.map_batches(pair_memberships, batch_format="pyarrow").union(
        sigs.map_batches(sig_rows, batch_format="pyarrow")
    )

    def attach(bucket: pd.DataFrame) -> pd.DataFrame:
        is_sig = bucket["id_a"].isna()
        sig_map = dict(zip(bucket.loc[is_sig, "key"], bucket.loc[is_sig, "sig"]))
        mem = bucket[~is_sig]
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

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (md5 token hashes, +/-1 bit
    voting)."""
    toks = (text or "").lower().split()
    if not toks:
        return 0
    v = [0] * 64
    for t in toks:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        for bit in range(64):
            v[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if v[bit] > 0:
            out |= 1 << bit
    return out


def simhash_batch(batch: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    out = pd.DataFrame()
    out[id_col] = batch[id_col]
    out["simhash"] = [simhash64(t) for t in batch[text_col].fillna("")]
    return out


def simhash_pairs(
    ds: Dataset, id_col: str, text_col: str, *, max_hamming: int = 3
) -> Dataset:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Banding guarantee (pigeonhole): with ``max_hamming + 1`` bands, any
    pair within the distance budget shares at least one identical band.
    Larger budgets mean narrower bands -> bigger candidate buckets; the
    classic 4x16-bit layout corresponds to the default max_hamming=3."""
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

    sigs = ds.map_batches(
        lambda b: simhash_batch(b, id_col, text_col), batch_format="pandas"
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"band": [], "band_key": [], id_col: [], "simhash": []}
        for i, h in zip(batch[id_col], batch["simhash"]):
            for bnd, (shift, mask) in enumerate(masks):
                rows["band"].append(bnd)
                rows["band_key"].append((int(h) >> shift) & mask)
                rows[id_col].append(i)
                rows["simhash"].append(int(h))
        return pd.DataFrame(rows)

    def bucket_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        # bucket holds many (band, band_key) sub-buckets; only sub-buckets
        # with >=2 members can produce pairs
        dup = bucket[bucket.duplicated(["band", "band_key"], keep=False)]
        out = {"id_a": [], "id_b": [], "hamming": []}
        for (band_no, _), g in dup.groupby(["band", "band_key"], sort=False):
            g = g.sort_values(id_col, kind="mergesort")
            ids, hs = g[id_col].to_numpy(), g["simhash"].to_numpy()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    x = int(hs[i]) ^ int(hs[j])
                    d = bin(x).count("1")
                    if d > max_hamming:
                        continue
                    # first-band ownership dedups pairs across bands
                    first = next(
                        (b for b, (shift, mask) in enumerate(masks)
                         if ((x >> shift) & mask) == 0),
                        int(band_no),
                    )
                    if first == int(band_no):
                        out["id_a"].append(ids[i])
                        out["id_b"].append(ids[j])
                        out["hamming"].append(d)
        return pd.DataFrame(out)

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
) -> Dataset:
    """Pairs with cosine >= threshold.  ``num_buckets=1`` is the exact
    all-pairs path (quadratic — for oracle-checkable small inputs); for
    scale, bucket by a random-hyperplane LSH sketch first
    (``num_buckets>1``) so comparisons stay within buckets."""

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        if num_buckets <= 1:
            batch["bucket"] = 0
            return batch
        rng = np.random.RandomState(11)
        vecs = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        planes = rng.standard_normal((vecs.shape[1], max(1, int(np.log2(num_buckets)))))
        bits = (vecs @ planes) > 0
        batch["bucket"] = bits.dot(1 << np.arange(bits.shape[1])).astype(np.int64)
        return batch

    from pdf_extract_ray.util import round_half_away

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
        return pd.DataFrame(
            {
                "id_a": ids[iu[mask]],
                "id_b": ids[ju[mask]],
                "cosine": round_half_away(sim[iu, ju][mask], 6),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )


def winnow_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    window: int = 4,
    overlap_threshold: float = 0.3,
    max_fp_freq: int = 200,
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
    pairs) is materialized because two downstream branches consume it —
    without pinning, Ray Data re-executes the fingerprinting pass per
    branch.  For corpora where that intermediate exceeds the object store,
    persist it to parquet between the stages instead."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply, grouped_aggregate
    from pdf_extract_ray.functions.fingerprint import winnow_fingerprints
    from pdf_extract_ray.util import round_half_away

    def explode(batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            for fp in set(winnow_fingerprints(t or "", k, window)):
                ids.append(i)
                fps.append(fp)
        return pa.table({id_col: pa.array(ids), "val": pa.array(fps, pa.uint64())})

    fp_rows = ds.map_batches(explode, batch_format="pyarrow")

    def per_fp(bucket: pd.DataFrame) -> pd.DataFrame:
        # one fp == one group; emit candidate pairs and kept memberships
        out = {"kind": [], "id_a": [], "id_b": [], "key": []}
        for _, g in bucket.groupby("val", sort=False):
            if len(g) > max_fp_freq:
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

    survivors = bucketed_group_apply(fp_rows, ["val"], per_fp).materialize()
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
        g["overlap"] = round_half_away(
            np.where(union > 0, g["shared"] / union.replace(0, 1), 0.0), 4)
        g = g[g["overlap"] >= overlap_threshold]
        return g[["id_a", "id_b", "shared", "overlap"]]

    return bucketed_group_apply(attached, ["id_a", "id_b"], finish)
