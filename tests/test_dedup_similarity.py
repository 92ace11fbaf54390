"""Dedup family (D1 + near-dup) and similarity-search tests."""

import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.stages.dedup import (
    dedup_exact,
    embedding_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash64,
    simhash_pairs,
)
from pdf_extract_ray.stages.similarity import brute_force_topk, ivf_topk
from pdf_extract_ray.stages.textquality import (
    fingerprint_batch,
    lang_id_batch,
    quality_score_batch,
    token_stats_batch,
)


def _docs_ds(ray_session):
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = []
    for i in range(40):
        words = base.split()
        if i % 10 == 0 and i > 0:
            words[3] = f"var{i}"  # near-duplicate of doc 0-family
        text = " ".join(words) + (f" tail{i // 20}" if i % 2 else "")
        rows.append({"doc_id": i, "text": text})
    # exact duplicates: 30..34 duplicate 0..4
    for i in range(30, 35):
        rows[i]["text"] = rows[i - 30]["text"]
    return rd.from_pandas(pd.DataFrame(rows)).repartition(4), rows


def test_dedup_exact_keeps_min_order_key(ray_session):
    import ray.data as rd

    ds, rows = _docs_ds(ray_session)
    with_fp = ds.map_batches(lambda b: fingerprint_batch(b, "text"), batch_format="pandas")
    out = dedup_exact(with_fp, "fingerprint", "doc_id").take_all()
    kept = sorted(r["doc_id"] for r in out)
    texts = {}
    for r in rows:
        texts.setdefault(r["text"], []).append(r["doc_id"])
    expect = sorted(min(ids) for ids in texts.values())
    assert kept == expect


def test_minhash_lsh_finds_near_dups(ray_session):
    ds, _ = _docs_ds(ray_session)
    pairs = minhash_lsh_pairs(ds, "doc_id", "text", jaccard_threshold=0.5).take_all()
    assert pairs, "expected near-duplicate candidates"
    keys = [(p["id_a"], p["id_b"]) for p in pairs]
    assert len(keys) == len(set(keys)), "pairs must be globally unique"
    assert all(p["id_a"] < p["id_b"] for p in pairs)
    # exact duplicates must be found with jaccard 1.0
    exact = {(i - 30, i) for i in range(30, 35)}
    found_exact = {k for k in keys if k in exact}
    assert found_exact == exact


def test_simhash_pairs(ray_session):
    ds, _ = _docs_ds(ray_session)
    pairs = simhash_pairs(ds, "doc_id", "text", max_hamming=3).take_all()
    keys = [(p["id_a"], p["id_b"]) for p in pairs]
    assert len(keys) == len(set(keys))
    exact = {(i - 30, i) for i in range(30, 35)}
    assert exact <= set(keys)
    assert all(p["hamming"] == 0 for p in pairs if (p["id_a"], p["id_b"]) in exact)


def test_simhash_deterministic():
    assert simhash64("hello world") == simhash64("hello  world ")
    assert simhash64("") == 0


def test_ngram_jaccard():
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c", "x y z") == 0.0
    assert 0 < ngram_jaccard("a b c d e", "a b c d x") < 1


def test_embedding_dup_pairs(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((30, 16))
    vecs[10] = vecs[0] * 2.0          # same direction -> cosine 1
    vecs[11] = vecs[1] + 0.01 * rng.standard_normal(16)
    df = pd.DataFrame({"vec_id": range(30), "embedding": list(vecs)})
    ds = rd.from_pandas(df).repartition(3)
    pairs = embedding_dup_pairs(ds, threshold=0.99).take_all()
    got = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (0, 10) in got and (1, 11) in got


def test_brute_force_topk(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(4)
    vecs = rng.standard_normal((100, 16))
    df = pd.DataFrame({"vec_id": range(100), "embedding": list(vecs)})
    ds = rd.from_pandas(df).repartition(5)
    queries = vecs[[7, 42]]
    out = brute_force_topk(ds, queries, k=5).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1}
    # exact match must rank first with cosine 1.0
    top0 = max(by_q[0], key=lambda r: r["cosine"])
    assert top0["vec_id"] == 7 and top0["cosine"] == 1.0
    top1 = max(by_q[1], key=lambda r: r["cosine"])
    assert top1["vec_id"] == 42
    # verify against numpy brute force
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    expect0 = set(np.argsort(-(vn @ vn[7]))[:5].tolist())
    assert {r["vec_id"] for r in by_q[0]} == expect0


def test_ivf_topk_recalls_identical_vector(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(5)
    vecs = rng.standard_normal((200, 16))
    df = pd.DataFrame({"vec_id": range(200), "embedding": list(vecs)})
    ds = rd.from_pandas(df).repartition(4)
    out = ivf_topk(ds, vecs[[13]], k=3, n_cells=8, nprobe=2).take_all()
    assert any(r["vec_id"] == 13 and r["cosine"] == 1.0 for r in out)


class TestTextQuality:
    def test_lang_id(self):
        df = pd.DataFrame({"text": ["한국어 문장입니다", "plain english", "你好世界",
                                    "Привет мир", "12345 !!!"]})
        out = lang_id_batch(df.copy())
        assert out["lang_id"].tolist() == ["ko", "en", "zh", "ru", "und"]

    def test_token_stats(self):
        df = pd.DataFrame({"text": ["Hello, world! 123", ""]})
        out = token_stats_batch(df.copy())
        assert out["n_words"].tolist() == [3, 0]
        # tokens: Hello , world ! 123 -> 5
        assert out["n_tokens"].tolist() == [5, 0]

    def test_quality_score(self):
        df = pd.DataFrame({"text": ["The cat and the dog. One 2 three!"]})
        out = quality_score_batch(df.copy())
        assert out["punct_ratio"].iloc[0] > 0
        assert out["stop_ratio"].iloc[0] == round(3 / 8, 4)

    def test_fingerprint_normalizes(self):
        df = pd.DataFrame({"text": ["Hello  World", "hello world", "different"]})
        out = fingerprint_batch(df.copy())
        assert out["fingerprint"].iloc[0] == out["fingerprint"].iloc[1]
        assert out["fingerprint"].iloc[0] != out["fingerprint"].iloc[2]


def test_embedding_dup_pairs_bucketed_scale_path(ray_session):
    """The LSH-bucketed variant still finds same-direction duplicates
    (identical directions share every hyperplane sign -> same bucket)."""
    import ray.data as rd

    rng = np.random.RandomState(8)
    vecs = rng.standard_normal((60, 16))
    vecs[30] = vecs[5] * 3.0
    df = pd.DataFrame({"vec_id": range(60), "embedding": list(vecs)})
    pairs = embedding_dup_pairs(
        rd.from_pandas(df).repartition(4), threshold=0.999, num_buckets=8
    ).take_all()
    assert any(p["id_a"] == 5 and p["id_b"] == 30 for p in pairs)


class TestWinnowing:
    def test_deterministic_and_ws_insensitive(self):
        from pdf_extract_ray.stages.textquality import winnow_fingerprints

        a = winnow_fingerprints("The quick brown fox jumps over the lazy dog")
        b = winnow_fingerprints("The  quick brown   fox jumps over the lazy dog")
        assert a == b and len(a) > 0
        assert winnow_fingerprints("ab") == []

    def test_overlap_detects_shared_content(self):
        from pdf_extract_ray.stages.textquality import winnow_overlap

        base = "the asylum court issued a decision on the appeal procedure today"
        near = base + " with additional remarks appended at the end"
        other = "completely different words about databases and query engines"
        assert winnow_overlap(base, base) == 1.0
        assert winnow_overlap(base, near) > 0.5
        assert winnow_overlap(base, other) < 0.1


def test_winnow_short_and_unrelated_texts_not_similar():
    from pdf_extract_ray.functions.fingerprint import winnow_fingerprints, winnow_overlap

    assert winnow_overlap("abcde", "zyxwv") == 0.0   # disjoint short texts
    assert winnow_overlap("", "abcde") == 0.0
    assert winnow_fingerprints("abcde") != []        # >= k chars -> >= 1 fp
    # non-ASCII: adjacent-codepoint substitutions must hash differently
    # (base > 0x10FFFF; with a small base "aĀxyz" and "b}xyz" collide)
    assert winnow_fingerprints("aĀxyz") != winnow_fingerprints("b}xyz")


def test_winnow_pairs_pipeline(ray_session):
    import ray.data as rd

    from pdf_extract_ray.functions.fingerprint import winnow_overlap
    from pdf_extract_ray.stages.dedup import winnow_pairs

    ds, rows = _docs_ds(ray_session)
    pairs = winnow_pairs(ds, "doc_id", "text", overlap_threshold=0.5).take_all()
    got = {(p["id_a"], p["id_b"]): p["overlap"] for p in pairs}
    # exact duplicates 0..4 <-> 30..34 must appear with overlap 1.0
    for i in range(30, 35):
        assert got.get((i - 30, i)) == 1.0
    # distributed overlap equals the single-process fingerprint Jaccard
    texts = {r["doc_id"]: r["text"] for r in rows}
    for (a, b), ov in list(got.items())[:20]:
        assert abs(ov - round(winnow_overlap(texts[a], texts[b]), 4)) < 1e-3


def test_minhash_estimate_tracks_true_jaccard():
    """With the exact universal-hash family (a,b < 2^32, 32-bit shingles,
    true mod-Mersenne), the 128-perm signature equality must track the
    true shingle-set Jaccard within sampling error (sigma ~ 0.044)."""
    from pdf_extract_ray.stages.dedup import (
        _hash_perm_params, minhash_signatures, shingle_set)

    a, b = _hash_perm_params(128)
    words = [f"w{i}" for i in range(400)]
    base = words[:200]
    errors = []
    for n_shared in (180, 140, 100, 60):
        other = base[:n_shared] + words[200 : 200 + (200 - n_shared)]
        t1, t2 = " ".join(base), " ".join(other)
        s1 = set(shingle_set(t1).tolist())
        s2 = set(shingle_set(t2).tolist())
        true_j = len(s1 & s2) / len(s1 | s2)
        sig = minhash_signatures([t1, t2], a, b)
        est = float((sig[0] == sig[1]).mean())
        errors.append(abs(est - true_j))
    assert max(errors) < 0.15, errors
    assert sum(errors) / len(errors) < 0.08, errors


def test_minhash_batch_and_scalar_paths_agree():
    """minhash_signatures (batch reduceat kernel) == per-doc
    minhash_signature over shingle_set — the two public paths must never
    drift."""
    import numpy as np

    from pdf_extract_ray.stages.dedup import (
        _hash_perm_params, minhash_signature, minhash_signatures,
        shingle_set, simhash64, simhash_signatures)

    a, b = _hash_perm_params(64)
    texts = ["the quick brown fox", "", "one", "alpha beta gamma delta epsilon",
             "x " * 500]
    batch = minhash_signatures(texts, a, b)
    for i, t in enumerate(texts):
        scalar = minhash_signature(shingle_set(t), a, b)
        assert (batch[i] == scalar).all(), f"minhash drift on {t!r}"
    sims = simhash_signatures(texts)
    for i, t in enumerate(texts):
        assert int(sims[i]) == simhash64(t), f"simhash drift on {t!r}"


def test_near_dup_bucket_caps_bound_degenerate_skew(ray_session):
    """10^4 identical boilerplate docs collapse into one candidate bucket;
    the caps must drop it (with a log line) instead of running an O(b^2)
    pair loop — and distinct near-dup families must still be found."""
    import time

    import ray.data as rd

    from pdf_extract_ray.stages.dedup import minhash_lsh_pairs, simhash_pairs

    rows = [{"doc_id": i, "text": "identical boilerplate body text here"}
            for i in range(10_000)]
    # one real near-dup family on top of the degenerate mass
    rows.append({"doc_id": 20_000,
                 "text": "rare unique content about asylum appeal procedures"})
    rows.append({"doc_id": 20_001,
                 "text": "rare unique content about asylum appeal procedures"})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(8)

    t0 = time.time()
    mh = minhash_lsh_pairs(ds, "doc_id", "text", jaccard_threshold=0.5,
                           max_band_freq=100).take_all()
    sh = simhash_pairs(ds, "doc_id", "text", max_bucket=100).take_all()
    wall = time.time() - t0
    mh_keys = {(p["id_a"], p["id_b"]) for p in mh}
    sh_keys = {(p["id_a"], p["id_b"]) for p in sh}
    assert (20_000, 20_001) in mh_keys
    assert (20_000, 20_001) in sh_keys
    # the 10^4-doc bucket (~5*10^7 pairs) was dropped, not enumerated
    assert not any(a < 10_000 and b < 10_000 for a, b in mh_keys)
    assert not any(a < 10_000 and b < 10_000 for a, b in sh_keys)
    assert wall < 60, f"degenerate bucket not capped: {wall:.1f}s"


def test_embedding_lsh_multiprobe_recall_vs_exact(ray_session):
    """The default bucketed+multi-probe path must recover >= 95% of the
    exact all-pairs result on a clustered corpus (the oracle runs the
    exact num_buckets=1 mode; this freezes the scale path's quality)."""
    import ray.data as rd

    rng = np.random.RandomState(21)
    base = rng.standard_normal((60, 16))
    vecs = []
    for i in range(60):  # 60 clusters x 5 noisy members -> many true pairs
        for j in range(5):
            vecs.append(base[i] + 0.02 * rng.standard_normal(16))
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
    ds = rd.from_pandas(df).repartition(4)

    exact = {(p["id_a"], p["id_b"])
             for p in embedding_dup_pairs(ds, threshold=0.99,
                                          num_buckets=1).take_all()}
    bucketed = {(p["id_a"], p["id_b"])
                for p in embedding_dup_pairs(ds, threshold=0.99,
                                             num_buckets=32).take_all()}
    assert exact, "test corpus must contain true near-dup pairs"
    assert bucketed <= exact  # bucketing can only miss, never invent
    recall = len(bucketed & exact) / len(exact)
    assert recall >= 0.95, f"multi-probe recall too low: {recall:.3f}"
    # single-probe should be strictly worse or equal (documents why
    # multi-probe is the default)
    single = {(p["id_a"], p["id_b"])
              for p in embedding_dup_pairs(ds, threshold=0.99, num_buckets=32,
                                           multiprobe=False).take_all()}
    assert len(single) <= len(bucketed)
    # radius-2 probing is the recall lever: strictly more (or equal)
    # candidates, still a subset of exact
    r2 = {(p["id_a"], p["id_b"])
          for p in embedding_dup_pairs(ds, threshold=0.99, num_buckets=32,
                                       probe_radius=2).take_all()}
    assert bucketed <= r2 <= exact


def test_winnow_pairs_spill_dir_equivalent(ray_session, tmp_path):
    """spill_dir (parquet round-trip) and the default in-memory pin must
    produce identical pairs."""
    from pdf_extract_ray.stages.dedup import winnow_pairs

    ds, _ = _docs_ds(ray_session)
    mem = sorted(
        (p["id_a"], p["id_b"], p["overlap"])
        for p in winnow_pairs(ds, "doc_id", "text", overlap_threshold=0.5).take_all()
    )
    spill = sorted(
        (p["id_a"], p["id_b"], p["overlap"])
        for p in winnow_pairs(ds, "doc_id", "text", overlap_threshold=0.5,
                              spill_dir=str(tmp_path / "winnow")).take_all()
    )
    assert mem == spill and mem


def test_winnow_pairs_frequency_cap_consistent(ray_session):
    """Frequency-capped fingerprints are dropped from BOTH the shared count
    and the per-doc totals: a near-identical pair whose distinctive content
    is rare still scores high even when it also shares a stop phrase with
    hundreds of other docs."""
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import winnow_pairs

    common = "this exact boilerplate phrase appears in every single document here"
    rows = [{"doc_id": i, "text": f"{common} unique filler {i} {i*7} {i*13}"}
            for i in range(230)]
    rows.append({"doc_id": 500,
                 "text": f"{common} very distinctive rare tail content alpha beta"})
    rows.append({"doc_id": 501,
                 "text": f"{common} very distinctive rare tail content alpha beta"})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    pairs = winnow_pairs(ds, "doc_id", "text",
                         overlap_threshold=0.5, max_fp_freq=100).take_all()
    got = {(p["id_a"], p["id_b"]): p["overlap"] for p in pairs}
    assert got.get((500, 501)) == 1.0  # identical surviving fingerprints


def test_partial_topk_survives_nan_cosines(ray_session):
    """Regression: NaN cosines must not poison the k-th boundary and drop
    valid candidates from a batch's partial top-k."""
    import ray.data as rd

    rng = np.random.RandomState(12)
    vecs = rng.standard_normal((40, 8))
    vecs[5] = vecs[0]                      # guaranteed top hit
    for i in range(20, 38):                # NaNs outnumber n - k
        vecs[i, 0] = np.nan
    df = pd.DataFrame({"vec_id": range(40), "embedding": list(vecs)})
    out = brute_force_topk(rd.from_pandas(df).repartition(1), vecs[[0]],
                           k=5).take_all()
    got = {r["vec_id"] for r in out}
    assert {0, 5} <= got and len(out) == 5


def test_simhash_pairs_complete_and_unique_vs_bruteforce(ray_session):
    """End-to-end property: with no cap in play, simhash_pairs returns
    EXACTLY the pairs with Hamming(simhash) <= max_hamming — banding is
    complete (pigeonhole) and first-band ownership emits each exactly
    once."""
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import simhash_pairs, simhash_signatures

    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(120):
        base = rng.randint(0, 6)
        toks = [vocab[(base * 3 + j) % 30] for j in range(12)]
        for _ in range(rng.randint(0, 3)):  # small perturbations
            toks[rng.randint(0, 12)] = vocab[rng.randint(0, 30)]
        rows.append({"doc_id": i, "text": " ".join(toks)})
    df = pd.DataFrame(rows)
    got = {(p["id_a"], p["id_b"]): p["hamming"]
           for p in simhash_pairs(rd.from_pandas(df).repartition(5),
                                  "doc_id", "text").take_all()}
    sigs = simhash_signatures(df["text"].tolist())
    expect = {}
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            d = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
            if d <= 3:
                expect[(i, j)] = d
    assert got == expect and expect, f"{len(got)} vs {len(expect)}"


def test_ivf_centroids_from_spread_sample_on_sorted_corpus(ray_session):
    """The round-2 flaw: centroids learned from ds.limit(2048) head rows
    degrade recall when the corpus is SORTED BY CLUSTER (the head sample
    only sees the first topics).  The hash-spread sample must keep recall
    high on exactly that layout."""
    import ray.data as rd

    rng = np.random.RandomState(3)
    n_clusters, per = 40, 200  # 8000 rows; head-2048 sees ~10 clusters
    centers = rng.standard_normal((n_clusters, 16)) * 5
    vecs = np.concatenate([
        centers[c] + 0.05 * rng.standard_normal((per, 16))
        for c in range(n_clusters)
    ])
    ids = np.arange(len(vecs), dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": list(vecs)})).repartition(8)
    # queries drawn from LATE clusters (unseen by a head sample)
    q_idx = [n_clusters // 2 * per + 7, (n_clusters - 1) * per + 3]
    queries = vecs[q_idx]
    exact = brute_force_topk(ds, queries, k=10).take_all()
    approx = ivf_topk(ds, queries, k=10, n_cells=32, nprobe=4,
                      sample_n=2048).take_all()
    exact_ids = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_ids = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_ids & approx_ids) / len(exact_ids)
    assert recall >= 0.9, f"recall {recall} on cluster-sorted corpus"


class TestNgramJaccard:
    """Exact word-n-gram set Jaccard (dedup.ngram_jaccard_pairs)."""

    @staticmethod
    def _brute(texts, n=3, max_df=100, threshold=0.4):
        sets = {}
        for i, t in texts.items():
            w = t.lower().split(" ")
            sets[i] = {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}
        from collections import Counter
        df = Counter(g for s in sets.values() for g in s)
        filt = {i: {g for g in s if df[g] <= max_df} for i, s in sets.items()}
        out = {}
        ids = sorted(sets)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                inter = len(filt[a] & filt[b])
                union = len(filt[a] | filt[b])
                j = round(inter / union, 6) if union else 0.0
                if inter and j >= threshold:
                    out[(a, b)] = (inter, j)
        return out

    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        from pdf_extract_ray.stages.dedup import ngram_jaccard_pairs

        base = "the quick brown fox jumps over the lazy dog near the river bank today"
        texts = {
            0: base,
            1: base,                                   # exact dup
            2: base.replace("lazy", "sleepy"),         # near dup
            3: "completely different words entirely here with no shared phrases at all",
            4: base + " and then some extra trailing words",
        }
        got = {(r["id_a"], r["id_b"]): (r["shared"], r["jaccard"])
               for r in ngram_jaccard_pairs(
                   rd.from_items([{"doc_id": i, "text": t}
                                  for i, t in texts.items()]).repartition(3),
                   "doc_id", "text").take_all()}
        assert got == self._brute(texts)

    def test_max_df_drops_stop_phrase_only_pairs(self, ray_session):
        import ray.data as rd

        from pdf_extract_ray.stages.dedup import ngram_jaccard_pairs

        # every doc shares ONLY the stop phrase; with max_df below the
        # corpus size the phrase is non-discriminative -> no pairs
        texts = {i: f"common stop phrase here unique{i} tail{i} word{i} more{i}"
                 for i in range(6)}
        ds = rd.from_items([{"doc_id": i, "text": t} for i, t in texts.items()])
        assert ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.05,
                                   max_df=3).take_all() == []
        # raising max_df brings the stop-phrase overlap back
        assert len(ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.05,
                                       max_df=10).take_all()) == 15


# ---------------------------------------------------------------------------
# image near-dup (stages/multimodal dHash + generic hamming_lsh_pairs)
# ---------------------------------------------------------------------------

def test_dhash_frozen_rule_and_noise_tolerance():
    import numpy as np

    from pdf_extract_ray.functions.bmp import decode_bmp, encode_bmp
    from pdf_extract_ray.stages.multimodal import _mean_pool, dhash64

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (20, 30, 3), dtype=np.uint8)
    h0 = dhash64(px)
    # frozen: bit (row*8+col) == cells[row][col+1] > cells[row][col]
    g = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    cells = _mean_pool(g, 8, 9)
    for r in range(8):
        for c in range(8):
            assert bool((h0 >> (r * 8 + c)) & 1) == \
                bool(cells[r][c + 1] > cells[r][c])
    # codec round-trip is exact -> hash identical
    assert dhash64(decode_bmp(encode_bmp(px))) == h0
    # small perturbation -> small hamming; unrelated image -> large
    near = px.copy()
    ys, xs = rng.randint(0, 20, 8), rng.randint(0, 30, 8)
    near[ys, xs] = np.clip(near[ys, xs].astype(np.int16)
                           + rng.randint(-40, 41, (8, 3)),
                           0, 255).astype(np.uint8)
    other = rng.randint(0, 256, (20, 30, 3), dtype=np.uint8)
    d_near = bin(h0 ^ dhash64(near)).count("1")
    d_other = bin(h0 ^ dhash64(other)).count("1")
    assert d_near <= 5 < d_other


def test_dhash_tiny_images_upsample_deterministically():
    import numpy as np

    from pdf_extract_ray.stages.multimodal import dhash64

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert dhash64(px) == dhash64(px)  # total, no crash on h<8 / w<9
    # pure magnification keeps the hash CLOSE: pooled cells are equal up
    # to summation order, so only near-tie gradient bits can flip (the
    # strict > on almost-equal floats), never structure
    rng = np.random.RandomState(11)
    mid = rng.randint(0, 256, (16, 18, 3), dtype=np.uint8)
    big = np.repeat(np.repeat(mid, 2, axis=0), 2, axis=1)
    assert bin(dhash64(mid) ^ dhash64(big)).count("1") <= 3


def test_image_dup_pairs_match_bruteforce(ray_session):
    import itertools

    import numpy as np
    import ray.data as rd

    from pdf_extract_ray.functions.bmp import decode_bmp
    from pdf_extract_ray.stages.multimodal import (
        dhash64,
        image_dup_pairs,
        synth_image_dup_table,
    )

    t = synth_image_dup_table(90)
    got = (image_dup_pairs(rd.from_arrow(t).repartition(5))
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    hs = [dhash64(decode_bmp(p)) for p in t["payload"].to_pylist()]
    exp = sorted((a, b, bin(hs[a] ^ hs[b]).count("1"))
                 for a, b in itertools.combinations(range(90), 2)
                 if bin(hs[a] ^ hs[b]).count("1") <= 5)
    assert [tuple(r) for r in got.to_numpy()] == exp
    # every planted triple's (3k, 3k+1) near-dup is recovered
    planted = {(3 * k, 3 * k + 1) for k in range(30)}
    found = set(zip(got["id_a"], got["id_b"]))
    assert planted <= found


def test_image_dup_skips_non_images_and_garbage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pdf_extract_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        image_dup_pairs,
        synth_image_dup_table,
    )

    t = synth_image_dup_table(6)
    junk = pa.table({
        "media_id": [100, 101],
        "url": ["u1", "u2"],
        "kind": ["audio", "image"],
        "payload": [b"not audio", b"not a bmp"],
        "content_type": ["audio/wav", "image/bmp"],
        "n_bytes": [9, 9],
    }, schema=MEDIA_SCHEMA)
    ds = rd.from_arrow(pa.concat_tables([t, junk]))
    got = image_dup_pairs(ds).to_pandas()
    ids = set(got["id_a"]) | set(got["id_b"])
    assert 100 not in ids and 101 not in ids
    assert {(0, 1), (3, 4)} <= set(zip(got["id_a"], got["id_b"]))


def test_dedup_exact_keep_last_keeps_max_order_key(ray_session):
    ds, rows = _docs_ds(ray_session)
    with_fp = ds.map_batches(lambda b: fingerprint_batch(b, "text"),
                             batch_format="pandas")
    out = dedup_exact(with_fp, "fingerprint", "doc_id",
                      keep="last").take_all()
    kept = sorted(r["doc_id"] for r in out)
    texts = {}
    for r in rows:
        texts.setdefault(r["text"], []).append(r["doc_id"])
    expect = sorted(max(ids) for ids in texts.values())
    assert kept == expect
    with pytest.raises(ValueError):
        dedup_exact(with_fp, "fingerprint", "doc_id", keep="best")


def test_dedup_keep_best_and_sql_parity(ray_session):
    import duckdb

    import ray.data as rd

    from pdf_extract_ray.stages.dedup import (
        dedup_keep_best,
        keep_best_oracle_sql,
    )

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "doc_id": np.arange(200),
        "key": [f"k{int(x)}" for x in rng.integers(0, 40, size=200)],
        "score": rng.integers(0, 5, size=200),  # heavy score ties
    })
    got = (dedup_keep_best(rd.from_pandas(df).repartition(4),
                           "key", "score", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # one row per key, and it is the (max score, min id) row
    assert len(got) == df["key"].nunique()
    best = (df.sort_values(["key", "score", "doc_id"],
                           ascending=[True, False, True], kind="mergesort")
            .drop_duplicates("key"))
    assert sorted(got["doc_id"]) == sorted(best["doc_id"])
    con = duckdb.connect()
    con.register("t", df)
    want = (con.sql(keep_best_oracle_sql(
        "SELECT doc_id, key, score FROM t", "key", "score", "doc_id"))
        .df().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)])


def test_dedup_against_reference_and_sql_parity(ray_session):
    import duckdb

    import ray.data as rd

    from pdf_extract_ray.stages.dedup import (
        dedup_against_reference,
        dedup_against_reference_oracle_sql,
    )

    rng = np.random.default_rng(29)
    corpus = pd.DataFrame({
        "doc_id": np.arange(200),
        "key": [f"k{int(x)}" for x in rng.integers(0, 80, size=200)],
    })
    ref = pd.DataFrame({
        "doc_id": np.arange(1000, 1060),
        "key": [f"k{int(x)}" for x in rng.integers(40, 120, size=60)],
    })
    got = (dedup_against_reference(
        rd.from_pandas(corpus).repartition(4),
        rd.from_pandas(ref).repartition(3), "key")
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("c", corpus)
    con.register("r", ref)
    want = (con.sql(dedup_against_reference_oracle_sql(
        "SELECT doc_id, key FROM c", "SELECT doc_id, key FROM r", "key"))
        .df().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: survivors' keys are disjoint from the reference, and
    # rows with non-overlapping keys (< k40) all survive
    assert not set(got["key"]) & set(ref["key"])
    low = corpus[~corpus["key"].isin(set(ref["key"]))]
    assert sorted(got["doc_id"]) == sorted(low["doc_id"])


def test_quantize_embeddings_roundtrip_and_sql_parity():
    import duckdb

    from pdf_extract_ray.stages.similarity import (
        quantize_embeddings_batch,
        quantize_embeddings_oracle_sql,
    )

    rng = np.random.default_rng(3)
    X = [rng.normal(0, 2, size=16).astype(np.float32) for _ in range(300)]
    X[0] = np.zeros(16, dtype=np.float32)
    df = pd.DataFrame({"vec_id": np.arange(300), "embedding": X})
    got = (quantize_embeddings_batch(df)
           .sort_values("vec_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("embeddings", df)
    want = (con.sql(quantize_embeddings_oracle_sql()).df()
            .sort_values("vec_id").reset_index(drop=True))
    key = lambda d: d.assign(q=d["q"].map(lambda a: list(map(int, a))))
    pd.testing.assert_frame_equal(key(got), key(want), check_dtype=False)
    # codes bounded, max-|v| element hits exactly +-127, dequant error
    # bounded by scale/2 per element; zero vector -> zero codes, scale 0
    allq = np.stack(got["q"].to_numpy())
    assert np.abs(allq).max() == 127
    assert (np.abs(allq[1:]).max(axis=1) == 127).all()
    deq = allq * got["scale"].to_numpy()[:, None]
    orig = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    err = np.abs(deq - orig)
    assert (err <= got["scale"].to_numpy()[:, None] / 2 + 1e-9).all()
    assert got.loc[0, "scale"] == 0.0 and not got.loc[0, "q"].any()


def test_levenshtein_matches_duckdb_bytes():
    import duckdb

    from pdf_extract_ray.stages.dedup import levenshtein

    rng = np.random.default_rng(5)
    al = list("abcdef 123é한")
    cases = [("", ""), ("a", ""), ("", "xyz"), ("kitten", "sitting"),
             ("héllo", "hello"), ("한국", "한글국")]
    cases += [("".join(rng.choice(al, size=rng.integers(0, 25))),
               "".join(rng.choice(al, size=rng.integers(0, 25))))
              for _ in range(200)]
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)
    # the byte convention: a 2-byte char substitution costs 2
    assert levenshtein("héllo", "hello") == 2


def test_refine_pairs_levenshtein_and_sql_parity(ray_session):
    import duckdb

    import ray.data as rd

    from pdf_extract_ray.stages.dedup import (
        refine_pairs_levenshtein,
        refine_pairs_levenshtein_oracle_sql,
    )

    rng = np.random.default_rng(67)
    texts = ["shared prefix " + "".join(rng.choice(list("abcdef "), 20))
             for _ in range(80)]
    docs = pd.DataFrame({"doc_id": np.arange(80), "text": texts})
    pairs = pd.DataFrame({"a": np.arange(0, 80, 2),
                          "b": np.arange(1, 80, 2)})
    got = (refine_pairs_levenshtein(
        rd.from_pandas(pairs).repartition(3),
        rd.from_pandas(docs).repartition(4), max_dist=15)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("d", docs)
    con.register("p", pairs)
    want = (con.sql(refine_pairs_levenshtein_oracle_sql(
        "SELECT a, b FROM p", "SELECT doc_id, text FROM d",
        max_dist=15)).df()
        .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)
    # identical pair scores distance 0 / sim 1
    same = refine_pairs_levenshtein(
        rd.from_pandas(pd.DataFrame({"a": [0], "b": [0]})),
        rd.from_pandas(docs)).to_pandas()
    assert same["edit_distance"].iloc[0] == 0
    assert same["edit_sim"].iloc[0] == 1.0


def test_prefix_jaccard_matches_bruteforce_and_sql(ray_session):
    import itertools
    import re

    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import (
        _PJ_TOKEN_PAT,
        prefix_filter_jaccard_pairs,
        prefix_filter_jaccard_oracle_sql,
    )

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(70):
        k = int(rng.integers(0, 14))  # includes empty-token docs
        rows.append((i, " ".join(rng.choice(vocab, size=k, replace=True))))
    rows.append((70, ""))          # empty text
    rows.append((71, None))        # null text
    docs = pd.DataFrame(rows, columns=["doc_id", "text"])

    cols = ["a", "b", "n_common", "n_union", "jaccard"]
    tok_re = re.compile(_PJ_TOKEN_PAT)
    for thr in (0.5, 0.75):
        got = prefix_filter_jaccard_pairs(
            rd.from_pandas(docs).repartition(5), threshold=thr).to_pandas()
        if not len(got):  # empty Dataset loses its schema
            got = pd.DataFrame({c: [] for c in cols})
        got = got.sort_values(["a", "b"]).reset_index(drop=True)
        ref = []
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
            sa = set(tok_re.findall((ta or "").lower()))
            sb = set(tok_re.findall((tb or "").lower()))
            if not (sa | sb):
                continue
            i, u = len(sa & sb), len(sa | sb)
            if i / u >= thr:
                ref.append((ia, ib, i, u, i / u))
        want = pd.DataFrame(
            ref, columns=cols).sort_values(["a", "b"]).reset_index(drop=True)
        assert len(got) == len(want), f"thr={thr}"
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    con = duckdb.connect()
    con.register("d", docs)
    sql = prefix_filter_jaccard_oracle_sql(
        "SELECT doc_id, text FROM d", threshold=0.5)
    want_sql = (con.sql(sql).df()
                .sort_values(["a", "b"]).reset_index(drop=True))
    got = (prefix_filter_jaccard_pairs(
        rd.from_pandas(docs).repartition(5), threshold=0.5)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want_sql, check_dtype=False)


def test_prefix_jaccard_exact_threshold_boundary(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import prefix_filter_jaccard_pairs

    # J exactly == threshold must survive: sets {a b c d} vs {a b c e}
    # -> 3/5 = 0.6
    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a b c d", "a b c e"],
    })
    got = prefix_filter_jaccard_pairs(
        rd.from_pandas(docs), threshold=0.6).to_pandas()
    assert len(got) == 1
    assert got["jaccard"].iloc[0] == 3 / 5
    # and strictly above the boundary it is excluded
    got2 = prefix_filter_jaccard_pairs(
        rd.from_pandas(docs), threshold=0.61).to_pandas()
    assert len(got2) == 0


def test_prefix_jaccard_validation_and_freq_cap(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import prefix_filter_jaccard_pairs

    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "a b"]})
    with pytest.raises(ValueError):
        prefix_filter_jaccard_pairs(rd.from_pandas(docs), threshold=0.0)
    # a tiny freq_cap forces the rare-token hash-order path; results
    # must be unchanged (ordering affects candidates, never the answer)
    got = prefix_filter_jaccard_pairs(
        rd.from_pandas(docs), threshold=0.9, freq_cap=1).to_pandas()
    assert len(got) == 1 and got["jaccard"].iloc[0] == 1.0


def test_sorted_neighborhood_matches_sql(ray_session):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import (
        sorted_neighborhood_pairs,
        sorted_neighborhood_oracle_sql,
    )

    rng = np.random.default_rng(23)
    # heavy duplicate sort keys -> the id tie-break carries uniqueness
    df = pd.DataFrame({"doc_id": np.arange(120),
                       "n_chars": rng.integers(0, 9, 120)})
    con = duckdb.connect()
    con.register("t", df)
    for w in (1, 3, 5):
        got = (sorted_neighborhood_pairs(
            rd.from_pandas(df).repartition(6), ["n_chars", "doc_id"],
            window=w)
            .to_pandas().sort_values(["rank_a", "rank_b"])
            .reset_index(drop=True))
        want = (con.sql(sorted_neighborhood_oracle_sql(
            "SELECT doc_id, n_chars FROM t", ["n_chars", "doc_id"],
            window=w)).df()
            .sort_values(["rank_a", "rank_b"]).reset_index(drop=True))
        assert len(got) == len(want) == 120 * w - w * (w + 1) // 2
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(rd.from_pandas(df),
                                  ["n_chars", "doc_id"], window=0)


def test_grouped_centroids_exact_and_sql(ray_session):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.similarity import (
        grouped_centroids,
        grouped_centroids_oracle_sql,
    )

    rng = np.random.default_rng(55)
    n, d = 200, 8
    df = pd.DataFrame({
        "grp": rng.choice(["a", "b", "c"], n),
        "embedding": [rng.integers(-50, 50, d).astype("float64")
                      for _ in range(n)],
    })
    got = (grouped_centroids(rd.from_pandas(df).repartition(5), ["grp"])
           .to_pandas().sort_values("grp").reset_index(drop=True))
    # numpy reference: exact mean per group
    for _, row in got.iterrows():
        m = np.stack(df.loc[df["grp"] == row["grp"], "embedding"].to_numpy())
        np.testing.assert_array_equal(np.asarray(row["centroid"]),
                                      m.mean(axis=0))
        assert row["n_vecs"] == len(m)
    # SQL bit-parity on the integer-valued components
    con = duckdb.connect()
    con.register("t", df)
    want = (con.sql(grouped_centroids_oracle_sql("SELECT * FROM t",
                                                 ["grp"])).df()
            .sort_values("grp").reset_index(drop=True))
    assert got["grp"].tolist() == want["grp"].tolist()
    assert got["n_vecs"].tolist() == want["n_vecs"].tolist()
    for a, b in zip(got["centroid"], want["centroid"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # topology independence
    got2 = (grouped_centroids(rd.from_pandas(df).repartition(1), ["grp"])
            .to_pandas().sort_values("grp").reset_index(drop=True))
    for a, b in zip(got["centroid"], got2["centroid"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_jaro_winkler_duckdb_byte_parity():
    import random

    import duckdb

    from pdf_extract_ray.stages.dedup import jaro_winkler

    con = duckdb.connect()
    rng = random.Random(17)
    alpha = "abcdefé한 xyz"
    cases = [("a", "a"), ("ab", "ba"), ("", ""), ("a", ""),
             ("martha", "marhta"), ("dixon", "dicksonx"),
             ("aa", "ab"),          # jaro 2/3 <= 0.7: NO winkler boost
             ("héllo", "hello"),    # multibyte: byte-oriented window
             ("abcd", "dcba")]
    for _ in range(400):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        cases.append((a, b))
    for a, b in cases:
        want = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                           [a, b]).fetchone()[0]
        assert jaro_winkler(a, b) == want, (a, b)


def test_refine_pairs_jaro_winkler_sql_parity(ray_session):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import (
        refine_pairs_jaro_winkler,
        refine_pairs_jaro_winkler_oracle_sql,
    )

    rng = np.random.default_rng(71)
    texts = ["name " + "".join(rng.choice(list("abcde "), 15))
             for _ in range(60)]
    docs = pd.DataFrame({"doc_id": np.arange(60, dtype="int64"),
                         "text": texts})
    pairs = pd.DataFrame({"a": np.arange(0, 60, 2, dtype="int64"),
                          "b": np.arange(1, 60, 2, dtype="int64")})
    got = (refine_pairs_jaro_winkler(
        rd.from_pandas(pairs).repartition(3),
        rd.from_pandas(docs).repartition(4), min_sim=0.5)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("d", docs)
    con.register("p", pairs)
    want = (con.sql(refine_pairs_jaro_winkler_oracle_sql(
        "SELECT a, b FROM p", "SELECT doc_id, text FROM d",
        min_sim=0.5)).df()
        .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # identical pair scores exactly 1
    same = refine_pairs_jaro_winkler(
        rd.from_pandas(pd.DataFrame({"a": [0], "b": [0]})),
        rd.from_pandas(docs)).to_pandas()
    assert same["jw_sim"].iloc[0] == 1.0


def test_refine_pairs_word_overlap_containment(ray_session):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import (
        refine_pairs_word_overlap,
        refine_pairs_word_overlap_oracle_sql,
    )

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "text": [
            "the cat sat on the mat today",   # 0: superset
            "cat mat",                        # 1: subset of 0
            "dogs only here",                 # 2: disjoint from 0
            "",                               # 3: empty text
            "the cat sat on the mat today",   # 4: identical to 0
            None,                             # 5: null text
        ],
    })
    pairs = pd.DataFrame({"a": [0, 0, 0, 0, 0],
                          "b": [1, 2, 3, 4, 5]})
    got = (refine_pairs_word_overlap(
        rd.from_pandas(pairs).repartition(2),
        rd.from_pandas(docs).repartition(3))
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    # subset: containment_b == 1, jaccard < 1
    r1 = got[got["b"] == 1].iloc[0]
    assert r1["containment_b"] == 1.0 and r1["jaccard"] < 1.0
    # disjoint: zero-overlap pair still reported
    r2 = got[got["b"] == 2].iloc[0]
    assert r2["n_common"] == 0 and r2["jaccard"] == 0.0
    # empty/null side: NULL ratios, pair kept
    for bid in (3, 5):
        r = got[got["b"] == bid].iloc[0]
        assert r["n_b"] == 0 and pd.isna(r["containment_b"])
    # identical: everything 1
    r4 = got[got["b"] == 4].iloc[0]
    assert r4["jaccard"] == 1.0 == r4["containment_a"]
    con = duckdb.connect()
    con.register("d", docs)
    con.register("p", pairs)
    want = (con.sql(refine_pairs_word_overlap_oracle_sql(
        "SELECT a, b FROM p", "SELECT doc_id, text FROM d")).df()
        .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_semi_join_reference_parity(ray_session):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import (
        dedup_against_reference,
        semi_join_reference,
        semi_join_reference_oracle_sql,
    )

    rng = np.random.default_rng(3)
    corpus = pd.DataFrame({"doc_id": np.arange(200, dtype="int64"),
                           "key": rng.integers(0, 40, 200).astype("int64")})
    ref = pd.DataFrame({"doc_id": np.arange(50, dtype="int64"),
                        "key": rng.integers(20, 60, 50).astype("int64")})
    semi = (semi_join_reference(
        rd.from_pandas(corpus).repartition(4),
        rd.from_pandas(ref).repartition(2), "key")
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("c", corpus)
    con.register("r", ref)
    want = (con.sql(semi_join_reference_oracle_sql(
        "SELECT * FROM c", "SELECT * FROM r", "key")).df()
        .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(semi, want, check_dtype=False)
    # semi + anti partition the corpus exactly
    anti = dedup_against_reference(
        rd.from_pandas(corpus).repartition(4),
        rd.from_pandas(ref).repartition(2), "key").to_pandas()
    assert len(semi) + len(anti) == len(corpus)
    assert not set(semi["doc_id"]) & set(anti["doc_id"])


def test_hard_negative_topk_excludes_same_label(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pdf_extract_ray.stages.similarity import hard_negative_topk

    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(60, 8))
    df = pd.DataFrame({
        "vec_id": np.arange(60),
        "embedding": list(vecs),
        "label": (np.arange(60) % 3).astype(np.int32),
    })
    q = vecs[:2]
    qlab = np.array([0, 1], dtype=np.int32)
    got = hard_negative_topk(rd.from_pandas(df).repartition(4), q, qlab,
                             k=4).to_pandas()
    labels = dict(zip(df["vec_id"], df["label"]))
    assert len(got) == 8
    for _, r in got.iterrows():
        assert labels[r["vec_id"]] != qlab[int(r["query_id"])]
    # brute-force reference for query 0
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ (q[0] / np.linalg.norm(q[0]))
    cand = [(-s, i) for i, s in enumerate(sims) if i % 3 != 0]
    want = [i for _, i in sorted(cand)[:4]]
    g0 = got[got["query_id"] == 0].sort_values(
        ["cosine", "vec_id"], ascending=[False, True])
    assert list(g0["vec_id"]) == want


def test_hard_negative_topk_scarce_negatives(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pdf_extract_ray.stages.similarity import hard_negative_topk

    df = pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
        "label": [0, 0, 1],
    })
    got = hard_negative_topk(rd.from_pandas(df), np.array([[1.0, 0.0]]),
                             np.array([0]), k=5).to_pandas()
    # only ONE other-label vector exists -> fewer than k rows
    assert list(got["vec_id"]) == [2]


# --- q-gram edit-distance join ----------------------------------------------

def _lev_ref(a, b):
    ab, bb = a.encode(), b.encode()
    prev = list(range(len(bb) + 1))
    for i, ca in enumerate(ab, 1):
        cur = [i]
        for j, cb in enumerate(bb, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_qgram_edit_join_complete_vs_bruteforce(ray_session):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import (
        qgram_edit_join, qgram_edit_join_oracle_sql)

    rng = np.random.default_rng(6)
    base = ["banana split sundae", "grape fruit punch bowl",
            "lemon curd tartine", "apple cider donut shop"]
    rows = []
    for i in range(60):
        s = list(base[i % 4])
        for _ in range(rng.integers(0, 3)):  # 0-2 random edits
            p = rng.integers(0, len(s))
            s[p] = chr(ord("a") + rng.integers(0, 26))
        rows.append((i, "".join(s)))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = (qgram_edit_join(rd.from_pandas(df).repartition(5),
                           max_dist=3)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    # brute force: every pair within distance 3 must be present
    want = []
    for i in range(60):
        for j in range(i + 1, 60):
            d = _lev_ref(df["text"][i], df["text"][j])
            if d <= 3:
                sim = 1.0 - d / max(len(df["text"][i].encode()),
                                    len(df["text"][j].encode()), 1)
                want.append((i, j, d, round(sim + 1e-12, 4)))
    assert len(got) == len(want)
    assert got["edit_distance"].tolist() == [w[2] for w in want]
    assert got["a"].tolist() == [w[0] for w in want]
    # and against the SQL brute-force oracle too
    con = duckdb.connect()
    con.register("t", df)
    sql = qgram_edit_join_oracle_sql("SELECT * FROM t", max_dist=3)
    want_sql = (con.sql(sql).df()
                .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want_sql, check_dtype=False)


def test_qgram_edit_join_cap_drops_oversized_buckets(ray_session):
    # the warning itself fires inside Ray workers (not capturable by
    # driver-side caplog); assert the CAP BEHAVIOR instead: capped run
    # drops the oversized buckets, uncapped run keeps all 435 pairs
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import qgram_edit_join

    df = pd.DataFrame({"doc_id": range(30),
                       "text": ["identical string value"] * 30})
    capped = (qgram_edit_join(rd.from_pandas(df), max_dist=1,
                              pair_cap_per_gram=10).to_pandas())
    assert len(capped) == 0  # every gram bucket exceeded the cap
    full = (qgram_edit_join(rd.from_pandas(df), max_dist=1)
            .to_pandas())
    assert len(full) == 30 * 29 // 2
    assert (full["edit_distance"] == 0).all()
    with pytest.raises(ValueError):
        qgram_edit_join(rd.from_pandas(df), max_dist=-1)


# --- host mirror detection ---------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 6])
def test_host_mirror_pairs_finds_planted_mirror(ray_session, blocks):
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import host_mirror_pairs

    rng = np.random.default_rng(17)
    words = [f"tok{i}" for i in range(300)]
    texts = [" ".join(rng.choice(words, 30)) for _ in range(30)]
    rows = []
    for i, t in enumerate(texts[:10]):       # identical unions: a == b
        rows.append(("mirror-a", t))
        rows.append(("mirror-b", t))
    for t in texts[10:20]:
        rows.append(("host-c", t))
    for t in texts[20:]:
        rows.append(("host-d", t))
    df = pd.DataFrame(rows, columns=["host", "text"])
    got = (host_mirror_pairs(rd.from_pandas(df).repartition(blocks),
                             "host", "text", jaccard_threshold=0.9)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    assert len(got) == 1
    assert got.loc[0, "id_a"] == "mirror-a"
    assert got.loc[0, "id_b"] == "mirror-b"
    assert got.loc[0, "jaccard"] == 1.0


def test_host_mirror_union_algebra_order_independent(ray_session):
    # minhash(union) == elementwise min of member signatures, so two
    # hosts holding the SAME documents in scrambled order (and split
    # across blocks differently) must pair at exactly jaccard 1.0
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import host_mirror_pairs

    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "iota kappa lambda mu nu xi omicron pi rho sigma"
    df = pd.DataFrame({
        "host": ["x", "x", "y", "y"],
        "text": [t1, t2, t2, t1]})  # order scrambled on purpose
    got = (host_mirror_pairs(rd.from_pandas(df).repartition(3),
                             "host", "text", jaccard_threshold=0.99)
           .to_pandas())
    assert len(got) == 1 and got.loc[0, "jaccard"] == 1.0


class TestSyndicatedPairs:
    def test_cross_host_filter(self, ray_session):
        import ray.data as rd

        from pdf_extract_ray.stages.dedup import syndicated_pairs

        pairs = pd.DataFrame({"id_a": [1, 2, 3], "id_b": [10, 20, 30]})
        docs = pd.DataFrame({
            "doc_id": [1, 10, 2, 20, 3, 30],
            "url_host": ["a.com", "b.org", "c.net", "c.net",
                         "d.io", "e.io"],
        })
        got = (syndicated_pairs(rd.from_pandas(pairs).repartition(2),
                                rd.from_pandas(docs).repartition(3))
               .to_pandas().sort_values("id_a").reset_index(drop=True))
        # (2, 20) share c.net -> dropped; the other two cross hosts
        assert got["id_a"].tolist() == [1, 3]
        assert got["host_a"].tolist() == ["a.com", "d.io"]
        assert got["host_b"].tolist() == ["b.org", "e.io"]


class TestCdcChunking:
    def test_boundaries_are_content_defined(self):
        from pdf_extract_ray.stages.substr import cdc_boundaries

        base = (b"hello world, this is a test of chunking content "
                b"defined boundaries over some bytes " * 10)
        b1 = cdc_boundaries(base)
        # an insertion near the start shifts boundaries by a constant
        # offset but the chunk PATTERN re-synchronizes (content-defined)
        b2 = cdc_boundaries(b"XYZprefix " + base)
        tail1 = {base[max(0, e - 20):e] for e in b1}
        tail2 = {(b"XYZprefix " + base)[max(0, e - 20):e] for e in b2}
        assert len(tail1 & tail2) >= len(tail1) - 2
        # limits honored
        assert all(e2 - e1 <= 4096 for e1, e2 in zip([0] + b1, b1))
        assert b1[-1] == len(base)
        assert cdc_boundaries(b"") == []
        assert cdc_boundaries(b"abc") == [3]

    def test_dedup_stats_shared_footer(self, ray_session):
        import ray.data as rd

        from pdf_extract_ray.stages.substr import cdc_dedup_stats

        foot = ("shared cookie banner text that repeats on every "
                "single page of the corpus " * 3)
        docs = pd.DataFrame({
            "doc_id": [0, 1, 2],
            "text": [f"unique body number {i} with its own words "
                     * 8 + foot for i in range(3)],
        })
        got = (cdc_dedup_stats(rd.from_pandas(docs).repartition(2))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # every doc carries duplicated (footer) chunks but also unique
        # body chunks
        assert (got["n_dup_chunks"] >= 1).all()
        assert (got["n_dup_chunks"] < got["n_chunks"]).all()
        assert (got["dup_bytes"] < got["n_bytes"]).all()
        assert (got["n_bytes"] == docs["text"].str.len().to_numpy()).all()


def test_pair_confusion_report_known_counts(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import pair_confusion_report

    truth = pd.DataFrame({"id_a": [1, 2, 3, 4], "id_b": [10, 20, 30, 40],
                          "jaccard": [0.9, 0.8, 0.7, 0.6]})
    cand = pd.DataFrame({"id_a": [1, 2, 5], "id_b": [10, 20, 50]})
    got = pair_confusion_report(rd.from_pandas(truth).repartition(2),
                                rd.from_pandas(cand).repartition(2))
    assert got.iloc[0]["n_truth"] == 4
    assert got.iloc[0]["n_cand"] == 3
    assert got.iloc[0]["n_common"] == 2
    assert got.iloc[0]["precision"] == round(2 / 3, 6)
    assert got.iloc[0]["recall"] == 0.5
    # empty candidate side -> NULL precision, zero recall numerator
    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64")})
    e = pair_confusion_report(rd.from_pandas(truth),
                              rd.from_pandas(empty))
    assert e.iloc[0]["n_cand"] == 0 and pd.isna(e.iloc[0]["precision"])
    assert e.iloc[0]["recall"] == 0.0
