"""Deterministic split assignment (stages/split.py) and benchmark
decontamination (stages/decontam.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pdf_extract_ray.stages.decontam import (
    benchmark_gram_set,
    contamination_stats,
)
from pdf_extract_ray.stages.split import (
    assign_split,
    assign_split_batch,
    split_thresholds,
)


def test_split_thresholds_validate():
    with pytest.raises(ValueError):
        split_thresholds({})
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})  # sums to 0.9
    th = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    assert [t[0] for t in th] == ["train", "val", "test"]
    assert th[0][1] == format(int(0.8 * 16 ** 8), "08x")


@pytest.mark.parametrize("method", ["md5", "fast"])
def test_split_deterministic_and_batch_invariant(method):
    ids = pd.DataFrame({"doc_id": np.arange(1000)})
    whole = assign_split_batch(ids, method=method)["split"]
    # batching must not change the assignment (pure function of the id)
    parts = pd.concat([
        assign_split_batch(ids.iloc[:300], method=method),
        assign_split_batch(ids.iloc[300:], method=method),
    ])["split"].reset_index(drop=True)
    assert (whole == parts).all()
    # proportions approximately honor the fractions
    frac = whole.value_counts(normalize=True)
    assert abs(frac.get("train", 0) - 0.8) < 0.06
    assert abs(frac.get("val", 0) - 0.1) < 0.04
    assert abs(frac.get("test", 0) - 0.1) < 0.04


def test_split_bad_method():
    with pytest.raises(ValueError):
        assign_split_batch(pd.DataFrame({"doc_id": [1]}), method="seeded")


def test_split_dataset_matches_batch(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(200)})
    got = (assign_split(rd.from_pandas(df).repartition(4), "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = assign_split_batch(df)
    assert (got["split"].to_numpy() == want["split"].to_numpy()).all()


BENCH = ["the quick brown fox jumps over the lazy dog again and again",
         "pack my box with five dozen liquor jugs right now please"]
CLEAN = "completely unrelated content about distributed stream engines"


def _corpus():
    return pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            # contains a verbatim bench span
            "prefix words " + BENCH[0] + " suffix words",
            CLEAN + " with nothing shared at all beyond single words",
            BENCH[1],          # the bench text itself
            "tiny",            # shorter than n -> zero windows
        ],
    })


@pytest.mark.parametrize("key", ["text", "hash"])
def test_contamination_flags(ray_session, key):
    ds = rd.from_pandas(_corpus()).repartition(2)
    got = (contamination_stats(ds, BENCH, n=8, key=key)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["contaminated"].tolist() == [True, False, True, False]
    assert got.loc[3, "n_grams"] == 0 and got.loc[3, "hit_frac"] == 0.0
    # bench text itself: every window hits
    assert got.loc[2, "n_hits"] == got.loc[2, "n_grams"] > 0
    assert got.loc[2, "hit_frac"] == 1.0


def test_contamination_hash_equals_text_mode(ray_session):
    ds = rd.from_pandas(_corpus())
    a = (contamination_stats(ds, BENCH, n=8, key="text")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (contamination_stats(ds, BENCH, n=8, key="hash")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_benchmark_gram_set_shapes():
    h = benchmark_gram_set(BENCH, 8, "hash")
    t = benchmark_gram_set(BENCH, 8, "text")
    assert h.dtype == np.uint64 and len(h) == len(t)
    assert all(len(g.split(" ")) == 8 for g in t)


# ---------------------------------------------------------------- #
# fuzzy decontamination (max n-gram-set Jaccard vs the eval set)


def test_fuzzy_contamination_known_values(ray_session):
    from pdf_extract_ray.stages.decontam import fuzzy_contamination_stats

    bench = ["a b c d"]  # 2-grams {a b, b c, c d}
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b c d",     # identical -> 1.0
            "a b c x",     # {a b, b c, c x}: inter 2, union 4 -> 0.5
            "z z z z",     # {z z}: inter 0 -> 0.0
            "",            # no grams -> 0.0
        ],
    })
    ds = rd.from_pandas(df).repartition(2)
    got = (fuzzy_contamination_stats(ds, bench, n=2, key="text",
                                     threshold=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["max_jaccard"].tolist() == [1.0, 0.5, 0.0, 0.0]
    assert got["fuzzy_contaminated"].tolist() == [True, True, False, False]
    assert got["n_distinct_grams"].tolist() == [3, 3, 1, 0]


def test_fuzzy_contamination_hash_equals_text_mode(ray_session):
    from pdf_extract_ray.stages.decontam import fuzzy_contamination_stats

    ds = rd.from_pandas(_corpus())
    a = (fuzzy_contamination_stats(ds, BENCH, n=3, key="text")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (fuzzy_contamination_stats(ds, BENCH, n=3, key="hash")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_fuzzy_contamination_sql_parity(ray_session):
    import duckdb

    from pdf_extract_ray.stages.decontam import (
        fuzzy_contamination_oracle_sql,
        fuzzy_contamination_stats,
    )

    rng = np.random.default_rng(23)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "Eta!"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 15))))
             for _ in range(120)] + ["", None]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    bench_texts = [t for i, t in enumerate(texts)
                   if i % 5 == 0 and t is not None]
    got = (fuzzy_contamination_stats(
        rd.from_pandas(df).repartition(3), bench_texts,
        n=3, key="text", threshold=0.4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    want = (con.sql(fuzzy_contamination_oracle_sql(
        "documents", n=3, threshold=0.4, bench_pred="doc_id % 5 = 0"))
        .df().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"n_distinct_grams": "int64"}),
        want.astype({"n_distinct_grams": "int64"}))


# ---------------------------------------------------------------- #
# leakage-safe group-exclusive split (hash the host, not the doc)


def test_split_by_host_is_host_exclusive(ray_session):
    hosts = pd.DataFrame({
        "doc_id": np.arange(400),
        "url_host": [f"site{h}.example" for h in np.arange(400) % 23],
    })
    out = assign_split_batch(hosts, id_col="url_host")
    per_host = out.groupby("url_host")["split"].nunique()
    assert (per_host == 1).all()
    assert out["split"].nunique() > 1  # 23 hosts spread across splits


class TestContaminationEvidence:
    def test_best_bench_argmax_and_sentinel(self, ray_session):
        import ray.data as rd

        from pdf_extract_ray.stages.decontam import (
            fuzzy_contamination_stats,
        )

        bench_texts = [
            "the quick brown fox jumps over the lazy dog tonight",
            "pack my box with five dozen liquor jugs right now",
        ]
        docs = pd.DataFrame({
            "doc_id": [0, 1, 2],
            "text": [
                # heavy overlap with bench 0
                "the quick brown fox jumps over the lazy dog today",
                # heavy overlap with bench 1
                "please pack my box with five dozen liquor jugs",
                # no 5-gram overlap with either
                "completely different words in every single position here",
            ],
        })
        got = (fuzzy_contamination_stats(
                   rd.from_pandas(docs).repartition(2), bench_texts,
                   n=5, key="text", threshold=0.3,
                   bench_ids=[100, 200])
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got["best_bench_id"].tolist() == [100, 200, -1]
        assert got["fuzzy_contaminated"].tolist() == [True, True, False]

    def test_bench_ids_misaligned_raises(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from pdf_extract_ray.stages.decontam import (
            fuzzy_contamination_stats,
        )

        with _pytest.raises(ValueError):
            fuzzy_contamination_stats(
                rd.from_pandas(pd.DataFrame({"doc_id": [0],
                                             "text": ["x"]})),
                ["a b c d e f"], bench_ids=[1, 2])
