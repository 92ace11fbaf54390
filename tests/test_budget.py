"""Greedy token-budget selection (stages/budget.py)."""

import duckdb
import numpy as np
import pytest
import pandas as pd
import ray.data as rd

from pdf_extract_ray.stages.budget import (
    take_token_budget,
    take_token_budget_oracle_sql,
)


def _reference(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Single-process reference: literal window rule."""
    srt = df.sort_values(["score", "doc_id"],
                         ascending=[False, True], kind="mergesort")
    keep = srt[srt["w"].cumsum() <= budget]
    return keep.sort_values("doc_id").reset_index(drop=True)


def test_budget_known_values(ray_session):
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "score": [9, 9, 5, 5, 1],
        "w": [4, 4, 3, 100, 1],
    })
    # order: doc0(4) doc1(8) doc2(11) doc3(111>10 stop) doc4 excluded
    got = (take_token_budget(rd.from_pandas(df), 11,
                             score_col="score", weight_col="w")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1, 2]
    # doc4 (w=1) must NOT sneak in after the overflow: running total
    # includes excluded rows (the SQL window semantics)
    got2 = (take_token_budget(rd.from_pandas(df), 12,
                              score_col="score", weight_col="w")
            .to_pandas())
    assert sorted(got2["doc_id"]) == [0, 1, 2]


def test_budget_whole_corpus_fits_and_empty(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2], "score": [1, 2], "w": [5, 5]})
    got = take_token_budget(rd.from_pandas(df), 100,
                            score_col="score", weight_col="w").to_pandas()
    assert len(got) == 2
    empty = take_token_budget(
        rd.from_pandas(df).map_batches(lambda b: b.iloc[:0],
                                       batch_format="pandas"),
        100, score_col="score", weight_col="w").to_pandas()
    assert len(empty) == 0


def test_budget_randomized_vs_reference_and_sql(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "doc_id": rng.permutation(600),
        "score": rng.integers(0, 12, size=600),   # heavy score ties
        "w": rng.integers(0, 9, size=600),        # zero weights too
    })
    for budget in (0, 37, 500, 10_000):
        got = take_token_budget(
            rd.from_pandas(df).repartition(4), budget,
            score_col="score", weight_col="w", id_bucket_bits=3).to_pandas()
        want = _reference(df, budget)
        if got.empty:  # Ray drops columns on an all-empty to_pandas
            assert want.empty
            continue
        got = got.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64"))
        con = duckdb.connect()
        con.register("t", df)
        sql = (con.sql(take_token_budget_oracle_sql(
            "SELECT doc_id, score, w FROM t", budget,
            score_col="score", weight_col="w"))
            .df().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype("int64"), sql.astype("int64"))


# --- crawl budget apportionment ---------------------------------------------

@pytest.mark.parametrize("blocks", [1, 6])
def test_crawl_budget_sums_exactly_and_matches_sql(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.budget import (
        crawl_budget, crawl_budget_oracle_sql)

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"host": rng.choice(
        [f"h{i}" for i in range(13)], size=311)})
    for budget in (0, 7, 100, 311, 5000):
        got = (crawl_budget(rd.from_pandas(df).repartition(blocks),
                            ["host"], budget=budget)
               .sort_values("host").reset_index(drop=True))
        assert int(got["quota"].sum()) == budget  # EXACT apportionment
        # proportionality: quota within 1 of the real share
        share = budget * got["n"].to_numpy() / len(df)
        assert (np.abs(got["quota"].to_numpy() - share) < 1.0 + 1e-9).all()
        con = duckdb.connect()
        con.register("t", df)
        sql = crawl_budget_oracle_sql("SELECT * FROM t", ["host"],
                                      budget=budget)
        want = (con.sql(sql).df()
                .sort_values("host").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(ValueError):
        crawl_budget(rd.from_pandas(df), ["host"], budget=-1)
