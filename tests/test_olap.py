"""OLAP operators: grouping sets / rollup / cube, pivot-to-wide,
per-group rank / ntile (stages/olap.py) vs a DuckDB mirror."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.stages.olap import (
    cube_aggregate,
    cube_oracle_sql,
    grouped_rank,
    grouped_rank_oracle_sql,
    grouping_sets,
    pivot_wide,
    pivot_wide_oracle_sql,
    rollup_aggregate,
    rollup_oracle_sql,
)


def _df(seed: int = 3, n: int = 400) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k1": rng.choice(["a", "b", "c"], n),
        "k2": rng.choice(["x", "y"], n),
        "rid": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 100, n).astype(float),
    })


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return (df.astype(str)
            .sort_values(sorted(df.columns), kind="mergesort")
            .reset_index(drop=True))


def _oracle(df: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(sql).df()


SPEC = {"sum_v": ("v", "sum"), "n": ("v", "count"),
        "min_v": ("v", "min"), "max_v": ("v", "max")}


def test_rollup_matches_duckdb(ray_session):
    import ray.data as rd

    df = _df()
    got = rollup_aggregate(
        rd.from_pandas(df).repartition(7), ["k1", "k2"], SPEC).to_pandas()
    want = _oracle(df, rollup_oracle_sql("t", ["k1", "k2"], SPEC))
    # rollup = 3 levels: (k1,k2) + (k1) + grand total
    assert len(got) == df.groupby(["k1", "k2"]).ngroups + 3 + 1
    # rolled-out slots are real nulls, not strings/NaN-likes
    assert got["k2"].isna().sum() == 3 + 1
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_cube_and_grouping_sets_match_duckdb(ray_session):
    import ray.data as rd

    df = _df(seed=5)
    ds = rd.from_pandas(df).repartition(5)
    got = cube_aggregate(ds, ["k1", "k2"], SPEC).to_pandas()
    want = _oracle(df, cube_oracle_sql("t", ["k1", "k2"], SPEC))
    pd.testing.assert_frame_equal(_canon(got), _canon(want))

    # a non-hierarchical set list: (k2) alone + grand total — k1 is in
    # no set, so (per the SQL rule) it is absent from the output
    got2 = grouping_sets(ds, ["k1", "k2"], SPEC, [["k2"], []]).to_pandas()
    assert "k1" not in got2.columns
    want2 = _oracle(
        df, "SELECT k2, sum(v) AS sum_v, count(*) AS n, "
            "min(v) AS min_v, max(v) AS max_v FROM t "
            "GROUP BY GROUPING SETS ((k2), ())")
    pd.testing.assert_frame_equal(_canon(got2), _canon(want2))


def test_grouping_sets_rejects_bad_input(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(_df(n=10))
    with pytest.raises(ValueError, match="subset"):
        grouping_sets(ds, ["k1"], SPEC, [["k2"]])
    with pytest.raises(ValueError, match="unsupported op"):
        grouping_sets(ds, ["k1"], {"m": ("v", "mean")}, [["k1"]])


def test_pivot_wide_count_and_sum(ray_session):
    import ray.data as rd

    df = _df(seed=11)
    ds = rd.from_pandas(df).repartition(6)
    cats = ["a", "b", "c"]
    got = pivot_wide(ds, ["k2"], "k1", cats, op="count",
                     prefix="n_").to_pandas()
    want = _oracle(df, pivot_wide_oracle_sql("t", ["k2"], "k1", cats,
                                             op="count", prefix="n_"))
    pd.testing.assert_frame_equal(_canon(got), _canon(want))

    got = pivot_wide(ds, ["k2"], "k1", cats, value_col="v", op="sum",
                     prefix="v_").to_pandas()
    want = _oracle(df, pivot_wide_oracle_sql("t", ["k2"], "k1", cats,
                                             value_col="v", op="sum",
                                             prefix="v_"))
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_pivot_out_of_vocab_counts_nowhere(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k2": ["x", "x", "y"], "k1": ["a", "zz", "zz"],
                       "v": [1.0, 2.0, 3.0]})
    got = (pivot_wide(rd.from_pandas(df), ["k2"], "k1", ["a"], op="count")
           .to_pandas().sort_values("k2").reset_index(drop=True))
    # zz rows create the index row but no column counts them
    assert got["a"].tolist() == [1, 0] and got["k2"].tolist() == ["x", "y"]


def test_grouped_rank_row_number_ntile(ray_session):
    import ray.data as rd

    df = _df(seed=7, n=300)
    got = grouped_rank(
        rd.from_pandas(df).repartition(5), ["k1"], "v",
        descending=True, tie_col="rid", out_col="r",
        method="row_number", ntile=4, ntile_col="q").to_pandas()
    want = _oracle(df, grouped_rank_oracle_sql(
        "t", ["k1"], "v", descending=True, tie_col="rid",
        out_col="r", method="row_number", ntile=4, ntile_col="q"))
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_grouped_rank_dense_and_small_groups(ray_session):
    import ray.data as rd

    # ties share a dense rank; groups smaller than ntile get 1 row/tile
    df = pd.DataFrame({"k": ["g"] * 4 + ["h"] * 2,
                       "rid": np.arange(6, dtype=np.int64),
                       "v": [5.0, 5.0, 3.0, 1.0, 9.0, 9.0]})
    got = grouped_rank(
        rd.from_pandas(df), ["k"], "v", descending=True,
        tie_col="rid", out_col="r", method="dense",
        ntile=4, ntile_col="q").to_pandas()
    want = _oracle(df, grouped_rank_oracle_sql(
        "t", ["k"], "v", descending=True, tie_col="rid",
        out_col="r", method="dense", ntile=4, ntile_col="q"))
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
    with pytest.raises(ValueError, match="tie_col"):
        grouped_rank(rd.from_pandas(df), ["k"], "v",
                     method="row_number")


def test_unpivot_matches_sql_and_melt(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.olap import unpivot, unpivot_oracle_sql

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "id": np.arange(200, dtype="int64"),
        "a": rng.integers(0, 9, 200).astype("int64"),
        "b": rng.random(200),
        "c": rng.integers(-5, 5, 200).astype("float64"),
    })
    got = (unpivot(rd.from_pandas(df).repartition(3), ["id"],
                   ["a", "b", "c"])
           .to_pandas().sort_values(["id", "variable"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = (con.sql(unpivot_oracle_sql("(SELECT * FROM t)", ["id"],
                                       ["a", "b", "c"]))
            .df().sort_values(["id", "variable"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # pandas melt reference
    ref = (df.assign(a=df["a"].astype(float))
           .melt(id_vars=["id"], value_vars=["a", "b", "c"])
           .sort_values(["id", "variable"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    assert len(got) == 3 * len(df)
