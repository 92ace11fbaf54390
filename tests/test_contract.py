"""Data-contract validation (stages/contract.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_validate_table_and_sql_parity(ray_session):
    from pdf_extract_ray.stages.contract import (
        validate_table,
        validate_table_oracle_sql,
    )

    df = pd.DataFrame({
        "id": [1, 2, 2, 3, 4, 5, 5, 5, None, 7],
        "score": [0.5, -1.0, 2.0, 0.1, None, 9.9, 0.0, 1.0, 0.2, 0.3],
        "status": ["ok", "ok", "bad", None, "ok", "ok", "meh", "ok",
                   "ok", "ok"],
        "code": ["A-1", "B-2", "xx", "A-9", None, "C-3", "D-4", "E-5",
                 "F-6", "zz"],
    })
    got = (validate_table(
        rd.from_pandas(df).repartition(4),
        not_null=["id", "status"],
        ranges={"score": (0.0, 1.0)},
        patterns={"code": "[A-Z]-[0-9]"},
        allowed={"status": ["ok", "meh"]},
        unique=["id"])
        .to_pandas().sort_values("rule").reset_index(drop=True))
    # hand-computed: id has 1 null + 3 duplicate copies (2x2, 5x3 ->
    # 1 + 2 extra); score out of [0,1]: -1.0, 2.0, 9.9; code not
    # X-9 shape: xx, zz; status not in enum: bad (nulls excluded)
    want_vals = {
        "not_null:id": 1, "not_null:status": 1, "range:score": 3,
        "pattern:code": 2, "allowed:status": 1, "unique:id": 3,
    }
    assert dict(zip(got["rule"], got["n_violations"])) == want_vals
    con = duckdb.connect()
    con.register("src", df)
    want = (con.sql(validate_table_oracle_sql(
        "SELECT * FROM src",
        not_null=["id", "status"],
        ranges={"score": (0.0, 1.0)},
        patterns={"code": "[A-Z]-[0-9]"},
        allowed={"status": ["ok", "meh"]},
        unique=["id"]))
        .df().sort_values("rule").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_validate_table_clean_data_reports_zeroes(ray_session):
    from pdf_extract_ray.stages.contract import validate_table

    df = pd.DataFrame({"id": np.arange(50), "v": np.linspace(0, 1, 50)})
    got = (validate_table(rd.from_pandas(df),
                          not_null=["id"], ranges={"v": (0.0, 1.0)},
                          unique=["id"]).to_pandas())
    assert len(got) == 3 and (got["n_violations"] == 0).all()


# --- ANALYZE column profile --------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 5])
def test_analyze_columns_matches_reference_and_sql(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.contract import (
        analyze_columns, analyze_columns_oracle_sql)

    rng = np.random.default_rng(41)
    df = pd.DataFrame({
        "a": rng.integers(0, 9, 200).astype("int64"),
        "b": rng.choice(["x", "y", "z", None], 200),
        "c": rng.normal(0, 1, 200).round(2)})
    df.loc[rng.choice(200, 30, replace=False), "c"] = np.nan
    got = analyze_columns(rd.from_pandas(df).repartition(blocks),
                          ["a", "b", "c"])
    for col in ("a", "b", "c"):
        row = got[got["col"] == col].iloc[0]
        assert row["n_rows"] == 200
        assert row["n_nulls"] == int(df[col].isna().sum())
        assert row["n_distinct"] == df[col].dropna().nunique()
    con = duckdb.connect()
    con.register("t", df)
    sql = analyze_columns_oracle_sql("SELECT * FROM t", ["a", "b", "c"])
    want = con.sql(sql).df().sort_values("col").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
