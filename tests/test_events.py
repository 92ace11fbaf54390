"""stages/events.py: funnel progression and cohort retention.

Both checked against crafted fixtures with known answers, a DuckDB SQL
mirror, and across topologies (repartition / num_buckets must not change
results).
"""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pdf_extract_ray.stages.events import (
    cohort_retention,
    cohort_retention_oracle_sql,
    funnel,
    funnel_oracle_sql,
)

T0 = pd.Timestamp("2024-01-01")


def _m(minutes):
    return T0 + pd.Timedelta(minutes=minutes)


def test_funnel_semantics_crafted(ray_session):
    rows = pd.DataFrame({
        # u1: full funnel; u2: b before a only (chain breaks at step 2);
        # u3: a only; u4: never does a (no row); u5: a,b,c but c before b
        "user_id": [1, 1, 1, 2, 2, 3, 4, 5, 5, 5],
        "event_type": ["a", "b", "c", "b", "a", "a", "x", "a", "c", "b"],
        "ts": [_m(0), _m(10), _m(20), _m(5), _m(30), _m(1), _m(2),
               _m(0), _m(5), _m(10)],
    })
    got = (funnel(rd.from_pandas(rows).repartition(3), ["a", "b", "c"])
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert got["user_id"].tolist() == [1, 2, 3, 5]
    assert got["steps_completed"].tolist() == [3, 1, 1, 2]
    assert got.loc[0, "t3"] == _m(20)
    # u2's b at minute 5 precedes their a at 30: step 2 unreached
    assert pd.isna(got.loc[1, "t2"]) and pd.isna(got.loc[1, "t3"])
    # u5 reaches b at minute 10 but their only c (minute 5) is before it
    assert got.loc[3, "t2"] == _m(10) and pd.isna(got.loc[3, "t3"])


def test_funnel_within_window_and_validation(ray_session):
    rows = pd.DataFrame({
        "user_id": [1, 1, 2, 2],
        "event_type": ["a", "b", "a", "b"],
        "ts": [_m(0), _m(30), _m(0), _m(90)],
    })
    got = (funnel(rd.from_pandas(rows), ["a", "b"], within="1h")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # u1's b lands inside the hour; u2's does not
    assert got["steps_completed"].tolist() == [2, 1]
    with pytest.raises(ValueError, match="2 steps"):
        funnel(rd.from_pandas(rows), ["a"])


def test_funnel_sql_parity_and_topology(ray_session):
    import duckdb

    rng = np.random.RandomState(17)
    n = 1200
    df = pd.DataFrame({
        "user_id": rng.randint(0, 60, n).astype("int64"),
        "event_type": rng.choice(["a", "b", "c", "z"], n),
        "ts": T0 + pd.to_timedelta(
            rng.choice(10_000_000, n, replace=False), unit="s"),
    })
    a = (funnel(rd.from_pandas(df).repartition(4), ["a", "b", "c"])
         .to_pandas().sort_values("user_id").reset_index(drop=True))
    b = (funnel(rd.from_pandas(df).repartition(9), ["a", "b", "c"],
                num_buckets=32)
         .to_pandas().sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.register("t", df)
    want = (con.sql(funnel_oracle_sql(
        "(SELECT user_id, ts, event_type FROM t)", ["a", "b", "c"]))
        .df().sort_values("user_id").reset_index(drop=True))
    for c in ("t1", "t2", "t3"):  # duckdb returns ns, engine emits us
        want[c] = want[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(a[sorted(a.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)


def test_cohort_retention_crafted_and_sql(ray_session):
    import duckdb

    # two cohorts: u1/u2 first in week W, u3 in week W+1; u1 returns in
    # W+1 and W+2, u2 never returns, u3 returns in W+2
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 3, 3],
        "ts": [T0, T0 + pd.Timedelta(days=8), T0 + pd.Timedelta(days=15),
               T0 + pd.Timedelta(days=1), T0 + pd.Timedelta(days=9),
               T0 + pd.Timedelta(days=16)],
    })
    got = (cohort_retention(rd.from_pandas(df).repartition(2),
                            period_days=7)
           .to_pandas().sort_values(["cohort", "period_offset"])
           .reset_index(drop=True))
    w = (T0 - pd.Timestamp("1970-01-01")).days // 7
    exp = pd.DataFrame({
        "cohort": np.array([w, w, w, w + 1, w + 1], dtype="int64"),
        "period_offset": np.array([0, 1, 2, 0, 1], dtype="int64"),
        "n_users": np.array([2, 1, 1, 1, 1], dtype="int64"),
    })
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    con = duckdb.connect()
    con.register("t", df)
    want = (con.sql(cohort_retention_oracle_sql(
        "(SELECT user_id, ts FROM t)", period_days=7))
        .df().sort_values(["cohort", "period_offset"])
        .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(ValueError, match="period_days"):
        cohort_retention(rd.from_pandas(df), period_days=0)


def test_cohort_retention_topology_independent(ray_session):
    rng = np.random.RandomState(23)
    df = pd.DataFrame({
        "user_id": rng.randint(0, 80, 2000).astype("int64"),
        "ts": T0 + pd.to_timedelta(rng.randint(0, 60 * 86400, 2000),
                                   unit="s"),
    })
    a = (cohort_retention(rd.from_pandas(df).repartition(3), period_days=10)
         .to_pandas().sort_values(["cohort", "period_offset"])
         .reset_index(drop=True))
    b = (cohort_retention(rd.from_pandas(df).repartition(11),
                          period_days=10, num_buckets=64)
         .to_pandas().sort_values(["cohort", "period_offset"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # offset-0 row of each cohort counts exactly its cohort members
    first = (a[a["period_offset"] == 0].set_index("cohort")["n_users"])
    days = df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
    ref = (pd.DataFrame({"u": df["user_id"], "p": days // 10})
           .groupby("u")["p"].min().value_counts().sort_index())
    assert first.sort_index().tolist() == ref.tolist()


# --- cumulative distinct users -----------------------------------------------

@pytest.mark.parametrize("blocks", [1, 5])
def test_cumulative_users_matches_reference_and_sql(ray_session, blocks):
    import duckdb

    from pdf_extract_ray.stages.events import (
        cumulative_users, cumulative_users_oracle_sql)

    rng = np.random.default_rng(19)
    base = np.datetime64("2024-03-01T12:00:00", "us")
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, 300).astype(np.int64),
        "ts": base + rng.integers(0, 10 * 86_400_000_000, 300).astype(
            "timedelta64[us]")})
    got = cumulative_users(rd.from_pandas(df).repartition(blocks),
                           "user_id", "ts")
    first = df.assign(
        day=df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
    ).groupby("user_id")["day"].min()
    per = first.value_counts().sort_index()
    want = pd.DataFrame({"day": per.index.to_numpy(np.int64),
                         "n_new": per.to_numpy(np.int64)})
    want["cum_users"] = want["n_new"].cumsum()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)
    assert got["cum_users"].iloc[-1] == df["user_id"].nunique()
    con = duckdb.connect()
    con.register("t", df)
    sql = cumulative_users_oracle_sql("SELECT * FROM t", "user_id", "ts")
    want_sql = con.sql(sql).df().sort_values("day").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want_sql,
                                  check_dtype=False)


def test_item_cooccurrence_lift_and_parity(ray_session):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.events import (
        item_cooccurrence,
        item_cooccurrence_oracle_sql,
    )

    # 4 users: x+y together twice, x alone once, z with x once;
    # duplicate rows must not inflate anything
    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2, 3, 4, 4],
        "it": ["x", "y", "y", "x", "y", "x", "x", "z"],
    })
    for parts in (1, 4):
        got = (item_cooccurrence(rd.from_pandas(df).repartition(parts),
                                 "u", "it")
               .to_pandas().sort_values(["item_a", "item_b"])
               .reset_index(drop=True))
        assert got[["item_a", "item_b"]].values.tolist() == \
            [["x", "y"], ["x", "z"]]
        assert got["n_both"].tolist() == [2, 1]
        assert got["n_a"].tolist() == [4, 4]
        assert got["n_b"].tolist() == [2, 1]
        # lift(x,y) = 2*4/(4*2) = 1.0; lift(x,z) = 1*4/(4*1) = 1.0
        assert got["lift"].tolist() == [1.0, 1.0]
    con = duckdb.connect()
    con.register("t", df)
    want = (con.sql(item_cooccurrence_oracle_sql("SELECT * FROM t",
                                                 "u", "it")).df()
            .sort_values(["item_a", "item_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
