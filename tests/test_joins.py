"""stages/joins.py: as-of join, broadcast range join, broadcast hash join.

Each operator is checked against a plain single-process pandas reference
(merge_asof / interval scan / merge) on inputs engineered for the edge
cases: tie groups, unmatched rows, keys only on one side, both
directions, and the int64-stays-int64 contract for nullable payloads.
"""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pdf_extract_ray.stages.joins import (
    asof_join,
    broadcast_hash_join,
    broadcast_range_join,
)


def _left_df():
    rng = np.random.RandomState(7)
    n = 400
    return pd.DataFrame({
        "k": rng.randint(0, 12, n).astype("int64"),
        "t": rng.randint(0, 1000, n).astype("int64"),
        "lid": np.arange(n, dtype="int64"),
    })


def _right_df():
    rng = np.random.RandomState(8)
    n = 150
    df = pd.DataFrame({
        "rk": rng.randint(0, 15, n).astype("int64"),  # keys 12-14 unmatched
        "rt": rng.randint(0, 1000, n).astype("int64"),
        "rid": np.arange(n, dtype="int64") + 10_000_000_000,  # > 2^31
        "val": rng.rand(n),
    })
    # force (rk, rt) ties so the tie_break contract is exercised
    dup = df.iloc[:10].copy()
    dup["rid"] += 5000
    dup["val"] += 1.0
    return pd.concat([df, dup], ignore_index=True)


def _expected(left, right, direction, how):
    r = (right.sort_values(["rk", "rt", "rid"], kind="mergesort")
              .drop_duplicates(["rk", "rt"], keep="last"))
    m = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        r.sort_values("rt", kind="mergesort"),
        left_on="t", right_on="rt", left_by="k", right_by="rk",
        direction=direction)
    m = m.drop(columns=["rk", "rt"])
    if how == "inner":
        m = m[m["rid"].notna()]
    return m


@pytest.mark.parametrize("direction,how", [
    ("backward", "left"), ("backward", "inner"), ("forward", "left")])
def test_asof_join_matches_merge_asof(ray_session, direction, how):
    left, right = _left_df(), _right_df()
    out_ds = asof_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(4),
        on="t", by="k", right_on="rt", right_by="rk",
        right_cols=["rid", "val"], tie_break="rid",
        direction=direction, how=how, num_buckets=6,
    )
    # int64 payload must stay int64 at the Arrow level (nullable), not
    # decay to float — the driver compares schemas through Arrow
    schema = out_ds.schema()
    assert str(dict(zip(schema.names, schema.types))["rid"]) == "int64"
    out = out_ds.to_pandas()

    exp = _expected(left, right, direction, how)
    cols = ["k", "t", "lid", "rid", "val"]
    got = out[cols].sort_values(["lid"], kind="mergesort").reset_index(drop=True)
    exp = exp[cols].sort_values(["lid"], kind="mergesort").reset_index(drop=True)
    got["rid"] = got["rid"].astype("float64")
    exp["rid"] = exp["rid"].astype("float64")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_join_deterministic_across_parallelism(ray_session):
    left, right = _left_df(), _right_df()
    outs = []
    for nb, parts in [(2, 1), (16, 8)]:
        o = asof_join(
            rd.from_pandas(left).repartition(parts),
            rd.from_pandas(right).repartition(parts),
            on="t", by="k", right_on="rt", right_by="rk",
            right_cols=["rid"], tie_break="rid", num_buckets=nb,
        ).to_pandas().sort_values("lid").reset_index(drop=True)
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_asof_join_key_dtype_mismatch_raises(ray_session):
    left = rd.from_pandas(_left_df())
    bad = _right_df().assign(rk=lambda d: d["rk"].astype("int32"))
    with pytest.raises(TypeError):
        asof_join(left, rd.from_pandas(bad), on="t", by="k",
                  right_on="rt", right_by="rk", right_cols=["rid"])


TIERS = pd.DataFrame({
    "tier": ["a", "b", "c"],
    "lo": [0.0, 10.0, 50.0],
    "hi": [10.0, 50.0, 100.0],
})


def test_range_join_inner_and_left(ray_session):
    df = pd.DataFrame({"x": [-5.0, 0.0, 9.999, 10.0, 49.0, 99.0, 100.0, 250.0],
                       "i": np.arange(8, dtype="int64")})
    ds = rd.from_pandas(df).repartition(3)
    inner = broadcast_range_join(
        ds, TIERS, value_col="x", lo_col="lo", hi_col="hi", how="inner"
    ).to_pandas().sort_values("i")
    assert list(inner["i"]) == [1, 2, 3, 4, 5]
    assert list(inner["tier"]) == ["a", "a", "b", "b", "c"]

    left = broadcast_range_join(
        ds, TIERS, value_col="x", lo_col="lo", hi_col="hi", how="left"
    ).to_pandas().sort_values("i")
    assert len(left) == 8
    assert left["tier"].isna().tolist() == [True, False, False, False,
                                            False, False, True, True]


def test_range_join_rejects_overlap(ray_session):
    bad = pd.DataFrame({"tier": ["a", "b"], "lo": [0.0, 5.0], "hi": [6.0, 9.0]})
    with pytest.raises(ValueError, match="overlap"):
        broadcast_range_join(rd.range(3), bad, value_col="id",
                             lo_col="lo", hi_col="hi")


def test_broadcast_hash_join_left_inner_and_unique_check(ray_session):
    big = pd.DataFrame({"k": [1, 2, 3, 2, 9], "i": np.arange(5, dtype="int64")})
    dim = pd.DataFrame({"dk": [1, 2, 3], "name": ["x", "y", "z"],
                        "code": np.array([7, 8, 9], dtype="int64")})
    ds = rd.from_pandas(big).repartition(2)

    left = broadcast_hash_join(
        ds, dim, on="k", right_on="dk", payload_cols=["name", "code"],
        how="left").to_pandas().sort_values("i")
    assert list(left["name"])[:4] == ["x", "y", "z", "y"]
    assert pd.isna(list(left["name"])[4])
    assert str(left["code"].dtype) == "Int64"  # no float decay on the miss

    inner = broadcast_hash_join(
        ds, dim, on="k", right_on="dk", how="inner").to_pandas()
    assert len(inner) == 4

    with pytest.raises(ValueError, match="unique"):
        broadcast_hash_join(ds, pd.concat([dim, dim]), on="k", right_on="dk")


def test_interval_join_overlapping_matches_bruteforce(ray_session):
    from pdf_extract_ray.stages.joins import broadcast_interval_join

    rng = np.random.RandomState(11)
    big = pd.DataFrame({"v": rng.uniform(-20, 120, 500),
                        "i": np.arange(500, dtype="int64")})
    iv = pd.DataFrame({
        "lo": [0.0, 10.0, 10.0, 50.0, 90.0],
        "hi": [40.0, 60.0, 25.0, 100.0, 95.0],
        "bid": np.arange(5, dtype="int64"),
    })
    got = (broadcast_interval_join(
        rd.from_pandas(big).repartition(4), iv,
        value_col="v", lo_col="lo", hi_col="hi")
        .to_pandas().sort_values(["i", "bid"]).reset_index(drop=True))
    # brute-force reference: cross product filtered
    ref = big.merge(iv, how="cross")
    ref = (ref[(ref["v"] >= ref["lo"]) & (ref["v"] < ref["hi"])]
           [["v", "i", "bid"]]
           .sort_values(["i", "bid"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["v", "i", "bid"]], ref)
    # rows can match several overlapping bands
    assert (got.groupby("i").size() > 1).any()


def test_interval_join_left_and_validation(ray_session):
    from pdf_extract_ray.stages.joins import broadcast_interval_join

    big = pd.DataFrame({"v": [-5.0, 5.0, 15.0, 99.0],
                        "i": np.arange(4, dtype="int64")})
    iv = pd.DataFrame({"lo": [0.0, 10.0], "hi": [20.0, 30.0],
                       "name": ["a", "b"]})
    left = (broadcast_interval_join(
        rd.from_pandas(big), iv, value_col="v", lo_col="lo", hi_col="hi",
        how="left").to_pandas().sort_values(["i", "name"])
        .reset_index(drop=True))
    # v=-5 and v=99 survive with null payload; v=15 matches both bands
    assert len(left) == 5
    assert left.loc[left["i"] == 0, "name"].isna().all()
    assert left.loc[left["i"] == 3, "name"].isna().all()
    assert sorted(left.loc[left["i"] == 2, "name"]) == ["a", "b"]
    inner = broadcast_interval_join(
        rd.from_pandas(big), iv, value_col="v", lo_col="lo",
        hi_col="hi").to_pandas()
    assert sorted(inner["i"].unique()) == [1, 2]
    with pytest.raises(ValueError, match="inverted"):
        broadcast_interval_join(
            rd.from_pandas(big),
            pd.DataFrame({"lo": [5.0], "hi": [5.0], "name": ["x"]}),
            value_col="v", lo_col="lo", hi_col="hi")
    with pytest.raises(ValueError, match="how"):
        broadcast_interval_join(rd.from_pandas(big), iv, value_col="v",
                                lo_col="lo", hi_col="hi", how="outer")


def test_interval_join_agrees_with_range_join_when_disjoint(ray_session):
    from pdf_extract_ray.stages.joins import broadcast_interval_join

    rng = np.random.RandomState(13)
    big = pd.DataFrame({"v": rng.uniform(0, 100, 300),
                        "i": np.arange(300, dtype="int64")})
    iv = pd.DataFrame({"lo": [0.0, 25.0, 50.0], "hi": [25.0, 50.0, 75.0],
                       "tag": ["p", "q", "r"]})
    a = (broadcast_interval_join(rd.from_pandas(big).repartition(3), iv,
                                 value_col="v", lo_col="lo", hi_col="hi")
         .to_pandas().sort_values("i").reset_index(drop=True))
    b = (broadcast_range_join(rd.from_pandas(big).repartition(3), iv,
                              value_col="v", lo_col="lo", hi_col="hi",
                              how="inner")
         .to_pandas().sort_values("i").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_bloom_filtered_join_equals_plain_join(ray_session):
    from pdf_extract_ray.stages.joins import bloom_filtered_join

    rng = np.random.RandomState(29)
    left = pd.DataFrame({
        "k": rng.randint(0, 5000, 3000).astype("int64"),
        "lid": np.arange(3000, dtype="int64"),
    })
    right = pd.DataFrame({
        "rk": (np.arange(40, dtype="int64") * 53) % 5000,
        "name": [f"r{i}" for i in range(40)],
    }).drop_duplicates("rk")
    got = (bloom_filtered_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right), on="k", right_on="rk",
        num_partitions=4)
        .to_pandas().sort_values("lid").reset_index(drop=True))
    ref = (left.merge(right, left_on="k", right_on="rk", how="inner")
           .sort_values("lid").reset_index(drop=True))
    assert got["lid"].tolist() == ref["lid"].tolist()
    assert got["name"].tolist() == ref["name"].tolist()
    # the probe genuinely filters: most of the 3000 left rows never
    # reach the join (40/5000 keys match; FPR is bounded by the fill)
    assert len(got) == len(ref) < 300


def test_asof_join_nearest_with_tolerance_matches_pandas(ray_session):
    left = _left_df()
    rng = np.random.RandomState(11)
    right = pd.DataFrame({
        "k": rng.randint(0, 12, 150).astype("int64"),
        "t": rng.randint(0, 1000, 150).astype("int64"),
        "v": rng.randint(0, 500, 150).astype("int64"),
    }).drop_duplicates(["k", "t"]).reset_index(drop=True)
    for tol in (None, 30, 120):
        got = (asof_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(3),
            on="t", by="k", direction="nearest", tolerance=tol)
            .to_pandas().sort_values(["k", "t", "lid"])
            .reset_index(drop=True))
        want = (pd.merge_asof(
            left.sort_values("t", kind="mergesort"),
            right.sort_values("t", kind="mergesort"),
            on="t", by="k", direction="nearest", tolerance=tol)
            .sort_values(["k", "t", "lid"]).reset_index(drop=True))
        assert len(got) == len(want)
        np.testing.assert_array_equal(
            got["v"].to_numpy(dtype="float64"),
            want["v"].to_numpy(dtype="float64"))


def test_asof_join_nearest_tie_goes_backward(ray_session):
    # equidistant right rows: the EARLIER one wins (frozen pandas rule
    # the nearest_event_order SQL oracle mirrors)
    left = pd.DataFrame({"k": [1], "t": [10], "lid": [0]})
    right = pd.DataFrame({"k": [1, 1], "t": [5, 15],
                          "v": np.array([100, 200], dtype="int64")})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="t", by="k", direction="nearest").to_pandas()
    assert got["v"].iloc[0] == 100  # t=5, the earlier (backward) row
    # inclusive tolerance boundary: distance 5 matches at tol=5,
    # not at tol=4
    got5 = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     on="t", by="k", direction="nearest",
                     tolerance=5).to_pandas()
    assert got5["v"].iloc[0] == 100
    got4 = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     on="t", by="k", direction="nearest",
                     tolerance=4).to_pandas()
    assert pd.isna(got4["v"].iloc[0])


def test_asof_join_rejects_bad_direction(ray_session):
    left = pd.DataFrame({"k": [1], "t": [10]})
    with pytest.raises(ValueError, match="nearest"):
        asof_join(rd.from_pandas(left), rd.from_pandas(left),
                  on="t", by="k", direction="sideways")


def test_skew_salted_join_equals_plain_join(ray_session):
    from pdf_extract_ray.stages.joins import skew_salted_join

    rng = np.random.RandomState(5)
    # heavy skew: key 3 holds ~60% of the left side
    k = np.where(rng.rand(4000) < 0.6, 3,
                 rng.randint(0, 25, 4000)).astype("int64")
    left = pd.DataFrame({"k": k, "lid": np.arange(4000, dtype="int64"),
                         "v": rng.randint(0, 9, 4000).astype("int64")})
    # right misses some keys (20..24) so unmatched-left drops are covered
    right = pd.DataFrame({"rk": np.arange(0, 20, dtype="int64"),
                          "code": np.arange(100, 120, dtype="int64")})
    got = (skew_salted_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(2),
        on="k", right_on="rk", salt_col="lid", salts=4,
        hot_threshold=200)
        .to_pandas().sort_values("lid").reset_index(drop=True))
    want = (left.merge(right, left_on="k", right_on="rk", how="inner")
            .sort_values("lid").reset_index(drop=True))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[["k", "lid", "v", "code"]],
                                  want[["k", "lid", "v", "code"]],
                                  check_dtype=False)
    # no-hot-keys path: threshold higher than any key count
    got2 = (skew_salted_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(2),
        on="k", right_on="rk", salt_col="lid", salts=4,
        hot_threshold=10_000_000)
        .to_pandas().sort_values("lid").reset_index(drop=True))
    pd.testing.assert_frame_equal(got2[["k", "lid", "v", "code"]],
                                  want[["k", "lid", "v", "code"]],
                                  check_dtype=False)
    with pytest.raises(ValueError):
        skew_salted_join(rd.from_pandas(left), rd.from_pandas(right),
                         on="k", right_on="rk", salt_col="lid", salts=1)


# --- distributed band join ---------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 5])
def test_band_join_matches_bruteforce_and_sql(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.joins import band_join, band_join_oracle_sql

    rng = np.random.default_rng(33)
    lf = pd.DataFrame({
        "v": rng.integers(-50, 50, 80).astype(np.int64),
        "lid": np.arange(80, dtype=np.int64)})
    rt = pd.DataFrame({
        "w": rng.integers(-60, 60, 90).astype(np.int64),
        "rid": np.arange(90, dtype=np.int64)})
    for eps in (1, 7):
        got = (band_join(rd.from_pandas(lf).repartition(blocks),
                         rd.from_pandas(rt).repartition(blocks),
                         "v", "w", eps=eps, left_cols=["lid"],
                         right_cols=["rid"])
               .to_pandas().sort_values(["l_lid", "r_rid"])
               .reset_index(drop=True))
        # brute force: EVERY qualifying pair exactly once
        want = []
        for _, l in lf.iterrows():
            for _, r in rt.iterrows():
                if abs(l["v"] - r["w"]) <= eps:
                    want.append((l["v"], r["w"], l["lid"], r["rid"]))
        wdf = (pd.DataFrame(want, columns=["l_v", "r_w", "l_lid",
                                           "r_rid"])
               .sort_values(["l_lid", "r_rid"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, wdf, check_dtype=False)
        con = duckdb.connect()
        con.register("lf", lf)
        con.register("rt", rt)
        sql = band_join_oracle_sql("SELECT * FROM lf", "SELECT * FROM rt",
                                   "v", "w", eps=eps, left_cols=["lid"],
                                   right_cols=["rid"])
        want_sql = (con.sql(sql).df().sort_values(["l_lid", "r_rid"])
                    .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want_sql, check_dtype=False)
    with pytest.raises(ValueError):
        band_join(rd.from_pandas(lf), rd.from_pandas(rt), "v", "w",
                  eps=0)
