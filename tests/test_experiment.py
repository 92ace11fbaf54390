"""Time-decay scoring and Welch A/B test (stages/experiment.py) vs
plain-python references, plus parallelism-independence checks."""

import math

import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.stages.experiment import decayed_group_scores, welch_ab_test


def _events(n=400, seed=7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    return pd.DataFrame({
        "key": rng.choice(["a", "b", "c"], size=n),
        "ts": base + rng.integers(0, 30 * 86_400_000_000, size=n).astype(
            "timedelta64[us]"),
        "arm": rng.integers(0, 2, size=n),
        "v": rng.integers(-5, 50, size=n).astype(np.float64),
    })


def _decay_reference(df: pd.DataFrame, hl_days: int, cap: int) -> dict:
    ref = df["ts"].max()
    out: dict = {}
    for _, r in df.iterrows():
        age_us = int((ref - r["ts"]) / np.timedelta64(1, "us"))
        k = min(age_us // (hl_days * 86_400_000_000), cap)
        n, w = out.get(r["key"], (0, 0))
        out[r["key"]] = (n + 1, w + (1_000_000 >> k))
    return out


@pytest.mark.parametrize("blocks", [1, 7])
def test_decayed_scores_match_reference(ray_session, blocks):
    import ray.data as rd

    df = _events()
    got = (decayed_group_scores(
        rd.from_pandas(df).repartition(blocks), ["key"], "ts",
        half_life_days=2, cap_shifts=20)
        .to_pandas().sort_values("key").reset_index(drop=True))
    want = _decay_reference(df, 2, 20)
    assert list(got["key"]) == sorted(want)
    for _, r in got.iterrows():
        n, w = want[r["key"]]
        assert r["n_events"] == n
        assert r["decayed_ppm"] == w
        assert r["decayed_score"] == w / 1e6


def test_decayed_scores_cap_and_fresh_row(ray_session):
    import ray.data as rd

    base = np.datetime64("2024-03-01T00:00:00", "us")
    df = pd.DataFrame({
        "key": ["x", "x", "x"],
        "ts": [base, base - np.timedelta64(1, "D"),
               base - np.timedelta64(400, "D")],
    })
    got = decayed_group_scores(rd.from_pandas(df), ["key"], "ts",
                               half_life_days=1, cap_shifts=20).to_pandas()
    # fresh row weight 1e6, 1-day-old 5e5, 400-day-old capped to 1e6>>20 == 0
    assert int(got["decayed_ppm"].iloc[0]) == 1_000_000 + 500_000 + 0


def _welch_reference(df: pd.DataFrame) -> dict:
    out = {}
    for key, g in df.groupby("key"):
        a = g.loc[g["arm"] == 0, "v"].astype(np.int64)
        b = g.loc[g["arm"] == 1, "v"].astype(np.int64)
        if len(a) < 2 or len(b) < 2:
            out[key] = (len(a), len(b), None, None)
            continue
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(se2)
        df_w = se2 ** 2 / ((va / len(a)) ** 2 / (len(a) - 1)
                           + (vb / len(b)) ** 2 / (len(b) - 1))
        out[key] = (len(a), len(b), t, df_w)
    return out


@pytest.mark.parametrize("blocks", [1, 5])
def test_welch_matches_reference(ray_session, blocks):
    import ray.data as rd

    df = _events(seed=11)
    got = welch_ab_test(rd.from_pandas(df).repartition(blocks),
                        ["key"], "arm", "v")
    want = _welch_reference(df)
    assert set(got["key"]) == set(want)
    for _, r in got.iterrows():
        na, nb, t, dfw = want[r["key"]]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["t_stat"] == pytest.approx(t, rel=1e-12)
        assert r["welch_df"] == pytest.approx(dfw, rel=1e-12)


def test_welch_degenerate_arm_gives_null(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"key": ["k"] * 4, "arm": [0, 0, 0, 1],
                       "v": [1.0, 2.0, 3.0, 4.0]})
    got = welch_ab_test(rd.from_pandas(df), ["key"], "arm", "v")
    assert np.isnan(got["t_stat"].iloc[0])
    assert np.isnan(got["welch_df"].iloc[0])
    assert got["mean_b"].iloc[0] == 4.0


def test_welch_zero_variance_gives_null(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"key": ["k"] * 6, "arm": [0, 0, 0, 1, 1, 1],
                       "v": [2.0] * 6})
    got = welch_ab_test(rd.from_pandas(df), ["key"], "arm", "v")
    assert np.isnan(got["t_stat"].iloc[0])


def _auc_pairwise(v: np.ndarray, pos: np.ndarray) -> float:
    """Naive O(n^2) pair-counting AUC reference (ties count half)."""
    vp, vn = v[pos == 1], v[pos == 0]
    wins = (vp[:, None] > vn[None, :]).sum()
    ties = (vp[:, None] == vn[None, :]).sum()
    return (wins + 0.5 * ties) / (len(vp) * len(vn))


@pytest.mark.parametrize("blocks", [1, 9])
def test_rank_auc_matches_pairwise_and_sql(ray_session, blocks):
    import duckdb

    import ray.data as rd

    from pdf_extract_ray.stages.experiment import rank_auc, rank_auc_oracle_sql

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "key": rng.choice(["a", "b"], size=n),
        # heavy ties on purpose: scores in a small integer codomain
        "v": rng.integers(0, 12, size=n),
        "pos": rng.integers(0, 2, size=n),
    })
    # one single-class group (NULL auc)
    df = pd.concat([df, pd.DataFrame(
        {"key": ["z"] * 4, "v": [1, 2, 3, 4], "pos": [1, 1, 1, 1]})],
        ignore_index=True)
    got = (rank_auc(rd.from_pandas(df).repartition(blocks), ["key"],
                    "v", "pos")
           .to_pandas().sort_values("key").reset_index(drop=True))
    for _, r in got[got["key"] != "z"].iterrows():
        sub = df[df["key"] == r["key"]]
        ref = _auc_pairwise(sub["v"].to_numpy(), sub["pos"].to_numpy())
        assert abs(r["auc"] - ref) < 1e-12
        assert r["n_pos"] == int(sub["pos"].sum())
        assert r["n_neg"] == len(sub) - int(sub["pos"].sum())
    assert pd.isna(got[got["key"] == "z"]["auc"]).all()
    con = duckdb.connect()
    con.register("t", df)
    want = (con.sql(rank_auc_oracle_sql("SELECT * FROM t", ["key"],
                                        "v", "pos"))
            .df().sort_values("key").reset_index(drop=True))
    gv, wv = got["auc"].to_numpy(), want["auc"].to_numpy()
    assert (np.isnan(gv) == np.isnan(wv)).all()
    # single-division finish on an exact int numerator: bit parity
    assert (gv[~np.isnan(gv)] == wv[~np.isnan(wv)]).all()


def test_psi_drift_reference_and_nulls(ray_session):
    import duckdb

    import ray.data as rd

    from pdf_extract_ray.stages.experiment import psi_drift, psi_drift_oracle_sql

    df = pd.DataFrame({
        "cat": ["x"] * 6 + ["y"] * 3 + ["w"] * 2 + ["only_a"] * 2
               + ["only_b"] * 3,
        "snap": [0, 0, 0, 1, 1, 1,   # x balanced
                 0, 1, 1,            # y shifted
                 0, 1,               # w
                 0, 0,               # only in snapshot a
                 1, 1, 1],           # only in snapshot b
    })
    got = (psi_drift(rd.from_pandas(df).repartition(4), "cat", "snap")
           .sort_values("cat").reset_index(drop=True))
    # plain reference
    na_tot = (df["snap"] == 0).sum()
    nb_tot = (df["snap"] == 1).sum()
    for _, r in got.iterrows():
        sub = df[df["cat"] == r["cat"]]
        na = int((sub["snap"] == 0).sum())
        nb = int((sub["snap"] == 1).sum())
        assert r["n_a"] == na and r["n_b"] == nb
        if na and nb:
            pa, pb = na / na_tot, nb / nb_tot
            want = (pa - pb) * math.log(pa / pb)
            assert abs(r["psi_term"] - want) < 1e-6
        else:
            assert pd.isna(r["psi_term"])
    con = duckdb.connect()
    con.register("t", df)
    sql = (con.sql(psi_drift_oracle_sql("SELECT * FROM t", "cat", "snap"))
           .df().sort_values("cat").reset_index(drop=True))
    gv, wv = got["psi_term"].to_numpy(), sql["psi_term"].to_numpy()
    assert (np.isnan(gv) == np.isnan(wv)).all()
    assert (gv[~np.isnan(gv)] == wv[~np.isnan(wv)]).all()


# --- grouped entropy terms ---------------------------------------------------

def _entropy_reference(df, key, cat):
    rows = []
    for k, g in df.groupby(key):
        tot = len(g)
        for c, n in sorted(g[cat].value_counts().items()):
            p = n / tot
            t = -p * math.log(p)
            t = math.copysign(math.floor(abs(t) * 1e6 + 0.5) / 1e6, t)
            rows.append((k, c, n, tot, t))
    return pd.DataFrame(rows, columns=[key, cat, "n", "n_group",
                                       "entropy_term"])


@pytest.mark.parametrize("blocks", [1, 6])
def test_grouped_entropy_terms_matches_reference_and_sql(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.experiment import (
        grouped_entropy_terms, grouped_entropy_terms_oracle_sql)

    df = _events(300, seed=9).rename(columns={"key": "grp", "arm": "cat"})
    df["cat"] = df["cat"].astype(str)
    got = (grouped_entropy_terms(
        rd.from_pandas(df).repartition(blocks), ["grp"], "cat")
        .to_pandas().sort_values(["grp", "cat"]).reset_index(drop=True))
    want = (_entropy_reference(df, "grp", "cat")
            .sort_values(["grp", "cat"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    con = duckdb.connect()
    con.register("t", df[["grp", "cat"]])
    sql = grouped_entropy_terms_oracle_sql("SELECT * FROM t", ["grp"], "cat")
    want_sql = (con.sql(sql).df()
                .sort_values(["grp", "cat"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want_sql, check_dtype=False)
    # single-category group: one term of exactly 0.0
    one = pd.DataFrame({"grp": ["z"] * 5, "cat": ["only"] * 5})
    g1 = (grouped_entropy_terms(rd.from_pandas(one), ["grp"], "cat")
          .to_pandas())
    assert g1["entropy_term"].tolist() == [0.0]


# --- calibration bins --------------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 5])
def test_calibration_bins_matches_reference_and_sql(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.experiment import (
        calibration_bins, calibration_bins_oracle_sql)

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "s": rng.integers(-10, 120, 500).astype(np.int64),  # some out-of-range
        "y": rng.integers(0, 2, 500).astype(np.int64)})
    got = (calibration_bins(rd.from_pandas(df).repartition(blocks),
                            "s", "y", lo=0, hi=100, n_bins=5)
           .sort_values("bin").reset_index(drop=True))
    keep = df[(df["s"] >= 0) & (df["s"] < 100)].copy()
    keep["bin"] = keep["s"] * 5 // 100
    want = (keep.groupby("bin")
            .agg(n=("s", "size"), sum_score=("s", "sum"), n_pos=("y", "sum"))
            .reset_index())
    want["mean_score"] = want["sum_score"] / want["n"]
    want["frac_pos"] = want["n_pos"] / want["n"]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    con = duckdb.connect()
    con.register("t", df)
    sql = calibration_bins_oracle_sql("SELECT * FROM t", "s", "y",
                                      lo=0, hi=100, n_bins=5)
    want_sql = con.sql(sql).df().sort_values("bin").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want_sql, check_dtype=False)
    with pytest.raises(ValueError):
        calibration_bins(rd.from_pandas(df), "s", "y", lo=5, hi=5, n_bins=3)


# --- count gini --------------------------------------------------------------

def test_count_gini_matches_reference_and_sql(ray_session):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.profile import (
        count_gini, count_gini_oracle_sql)

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.zipf(1.6, 400).astype(np.int64) % 37})
    got = count_gini(rd.from_pandas(df).repartition(4), ["k"])
    x = np.sort(df.groupby("k").size().to_numpy(np.int64))
    i = np.arange(1, len(x) + 1)
    want = (2 * (i * x).sum() - (len(x) + 1) * x.sum()) / (len(x) * x.sum())
    assert got["gini"].iloc[0] == want
    assert got["n_groups"].iloc[0] == len(x)
    assert got["n_rows"].iloc[0] == x.sum()
    con = duckdb.connect()
    con.register("t", df)
    sql = count_gini_oracle_sql("SELECT * FROM t", ["k"])
    want_sql = con.sql(sql).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want_sql, check_dtype=False)
    # uniform counts -> gini exactly 0
    uni = pd.DataFrame({"k": np.repeat(np.arange(10), 7)})
    assert count_gini(rd.from_pandas(uni), ["k"])["gini"].iloc[0] == 0.0


# --- k-anonymity audit -------------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 6])
def test_k_anonymity_audit(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.pii import (
        k_anonymity_audit, k_anonymity_audit_oracle_sql)

    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "zip": rng.integers(0, 25, 300).astype(np.int64),
        "age": rng.integers(0, 4, 300).astype(np.int64)})
    got = (k_anonymity_audit(rd.from_pandas(df).repartition(blocks),
                             ["zip", "age"], k=4)
           .to_pandas().sort_values(["zip", "age"]).reset_index(drop=True))
    sizes = df.groupby(["zip", "age"]).size()
    want = (sizes[sizes < 4].rename("n").reset_index()
            .sort_values(["zip", "age"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every reported group really is < k, and none >= k leaked
    assert (got["n"] < 4).all()
    con = duckdb.connect()
    con.register("t", df)
    sql = k_anonymity_audit_oracle_sql("SELECT * FROM t", ["zip", "age"], k=4)
    want_sql = (con.sql(sql).df()
                .sort_values(["zip", "age"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want_sql, check_dtype=False)
    with pytest.raises(ValueError):
        k_anonymity_audit(rd.from_pandas(df), ["zip"], k=1)


# --- chi-squared contingency terms -------------------------------------------

@pytest.mark.parametrize("blocks", [1, 6])
def test_chisq_terms_matches_reference_and_sql(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.experiment import chisq_terms, chisq_terms_oracle_sql

    rng = np.random.default_rng(13)
    n = 500
    df = pd.DataFrame({
        "key": rng.choice(["a", "b"], n),
        "arm": rng.integers(0, 2, n).astype(np.int64),
        # arm-dependent category mix in group a (real dependence)
        "cat": rng.integers(0, 3, n).astype(np.int64),
    })
    df.loc[(df["key"] == "a") & (df["arm"] == 1), "cat"] = rng.integers(
        0, 2, int(((df["key"] == "a") & (df["arm"] == 1)).sum()))
    got = (chisq_terms(rd.from_pandas(df).repartition(blocks),
                       ["key"], "arm", "cat")
           .to_pandas().sort_values(["key", "arm", "cat"])
           .reset_index(drop=True))
    # plain contingency reference per cell
    for _, r in got.iterrows():
        sub = df[df["key"] == r["key"]]
        o = int(((sub["arm"] == r["arm"]) & (sub["cat"] == r["cat"])).sum())
        na = int((sub["arm"] == r["arm"]).sum())
        nc = int((sub["cat"] == r["cat"]).sum())
        nk = len(sub)
        e = na * nc / nk
        assert r["n"] == o and r["n_arm"] == na
        assert r["n_cat"] == nc and r["n_key"] == nk
        assert abs(r["chisq_term"] - (o - e) ** 2 / e) < 1e-6
    # the sum of terms over a 2x2 recovers scipy-style chi2 (no correction)
    sub = df[df["key"] == "b"]
    terms = got[got["key"] == "b"]
    obs = sub.groupby(["arm", "cat"]).size()
    full = sum(((int(obs.get((a, c), 0))
                 - (sub["arm"] == a).sum() * (sub["cat"] == c).sum() / len(sub)) ** 2)
               / ((sub["arm"] == a).sum() * (sub["cat"] == c).sum() / len(sub))
               for a in sub["arm"].unique() for c in sub["cat"].unique())
    assert abs(terms["chisq_term"].sum() - full) < 1e-4  # observed cells only
    con = duckdb.connect()
    con.register("t", df)
    want = (con.sql(chisq_terms_oracle_sql("SELECT * FROM t", ["key"],
                                           "arm", "cat"))
            .df().sort_values(["key", "arm", "cat"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)


# --- two-sample KS -----------------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 7])
def test_ks_test_matches_reference_and_sql(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.experiment import ks_test, ks_test_oracle_sql

    rng = np.random.default_rng(17)
    n = 600
    df = pd.DataFrame({
        "key": rng.choice(["a", "b"], n),
        "arm": rng.integers(0, 2, n).astype(np.int64),
        "v": rng.integers(0, 30, n).astype(np.float64),
    })
    # shift arm 1 of group a so it has a real KS gap
    df.loc[(df["key"] == "a") & (df["arm"] == 1), "v"] += 8
    # one single-arm group -> NULL ks_d
    df = pd.concat([df, pd.DataFrame(
        {"key": ["z"] * 3, "arm": [0, 0, 0], "v": [1.0, 2.0, 3.0]})],
        ignore_index=True)
    got = (ks_test(rd.from_pandas(df).repartition(blocks), ["key"],
                   "arm", "v")
           .to_pandas().sort_values("key").reset_index(drop=True))
    # plain two-pointer reference over the empirical CDFs
    for _, r in got[got["key"] != "z"].iterrows():
        sub = df[df["key"] == r["key"]]
        a = np.sort(sub.loc[sub["arm"] == 0, "v"].to_numpy())
        b = np.sort(sub.loc[sub["arm"] == 1, "v"].to_numpy())
        grid = np.unique(np.concatenate([a, b]))
        ca = np.searchsorted(a, grid, side="right") / len(a)
        cb = np.searchsorted(b, grid, side="right") / len(b)
        assert abs(r["ks_d"] - np.abs(ca - cb).max()) < 1e-12
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert pd.isna(got.loc[got["key"] == "z", "ks_d"]).all()
    con = duckdb.connect()
    con.register("t", df)
    want = (con.sql(ks_test_oracle_sql(
        "SELECT * FROM t", ["key"], "arm", "CAST(floor(v) AS BIGINT)"))
        .df().sort_values("key").reset_index(drop=True))
    gv, wv = got["ks_d"].to_numpy(), want["ks_d"].to_numpy()
    assert (np.isnan(gv) == np.isnan(wv)).all()
    # all-integer gap numerator + one division: bit parity
    assert (gv[~np.isnan(gv)] == wv[~np.isnan(wv)]).all()
    assert (got["d_num"].to_numpy() == want["d_num"].to_numpy()).all()


# --- Wilson bounds -----------------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 5])
def test_wilson_bounds_reference_and_sql(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.experiment import (
        wilson_bounds, wilson_bounds_oracle_sql)

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "key": rng.choice(["big", "small"], 300, p=[0.97, 0.03]),
        "y": rng.integers(0, 2, 300).astype(np.int64),
    })
    # tiny all-positive group: p_hat 1.0 but the lower bound must back off
    df = pd.concat([df, pd.DataFrame({"key": ["tiny"] * 2, "y": [1, 1]})],
                   ignore_index=True)
    got = (wilson_bounds(rd.from_pandas(df).repartition(blocks), ["key"], "y")
           .to_pandas().sort_values("key").reset_index(drop=True))
    z = 1.96
    for _, r in got.iterrows():
        sub = df[df["key"] == r["key"]]
        n, k = len(sub), int(sub["y"].sum())
        p = k / n
        lb = ((p + z * z / (2 * n))
              - z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)) / (
            1 + z * z / n)
        assert r["n"] == n and r["k"] == k
        assert abs(r["wilson_lb"] - lb) < 1e-6
        assert r["wilson_lb"] <= r["p_hat"] <= r["wilson_ub"]
    tiny = got[got["key"] == "tiny"].iloc[0]
    assert tiny["p_hat"] == 1.0 and tiny["wilson_lb"] < 0.4  # n=2 backs off hard
    con = duckdb.connect()
    con.register("t", df)
    want = (con.sql(wilson_bounds_oracle_sql("SELECT * FROM t", ["key"], "y"))
            .df().sort_values("key").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)


# --- l-diversity audit -------------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 6])
def test_l_diversity_audit(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.pii import (
        l_diversity_audit, l_diversity_audit_oracle_sql)

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "zip": rng.integers(0, 12, 400).astype(np.int64),
        "diagnosis": rng.integers(0, 6, 400).astype(np.int64)})
    # plant a homogeneous cohort: zip 99 is large but single-valued —
    # k-anonymous yet l-diversity must flag it
    plant = pd.DataFrame({"zip": [99] * 50, "diagnosis": [3] * 50})
    df = pd.concat([df, plant], ignore_index=True)
    got = (l_diversity_audit(rd.from_pandas(df).repartition(blocks),
                             ["zip"], "diagnosis", l=3)
           .to_pandas().sort_values("zip").reset_index(drop=True))
    assert 99 in got["zip"].tolist()
    assert (got["n_distinct"] < 3).all()
    nd = df.groupby("zip")["diagnosis"].nunique()
    want = (nd[nd < 3].rename("n_distinct").reset_index()
            .sort_values("zip").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    con = duckdb.connect()
    con.register("t", df)
    sql = (con.sql(l_diversity_audit_oracle_sql(
               "SELECT * FROM t", ["zip"], "diagnosis", l=3)).df()
           .sort_values("zip").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, sql, check_dtype=False)
