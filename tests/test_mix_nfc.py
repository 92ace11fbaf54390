"""Corpus mixing (stages/mix.py) and NFC normalization
(textquality.nfc_normalize_batch): determinism, nesting, and DuckDB
oracle parity at the kernel level (the Dataset level is covered by the
`source_mixed_docs` / `nfc_docs` driver queries)."""

import unicodedata

import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.stages.mix import (
    _bound_hex,
    weighted_sample_batch,
    weighted_sample_oracle_sql,
)
from pdf_extract_ray.stages.textquality import nfc_normalize_batch


def _docs(n=2000):
    rng = np.random.default_rng(3)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice(["a", "b", "c", "d"], size=n),
    })


def test_rates_are_approximate_and_deterministic():
    df = _docs()
    out1 = weighted_sample_batch(df, "source", {"a": 0.5, "b": 0.1},
                                 default_rate=1.0)
    out2 = weighted_sample_batch(df, "source", {"a": 0.5, "b": 0.1},
                                 default_rate=1.0)
    pd.testing.assert_frame_equal(out1, out2)
    frac_a = len(out1[out1.source == "a"]) / len(df[df.source == "a"])
    frac_b = len(out1[out1.source == "b"]) / len(df[df.source == "b"])
    assert abs(frac_a - 0.5) < 0.1 and abs(frac_b - 0.1) < 0.06
    # groups without a rate follow default_rate (1.0 keeps everything)
    assert len(out1[out1.source == "c"]) == len(df[df.source == "c"])


def test_samples_nest_across_rates():
    # the kept set at a lower rate is a subset of the kept set at a
    # higher rate (same hash rank) — free nested mix experiments
    df = _docs()
    small = weighted_sample_batch(df, "source", {}, default_rate=0.2)
    big = weighted_sample_batch(df, "source", {}, default_rate=0.6)
    assert set(small.doc_id).issubset(set(big.doc_id))


def test_fast_mode_deterministic_and_rate_shaped():
    df = _docs()
    out1 = weighted_sample_batch(df, "source", {"a": 0.5},
                                 default_rate=0.2, method="fast")
    out2 = weighted_sample_batch(
        df.sample(frac=1.0, random_state=1), "source", {"a": 0.5},
        default_rate=0.2, method="fast")
    assert set(out1.doc_id) == set(out2.doc_id)  # order-independent
    frac_a = len(out1[out1.source == "a"]) / len(df[df.source == "a"])
    assert abs(frac_a - 0.5) < 0.1


def test_bound_validation():
    with pytest.raises(ValueError):
        _bound_hex(1.5)
    with pytest.raises(ValueError):
        weighted_sample_batch(_docs(50), "source", {"a": -0.1})
    with pytest.raises(ValueError):
        weighted_sample_batch(_docs(50), "source", {}, method="nope")


def test_oracle_sql_matches_kernel():
    import duckdb

    df = _docs()
    rates = {"a": 0.5, "b": 0.1, "c": 1.0}
    kept = weighted_sample_batch(df, "source", rates, default_rate=0.25)
    con = duckdb.connect()
    con.register("documents", df.assign(lang="en"))
    sql = weighted_sample_oracle_sql(
        "SELECT doc_id, source, lang FROM documents", "source", rates,
        default_rate=0.25)
    got = con.sql(sql).df()
    assert sorted(got.doc_id) == sorted(kept.doc_id)


NFC_CASES = ["café", "étude", "가", "Å", "à́b", "ﬁ", "ascii", "", "Ǻ",
             "한글 텍스트", "x̸", "ȩ́"]


def test_nfc_normalizes_and_flags():
    df = pd.DataFrame({"text": NFC_CASES + [None]})
    out = nfc_normalize_batch(df.copy())
    for raw, nfc, changed in zip(df.text.fillna(""), out.text_nfc,
                                 out.changed):
        assert nfc == unicodedata.normalize("NFC", raw)
        assert changed == (nfc != raw)


def test_nfc_duckdb_parity():
    import duckdb

    con = duckdb.connect()
    for c in NFC_CASES:
        dk = con.sql("SELECT nfc_normalize(?)", params=[c]).fetchone()[0]
        assert dk == unicodedata.normalize("NFC", c), repr(c)


def test_oracle_sql_escapes_quotes():
    import duckdb

    df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                       "source": ["o'reilly", "plain"] * 50})
    rates = {"o'reilly": 0.5}
    kept = weighted_sample_batch(df, "source", rates, default_rate=1.0)
    con = duckdb.connect()
    con.register("t", df)
    got = con.sql(weighted_sample_oracle_sql(
        "SELECT doc_id, source FROM t", "source", rates,
        default_rate=1.0)).df()
    assert sorted(got.doc_id) == sorted(kept.doc_id)


def test_split_oracle_sql_escapes_quotes():
    import duckdb

    from pdf_extract_ray.stages.split import (
        assign_split_batch,
        split_oracle_sql,
    )

    fr = {"train'": 0.5, "rest": 0.5}
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64)})
    ours = assign_split_batch(df.copy(), "doc_id", fr)
    con = duckdb.connect()
    con.register("t", df)
    got = con.sql(split_oracle_sql("SELECT doc_id FROM t", "doc_id",
                                   fr)).df()
    assert list(got.sort_values("doc_id")["split"]) == list(
        ours.sort_values("doc_id")["split"])


# ---------------------------------------------------------------- #
# temperature sampling (XLM-R alpha-sampling shape)


def test_temperature_rates_endpoints_and_monotonicity():
    from pdf_extract_ray.stages.mix import temperature_rates

    counts = {"en": 1000, "de": 250, "fr": 40}
    # alpha=1: raw distribution, nothing dropped
    assert temperature_rates(counts, alpha=1.0) == {
        "en": 1.0, "de": 1.0, "fr": 1.0}
    # alpha=0: fully equalized — every group downsampled to n_min
    r0 = temperature_rates(counts, alpha=0.0)
    assert r0["fr"] == 1.0
    assert abs(r0["en"] - 40 / 1000) < 1e-12
    assert abs(r0["de"] - 40 / 250) < 1e-12
    # alpha=0.5: between the two, min group keeps all, ordering by size
    r5 = temperature_rates(counts, alpha=0.5)
    assert r5["fr"] == 1.0
    assert r0["en"] < r5["en"] < 1.0
    assert r5["en"] < r5["de"] < r5["fr"]
    with pytest.raises(ValueError):
        temperature_rates(counts, alpha=1.5)
    assert temperature_rates({}, alpha=0.5) == {}


def test_temperature_bound_hex_bitparity_with_duckdb():
    # the oracle formats floor(sqrt(n_min/n) * 2^32) as 8-hex in SQL;
    # sqrt and double division are correctly rounded in both engines,
    # so the hex bounds must agree digit-for-digit.
    import duckdb

    from pdf_extract_ray.stages.mix import _bound_hex, temperature_rates

    rng = np.random.default_rng(7)
    los = rng.integers(1, 10**6, size=500)
    his = np.maximum(los, rng.integers(1, 10**6, size=500))
    con = duckdb.connect()
    sql_hex = con.execute(
        "SELECT printf('%08x', CAST(floor(sqrt(CAST(a AS DOUBLE)/b)"
        " * 4294967296.0) AS BIGINT)) FROM (SELECT unnest($1::BIGINT[]) a,"
        " unnest($2::BIGINT[]) b)",
        [los.tolist(), his.tolist()]).fetchall()
    for lo, hi, (hx,) in zip(los, his, sql_hex):
        r = temperature_rates({"min": int(lo), "g": int(hi)},
                              alpha=0.5)["g"]
        py = _bound_hex(r)
        if lo == hi:
            assert py == "g" * 8
        else:
            assert py == hx, (lo, hi, py, hx)


def test_temperature_sample_oracle_parity_dataset_level():
    import duckdb
    import ray.data

    from pdf_extract_ray.stages.mix import (
        temperature_sample,
        temperature_sample_oracle_sql,
    )

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en"] * 6 + ["de"] * 3 + ["fr"], size=n),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    kept = temperature_sample(ds, "lang", alpha=0.5,
                              id_col="doc_id").to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    got = con.sql(temperature_sample_oracle_sql(
        "SELECT doc_id, lang FROM t", "lang", alpha=0.5,
        id_col="doc_id")).df()
    assert sorted(got.doc_id) == sorted(kept.doc_id)
    # the min-count group is kept whole
    fr_total = int((df.lang == "fr").sum())
    assert int((kept.lang == "fr").sum()) == fr_total
    # bigger groups are strictly downsampled at this skew
    assert int((kept.lang == "en").sum()) < int((df.lang == "en").sum())


def test_temperature_sample_fast_method_same_rates_contract():
    import ray.data

    from pdf_extract_ray.stages.mix import temperature_sample

    df = pd.DataFrame({
        "doc_id": np.arange(1000, dtype=np.int64),
        "lang": (["en"] * 800 + ["fr"] * 200),
    })
    ds = ray.data.from_pandas(df).repartition(3)
    kept = temperature_sample(ds, "lang", alpha=0.5, id_col="doc_id",
                              method="fast").to_pandas()
    # determinism: re-running yields the identical membership
    kept2 = temperature_sample(ds, "lang", alpha=0.5, id_col="doc_id",
                               method="fast").to_pandas()
    assert sorted(kept.doc_id) == sorted(kept2.doc_id)
    assert int((kept.lang == "fr").sum()) == 200


# ---------------------------------------------------------------- #
# per-group cap (anti-spam host cap)


def _cap_frame():
    rng = np.random.default_rng(11)
    return pd.DataFrame({
        "doc_id": np.arange(300),
        "host": [f"h{int(g)}" for g in rng.integers(0, 7, size=300)],
    })


def test_cap_per_group_caps_and_nests(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.mix import cap_per_group

    df = _cap_frame()
    ds = rd.from_pandas(df).repartition(4)
    k2 = cap_per_group(ds, "host", 2, method="md5").to_pandas()
    k5 = cap_per_group(ds, "host", 5, method="md5").to_pandas()
    assert (k2.groupby("host").size() <= 2).all()
    assert (k5.groupby("host").size() == 5).all()  # every host has >5
    # nested: the k=2 survivors are a subset of the k=5 survivors
    assert set(k2["doc_id"]) <= set(k5["doc_id"])


def test_cap_per_group_sql_parity(ray_session):
    import duckdb

    import ray.data as rd

    from pdf_extract_ray.stages.mix import (
        cap_per_group,
        cap_per_group_oracle_sql,
    )

    df = _cap_frame()
    got = (cap_per_group(rd.from_pandas(df).repartition(3), "host", 10)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = (con.sql(cap_per_group_oracle_sql(
        "SELECT doc_id, host FROM t", "host", 10))
        .df().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["doc_id", "host"]],
                                  want[["doc_id", "host"]])


def test_cap_per_group_fast_mode_and_validation(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.mix import cap_per_group

    df = _cap_frame()
    ds = rd.from_pandas(df)
    a = cap_per_group(ds, "host", 3, method="fast").to_pandas()
    b = (cap_per_group(ds.repartition(5), "host", 3, method="fast")
         .to_pandas())
    # parallelism-independent membership
    assert set(a["doc_id"]) == set(b["doc_id"])
    assert (a.groupby("host").size() <= 3).all()
    with pytest.raises(ValueError):
        cap_per_group(ds, "host", 0)
    with pytest.raises(ValueError):
        cap_per_group(ds, "host", 3, method="seeded")
