"""SCD-2 url version history (stages/history.py): consecutive-identical
collapse, half-open validity intervals, duplicate-timestamp tiebreak,
null content, md5/fast agreement on version structure, and the
change-stats rollup (the ``scd2_url_versions`` / ``url_change_freq``
driver queries add the full SQL-oracle check)."""

import hashlib

import pandas as pd
import pytest

from pdf_extract_ray.stages.history import (
    url_version_history, version_change_stats)


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _ts(h):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h)


@pytest.fixture()
def snapshots():
    # u/a: v1 v1 v2 v1  -> 3 versions (revert is a NEW version)
    # u/b: v1           -> 1 version
    # u/c: None then "" -> ONE version (null hashes as empty string)
    return pd.DataFrame({
        "url": ["u/a"] * 4 + ["u/b"] + ["u/c"] * 2,
        "ts": [_ts(0), _ts(1), _ts(2), _ts(3), _ts(0), _ts(0), _ts(5)],
        "text": ["v1", "v1", "v2", "v1", "only", None, ""],
    })


def _run(df, **kw):
    import ray.data as rd

    got = url_version_history(
        rd.from_pandas(df).repartition(3), num_buckets=2, **kw)
    return got.to_pandas().sort_values(
        ["url", "version_no"]).reset_index(drop=True)


def test_versions_and_intervals(ray_session, snapshots):
    got = _run(snapshots)
    a = got[got.url == "u/a"]
    assert list(a.version_no) == [1, 2, 3]
    assert list(a.content_hash) == [_md5("v1"), _md5("v2"), _md5("v1")]
    assert list(a.valid_from) == [_ts(0), _ts(2), _ts(3)]
    # half-open [from, to): valid_to == next version's valid_from
    assert list(a.valid_to)[:2] == [_ts(2), _ts(3)]
    assert pd.isna(a.valid_to.iloc[2]) and bool(a.is_current.iloc[2])
    assert not a.is_current.iloc[0] and not a.is_current.iloc[1]

    b = got[got.url == "u/b"]
    assert len(b) == 1 and b.version_no.iloc[0] == 1
    assert bool(b.is_current.iloc[0]) and pd.isna(b.valid_to.iloc[0])

    c = got[got.url == "u/c"]  # None and "" hash identically -> collapsed
    assert len(c) == 1 and c.content_hash.iloc[0] == _md5("")
    assert c.valid_from.iloc[0] == _ts(0)


def test_duplicate_ts_tiebreak_deterministic(ray_session):
    # two snapshots at the SAME ts: ordered by (ts, content_hash), so the
    # result is deterministic regardless of input row order
    df = pd.DataFrame({
        "url": ["u"] * 2, "ts": [_ts(0)] * 2, "text": ["x", "y"]})
    lo, hi = sorted([_md5("x"), _md5("y")])
    for perm in (df, df.iloc[::-1].reset_index(drop=True)):
        got = _run(perm)
        assert list(got.content_hash) == [lo, hi]
        assert list(got.version_no) == [1, 2]


def test_fast_mode_same_structure(ray_session, snapshots):
    md5 = _run(snapshots)
    fast = _run(snapshots, method="fast")
    # hashes differ by family, but version structure is identical
    cols = ["url", "version_no", "valid_from", "valid_to", "is_current"]
    pd.testing.assert_frame_equal(md5[cols], fast[cols])


def test_change_stats_rollup(ray_session, snapshots):
    import ray.data as rd

    hist = url_version_history(
        rd.from_pandas(snapshots).repartition(3), num_buckets=2)
    got = (version_change_stats(hist).to_pandas()
           .sort_values("url").set_index("url"))
    assert got.loc["u/a", "n_versions"] == 3
    assert got.loc["u/a", "first_seen"] == _ts(0)
    assert got.loc["u/a", "last_change"] == _ts(3)
    assert got.loc["u/b", "n_versions"] == 1
    assert got.loc["u/c", "n_versions"] == 1


def test_plain_reference_equivalence(ray_session):
    # independent plain-Python reference over a derived multi-snapshot
    # corpus: group rows by url, sort by (ts, md5), collapse runs
    rows = []
    for d in range(40):
        for k in range(3):
            txt = f"doc{d}" + (" v2" if d % 3 == 0 and k >= 1 else "") \
                + (" v3" if d % 4 == 0 and k >= 2 else "")
            rows.append({"url": f"u/{d}", "ts": _ts(d * 24 + k),
                         "text": txt})
    df = pd.DataFrame(rows)

    expect = []
    for url, g in df.groupby("url"):
        g = g.sort_values("ts")
        hs = [_md5(t) for t in g.text]
        ver = 0
        for i, (h, ts) in enumerate(zip(hs, g.ts)):
            if i == 0 or h != hs[i - 1]:
                ver += 1
                expect.append((url, ver, h, ts))
    exp = pd.DataFrame(expect, columns=[
        "url", "version_no", "content_hash", "valid_from"])

    got = _run(df)
    pd.testing.assert_frame_equal(
        got[["url", "version_no", "content_hash", "valid_from"]],
        exp.sort_values(["url", "version_no"]).reset_index(drop=True),
        check_dtype=False)


# --- incremental maintenance + as-of reconstruction -------------------------

def _snaps_k(n_docs, ks):
    rows = []
    for d in range(n_docs):
        for k in ks:
            txt = f"doc{d}" + (" v2" if d % 3 == 0 and k >= 1 else "") \
                + (" v3" if d % 4 == 0 and k >= 2 else "")
            rows.append({"url": f"u/{d}", "ts": _ts(d + k * 1000),
                         "text": txt})
    return pd.DataFrame(rows)


def test_incremental_equals_full_rebuild(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.history import update_version_history

    full = url_version_history(
        rd.from_pandas(_snaps_k(30, [0, 1, 2])).repartition(3),
        num_buckets=2).to_pandas()
    hist01 = url_version_history(
        rd.from_pandas(_snaps_k(30, [0, 1])).repartition(3), num_buckets=2)
    third = _snaps_k(30, [2])[["url", "ts", "text"]]
    inc = update_version_history(
        hist01, rd.from_pandas(third).repartition(2),
        num_buckets=2).to_pandas()
    key = ["url", "version_no"]
    pd.testing.assert_frame_equal(
        inc.sort_values(key).reset_index(drop=True),
        full.sort_values(key).reset_index(drop=True))


def test_incremental_new_url_and_multi_version_crawl(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.history import update_version_history

    hist = url_version_history(
        rd.from_pandas(pd.DataFrame({
            "url": ["u/old"], "ts": [_ts(0)], "text": ["v1"]})),
        num_buckets=2)
    # new crawl: unseen url with TWO distinct contents (collapse rule
    # applies within the new crawl) + an unchanged old url row
    new = pd.DataFrame({
        "url": ["u/new", "u/new", "u/old"],
        "ts": [_ts(10), _ts(11), _ts(12)],
        "text": ["a", "b", "v1"],
    })
    got = (update_version_history(hist, rd.from_pandas(new), num_buckets=2)
           .to_pandas().sort_values(["url", "version_no"])
           .reset_index(drop=True))
    old = got[got.url == "u/old"]
    assert len(old) == 1 and bool(old.is_current.iloc[0])  # untouched
    newv = got[got.url == "u/new"]
    assert list(newv.version_no) == [1, 2]
    assert list(newv.content_hash) == [_md5("a"), _md5("b")]
    assert list(newv.valid_from) == [_ts(10), _ts(11)]
    assert newv.valid_to.iloc[0] == _ts(11)
    assert bool(newv.is_current.iloc[1])


def test_snapshot_asof_picks_live_version(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.history import snapshot_asof

    hist = url_version_history(
        rd.from_pandas(_snaps_k(12, [0, 1, 2])).repartition(3),
        num_buckets=2)
    # asof between crawl 1 (ts base +1000h) and crawl 2 (+2000h)
    got = (snapshot_asof(hist, _ts(1500)).to_pandas()
           .sort_values("url").set_index("url"))
    assert len(got) == 12  # every url has a live version
    # doc 0: changed at k=1 (v2) -> version 2 is live at asof
    assert got.loc["u/0", "version_no"] == 2
    assert got.loc["u/0", "content_hash"] == _md5("doc0 v2")
    # doc 1: never changed by k=1 -> version 1
    assert got.loc["u/1", "version_no"] == 1
    # before everything: empty
    early = snapshot_asof(hist, _ts(-1)).to_pandas()
    assert len(early) == 0
