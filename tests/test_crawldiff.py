"""Crawl snapshot diff (stages/crawldiff.py): verdict classification,
duplicate-url max-hash rule, null content, and md5/fast mode agreement
on verdicts (the `crawl_diff_docs` driver query adds the full SQL-oracle
check including hash values)."""

import hashlib

import pandas as pd
import pytest

from pdf_extract_ray.stages.crawldiff import content_hashes, crawl_diff


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture()
def snapshots():
    old = pd.DataFrame({
        "url": ["u/gone", "u/same", "u/edit", "u/dup"],
        "text": ["old page", "stable", "v1", "dup-a"],
    })
    new = pd.DataFrame({
        "url": ["u/same", "u/edit", "u/dup", "u/dup", "u/fresh"],
        "text": ["stable", "v2", "dup-a", "dup-b", None],
    })
    return old, new


def test_verdicts_and_hashes(ray_session, snapshots):
    import ray.data as rd

    old, new = snapshots
    got = (crawl_diff(rd.from_pandas(old).repartition(2),
                      rd.from_pandas(new).repartition(3), num_buckets=2)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert dict(zip(got.url, got.status)) == {
        "u/gone": "removed", "u/same": "unchanged", "u/edit": "changed",
        "u/dup": "changed",  # old max-hash dup-a vs new max(dup-a, dup-b)
        "u/fresh": "added",
    }
    row = got.set_index("url")
    assert row.loc["u/edit", "old_hash"] == _md5("v1")
    assert row.loc["u/edit", "new_hash"] == _md5("v2")
    assert row.loc["u/fresh", "old_hash"] is None
    assert row.loc["u/fresh", "new_hash"] == _md5("")  # null -> ""
    assert row.loc["u/dup", "new_hash"] == max(_md5("dup-a"), _md5("dup-b"))


def test_fast_mode_same_verdicts(ray_session, snapshots):
    import ray.data as rd

    old, new = snapshots
    md5 = (crawl_diff(rd.from_pandas(old), rd.from_pandas(new))
           .to_pandas().sort_values("url").reset_index(drop=True))
    fast = (crawl_diff(rd.from_pandas(old), rd.from_pandas(new),
                       method="fast")
            .to_pandas().sort_values("url").reset_index(drop=True))
    # u/dup's verdict may legitimately differ across hash families (the
    # max-hash rule picks a different duplicate); all other urls agree.
    stable = md5.url != "u/dup"
    pd.testing.assert_frame_equal(md5.loc[stable, ["url", "status"]],
                                  fast.loc[stable, ["url", "status"]])


def test_content_hashes_dedup(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({
        "url": ["a", "a", "b"], "text": ["x", "y", "z"]}))
    got = content_hashes(ds).to_pandas().sort_values("url")
    assert len(got) == 2
    assert got.set_index("url").loc["a", "h"] == max(_md5("x"), _md5("y"))
