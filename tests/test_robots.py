"""Robots-meta directives (stages/robots.py): parse rules, restrictive
union, quoting forms, the indexability filter, and the nofollow-aware
link graph (the `robots_indexable` driver query adds the SQL-oracle
check)."""

import pandas as pd

from pdf_extract_ray.stages.robots import (filter_indexable,
                                           robots_directives,
                                           robots_directives_batch)


def test_directive_parsing():
    assert robots_directives('<meta name="robots" content="noindex">') == (True, False)
    assert robots_directives("<meta name='robots' content='nofollow'>") == (False, True)
    assert robots_directives('<meta name=robots content=none>') == (True, True)
    assert robots_directives(
        '<meta content="NOINDEX, NoFollow" name="ROBOTS">') == (True, True)
    assert robots_directives(
        '<meta name="robots" content="index, follow">') == (False, False)
    assert robots_directives('<meta name="viewport" content="noindex">') == (False, False)
    assert robots_directives("no meta at all") == (False, False)
    # restrictive union across multiple tags
    assert robots_directives(
        '<meta name="robots" content="index">'
        '<meta name="robots" content="noindex">') == (True, False)
    # token trimming around commas
    assert robots_directives(
        '<meta name="robots" content=" noindex , nofollow ">') == (True, True)


def test_batch_and_bytes_and_null():
    b = pd.DataFrame({
        "url": ["u1", "u2", "u3"],
        "html": ['<meta name="robots" content="noindex">'.encode(),
                 None, "<p>ok</p>"],
    })
    out = robots_directives_batch(b)
    assert list(out.noindex) == [True, False, False]
    assert list(out.nofollow) == [False, False, False]


def test_filter_and_nofollow_graph(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.robots import host_link_edges_respecting_robots

    pages = pd.DataFrame({
        "url": ["http://a.example/1", "http://a.example/2",
                "http://a.example/3"],
        "html": ['<meta name="robots" content="noindex,nofollow">'
                 '<a href="http://b.example/x">t</a>',
                 '<a href="http://b.example/y">t</a>',
                 '<meta name="robots" content="noindex">'
                 '<a href="http://b.example/z">t</a>'],
    })
    ds = rd.from_pandas(pages)
    kept = filter_indexable(ds).to_pandas()
    assert list(kept.url) == ["http://a.example/2"]
    edges = (host_link_edges_respecting_robots(ds).to_pandas()
             .sort_values("src_host").reset_index(drop=True))
    # page 1 is nofollow (no edges); page 3 is noindex but follow (edges kept)
    assert int(edges["n_links"].sum()) == 2


def test_webtext_run_respect_robots(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from pdf_extract_ray.pipelines.webtext import webtext_run

    pages = pa.table({
        "url": ["http://a.example/keep", "http://a.example/drop"],
        "warc_ts": [1, 2],
        "html": [b"<html><body><p>Plenty of good text here. " * 40
                 + b"</p></body></html>",
                 b'<meta name="robots" content="noindex">'
                 b"<html><body><p>hidden</p></body></html>"],
        "lang": ["en", "en"],
    })
    src = tmp_path / "corpus"
    src.mkdir()
    pq.write_table(pages, src / "p0.parquet")

    out = tmp_path / "out"
    webtext_run(str(src / "*.parquet"), str(out), extract_first=True,
                respect_robots=True, keep_rejects=True,
                files_per_partition=10)
    import ray.data as rd

    got = rd.read_parquet(str(out)).to_pandas()
    assert "http://a.example/drop" not in set(got["url"])
    assert "http://a.example/keep" in set(got["url"])

    # pre-extracted inputs cannot honor robots: loud error, not a no-op
    docs = pa.table({"url": ["u"], "text": ["t"]})
    src2 = tmp_path / "docs"
    src2.mkdir()
    pq.write_table(docs, src2 / "d0.parquet")
    with _pytest.raises(Exception):
        webtext_run(str(src2 / "*.parquet"), str(tmp_path / "out2"),
                    respect_robots=True, files_per_partition=10)
