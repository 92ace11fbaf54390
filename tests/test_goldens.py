"""Frozen golden end-to-end check (SURVEY.md §5.2.2): the committed fixture
locks the extraction semantics — if any rule implementation drifts, this
fails even though the fused/staged/oracle are internally consistent."""

import hashlib
import json
import os

import pytest

from pdf_extract_ray.corpus import pages_table
from pdf_extract_ray.pipelines.extract import extract_pages_fused, oracle_extract

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "extract_seed42_200.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def test_oracle_matches_committed_golden(golden):
    out = oracle_extract(pages_table(200, 42).to_pylist())
    assert len(out) == len(golden["hashes"])
    for r in out:
        g = golden["hashes"][r["url"]]
        assert hashlib.md5(r["extracted_text"].encode()).hexdigest() == g["md5"], r["url"]
        assert r["n_sentences"] == g["n_sentences"]
        assert r["n_pages"] == g["n_pages"]
        assert r["status"] == g["status"]
    # human-readable samples byte-identical
    by_url = {r["url"]: r["extracted_text"] for r in out}
    for url, text in golden["samples"].items():
        assert by_url[url] == text


def test_ray_pipeline_matches_committed_golden(ray_session, golden):
    import ray.data as rd

    ds = rd.from_arrow(pages_table(200, 42)).repartition(8)
    for r in extract_pages_fused(ds, batch_size=32).take_all():
        g = golden["hashes"][r["url"]]
        assert hashlib.md5(r["extracted_text"].encode()).hexdigest() == g["md5"], r["url"]
