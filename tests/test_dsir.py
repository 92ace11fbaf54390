"""DSIR importance weights (stages/dsir.py): distributed == reference
bit-parity, target-affinity direction, edge cases, determinism."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pdf_extract_ray.stages.dsir import (
    dsir_reference,
    dsir_weights,
    train_bucket_dist,
)

TARGET = pd.DataFrame({
    "doc_id": range(4),
    "text": [
        "the cat sat on the mat and the dog sat on the rug",
        "the quick brown fox jumps over the lazy dog",
        "a cat and a dog sat in the sun by the door",
        "the dog ran to the cat and the cat ran away",
    ],
})

RAW = pd.DataFrame({
    "doc_id": range(8),
    "text": [
        "the cat sat on the mat and the dog sat on the rug",
        "the quick brown fox jumps over the lazy dog",
        "a cat and a dog sat in the sun by the door",
        "the dog ran to the cat and the cat ran away",
        "le chat dort sur le tapis et le chien dort aussi",
        "zzz qqq xxx www vvv uuu ttt sss rrr",
        "buy cheap pills now click here free offer buy now",
        "",
    ],
})

N_BUCKETS = 1 << 12  # small space keeps the test fast; collisions fine


def test_distributed_matches_reference_bitwise(ray_session):
    ds = rd.from_pandas(RAW).repartition(3)
    log_t = train_bucket_dist(rd.from_pandas(TARGET), n_buckets=N_BUCKETS)
    log_r = train_bucket_dist(ds, n_buckets=N_BUCKETS)
    got = (dsir_weights(ds, log_t, log_r)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = dsir_reference(TARGET["text"], RAW["text"], RAW["text"],
                         n_buckets=N_BUCKETS)
    exp.insert(0, "doc_id", RAW["doc_id"].to_numpy())
    pd.testing.assert_frame_equal(got, exp)


def test_target_like_docs_score_higher(ray_session):
    ds = rd.from_pandas(RAW)
    log_t = train_bucket_dist(rd.from_pandas(TARGET), n_buckets=N_BUCKETS)
    log_r = train_bucket_dist(ds, n_buckets=N_BUCKETS)
    out = dsir_weights(ds, log_t, log_r).to_pandas().set_index("doc_id")
    # every in-target doc outranks the gibberish and the spam on the
    # length-normalized weight
    worst_target = out.loc[[0, 1, 2, 3], "dsir_avg"].min()
    assert worst_target > out.loc[5, "dsir_avg"]
    assert worst_target > out.loc[6, "dsir_avg"]


def test_empty_doc_edges(ray_session):
    ds = rd.from_pandas(RAW)
    log_t = train_bucket_dist(rd.from_pandas(TARGET), n_buckets=N_BUCKETS)
    log_r = train_bucket_dist(ds, n_buckets=N_BUCKETS)
    out = dsir_weights(ds, log_t, log_r).to_pandas().set_index("doc_id")
    assert out.loc[7, "n_features"] == 0
    assert out.loc[7, "dsir_logratio"] == 0.0
    assert np.isnan(out.loc[7, "dsir_avg"])


def test_mismatched_bucket_spaces_rejected(ray_session):
    ds = rd.from_pandas(RAW)
    log_t = train_bucket_dist(rd.from_pandas(TARGET), n_buckets=1 << 8)
    log_r = train_bucket_dist(ds, n_buckets=N_BUCKETS)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_weights(ds, log_t, log_r)


def test_deterministic_under_repartition(ray_session):
    log_t = train_bucket_dist(rd.from_pandas(TARGET), n_buckets=N_BUCKETS)
    runs = []
    for p in (1, 4):
        ds = rd.from_pandas(RAW).repartition(p)
        log_r = train_bucket_dist(ds, n_buckets=N_BUCKETS)
        runs.append(dsir_weights(ds, log_t, log_r).to_pandas()
                    .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(runs[0], runs[1])
