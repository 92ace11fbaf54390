"""Sequence packing assignment (stages/packing.py): frozen layout rules,
boundary straddling, and distributed == single-process reference (the
`pack_assignments` driver query adds the full SQL-oracle check)."""

import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.stages.packing import assign_packs, assign_packs_reference


def test_reference_layout_rules():
    df = pd.DataFrame({"doc_id": [0, 2, 4, 1, 3],
                       "n_tokens": [100, 100, 100, 60, 300]})
    got = assign_packs_reference(df, seq_len=128, num_buckets=2)
    by = got.set_index("id")
    # bucket 0: ids 0,2,4 concat -> cums 0,100,200
    assert (by.loc[0, "pack_id"], by.loc[0, "pack_offset"]) == (0, 0)
    assert (by.loc[2, "pack_id"], by.loc[2, "pack_offset"]) == (0, 100)
    assert (by.loc[4, "pack_id"], by.loc[4, "pack_offset"]) == (1, 72)
    # bucket 1: ids 1,3 -> cums 0,60
    assert (by.loc[3, "pack_id"], by.loc[3, "pack_offset"]) == (0, 60)
    # doc 2 straddles the pack boundary (offset 100 + 100 > 128): allowed
    # by concat-and-chunk; layout is exact, not greedy-fit


def test_zero_seq_len_rejected(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError):
        assign_packs(rd.from_pandas(pd.DataFrame({"doc_id": [1],
                                                  "n_tokens": [1]})),
                     seq_len=0)


def test_distributed_equals_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "doc_id": rng.permutation(400),
        "n_tokens": rng.integers(0, 500, size=400),
    })
    got = (assign_packs(rd.from_pandas(df).repartition(5), seq_len=256,
                        num_buckets=8, shuffle_buckets=3)
           .to_pandas().sort_values("id").reset_index(drop=True))
    ref = (assign_packs_reference(df, seq_len=256, num_buckets=8)
           .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref)
