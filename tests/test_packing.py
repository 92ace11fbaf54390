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


def test_chunk_spans(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.packing import chunk_spans

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "n_tokens": [500, 0, 1, 192]})
    got = (chunk_spans(rd.from_pandas(df).repartition(2),
                       chunk_len=256, stride=192)
           .to_pandas().sort_values(["id", "chunk_no"])
           .reset_index(drop=True))

    def ref(n, L=256, S=192):
        out, s, c = [], 0, 0
        while s < n:
            out.append((c, s, min(s + L, n)))
            s += S
            c += 1
        return out

    expect = []
    for _, r in df.iterrows():
        for c, s, e in ref(r["n_tokens"]):
            expect.append({"id": r["doc_id"], "chunk_no": c,
                           "start_tok": s, "end_tok": e})
    exp = pd.DataFrame(expect,
                       columns=["id", "chunk_no", "start_tok", "end_tok"])
    pd.testing.assert_frame_equal(got, exp.astype("int64"))
    assert (got[got.id == 2].empty  # empty doc -> no chunks
            and list(got[got.id == 4][["start_tok", "end_tok"]].iloc[0])
            == [0, 192])


def test_chunk_spans_bad_params(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.packing import chunk_spans

    with pytest.raises(ValueError):
        chunk_spans(rd.from_pandas(pd.DataFrame({"doc_id": [1],
                                                 "n_tokens": [1]})),
                    stride=0)


def test_packing_and_chunking_invariants():
    """Property checks of the frozen layouts: pack offsets tile each
    bucket's token stream exactly (no gaps, no overlap), and chunk
    windows cover every token with stride-bounded overlap."""
    import numpy as np

    from pdf_extract_ray.stages.packing import assign_packs_reference

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"doc_id": rng.permutation(300),
                       "n_tokens": rng.integers(0, 700, size=300)})
    out = assign_packs_reference(df, seq_len=512, num_buckets=4)
    for _, grp in out.groupby("bucket"):
        grp = grp.sort_values("id")
        # global position = pack_id * seq_len + pack_offset must equal
        # the exclusive running sum of token counts (exact tiling)
        pos = grp["pack_id"].to_numpy() * 512 + grp["pack_offset"].to_numpy()
        toks = grp["n_tokens"].to_numpy()
        assert (pos == np.concatenate(([0], np.cumsum(toks)[:-1]))).all()

    # chunk coverage: union of [start, end) == [0, n) for every doc
    def ref_chunks(n, L, S):
        s = 0
        spans = []
        while s < n:
            spans.append((s, min(s + L, n)))
            s += S
        return spans

    for n in (1, 47, 48, 49, 256, 500, 1000):
        spans = ref_chunks(n, 64, 48)
        covered = np.zeros(n, dtype=bool)
        for s, e in spans:
            assert e > s  # no empty chunks
            covered[s:e] = True
        assert covered.all()
        # overlap between consecutive chunks is exactly L - S (except tail)
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 - s1 == 48
