"""C4 heuristic cleaning (stages/c4.py): line/page rules on adversarial
fixtures, SQL-oracle parity, and distributed determinism."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pdf_extract_ray.stages.c4 import c4_clean, c4_clean_batch, c4_oracle_sql

FIXTURE = pd.DataFrame({
    "doc_id": range(9),
    "text": [
        # 3 good sentences -> kept
        "This is a perfectly fine sentence.\nAnother good long sentence "
        "right here!\nAnd a third one to pass the gate?",
        # javascript line dropped; only 2 sentences survive -> page drop
        "This line mentions JavaScript and has many words.\nA fine long "
        "sentence number one.\nA fine long sentence number two.",
        # lorem ipsum page drop even with 3 good lines
        "Lorem Ipsum dolor sit amet right here.\nA fine long sentence "
        "number one.\nA fine long sentence number two!\nAnd one more "
        "decent sentence to spare?",
        # curly brace page drop
        "function f() { return 1; }\nA fine long sentence number one.\n"
        "A fine long sentence number two!\nAnd one more decent sentence?",
        # no terminal punctuation anywhere -> all lines drop
        "no punctuation on this line at all\nanother line with no ending",
        # short lines drop (< 5 words) even with punctuation
        "Tiny line.\nAlso small!\nStill too short?",
        # quote-after-punctuation is terminal; ASCII trim applies
        '  \t"He said it was entirely acceptable."  \t\r\nA fine long '
        "sentence number one!\nAnd one more decent sentence right here?",
        # empty and None texts
        "",
        None,
    ],
})


def _expected_kept_lines():
    return {
        0: 3, 1: 2, 2: 4, 3: 3, 4: 0, 5: 0, 6: 3, 7: 0, 8: 0,
    }


def test_line_and_page_rules():
    out = c4_clean_batch(FIXTURE).set_index("doc_id")
    assert out["n_lines_kept"].to_dict() == _expected_kept_lines()
    # page keeps: 0 (3 sentences), 6 (quote-terminal + 2 more)
    assert out["c4_kept"].to_dict() == {
        0: True, 1: False, 2: False, 3: False, 4: False, 5: False,
        6: True, 7: False, 8: False,
    }
    # kept lines keep their ORIGINAL bytes (untrimmed)
    assert out.loc[6, "c4_text"].startswith('  \t"He said')
    # empty/None -> empty cleaned text, zero counts
    assert out.loc[7, "c4_text"] == "" and out.loc[8, "c4_text"] == ""


def test_sql_oracle_parity_adversarial():
    got = (c4_clean_batch(FIXTURE)
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", FIXTURE)
    exp = con.sql(c4_oracle_sql("documents")).df() \
        .sort_values("doc_id").reset_index(drop=True)
    exp["c4_kept"] = exp["c4_kept"].astype(bool)
    pd.testing.assert_frame_equal(got, exp)


def test_distributed_matches_batch_function(ray_session):
    big = pd.concat([FIXTURE.assign(doc_id=FIXTURE["doc_id"] + 10 * k)
                     for k in range(6)], ignore_index=True)
    got = (c4_clean(rd.from_pandas(big).repartition(4))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = c4_clean_batch(big).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_thresholds_are_knobs():
    out = c4_clean_batch(FIXTURE, min_words=2, min_sentences=1) \
        .set_index("doc_id")
    # the short-lines doc now keeps its three tiny lines and the page
    assert out.loc[5, "n_lines_kept"] == 3
    assert bool(out.loc[5, "c4_kept"])


def test_webtext_run_c4_rules(ray_session, tmp_path):
    # c4_rules fuses cleaning in front of tiering: line-rewritten text,
    # C4-dropped pages never reach a tier, flag is in the run identity
    import os

    import pyarrow.parquet as pq

    from pdf_extract_ray.pipelines.webtext import webtext_run, webtext_tiers
    from pdf_extract_ray.stages.c4 import apply_c4_filter

    good = ("The cat sat on a mat and looked to the sky for it was "
            "that kind of day when every animal wanders far away.\n"
            "It is one of those long and gentle sentences that the "
            "filter should keep without any complaint at all!\n"
            "And here is a third one so the page passes the gate?")
    src = str(tmp_path / "src")
    os.makedirs(src)
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [good,
                 good + "\ncode { display: none }",  # '{' -> page drop
                 "no terminal punctuation here at all"],
    })
    docs.to_parquet(f"{src}/a.parquet")
    out = str(tmp_path / "out")
    webtext_run(f"{src}/*.parquet", out, c4_rules=True,
                files_per_partition=1, min_rows_per_file=1)
    import glob as _glob
    import re as _re

    frames = []
    for p in _glob.glob(f"{out}/part=*/tier=*/*.parquet"):
        f = pq.read_table(p).to_pandas()
        f["tier"] = _re.search(r"tier=([^/]+)/", p).group(1)
        frames.append(f)
    got = pd.concat(frames, ignore_index=True).sort_values("doc_id")
    # only doc 0 survives C4 (1: curly brace, 2: no kept lines)
    assert list(got["doc_id"]) == [0]
    # and its tier was computed on the CLEANED text: equal to the manual
    # composition apply_c4_filter -> webtext_tiers
    manual = webtext_tiers(
        rd.from_pandas(apply_c4_filter(docs, "text"))).to_pandas()
    manual = manual[manual["doc_id"] == 0]
    assert got["tier"].iloc[0] == manual["tier"].iloc[0]
    # resuming with the flag toggled must NOT skip: identity differs
    stats2 = webtext_run(f"{src}/*.parquet", out, c4_rules=False,
                         files_per_partition=1, min_rows_per_file=1)
    assert stats2["completed"] == 1 and stats2["skipped"] == 0
