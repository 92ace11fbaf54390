"""PDF-style span-table layout tagging (M1-M5 faithful path) and
multimodal stub plumbing tests."""

import pandas as pd
import pytest

from pdf_extract_ray.config import ExtractConfig
from pdf_extract_ray.stages.layout import tag_page_lines
from pdf_extract_ray.stages.multimodal import (
    DeterministicStubDecoder,
    media_features,
    synth_media_table,
)


def L(x0, y0, text, size=12.0, flags=0, color=0, x1=None, y1=None):
    return {"x0": x0, "y0": y0, "x1": x1 or x0 + 100, "y1": y1 or y0 + 12,
            "text": text, "size": size, "flags": flags, "color": color}


PAGE_W, PAGE_H = 600.0, 800.0


class TestLayout:
    def test_header_footer_stripped(self):
        lines = [
            L(50, 10, "running header", y1=20),     # fully above 5% = 40
            L(50, 400, "body text"),
            L(50, 790, "page 1 of 9", y1=799),      # below 95% = 760
        ]
        out = tag_page_lines(lines, PAGE_W, PAGE_H, 1)
        assert [b.text for b in out] == ["body text"]

    def test_two_column_reading_order(self):
        lines = [
            L(350, 100, "right top"),
            L(50, 200, "left bottom"),
            L(50, 100, "left top"),
            L(350, 200, "right bottom"),
        ]
        out = tag_page_lines(lines, PAGE_W, PAGE_H, 1)
        assert [b.text for b in out] == [
            "left top", "left bottom", "right top", "right bottom"]

    def test_style_tagging(self):
        cfg = ExtractConfig()
        lines = [
            L(50, 100, "big bold title", size=20, flags=16),
            L(50, 120, "colored bold", size=12, flags=16, color=3101846),
            L(50, 140, "plain bold", size=12, flags=16),
            L(50, 160, "body one", size=12),
            L(50, 180, "body two", size=12),
        ]
        out = tag_page_lines(lines, PAGE_W, PAGE_H, 1, cfg)
        assert [b.tag for b in out] == ["H1", "H3", "H2", "P", "P"]

    def test_body_size_mode_tie_break_first_seen(self):
        # sizes 10 and 12 tie 2-2; first-seen (reading order) wins -> 10
        lines = [
            L(50, 100, "a", size=10), L(50, 120, "b", size=12),
            L(50, 140, "c", size=10), L(50, 160, "d", size=12),
            L(50, 180, "big bold", size=15, flags=16),
        ]
        out = tag_page_lines(lines, PAGE_W, PAGE_H, 1)
        assert out[-1].tag == "H1"  # 15 >= 1.5 * 10

    def test_whitespace_collapse_and_empty_drop(self):
        lines = [L(50, 100, "  a   b  "), L(50, 120, "   ")]
        out = tag_page_lines(lines, PAGE_W, PAGE_H, 1)
        assert [b.text for b in out] == ["a b"]

    def test_empty_page(self):
        assert tag_page_lines([], PAGE_W, PAGE_H, 1) == []


class TestMultimodal:
    def test_synth_media_deterministic(self):
        a, b = synth_media_table(10), synth_media_table(10)
        assert a.equals(b)

    def test_stub_decoder_shape(self):
        t = synth_media_table(8)
        out = DeterministicStubDecoder(dim=16)(t)
        assert out.num_rows == 8
        assert len(out["feature"][0].as_py()) == 16

    def test_media_features_pipeline(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(synth_media_table(40)).repartition(4)
        out = media_features(ds, dim=8, batch_size=16, concurrency=2).take_all()
        assert len(out) == 40
        by_id = {r["media_id"]: r["feature"] for r in out}
        # deterministic per payload
        again = media_features(
            rd.from_arrow(synth_media_table(40)), dim=8, batch_size=16,
            concurrency=2).take_all()
        assert {r["media_id"]: list(r["feature"]) for r in again} == {
            k: list(v) for k, v in by_id.items()}


def test_frame_sample_explodes_video_rows(ray_session):
    """1->N multimodal explode: only video rows emit frames, frame count
    respects stride/max_frames, and the operator is deterministic."""
    import ray.data as rd

    from pdf_extract_ray.stages.multimodal import (
        FrameSampler, frame_sample, synth_media_table)

    t = synth_media_table(60)
    ds = rd.from_arrow(t).repartition(3)
    out = frame_sample(ds, stride=2, max_frames=3, concurrency=2).take_all()
    vids = {i for i, k in zip(t.column("media_id").to_pylist(),
                              t.column("kind").to_pylist()) if k == "video"}
    assert {r["media_id"] for r in out} == vids
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_id.items():
        assert [r["frame_no"] for r in sorted(rows, key=lambda r: r["frame_no"])] \
            == list(range(len(rows)))
        assert all(r["n_frames_sampled"] == len(rows) for r in rows)
        assert 1 <= len(rows) <= 3
    # deterministic vs the single-process stage
    sp = FrameSampler(2, 3)(t)
    assert sorted((r["media_id"], r["frame_no"], r["frame_bytes"]) for r in out) \
        == sorted(zip(sp.column("media_id").to_pylist(),
                      sp.column("frame_no").to_pylist(),
                      sp.column("frame_bytes").to_pylist()))


# --- content-type sniffing ---------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 4])
def test_sniff_content_type_rules(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.multimodal import (
        sniff_content_type, sniff_content_type_oracle_sql)

    rows = [
        (0, b"%PDF-1.4 etc", "pdf"),
        (1, b"\x89PNG\r\n\x1a\nrest", "png"),
        (2, b"\xff\xd8\xff\xe1exif", "jpeg"),
        (3, b"GIF89a;;;", "gif"),
        (4, b"GIF87a;;;", "gif"),
        (5, b"RIFF1234WAVEfmt ", "wav"),
        (6, b"RIFF1234AVI LIST", "riff"),
        (7, b"BM66", "bmp"),
        (8, b"\x1f\x8b\x08gz", "gzip"),
        (9, b"PK\x03\x04zipzip", "zip"),
        (10, b"<?xml version", "xml"),
        (11, b"<html><body>", "html"),
        (12, b"<!DOCTYPE html>", "html"),
        (13, b"just text", "unknown"),
        (14, b"", "unknown"),
        (15, b"R", "unknown"),  # shorter than any prefix
    ]
    df = pd.DataFrame({"doc_id": [r[0] for r in rows],
                       "payload": [r[1] for r in rows]})
    got = (sniff_content_type(rd.from_pandas(df).repartition(blocks))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["content_type"].tolist() == [r[2] for r in rows]
    con = duckdb.connect()
    con.register("t", df)
    sql = sniff_content_type_oracle_sql("SELECT * FROM t", "payload")
    want = (con.sql(sql).df().sort_values("doc_id")
            .reset_index(drop=True))
    assert want["content_type"].tolist() == [r[2] for r in rows]
