"""Real stdlib-decodable media: BMP/WAV codecs (functions/bmp.py) and the
decoded-pixel feature + frame-sampling stages built on them."""
import numpy as np
import pyarrow as pa
import pytest

from pdf_extract_ray.functions.bmp import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    split_bmp_stream,
)


class TestBmpCodec:
    @pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (5, 4), (7, 9), (16, 2)])
    def test_round_trip_all_padding_residues(self, w, h):
        # w covers every (w*3) % 4 padding residue
        rng = np.random.RandomState(w * 100 + h)
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)

    def test_top_down_decode(self):
        px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        data = bytearray(encode_bmp(px))
        # flip to top-down: negate height, reverse stored row order
        import struct
        off = struct.unpack_from("<I", data, 10)[0]
        h = struct.unpack_from("<i", data, 22)[0]
        struct.pack_into("<i", data, 22, -h)
        stride = (3 * 3 + 3) & ~3
        rows = [bytes(data[off + i * stride: off + (i + 1) * stride])
                for i in range(h)]
        data[off:] = b"".join(reversed(rows))
        assert np.array_equal(decode_bmp(bytes(data)), px)

    def test_rejects_garbage_and_truncation(self):
        with pytest.raises(ValueError):
            decode_bmp(b"not a bmp at all")
        good = encode_bmp(np.zeros((4, 4, 3), np.uint8))
        with pytest.raises(ValueError):
            decode_bmp(good[:30])
        with pytest.raises(ValueError):
            decode_bmp(good[: len(good) - 5])

    def test_split_stream(self):
        frames = [encode_bmp(np.full((2, 2, 3), i, np.uint8)) for i in range(5)]
        parts = split_bmp_stream(b"".join(frames))
        assert parts == frames
        with pytest.raises(ValueError):
            split_bmp_stream(b"".join(frames) + b"xx")

    def test_wav_round_trip(self):
        s = (np.sin(np.linspace(0, 20, 500)) * 20000).astype(np.int16)
        out, rate = decode_wav(encode_wav(s, 16000))
        assert rate == 16000 and np.array_equal(out, s)


class TestDecodedMediaStages:
    def test_synth_bmp_table_payloads_decode(self):
        from pdf_extract_ray.stages.multimodal import synth_bmp_media_table

        t = synth_bmp_media_table(30)
        # deterministic bytes
        assert t.equals(synth_bmp_media_table(30))
        for kind, payload in zip(t["kind"].to_pylist(), t["payload"].to_pylist()):
            if kind == "image":
                assert decode_bmp(payload).ndim == 3
            elif kind == "video":
                assert all(decode_bmp(f).ndim == 3
                           for f in split_bmp_stream(payload))
            else:
                samples, rate = decode_wav(payload)
                assert len(samples) >= 200 and rate == 8000

    def test_pixel_features_match_plain_decode(self, ray_session):
        import ray.data as rd

        from pdf_extract_ray.stages.multimodal import (
            media_pixel_features, synth_bmp_media_table)

        t = synth_bmp_media_table(45)
        out = {r["media_id"]: r for r in media_pixel_features(
            rd.from_arrow(t).repartition(4), batch_size=8, concurrency=2
        ).take_all()}
        assert len(out) == 45
        for mid, kind, payload in zip(t["media_id"].to_pylist(),
                                      t["kind"].to_pylist(),
                                      t["payload"].to_pylist()):
            r = out[mid]
            if kind == "image":
                px = decode_bmp(payload)
                assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
                assert r["mean_lum"] == pytest.approx(px.mean(), abs=1e-6)
            elif kind == "video":
                frames = split_bmp_stream(payload)
                assert r["n_frames"] == len(frames)
            else:
                samples, rate = decode_wav(payload)
                assert r["n_samples"] == len(samples) and r["sample_rate"] == rate
                assert 0.0 < r["rms"] < 1.0

    def test_frame_sample_bmp_codec_emits_real_frames(self, ray_session):
        import ray.data as rd

        from pdf_extract_ray.stages.multimodal import (
            frame_sample, synth_bmp_media_table)

        t = synth_bmp_media_table(24)
        out = frame_sample(rd.from_arrow(t), stride=1, max_frames=3,
                           codec="bmp", concurrency=2).take_all()
        n_videos = sum(1 for k in t["kind"].to_pylist() if k == "video")
        assert len({r["media_id"] for r in out}) == n_videos
        for r in out:
            px = decode_bmp(r["frame_bytes"])  # every frame really decodes
            assert px.ndim == 3 and px.shape[2] == 3
