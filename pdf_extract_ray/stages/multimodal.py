"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The sandbox has no image/audio codecs, so the DECODE kernels are stubbed:
``DeterministicStubDecoder`` produces a deterministic fake feature vector
from the bytes (so the Ray-side plumbing — schema, batching, actor
signature, output layout — is real and testable), and ``CodecDecoder``
raises ``NotImplementedError`` until a codec library is installed on the
cluster.  Batch sizes stay SMALL for fat binary rows (SURVEY.md §7.4.4 —
a batch x concurrency must fit worker heap).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("url", pa.string()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.large_binary()),  # opaque encoded bytes
        ("content_type", pa.string()),
        ("n_bytes", pa.int64()),
    ]
)


def synth_media_table(n: int, seed: int = 9) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_id", "url", "kind", "payload",
                            "content_type", "n_bytes")}
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        payload = (h * ((i % 7) + 1))[: 64 + (i % 101)]
        kind = kinds[i % 3]
        rows["media_id"].append(i)
        rows["url"].append(f"https://media.example/{kind}/{i}")
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["content_type"].append({"image": "image/jpeg", "audio": "audio/wav",
                                     "video": "video/mp4"}[kind])
        rows["n_bytes"].append(len(payload))
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DeterministicStubDecoder:
    """Actor-pool stage: payload bytes -> fixed-dim feature vector.

    STUB: the "decode" is a seeded hash-derived vector (no codec libs in
    this container); on a real cluster replace the body of ``_decode_one``
    with PIL/torchaudio/ffmpeg and keep the signature."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def _decode_one(self, payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload or b"").digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        return rng.standard_normal(self.dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_one(p) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array([f.tolist() for f in feats],
                                    pa.list_(pa.float32())),
            }
        )


class CodecDecoder:  # pragma: no cover - needs codec libs
    """Real-decoder slot; raises until codecs exist in the environment."""

    def __init__(self, kind: str = "image"):
        raise NotImplementedError(
            "no image/audio codecs in this container; install PIL/ffmpeg on "
            "the cluster and implement decode here (keep the batch signature)"
        )


class FrameSampler:
    """Actor-pool stage: one video row -> N frame rows (1->N explode, the
    multimodal flat-map shape).  Frame selection is every ``stride``-th
    frame up to ``max_frames``.

    STUB decode: a "frame" is a deterministic byte-slice of the payload
    (the container has no video codecs); the Ray-side plumbing — schema,
    fat-row batching, actor state, row multiplication — is real.  On a
    real cluster replace ``_frames_of`` with an ffmpeg/pyav reader and
    keep the signature."""

    def __init__(self, stride: int = 2, max_frames: int = 4):
        self.stride, self.max_frames = stride, max_frames

    def _frames_of(self, payload: bytes) -> list[bytes]:
        payload = payload or b""
        n_virtual = max(1, len(payload) // 16)  # fake "frame count"
        picked = list(range(0, n_virtual, self.stride))[: self.max_frames]
        return [payload[i * 16 : (i + 1) * 16] for i in picked]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("media_id", "frame_no", "frame_bytes",
                               "n_frames_sampled")}
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            if kind != "video":
                continue
            frames = self._frames_of(payload)
            for fn_, fb in enumerate(frames):
                out["media_id"].append(mid)
                out["frame_no"].append(fn_)
                out["frame_bytes"].append(fb)
                out["n_frames_sampled"].append(len(frames))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "frame_no": pa.array(out["frame_no"], pa.int32()),
            "frame_bytes": pa.array(out["frame_bytes"], pa.large_binary()),
            "n_frames_sampled": pa.array(out["n_frames_sampled"], pa.int32()),
        })


def frame_sample(
    media: Dataset, *, stride: int = 2, max_frames: int = 4,
    batch_size: int = 32, concurrency: int = 4,
) -> Dataset:
    """video rows -> sampled frame rows.  Small batches: each output row
    multiplies the payload footprint by up to ``max_frames``."""
    return media.map_batches(
        FrameSampler,
        fn_constructor_args=(stride, max_frames),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_features(
    media: Dataset, *, dim: int = 32, batch_size: int = 64, concurrency: int = 4
) -> Dataset:
    """media rows -> (media_id, kind, feature).  Small batches: payloads are
    fat; concurrency x batch_size x payload must fit the worker heap."""
    return media.map_batches(
        DeterministicStubDecoder,
        fn_constructor_args=(dim,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
