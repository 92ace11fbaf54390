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
