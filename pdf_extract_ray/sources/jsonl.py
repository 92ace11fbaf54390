"""JSONL(.gz) interchange — the dominant LLM-corpus exchange format
(C4 / The Pile / Dolma releases ship gzipped JSON-lines; public
convention).  Reading uses Ray Data's native ``read_json`` (one task
per file, gz-transparent); this module adds the WRITER the engine was
missing plus a strict round-trip contract.

Frozen serialization rules (so round-trips are byte-stable and
diffable):

* one JSON object per line, ``\\n`` terminated;
* keys in sorted order, ``ensure_ascii=False`` (utf-8 bytes),
  compact separators ``(", ", ": ")`` -> ``(',', ':')``;
* timestamps serialize as ``YYYY-MM-DDTHH:MM:SS[.ffffff]`` ISO strings
  (microsecond precision, the parquet-side unit);
* NaN/None -> JSON ``null``;
* files are gzip members with ``mtime=0`` (deterministic bytes) named
  by the md5 of their UNCOMPRESSED content, written atomically —
  re-running over identical data rewrites identical files.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa


def rows_to_jsonl_bytes(df: pd.DataFrame) -> bytes:
    """The frozen serialization of a DataFrame block (uncompressed)."""
    out = io.StringIO()
    cols = list(df.columns)
    for rec in df.itertuples(index=False):
        obj = {}
        for k, v in zip(cols, rec):
            if v is None or (isinstance(v, float) and v != v) or \
                    v is pd.NaT:
                obj[k] = None
            elif isinstance(v, pd.Timestamp):
                obj[k] = v.isoformat()
            elif isinstance(v, (np.integer,)):
                obj[k] = int(v)
            elif isinstance(v, (np.floating,)):
                obj[k] = float(v)
            elif isinstance(v, (np.bool_,)):
                obj[k] = bool(v)
            else:
                obj[k] = v
        out.write(json.dumps(obj, ensure_ascii=False, sort_keys=True,
                             separators=(",", ":")))
        out.write("\n")
    return out.getvalue().encode("utf-8")


def write_jsonl(
    ds,
    out_dir: str,
    *,
    compress: bool = True,
) -> pa.Table:
    """Distributed JSONL export sink — each block becomes one
    ``.jsonl[.gz]`` file (frozen serialization above), atomic rename,
    content-named.  Returns the small manifest ``(path, n_records)``.

    Scale shape: pure map, no shuffle, no driver materialization of
    bodies; parallelism = block count (mirror of
    :func:`sources.warc.write_wet`)."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "n_records": pd.Series([], dtype="int64")})
        raw = rows_to_jsonl_bytes(b)
        name = hashlib.md5(raw).hexdigest()[:16]
        if compress:
            buf = io.BytesIO()
            gz = gzip.GzipFile(fileobj=buf, mode="wb", mtime=0)
            gz.write(raw)
            gz.close()
            data, suffix = buf.getvalue(), ".jsonl.gz"
        else:
            data, suffix = raw, ".jsonl"
        path = os.path.join(out_dir, f"part-{name}{suffix}")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pd.DataFrame({
            "path": [path],
            "n_records": np.array([len(b)], np.int64)})

    manifest = ds.map_batches(dump, batch_format="pandas").to_pandas()
    return pa.Table.from_pandas(
        manifest.sort_values("path").reset_index(drop=True))


def read_jsonl(paths, **read_kwargs):
    """``Dataset`` from JSONL/JSONL.GZ files — Ray Data's native
    ``read_json`` (gz-transparent, one task per file)."""
    import ray.data as rd

    return rd.read_json(paths, **read_kwargs)
