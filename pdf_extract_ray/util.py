"""Small runtime helpers (no ray.init here — sessions are owned by callers)."""

from __future__ import annotations


def default_concurrency(reserve: int = 2, cap: int = 64) -> int:
    """Size an actor pool to the cluster: total CPUs minus a reserve for the
    read/write stages, so one pool never starves the rest of the pipeline."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 4))
        else:
            import os

            cpus = os.cpu_count() or 4
    except Exception:
        cpus = 4
    return max(1, min(cap, cpus - reserve))


def round_half_away(x, ndigits: int):
    """Round half away from zero (DuckDB/SQL ROUND semantics) — numpy and
    Python ``round`` use banker's rounding, which breaks oracle parity on
    exact .5 boundaries."""
    import numpy as np

    arr = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** ndigits
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    return out


def parse_stats(stats_str: str) -> list[dict]:
    """Parse ``Dataset.stats()`` into per-operator dicts (name, wall_s,
    remote_wall_total_s, udf_total_s, rows) — the feedback loop for sizing
    batch/concurrency per stage without eyeballing the raw text."""
    import re

    out = []
    for block in stats_str.split("Operator ")[1:]:
        head = block.split("\n", 1)[0]
        m = re.match(r"\d+ (.+?): .*?in ([0-9.]+)s", head)
        if not m:
            continue
        op = {"name": m.group(1), "wall_s": float(m.group(2))}
        rw = re.search(r"Remote wall time:.*? ([0-9.]+)(us|ms|s) total", block)
        if rw:
            mult = {"us": 1e-6, "ms": 1e-3, "s": 1.0}[rw.group(2)]
            op["remote_wall_total_s"] = round(float(rw.group(1)) * mult, 3)
        udf = re.search(r"UDF time:.*? ([0-9.]+)(us|ms|s) total", block)
        if udf:
            mult = {"us": 1e-6, "ms": 1e-3, "s": 1.0}[udf.group(2)]
            op["udf_total_s"] = round(float(udf.group(1)) * mult, 3)
        rows = re.search(r"Output num rows per block:.*? (\d+) total", block)
        if rows:
            op["rows"] = int(rows.group(1))
        out.append(op)
    return out
