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
