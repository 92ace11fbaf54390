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
