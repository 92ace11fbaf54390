"""Engine metric formatting helpers (reference: utils.py:226-283 —
format_file_size / format_duration / safe_filename / estimate time)."""

from __future__ import annotations

import re


def format_file_size(n_bytes: float) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n_bytes) < 1024 or unit == "TB":
            return f"{n_bytes:.1f} {unit}" if unit != "B" else f"{int(n_bytes)} B"
        n_bytes /= 1024
    return f"{n_bytes:.1f} TB"


def format_duration(seconds: float) -> str:
    seconds = int(seconds)
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    if h:
        return f"{h}h {m}m {s}s"
    if m:
        return f"{m}m {s}s"
    return f"{s}s"


_UNSAFE_RE = re.compile(r"[^\w.\-]+", re.UNICODE)


def safe_filename(name: str, max_len: int = 120) -> str:
    return _UNSAFE_RE.sub("_", name).strip("_")[:max_len] or "_"


def estimate_remaining_s(done: int, total: int, elapsed_s: float) -> float:
    """ETA from completed/total partitions (utils.py:269 analogue, but
    measured from actual progress instead of a fixed per-batch guess)."""
    if done <= 0:
        return float("inf")
    return (total - done) * (elapsed_s / done)
