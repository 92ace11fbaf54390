"""Scalar document-fingerprint primitives (winnowing / set overlap).

Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash all character
k-grams with a rolling polynomial hash, keep the minimum of each sliding
window (rightmost on ties).  Guarantee preserved: any document of
normalized length >= k yields at least one fingerprint.
"""

from __future__ import annotations

from collections import deque

# base must exceed the Unicode codepoint range (0x10FFFF) or distinct
# k-grams collide deterministically (e.g. (c, d) vs (c+1, d-B))
_B = 1_114_513
_M = (1 << 61) - 1


def set_jaccard(sa: set, sb: set, *, empty_value: float = 0.0) -> float:
    """Jaccard of two sets.  ``empty_value`` is returned when BOTH sets are
    empty: 0.0 for winnowing (a doc too short to fingerprint is not evidence
    of similarity), 1.0 for shingle sets (only truly empty texts produce an
    empty shingle set, and empty == empty)."""
    if not sa and not sb:
        return empty_value
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def winnow_fingerprints(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing fingerprints of whitespace-normalized, lowercased text."""
    t = " ".join((text or "").lower().split())
    n = len(t)
    if n < k:
        return []
    top = pow(_B, k - 1, _M)
    h = 0
    hashes: list[int] = []
    for i, ch in enumerate(t):
        h = (h * _B + ord(ch)) % _M
        if i >= k - 1:
            hashes.append(h)
            h = (h - ord(t[i - k + 1]) * top) % _M
    if len(hashes) < window:
        return [min(hashes)]
    # monotonic deque of indices: amortized O(1) sliding-window minimum;
    # <= keeps the RIGHTMOST minimal index on ties
    out: list[int] = []
    dq: deque[int] = deque()
    last_pick = -1
    for i, v in enumerate(hashes):
        while dq and hashes[dq[-1]] >= v:
            dq.pop()
        dq.append(i)
        if dq[0] <= i - window:
            dq.popleft()
        if i >= window - 1 and dq[0] != last_pick:
            last_pick = dq[0]
            out.append(hashes[last_pick])
    return out


def winnow_overlap(a: str, b: str, k: int = 5, window: int = 4) -> float:
    """Jaccard overlap of winnowing fingerprint sets."""
    return set_jaccard(
        set(winnow_fingerprints(a, k, window)), set(winnow_fingerprints(b, k, window))
    )
