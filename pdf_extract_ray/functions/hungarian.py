"""Minimal rectangular Hungarian algorithm (linear sum assignment).

scipy is not available in the sandbox, so this is a from-scratch
implementation of the classic shortest-augmenting-path / potentials
formulation (Jonker-Volgenant style), minimizing total cost.  Returns
(row_indices, col_indices) with the same semantics as
``scipy.optimize.linear_sum_assignment`` for cost matrices with
n_rows <= n_cols (callers transpose otherwise).  Used by the alignment
stage (reference: euaa_사례/sentences/aligner.py:239 uses scipy).
"""

from __future__ import annotations

import numpy as np


def linear_sum_assignment(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cost = np.asarray(cost, dtype=np.float64)
    transposed = False
    if cost.shape[0] > cost.shape[1]:
        cost = cost.T
        transposed = True
    n, m = cost.shape
    INF = np.inf

    # potentials; way[j] = previous column on the augmenting path
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=np.int64)  # p[j] = row assigned to column j (1-based)
    way = np.zeros(m + 1, dtype=np.int64)

    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1

    rows = np.empty(n, dtype=np.int64)
    cols = np.empty(n, dtype=np.int64)
    k = 0
    for j in range(1, m + 1):
        if p[j] != 0:
            rows[k] = p[j] - 1
            cols[k] = j - 1
            k += 1
    order = np.argsort(rows)
    rows, cols = rows[order], cols[order]
    if transposed:
        order = np.argsort(cols)
        return cols[order], rows[order]
    return rows, cols
