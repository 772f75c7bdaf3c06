"""Globally-optimal 1:1 assignment (Hungarian algorithm), pure numpy.

The reference uses scipy.optimize.linear_sum_assignment to match local
tracks to wiki tracks per album (song_info_matcher.py:123-208). scipy is
not a dependency here, so this is a standalone O(n·m²) implementation of
the standard shortest-augmenting-path Hungarian method (Jonker-Volgenant
style with row/column potentials — textbook algorithm).
"""

from __future__ import annotations

import numpy as np


def linear_sum_assignment(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimize total cost over a 1:1 assignment.

    Returns (row_indices, col_indices) like scipy's function. Handles
    rectangular matrices; every row of the smaller side is assigned.
    """
    cost = np.asarray(cost, dtype=np.float64)
    if cost.ndim != 2:
        raise ValueError("cost must be 2-D")
    transposed = cost.shape[0] > cost.shape[1]
    if transposed:
        cost = cost.T
    n, m = cost.shape
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    match_col = np.zeros(m + 1, dtype=np.int64)  # col j -> row (1-based, 0=free)
    way = np.zeros(m + 1, dtype=np.int64)

    for i in range(1, n + 1):
        match_col[0] = i
        j0 = 0
        minv = np.full(m + 1, np.inf)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = match_col[j0]
            cols = ~used[1:]
            cur = cost[i0 - 1, cols] - u[i0] - v[1:][cols]
            idx = np.flatnonzero(cols) + 1
            better = cur < minv[idx]
            minv[idx[better]] = cur[better]
            way[idx[better]] = j0
            if idx.size == 0:
                break
            k = np.argmin(minv[idx])
            delta = minv[idx][k]
            j1 = idx[k]
            u[match_col[used]] += delta
            v[used] -= delta
            minv[~used] -= delta
            j0 = j1
            if match_col[j0] == 0:
                break
        while j0 != 0:
            j1 = way[j0]
            match_col[j0] = match_col[j1]
            j0 = j1

    rows, cols = [], []
    for j in range(1, m + 1):
        if match_col[j] != 0:
            rows.append(match_col[j] - 1)
            cols.append(j - 1)
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    order = np.argsort(rows)
    rows, cols = rows[order], cols[order]
    if transposed:
        rows, cols = cols, rows
        order = np.argsort(rows)
        rows, cols = rows[order], cols[order]
    return rows, cols
