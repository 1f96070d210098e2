"""Surface simplification: vertex-clustering decimation.

Fills the role of the reference's meshoptimizer-based quadric collapse (SimplifySurface,
src/mesh/Tets.cpp:249-261) on the solve-input path: lower `ratio` -> coarser surface ->
faster tetrahedralization/solve. Clustering on a uniform grid is cruder than quadric
collapse but robust on watertight inputs and fully vectorized; a quality-parity
edge-collapse pass is planned work.
"""

from __future__ import annotations

import numpy as np


def simplify_surface(
    positions: np.ndarray, tris: np.ndarray, ratio: float
) -> tuple[np.ndarray, np.ndarray]:
    """Reduce triangle count to roughly `ratio` of the input (ratio in (0, 1])."""
    positions = np.asarray(positions, dtype=np.float64).reshape(-1, 3)
    tris = np.asarray(tris, dtype=np.int64).reshape(-1, 3)
    if ratio >= 1.0 or tris.shape[0] <= 8:
        return positions.copy(), tris.astype(np.uint32)

    lo = positions.min(axis=0)
    extent = (positions.max(axis=0) - lo).max()
    if extent <= 0:
        return positions.copy(), tris.astype(np.uint32)

    # Triangle count scales ~ quadratically with grid resolution on a surface.
    target_tris = max(int(tris.shape[0] * ratio), 4)
    res = 8
    best = None
    for _ in range(12):
        cell = extent / res
        keys = np.floor((positions - lo) / cell).astype(np.int64)
        key1d = (keys[:, 0] << 42) | (keys[:, 1] << 21) | keys[:, 2]
        uniq, inverse = np.unique(key1d, return_inverse=True)
        # Cluster representative: mean position.
        reps = np.zeros((uniq.size, 3))
        counts = np.bincount(inverse, minlength=uniq.size).astype(np.float64)
        for d in range(3):
            reps[:, d] = np.bincount(inverse, weights=positions[:, d], minlength=uniq.size)
        reps /= counts[:, None]
        new_tris = inverse[tris]
        keep = (
            (new_tris[:, 0] != new_tris[:, 1])
            & (new_tris[:, 1] != new_tris[:, 2])
            & (new_tris[:, 0] != new_tris[:, 2])
        )
        new_tris = new_tris[keep]
        best = (reps, new_tris.astype(np.uint32))
        if new_tris.shape[0] >= target_tris or res > 4096:
            break
        res *= 2
    reps, new_tris = best
    # Compact to used vertices.
    used, remap = np.unique(new_tris.reshape(-1), return_inverse=True)
    return reps[used], remap.reshape(-1, 3).astype(np.uint32)
