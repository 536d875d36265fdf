"""Sparse-outlier selection via kd-tree radius counting.

Reference: src/query/sparse.rs:23-53 — selects gaussians with fewer than
``neighbor_threshold`` neighbors within ``radius`` (the point itself counts as
its own neighbor, matching kd_tree::within_radius semantics).  Used for cloud
cleanup and the ply_to_gcloud import filter.

Host-side scipy cKDTree (the reference is also host-side); for very large
clouds ``chunk`` bounds peak memory.
"""

from __future__ import annotations

import numpy as np

from bevy_gaussian_splatting_tpu.query.select import Select

DEFAULT_RADIUS = 0.05  # sparse.rs:32
DEFAULT_NEIGHBOR_THRESHOLD = 3  # sparse.rs:33


def sparse_select(
    cloud,
    radius: float = DEFAULT_RADIUS,
    neighbor_threshold: int = DEFAULT_NEIGHBOR_THRESHOLD,
    chunk: int = 262_144,
) -> Select:
    """SparseSelect::select (sparse.rs:40-53)."""
    points = np.asarray(cloud.position, dtype=np.float32)
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    counts = np.empty(len(points), dtype=np.int64)
    for lo in range(0, len(points), chunk):
        hi = min(lo + chunk, len(points))
        counts[lo:hi] = tree.query_ball_point(
            points[lo:hi], r=radius, return_length=True
        )
    return Select(np.nonzero(counts < neighbor_threshold)[0])


def remove_outliers(
    cloud,
    radius: float = DEFAULT_RADIUS,
    neighbor_threshold: int = DEFAULT_NEIGHBOR_THRESHOLD,
):
    """Convenience: drop sparse outliers (the ply_to_gcloud filter path,
    tools/ply_to_gcloud.rs)."""
    from bevy_gaussian_splatting_tpu.query.select import extract_selection

    sel = sparse_select(cloud, radius, neighbor_threshold).invert(len(cloud))
    return extract_selection(cloud, sel)
