"""Level-of-detail chains — the reference's declared "level of detail" intent
(README.md:55-58; `src/gaussian/formats/` LOD stub).

A LOD chain is a list of clouds: level 0 is the full cloud; each subsequent
level keeps the top ``ratio`` fraction of gaussians by contribution score
(opacity x screen-footprint proxy).  Optional opacity compensation rescales
the survivors so the total opacity mass of the level approximates the full
cloud's (coarse levels stay similarly "dense" from afar instead of thinning).

Selection maps camera distance to a level with a distance-doubling rule:
every doubling of distance past ``base_distance`` drops one level — the
screen-space footprint of a fixed splat halves per doubling, so the kept
fraction tracks the shrinking pixel coverage.
"""

from __future__ import annotations

from typing import List, Sequence

import dataclasses

import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.stream.slice import aabb_distance, take_rows


def importance_scores(cloud) -> np.ndarray:
    """Per-gaussian contribution proxy: opacity x mean linear extent."""
    opacity = np.asarray(cloud.opacity)
    scale = np.abs(np.asarray(cloud.scale))
    extent = np.cbrt(np.maximum(scale.prod(axis=1), 1e-30))
    return opacity * extent


def build_lod_chain(
    cloud, levels: int = 3, ratio: float = 0.25, compensate: bool = True
) -> List[object]:
    """[full, full*ratio, full*ratio^2, ...] importance-ordered sub-clouds."""
    if levels < 1:
        raise ValueError("levels must be >= 1")
    scores = importance_scores(cloud)
    order = np.argsort(-scores)  # descending importance
    total_mass = float(np.asarray(cloud.opacity).sum())
    chain = [cloud]
    n = len(cloud)
    for lv in range(1, levels):
        k = max(1, int(round(n * ratio**lv)))
        idx = np.sort(order[:k])  # preserve original ordering within a level
        sub = take_rows(cloud, idx)
        if compensate:
            kept_mass = float(np.asarray(sub.opacity).sum())
            gain = min(4.0, total_mass / max(kept_mass, 1e-12))
            so = np.asarray(sub.scale_opacity).copy()
            so[:, 3] = np.minimum(so[:, 3] * gain, 1.0)
            sub = dataclasses.replace(sub, scale_opacity=jnp.asarray(so))
        chain.append(sub)
    return chain


def select_lod(
    aabb_min,
    aabb_max,
    camera_position,
    num_levels: int,
    base_distance: float,
) -> int:
    """Distance-doubling level pick for a chunk with the given AABB.

    Distance is measured from the camera to the AABB (0 inside).  Level 0 up
    to ``base_distance``; +1 per doubling after that, clamped to the chain."""
    d = aabb_distance(aabb_min, aabb_max, camera_position)
    if d <= base_distance:
        return 0
    return int(min(np.floor(np.log2(d / base_distance)) + 1, num_levels - 1))
