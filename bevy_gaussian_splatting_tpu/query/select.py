"""Selection: index lists -> per-gaussian visibility masks.

Reference: src/query/select.rs:13-176.  Selection is encoded in the
``position_visibility.w`` channel (0.0 / 1.0); ``DrawMode.SELECTED`` renders
only w >= 0.5, ``HIGHLIGHT_SELECTED`` recolors them, and classification uses
w >= 2 as a class index — so Select writes floats, not booleans.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Union

import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.models.cloud import Gaussian3dCloud


@dataclasses.dataclass
class Select:
    """An index-list selection (select.rs:13-27)."""

    indices: np.ndarray  # int indices into the cloud

    def __init__(self, indices: Union[Sequence[int], np.ndarray]):
        self.indices = np.asarray(indices, dtype=np.int64)

    def __len__(self) -> int:
        return len(self.indices)

    def invert(self, cloud_size: int) -> "Select":
        """select.rs:29-40."""
        mask = np.ones(cloud_size, dtype=bool)
        mask[self.indices] = False
        return Select(np.nonzero(mask)[0])

    def to_visibility(self, cloud_size: int) -> jnp.ndarray:
        vis = np.zeros(cloud_size, dtype=np.float32)
        vis[self.indices] = 1.0
        return jnp.asarray(vis)


def apply_selection(cloud: Gaussian3dCloud, selection: Select) -> Gaussian3dCloud:
    """Write the selection into the visibility channel (the
    ``apply_selection`` system, select.rs:118-152)."""
    return cloud.with_visibility(selection.to_visibility(len(cloud)))


def selection_from_visibility(cloud) -> Select:
    """Recover the index list from the visibility channel."""
    vis = np.asarray(cloud.visibility)
    return Select(np.nonzero(vis >= 0.5)[0])


def extract_selection(cloud: Gaussian3dCloud, selection: Select) -> Gaussian3dCloud:
    """Subset cloud containing only the selected gaussians — the
    ``SaveSelectionEvent`` path that writes live_output.gcloud
    (select.rs:155-176)."""
    idx = jnp.asarray(selection.indices)
    return Gaussian3dCloud(
        position_visibility=cloud.position_visibility[idx],
        spherical_harmonic=cloud.spherical_harmonic[idx],
        rotation=cloud.rotation[idx],
        scale_opacity=cloud.scale_opacity[idx],
    )


def save_selection(cloud: Gaussian3dCloud, selection: Select, path: str) -> int:
    from bevy_gaussian_splatting_tpu.io.loader import save_cloud

    return save_cloud(extract_selection(cloud, selection), path)
