"""Batched multi-camera rendering.

The reference supports multiple ``GaussianCamera``s by chunking the sorted-
entries buffer per camera with dynamic bind-group offsets
(examples/multi_camera.rs, src/sort/mod.rs:347-354).  On TPU the idiomatic
equivalent is a leading camera batch dimension: stack the camera pytrees and
``vmap`` the whole tiled pipeline — every camera's sort/bin/composite runs as
one batched program (and shards across a ``camera`` mesh axis in
parallel/render.make_mesh(camera_parallel=...)).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from bevy_gaussian_splatting_tpu.models.camera import Camera
from bevy_gaussian_splatting_tpu.models.settings import CloudSettings
from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled


def stack_cameras(cameras: Sequence[Camera]) -> Camera:
    """Stack camera pytrees along a leading batch axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cameras)


def render_multi_camera(
    cloud,
    cameras,
    settings: CloudSettings = None,
    width: int = None,
    height: int = None,
    background=None,
    compositor: str = "xla",
) -> jnp.ndarray:
    """Render one cloud from a batch of cameras -> [C, H, W, 4].

    ``cameras`` is a list of Camera or an already-stacked Camera batch.
    All cameras share one viewport size (pass width/height explicitly when
    the stacked viewport is traced)."""
    if settings is None:
        settings = CloudSettings()
    if isinstance(cameras, (list, tuple)):
        if width is None:
            width = int(cameras[0].viewport[2])
        if height is None:
            height = int(cameras[0].viewport[3])
        cameras = stack_cameras(cameras)
    elif width is None or height is None:
        raise ValueError("pass width/height with a pre-stacked camera batch")

    def one(camera):
        return render_tiled(
            cloud, camera, settings, background=background,
            width=width, height=height, differentiable=False,
            compositor=compositor,
        )

    return jax.vmap(one)(cameras)
