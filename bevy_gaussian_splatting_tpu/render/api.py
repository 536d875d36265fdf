"""The functional render API with a compiled-pipeline cache.

``render(cloud, camera, settings) -> image`` is the framework's equivalent of
the reference's whole render graph (extract -> sort -> draw,
src/render/mod.rs:87-219): static settings specialize a jitted pipeline the way
``CloudPipelineKey`` specializes a wgpu pipeline (src/render/mod.rs:898-909),
and the cache mirrors ``SpecializedRenderPipelines``.

Implementations:
  - "oracle": exact pure-jnp painter (ops/rasterize_ref.py) — O(N*H*W)
  - "tiled":  production tile-binned renderer (ops/rasterize_tile.py)
  - "auto":   tiled when available for the mode, else oracle
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from bevy_gaussian_splatting_tpu.models.camera import Camera
from bevy_gaussian_splatting_tpu.models.settings import CloudSettings
from bevy_gaussian_splatting_tpu.ops.rasterize_ref import render_oracle

_PIPELINE_CACHE: dict = {}


def _oracle_pipeline(settings: CloudSettings, width: int, height: int):
    def fn(cloud, camera, model_transform, background, time):
        return render_oracle(
            cloud, camera, settings, model_transform, background, time,
            width=width, height=height,
        )

    return jax.jit(fn)


def render(
    cloud,
    camera: Camera,
    settings: Optional[CloudSettings] = None,
    model_transform: Optional[jnp.ndarray] = None,
    background: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Render one cloud -> [H, W, 4] linear premultiplied RGBA."""
    if settings is None:
        settings = CloudSettings()
    if model_transform is None:
        model_transform = jnp.eye(4, dtype=jnp.float32)
    if background is None:
        background = jnp.zeros((4,), jnp.float32)

    width = int(camera.viewport[2])
    height = int(camera.viewport[3])

    if impl == "auto":
        try:
            from bevy_gaussian_splatting_tpu.ops.rasterize_tile import supports

            impl = "tiled" if supports(settings) else "oracle"
        except ImportError:
            impl = "oracle"

    key = (impl, settings.static_key(), width, height, len(cloud), type(cloud).__name__)
    pipe = _PIPELINE_CACHE.get(key)
    if pipe is None:
        if impl == "tiled":
            from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
                make_tiled_pipeline,
            )

            pipe = make_tiled_pipeline(settings, width, height)
        else:
            pipe = _oracle_pipeline(settings, width, height)
        _PIPELINE_CACHE[key] = pipe

    return pipe(cloud, camera, model_transform, background, jnp.float32(settings.time))
