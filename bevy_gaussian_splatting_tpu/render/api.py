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
_COUNTER_CACHE: dict = {}
_BUDGET_STATE: dict = {}
_RECOUNT_PERIOD = 16  # frames between pair-count refreshes per pipeline key


def _oracle_pipeline(settings: CloudSettings, width: int, height: int):
    def fn(cloud, camera, model_transform, background, time):
        return render_oracle(
            cloud, camera, settings, model_transform, background, time,
            width=width, height=height,
        )

    return jax.jit(fn)


def _current_bucket(key, settings, width, height, cloud, camera, model_transform):
    """Adaptive pair-budget bucket: an exact N-sized pair count sizes the
    static expansion buffers to the scene (re-measured every
    ``_RECOUNT_PERIOD`` frames; growth is immediate since the count is exact
    for the frame about to render)."""
    from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
        pair_count,
        pairs_budget,
    )

    state = _BUDGET_STATE.get(key)
    if state is not None:
        bucket, frame = state
        if (frame + 1) % _RECOUNT_PERIOD:
            _BUDGET_STATE[key] = (bucket, frame + 1)
            return bucket
    counter = _COUNTER_CACHE.get(key)
    if counter is None:
        counter = jax.jit(
            functools.partial(
                pair_count, settings=settings, width=width, height=height
            )
        )
        _COUNTER_CACHE[key] = counter
    total = int(counter(cloud, camera, model_transform=model_transform))
    n = len(cloud)
    bucket = pairs_budget(n, total)
    if state is not None and bucket < state[0]:
        bucket = state[0]  # shrink lazily (avoid recompile churn on zoom-out)
    _BUDGET_STATE[key] = (bucket, (state[1] + 1) if state else 0)
    return bucket


def render(
    cloud,
    camera: Camera,
    settings: Optional[CloudSettings] = None,
    model_transform: Optional[jnp.ndarray] = None,
    background: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    adaptive_budget: bool = True,
) -> jnp.ndarray:
    """Render one cloud -> [H, W, 4] linear premultiplied RGBA.

    ``impl='auto'`` selects the tiled renderer with the Pallas compositor on
    TPU (XLA compositor elsewhere); ``adaptive_budget`` sizes the pair buffers
    to a measured per-scene pair count (recompiling only on bucket growth)."""
    if settings is None:
        settings = CloudSettings()
    if model_transform is None:
        model_transform = jnp.eye(4, dtype=jnp.float32)
    if background is None:
        background = jnp.zeros((4,), jnp.float32)

    width = int(camera.viewport[2])
    height = int(camera.viewport[3])

    compositor = "xla"
    if impl == "auto":
        try:
            from bevy_gaussian_splatting_tpu.ops.rasterize_tile import supports

            impl = "tiled" if supports(settings) else "oracle"
        except ImportError:
            impl = "oracle"
        if impl == "tiled" and jax.default_backend() == "tpu":
            compositor = "pallas"
    elif impl == "tiled-pallas":
        impl, compositor = "tiled", "pallas"

    base_key = (
        impl, compositor, settings.static_key(), width, height, len(cloud),
        type(cloud).__name__,
    )
    bucket = None
    if impl == "tiled" and adaptive_budget:
        bucket = _current_bucket(
            base_key, settings, width, height, cloud, camera, model_transform
        )
    key = base_key + (bucket,)
    pipe = _PIPELINE_CACHE.get(key)
    if pipe is None:
        if impl == "tiled":
            from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
                make_tiled_pipeline,
            )

            pipe = make_tiled_pipeline(
                settings, width, height, compositor=compositor, pairs_max=bucket
            )
        else:
            pipe = _oracle_pipeline(settings, width, height)
        _PIPELINE_CACHE[key] = pipe

    return pipe(cloud, camera, model_transform, background, jnp.float32(settings.time))
