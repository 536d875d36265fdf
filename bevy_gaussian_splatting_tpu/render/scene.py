"""Multi-cloud scene rendering.

The reference draws each cloud entity as a separate Transparent3d phase item,
sorted by per-entity view distance, into one render target
(src/render/mod.rs:344-452 queue_gaussians).  Equivalent here: render clouds
far-to-near, feeding each render's output image as the next render's
background (the blend is associative over whole-image composites).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.models.camera import Camera
from bevy_gaussian_splatting_tpu.io.scene import GaussianScene
from bevy_gaussian_splatting_tpu.render.api import render


def render_scene(
    scene: GaussianScene,
    camera: Camera,
    background: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    settings_override=None,
) -> jnp.ndarray:
    """Composite all scene clouds -> [H, W, 4] linear premultiplied RGBA."""
    if background is None:
        background = jnp.zeros((4,), jnp.float32)

    cam_pos = np.asarray(camera.world_position)

    def entity_distance(sc):
        origin = np.asarray(sc.transform)[:3, 3]
        return float(np.linalg.norm(origin - cam_pos))

    ordered = sorted(scene.clouds, key=entity_distance, reverse=True)  # far first

    image = None
    for sc in ordered:
        settings = settings_override if settings_override is not None else sc.settings
        image = render(
            sc.cloud,
            camera,
            settings,
            model_transform=jnp.asarray(sc.transform, jnp.float32),
            background=background if image is None else image,
            impl=impl,
        )
    if image is None:
        h, w = int(camera.viewport[3]), int(camera.viewport[2])
        image = jnp.broadcast_to(background, (h, w, 4))
    return image


def camera_from_scene(scene: GaussianScene, width: int = 512, height: int = 512) -> Optional[Camera]:
    """Adopt the first scene camera (viewer scene-camera adoption,
    viewer/viewer.rs:294-362): the node's world transform is the camera pose;
    view_from_world is its inverse."""
    if not scene.cameras:
        return None
    sc = scene.cameras[0]
    t = np.asarray(sc.transform, np.float64)
    view = np.linalg.inv(t).astype(np.float32)
    from bevy_gaussian_splatting_tpu.models.camera import perspective_infinite_reverse_rh

    proj = perspective_infinite_reverse_rh(
        sc.yfov_radians or float(np.pi / 4), width / height, sc.znear or 0.1
    )
    return Camera(
        view_from_world=jnp.asarray(view),
        clip_from_view=proj,
        viewport=jnp.array([0, 0, float(width), float(height)], jnp.float32),
        prev_clip_from_world=jnp.asarray(proj @ view),
    )
