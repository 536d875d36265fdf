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


def corrected_scene_camera_transform(sc) -> np.ndarray:
    """Scene-camera pose with the reference's upside-down correction
    (viewer/viewer.rs:319-331): an imported camera whose up vector opposes
    world up (roll ~= PI) is flipped upright by a PI rotation about its own
    forward axis — same look direction, orbit input no longer inverted."""
    t = np.asarray(sc.transform, np.float64).copy()
    rot = t[:3, :3]
    up = rot[:, 1]
    fwd = -rot[:, 2]  # Bevy cameras look down -Z
    world_up = np.array([0.0, 1.0, 0.0])
    if float(up @ world_up) < 0.0:
        f = fwd / max(np.linalg.norm(fwd), 1e-12)
        flip = 2.0 * np.outer(f, f) - np.eye(3)  # rotation by PI about f
        t[:3, :3] = flip @ rot
    return t


def camera_from_scene(scene: GaussianScene, width: int = 512, height: int = 512) -> Optional[Camera]:
    """Adopt the first scene camera (viewer scene-camera adoption,
    viewer/viewer.rs:294-362): the node's world transform is the camera pose
    (upside-down corrected); view_from_world is its inverse."""
    if not scene.cameras:
        return None
    sc = scene.cameras[0]
    t = corrected_scene_camera_transform(sc)
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


def orbit_from_scene_camera(scene: GaussianScene, orbit_radius: float):
    """Initial (az, el, radius, target) for an orbit viewer adopting the
    scene camera (the reference's orbit_from_translation_and_focus init,
    viewer/viewer.rs:333-358): focus sits ``orbit_radius`` along the
    corrected camera's forward axis; azimuth/elevation place the eye at the
    camera translation.  Returns None when the scene has no cameras."""
    if not scene.cameras:
        return None
    t = corrected_scene_camera_transform(scene.cameras[0])
    eye = t[:3, 3]
    fwd = -t[:3, :3][:, 2]
    fwd = fwd / max(np.linalg.norm(fwd), 1e-12)
    target = eye + fwd * orbit_radius
    v = eye - target  # = -fwd * orbit_radius
    r = float(np.linalg.norm(v))
    el = float(np.arcsin(np.clip(v[1] / max(r, 1e-12), -1.0, 1.0)))
    az = float(np.arctan2(v[0], v[2]))
    return az, el, r, tuple(float(x) for x in target)
