"""Camera model mirroring the Bevy view uniforms the reference shaders consume.

The reference reads ``view.view_from_world``, ``view.clip_from_view``,
``view.unjittered_clip_from_world``, ``view.viewport`` and ``view.world_position``
(src/render/bindings.wgsl, src/render/helpers.wgsl:8-55, src/render/transform.wgsl:5-9).
Bevy's 3D camera is right-handed, looks down -Z in view space, and uses an
infinite-reverse-Z projection.  This module reproduces those conventions exactly so
projection math (EWA cov2d focal terms, frustum test with z in (0, 1)) matches.

Matrices use standard numpy row-major [row, col] with column-vector convention:
``clip = M @ [x, y, z, 1]^T`` — numerically identical to the WGSL column-major
``M * v``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


def look_at_rh(eye, target, up) -> jnp.ndarray:
    """Right-handed view matrix (world -> view), glam ``Mat4::look_at_rh``
    convention used by Bevy's ``Transform::looking_at``."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)

    f = target - eye
    f = f / jnp.linalg.norm(f)
    s = jnp.cross(f, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)

    m = jnp.stack(
        [
            jnp.concatenate([s, jnp.array([-jnp.dot(s, eye)])]),
            jnp.concatenate([u, jnp.array([-jnp.dot(u, eye)])]),
            jnp.concatenate([-f, jnp.array([jnp.dot(f, eye)])]),
            jnp.array([0.0, 0.0, 0.0, 1.0]),
        ]
    )
    return m.astype(jnp.float32)


def perspective_infinite_reverse_rh(fov_y_radians: float, aspect: float, z_near: float) -> jnp.ndarray:
    """Bevy/glam ``Mat4::perspective_infinite_reverse_rh``: reverse-Z, NDC z in
    (0, 1] with z=1 at the near plane — matches the reference's depth test
    ``GreaterEqual`` and ``in_frustum`` z-window (src/render/transform.wgsl:11-14)."""
    f = 1.0 / jnp.tan(jnp.asarray(fov_y_radians, jnp.float32) / 2.0)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(f / aspect)
    m = m.at[1, 1].set(f)
    m = m.at[2, 3].set(z_near)
    m = m.at[3, 2].set(-1.0)
    return m


@_pytree_dataclass
class Camera:
    """View + projection + viewport state for one render.

    viewport = (x, y, width, height) in physical pixels (Bevy ``view.viewport``).
    """

    view_from_world: jax.Array  # [4, 4]
    clip_from_view: jax.Array  # [4, 4]
    viewport: jax.Array  # [4] (x, y, w, h)
    # Previous-frame clip_from_world for optical flow
    # (reference previous_view_uniforms, src/material/optical_flow.wgsl:16-40).
    prev_clip_from_world: jax.Array  # [4, 4]

    @property
    def clip_from_world(self) -> jax.Array:
        return self.clip_from_view @ self.view_from_world

    @property
    def world_position(self) -> jax.Array:
        """Camera position: -R^T t of the view matrix."""
        r = self.view_from_world[:3, :3]
        t = self.view_from_world[:3, 3]
        return -r.T @ t

    @property
    def width(self) -> jax.Array:
        return self.viewport[2]

    @property
    def height(self) -> jax.Array:
        return self.viewport[3]

    @staticmethod
    def create(
        eye=(0.0, 1.5, 5.0),
        target=(0.0, 0.0, 0.0),
        up=(0.0, 1.0, 0.0),
        width: int = 512,
        height: int = 512,
        fov_y_radians: float = float(np.pi / 4.0),
        z_near: float = 0.1,
        prev_clip_from_world=None,
    ) -> "Camera":
        """Build a camera the way the reference viewer does (viewer/viewer.rs
        pan-orbit camera + Bevy default ``PerspectiveProjection``: fov pi/4,
        near 0.1)."""
        view = look_at_rh(eye, target, up)
        proj = perspective_infinite_reverse_rh(fov_y_radians, width / height, z_near)
        if prev_clip_from_world is None:
            prev_clip_from_world = proj @ view
        return Camera(
            view_from_world=view,
            clip_from_view=proj,
            viewport=jnp.array([0.0, 0.0, float(width), float(height)], jnp.float32),
            prev_clip_from_world=jnp.asarray(prev_clip_from_world, jnp.float32),
        )
