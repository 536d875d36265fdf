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
    convention used by Bevy's ``Transform::looking_at``.

    Host numpy math: a 4x4 camera build is ~20 scalar ops, and issuing them
    as eager device ops costs a dispatch round-trip EACH through the remote
    relay (~40-60 ms per camera — measured dominating the interactive
    replay loop); one small transfer of the finished matrix is ~free.
    Traced arguments (inside jit) keep the jnp path — the public contract
    stays traceable."""
    if any(
        isinstance(a, jax.core.Tracer) for a in (eye, target, up)
    ):
        return _look_at_rh_jnp(eye, target, up)
    return jnp.asarray(_look_at_rh_np(eye, target, up))


def _look_at_rh_jnp(eye, target, up) -> jnp.ndarray:
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = target - eye
    f = f / jnp.linalg.norm(f)
    s = jnp.cross(f, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)
    return jnp.stack(
        [
            jnp.concatenate([s, -jnp.dot(s, eye)[None]]),
            jnp.concatenate([u, -jnp.dot(u, eye)[None]]),
            jnp.concatenate([-f, jnp.dot(f, eye)[None]]),
            jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        ]
    )


def orbit_camera_device(
    orbit: jnp.ndarray,  # f32[6]: az, el, radius, tx, ty, tz
    width: int,
    height: int,
    fov_y_radians: float = float(np.pi / 4.0),
    z_near: float = 0.1,
) -> "Camera":
    """Build the orbit camera ON DEVICE from one packed scalar array
    (traceable — call inside jit).

    Serving loops that upload a fresh host-built Camera every frame pay one
    relay transfer per pytree leaf (~10 ms/frame measured through the remote
    TPU tunnel); this takes ONE 24-byte upload and does the 4x4 math
    in-graph, where it is free.  The viewer's orbit parameterization:
    ``eye = target + r * (cos(el) sin(az), sin(el), cos(el) cos(az))``."""
    az, el, r = orbit[0], orbit[1], orbit[2]
    target = orbit[3:6]
    eye = target + r * jnp.stack(
        [jnp.cos(el) * jnp.sin(az), jnp.sin(el), jnp.cos(el) * jnp.cos(az)]
    )
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)

    f = target - eye
    f = f / jnp.linalg.norm(f)
    s = jnp.cross(f, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)
    view = jnp.stack(
        [
            jnp.concatenate([s, -jnp.dot(s, eye)[None]]),
            jnp.concatenate([u, -jnp.dot(u, eye)[None]]),
            jnp.concatenate([-f, jnp.dot(f, eye)[None]]),
            jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        ]
    )
    proj = jnp.asarray(
        _perspective_infinite_reverse_rh_np(
            fov_y_radians, width / height, z_near
        )
    )
    return Camera(
        view_from_world=view,
        clip_from_view=proj,
        viewport=jnp.array([0.0, 0.0, float(width), float(height)], jnp.float32),
        prev_clip_from_world=proj @ view,
    )


def _look_at_rh_np(eye, target, up) -> np.ndarray:
    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    up = np.asarray(up, np.float32)

    f = target - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)

    return np.stack(
        [
            np.concatenate([s, np.array([-np.dot(s, eye)], np.float32)]),
            np.concatenate([u, np.array([-np.dot(u, eye)], np.float32)]),
            np.concatenate([-f, np.array([np.dot(f, eye)], np.float32)]),
            np.array([0.0, 0.0, 0.0, 1.0], np.float32),
        ]
    ).astype(np.float32)


def perspective_infinite_reverse_rh(fov_y_radians: float, aspect: float, z_near: float) -> jnp.ndarray:
    """Bevy/glam ``Mat4::perspective_infinite_reverse_rh``: reverse-Z, NDC z in
    (0, 1] with z=1 at the near plane — matches the reference's depth test
    ``GreaterEqual`` and ``in_frustum`` z-window (src/render/transform.wgsl:11-14).

    Traceable for traced scalars (host-numpy fast path otherwise)."""
    if any(
        isinstance(a, jax.core.Tracer)
        for a in (fov_y_radians, aspect, z_near)
    ):
        f = 1.0 / jnp.tan(jnp.float32(fov_y_radians) / 2.0)
        m = jnp.zeros((4, 4), jnp.float32)
        m = m.at[0, 0].set(f / jnp.float32(aspect))
        m = m.at[1, 1].set(f)
        m = m.at[2, 3].set(jnp.float32(z_near))
        m = m.at[3, 2].set(-1.0)
        return m
    return jnp.asarray(
        _perspective_infinite_reverse_rh_np(fov_y_radians, aspect, z_near)
    )


def _perspective_infinite_reverse_rh_np(
    fov_y_radians: float, aspect: float, z_near: float
) -> np.ndarray:
    f = np.float32(1.0) / np.tan(np.float32(fov_y_radians) / np.float32(2.0))
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = f / np.float32(aspect)
    m[1, 1] = f
    m[2, 3] = z_near
    m[3, 2] = -1.0
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
        # ALL host math (numpy): a camera build issued as eager device ops
        # costs a relay dispatch round-trip per op (~40-60 ms per camera
        # through the remote TPU tunnel); four small transfers are ~free
        view = _look_at_rh_np(eye, target, up)
        proj = _perspective_infinite_reverse_rh_np(
            fov_y_radians, width / height, z_near
        )
        if prev_clip_from_world is None:
            prev_clip_from_world = proj @ view
        return Camera(
            view_from_world=jnp.asarray(view),
            clip_from_view=jnp.asarray(proj),
            viewport=jnp.array([0.0, 0.0, float(width), float(height)], jnp.float32),
            prev_clip_from_world=jnp.asarray(
                np.asarray(prev_clip_from_world, np.float32)
            ),
        )
