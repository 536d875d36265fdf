"""Rasterize-mode colorization helpers.

Transcribed from the reference material shaders:
  - depth ramp:        src/material/depth.wgsl:3-11
  - classification:    src/material/classification.wgsl:9-27
  - optical flow:      src/material/optical_flow.wgsl:16-56
"""

from __future__ import annotations

import jax.numpy as jnp

TAU = 6.283185307179586


def smoothstep(edge0, edge1, x):
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """Bevy's ``hsv_to_rgb`` (hue in radians [0, 2pi), s, v) -> rgb [..., 3]."""
    h = hsv[..., 0] / TAU * 6.0
    s = hsv[..., 1]
    v = hsv[..., 2]
    c = v * s
    xcomp = c * (1.0 - jnp.abs(jnp.mod(h, 2.0) - 1.0))
    m = v - c

    zeros = jnp.zeros_like(c)
    sector = jnp.floor(h).astype(jnp.int32) % 6
    r = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [c, xcomp, zeros, zeros, xcomp],
        c,
    )
    g = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [xcomp, c, c, xcomp, zeros],
        zeros,
    )
    b = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [zeros, zeros, xcomp, c, c],
        xcomp,
    )
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def depth_to_rgb(depth: jnp.ndarray, min_depth, max_depth) -> jnp.ndarray:
    """Blue -> green -> red depth ramp (depth.wgsl:3-11)."""
    nd = jnp.clip((depth - min_depth) / (max_depth - min_depth), 0.0, 1.0)
    r = smoothstep(0.5, 1.0, nd)
    g = 1.0 - jnp.abs(nd - 0.5) * 2.0
    b = 1.0 - smoothstep(0.0, 0.5, nd)
    return jnp.stack([r, g, b], axis=-1)


def class_to_rgb(visualization: jnp.ndarray, sh_color: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Visibility >= 2 encodes class index -> HSV hue mixed 50% with the SH color
    (classification.wgsl:9-27)."""
    class_idx = visualization - 2.0
    hue = (class_idx / float(num_classes)) * TAU
    hsv = jnp.stack([hue, jnp.ones_like(hue), jnp.ones_like(hue)], axis=-1)
    mixed = 0.5 * sh_color + 0.5 * hsv_to_rgb(hsv)
    return jnp.where((visualization < 2.0)[..., None], sh_color, mixed)


def calculate_motion_vector(
    world_position: jnp.ndarray,
    previous_world_position: jnp.ndarray,
    clip_from_world: jnp.ndarray,
    prev_clip_from_world: jnp.ndarray,
) -> jnp.ndarray:
    """Screen-space motion vector in [-1, 1] UV units with y flip
    (optical_flow.wgsl:16-40)."""

    def project(p, m):
        clip = p @ m[:3, :3].T + m[:3, 3]
        w = p @ m[3, :3] + m[3, 3]
        return clip[..., :2] / w[..., None]

    cur = project(world_position, clip_from_world)
    prev = project(previous_world_position, prev_clip_from_world)
    return (cur - prev) * jnp.array([0.5, -0.5])


def optical_flow_to_rgb(motion_vector: jnp.ndarray, delta_time: float) -> jnp.ndarray:
    """HSV color wheel over flow = motion / delta_time (optical_flow.wgsl:42-56)."""
    flow = motion_vector / delta_time
    radius = jnp.linalg.norm(flow, axis=-1)
    angle = jnp.arctan2(flow[..., 1], flow[..., 0])
    angle = jnp.where(angle < 0.0, angle + TAU, angle)
    m = jnp.clip(radius, 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([angle, m, jnp.ones_like(m)], axis=-1))
