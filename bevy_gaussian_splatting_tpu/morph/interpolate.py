"""Gaussian cloud interpolation (morph) — lhs/rhs -> output lerp.

The reference runs this as a 256-lane compute pass before the radix sort each
frame (src/morph/interpolate.rs:32-477, src/morph/interpolate.wgsl:52-119).
Here it is one fused jittable function over the SoA pytrees; XLA fuses it with
the downstream projection, which supersedes the reference's separate dispatch +
re-bind machinery.

Semantics transcribed from interpolate.wgsl:
  - t = clamp((time - time_start) / duration, 0, 1); degenerate duration
    (|d| < 1e-6) snaps to 0/1 by whether time has passed time_stop (wgsl:52-58)
  - position / visibility / SH / scale / opacity: lerp (wgsl:85-118)
  - rotation: nlerp = normalize(mix(q_l, q_r, t)), zero-length guard to the
    identity-last convention vec4(0,0,0,1) (wgsl:60-66)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from bevy_gaussian_splatting_tpu.models.cloud import Gaussian3dCloud
from bevy_gaussian_splatting_tpu.models.settings import CloudSettings


def interpolation_factor(time, time_start, time_stop):
    """interpolate.wgsl:52-58."""
    time = jnp.asarray(time, jnp.float32)
    duration = jnp.asarray(time_stop - time_start, jnp.float32)
    degenerate = jnp.abs(duration) < 1e-6
    safe = jnp.where(degenerate, 1.0, duration)
    t = jnp.clip((time - time_start) / safe, 0.0, 1.0)
    snap = jnp.where(time >= time_stop, 1.0, 0.0)
    return jnp.where(degenerate, snap, t)


def normalize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """interpolate.wgsl:60-66 — note the reference's zero-quat fallback is
    (0, 0, 0, 1) in component order, i.e. w-last convention inherited from the
    wgsl vec4; reproduced as-is."""
    length_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(q).at[..., 3].set(1.0)
    safe = jnp.where(length_sq > 0.0, length_sq, 1.0)
    return jnp.where(length_sq > 0.0, q / jnp.sqrt(safe), fallback)


def interpolate_clouds(
    lhs: Gaussian3dCloud,
    rhs: Gaussian3dCloud,
    time,
    time_start: float = 0.0,
    time_stop: float = 1.0,
) -> Gaussian3dCloud:
    """GaussianInterpolate lhs/rhs -> output (interpolate.wgsl:71-119)."""
    if len(lhs) != len(rhs):
        raise ValueError(
            f"interpolate requires equal-size clouds, got {len(lhs)} vs {len(rhs)}"
        )
    t = interpolation_factor(time, time_start, time_stop)

    pv = lhs.position_visibility + (rhs.position_visibility - lhs.position_visibility) * t
    sh = lhs.spherical_harmonic + (rhs.spherical_harmonic - lhs.spherical_harmonic) * t
    rot = normalize_quaternion(lhs.rotation + (rhs.rotation - lhs.rotation) * t)
    so = lhs.scale_opacity + (rhs.scale_opacity - lhs.scale_opacity) * t
    return Gaussian3dCloud(
        position_visibility=pv,
        spherical_harmonic=sh,
        rotation=rot,
        scale_opacity=so,
    )


def interpolate_for_settings(
    lhs: Gaussian3dCloud, rhs: Gaussian3dCloud, settings: CloudSettings, time=None
) -> Gaussian3dCloud:
    """Convenience wrapper driven by CloudSettings playback state (the
    InterpolatePlugin wiring, src/morph/interpolate.rs:110-145)."""
    if time is None:
        time = settings.time
    return interpolate_clouds(lhs, rhs, time, settings.time_start, settings.time_stop)
