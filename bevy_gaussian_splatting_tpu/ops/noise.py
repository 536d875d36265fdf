"""Noise material: procedural SH rewrite from gaussian positions.

Reference: src/material/noise.rs:28-56 — a CPU pass that replaces every SH
coefficient with ridged-multifractal simplex noise sampled at
(position * scale, coefficient_index).  Here it is a jittable jnp
implementation of ridged multifractal noise over a 4D gradient-noise base
(same structure: |noise| inverted, squared-gain octave accumulation, default
6 octaves, lacunarity ~2, matching the Rust ``noise`` crate's RidgedMulti
defaults), vectorized over gaussians x coefficients on the VPU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from bevy_gaussian_splatting_tpu.models.cloud import Gaussian3dCloud

DEFAULT_OCTAVES = 6
DEFAULT_LACUNARITY = 2.0943951023931953  # pi * 2/3 (noise crate default)
DEFAULT_PERSISTENCE = 1.0
DEFAULT_ATTENUATION = 2.0


def _hash4(ix, iy, iz, iw, seed):
    """Integer lattice hash -> uint32 (xxhash-style avalanche mix)."""
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(0x8DA6B343)
        + iy.astype(jnp.uint32) * jnp.uint32(0xD8163841)
        + iz.astype(jnp.uint32) * jnp.uint32(0xCB1AB31F)
        + iw.astype(jnp.uint32) * jnp.uint32(0x165667B1)
        + jnp.uint32(seed)
    )
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    h = h * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 15)
    return h


def _grad_dot(ix, iy, iz, iw, fx, fy, fz, fw, seed):
    """Gradient selected from the hash dotted with the offset vector."""
    h = _hash4(ix, iy, iz, iw, seed)
    # map hash to a pseudo-gradient with components in {-1, 0, 1}
    gx = (h & 3).astype(jnp.float32) - 1.0
    gy = ((h >> 2) & 3).astype(jnp.float32) - 1.0
    gz = ((h >> 4) & 3).astype(jnp.float32) - 1.0
    gw = ((h >> 6) & 3).astype(jnp.float32) - 1.0
    return gx * fx + gy * fy + gz * fz + gw * fw


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def gradient_noise_4d(x, y, z, w, seed: int = 0):
    """Perlin-style 4D gradient noise in approximately [-1, 1]."""
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    iz = jnp.floor(z).astype(jnp.int32)
    iw = jnp.floor(w).astype(jnp.int32)
    fx, fy, fz, fw = x - ix, y - iy, z - iz, w - iw
    ux, uy, uz, uw = _fade(fx), _fade(fy), _fade(fz), _fade(fw)

    def corner(dx, dy, dz, dw):
        return _grad_dot(
            ix + dx, iy + dy, iz + dz, iw + dw,
            fx - dx, fy - dy, fz - dz, fw - dw, seed,
        )

    def lerp(a, b, t):
        return a + (b - a) * t

    vals_w = []
    for dw in (0, 1):
        vals_z = []
        for dz in (0, 1):
            v00 = lerp(corner(0, 0, dz, dw), corner(1, 0, dz, dw), ux)
            v01 = lerp(corner(0, 1, dz, dw), corner(1, 1, dz, dw), ux)
            vals_z.append(lerp(v00, v01, uy))
        vals_w.append(lerp(vals_z[0], vals_z[1], uz))
    return lerp(vals_w[0], vals_w[1], uw) * 0.5


def ridged_multi_4d(
    x, y, z, w,
    octaves: int = DEFAULT_OCTAVES,
    lacunarity: float = DEFAULT_LACUNARITY,
    persistence: float = DEFAULT_PERSISTENCE,
    attenuation: float = DEFAULT_ATTENUATION,
    seed: int = 0,
):
    """Ridged multifractal accumulation (noise crate RidgedMulti structure):
    per octave: signal = (1 - |noise|)^2 * weight; weight = clamp(signal *
    attenuation); result scaled into ~[-1, 1]."""
    result = jnp.zeros_like(jnp.asarray(x, jnp.float32))
    weight = jnp.ones_like(result)
    freq = 1.0
    amp = 1.0
    for o in range(octaves):
        n = gradient_noise_4d(x * freq, y * freq, z * freq, w * freq, seed + o)
        signal = (1.0 - jnp.abs(n)) ** 2 * weight
        weight = jnp.clip(signal * attenuation, 0.0, 1.0)
        result = result + signal * amp
        freq *= lacunarity
        amp *= persistence
    # normalize to roughly [-1, 1] (max possible sum ~= 2 per octave chain)
    scale = 2.0 / octaves
    return result * scale - 1.0


def apply_noise(cloud: Gaussian3dCloud, scale: float = 1.0, seed: int = 0) -> Gaussian3dCloud:
    """NoiseMaterial application: every SH coefficient replaced by ridged
    noise at (pos * scale, coefficient_index) (noise.rs:40-55)."""
    pos = cloud.position * scale
    k = cloud.spherical_harmonic.shape[1]
    ws = jnp.arange(k, dtype=jnp.float32)  # coefficient index as 4th axis
    sh = ridged_multi_4d(
        pos[:, 0:1], pos[:, 1:2], pos[:, 2:3], ws[None, :], seed=seed
    )
    return dataclasses.replace(cloud, spherical_harmonic=sh.astype(jnp.float32))
