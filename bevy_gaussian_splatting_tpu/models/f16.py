"""Half-precision storage: packing utilities and f16 cloud conversion.

Reference: src/gaussian/f16.rs:30-263 — f16 pairs packed into u32 words
(``RotationScaleOpacityPacked128``: rotation quat + scale + opacity as 8 f16 =
four u32; ``Covariance3dOpacityPacked128`` similarly) for compressed gcloud
files and the PLANAR_F16 shader storage flavor (src/render/planar.wgsl f16
decode via unpack2x16float).

On TPU the natural compressed form is simply float16 arrays (bit-identical
values to the reference's f16 lanes); compute upcasts to f32 at the projection
boundary.  The u32 pack/unpack functions reproduce the reference's exact bit
layout (upper << 16 | lower, f16.rs:244-263) for byte-compatible compressed
gcloud IO.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def pack_f32s_to_u32(upper, lower) -> np.ndarray:
    """f16.rs:244-251: u32 = f16(upper).bits << 16 | f16(lower).bits."""
    ub = np.asarray(upper, np.float32).astype(np.float16).view(np.uint16).astype(np.uint32)
    lb = np.asarray(lower, np.float32).astype(np.float16).view(np.uint16).astype(np.uint32)
    return (ub << 16) | lb


def unpack_u32_to_f32s(value) -> tuple[np.ndarray, np.ndarray]:
    """f16.rs:254-263."""
    v = np.asarray(value, np.uint32)
    upper = (v >> 16).astype(np.uint16).view(np.float16).astype(np.float32)
    lower = (v & 0xFFFF).astype(np.uint16).view(np.float16).astype(np.float32)
    return upper, lower


def pack_rotation_scale_opacity(rotation: np.ndarray, scale: np.ndarray, opacity: np.ndarray) -> np.ndarray:
    """[N, 4] quat + [N, 3] scale + [N] opacity -> [N, 4] u32
    (RotationScaleOpacityPacked128, f16.rs:30-120 layout: (r0,r1),(r2,r3),
    (s0,s1),(s2,op))."""
    return np.stack(
        [
            pack_f32s_to_u32(rotation[:, 0], rotation[:, 1]),
            pack_f32s_to_u32(rotation[:, 2], rotation[:, 3]),
            pack_f32s_to_u32(scale[:, 0], scale[:, 1]),
            pack_f32s_to_u32(scale[:, 2], opacity),
        ],
        axis=1,
    )


def unpack_rotation_scale_opacity(packed: np.ndarray):
    r01 = unpack_u32_to_f32s(packed[:, 0])
    r23 = unpack_u32_to_f32s(packed[:, 1])
    s01 = unpack_u32_to_f32s(packed[:, 2])
    s2o = unpack_u32_to_f32s(packed[:, 3])
    rotation = np.stack([r01[0], r01[1], r23[0], r23[1]], axis=1)
    scale = np.stack([s01[0], s01[1], s2o[0]], axis=1)
    opacity = s2o[1]
    return rotation, scale, opacity


def pack_covariance_3d_opacity(cov3d: np.ndarray, opacity: np.ndarray) -> np.ndarray:
    """[N, 6] upper-tri covariance + [N] opacity -> [N, 4] u32
    (Covariance3dOpacityPacked128, f16.rs:122-152: cov pairs (c0,c1),(c2,c3),
    (c4,c5); opacity packed as (opacity, opacity))."""
    return np.stack(
        [
            pack_f32s_to_u32(cov3d[:, 0], cov3d[:, 1]),
            pack_f32s_to_u32(cov3d[:, 2], cov3d[:, 3]),
            pack_f32s_to_u32(cov3d[:, 4], cov3d[:, 5]),
            pack_f32s_to_u32(opacity, opacity),
        ],
        axis=1,
    )


def unpack_covariance_3d_opacity(packed: np.ndarray):
    """Inverse of :func:`pack_covariance_3d_opacity` (f16.rs:154-169: the
    opacity reads the UPPER half)."""
    c01 = unpack_u32_to_f32s(packed[:, 0])
    c23 = unpack_u32_to_f32s(packed[:, 1])
    c45 = unpack_u32_to_f32s(packed[:, 2])
    opacity, _ = unpack_u32_to_f32s(packed[:, 3])
    cov3d = np.stack([c01[0], c01[1], c23[0], c23[1], c45[0], c45[1]], axis=1)
    return cov3d, opacity


def to_f16_storage(cloud):
    """Cloud with float16 attribute storage (half the HBM footprint; renderers
    upcast to f32 at the projection boundary)."""
    return jax.tree.map(lambda a: a.astype(jnp.float16), cloud)


def to_f32(cloud):
    return jax.tree.map(lambda a: a.astype(jnp.float32), cloud)
