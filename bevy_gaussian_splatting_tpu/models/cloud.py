"""SoA Gaussian cloud pytrees — the TPU-native data model.

Re-designs the reference's core types (reference: src/gaussian/f32.rs:30-251,
src/gaussian/formats/planar_3d.rs:45-273, planar_4d.rs:40-316) as structure-of-array
JAX pytrees.  Where the reference interleaves per-gaussian structs and uses the
``bevy_interleave`` derive to generate planar GPU storage buffers, here the planar
(SoA) layout *is* the canonical form: each attribute is one ``[N, C]`` array, padded
along N to a lane-friendly multiple so every kernel sees static, aligned shapes.

Field layout mirrors the reference attribute structs exactly so IO round-trips are
trivially bit-compatible:

  Gaussian3dCloud.position_visibility  [N, 4]   xyz + visibility   (f32.rs:53-56)
  Gaussian3dCloud.spherical_harmonic   [N, 48]  SH deg-3, interleaved rgb per coeff
  Gaussian3dCloud.rotation             [N, 4]   quaternion wxyz    (f32.rs:95-97)
  Gaussian3dCloud.scale_opacity        [N, 4]   scale xyz + opacity (f32.rs:172-175)

  Gaussian4dCloud.position_visibility  [N, 4]
  Gaussian4dCloud.spherindrical_harmonic [N, 144]  (spherindrical_harmonics.rs:20-37)
  Gaussian4dCloud.isotropic_rotations  [N, 8]   two quats (l, r)   (f32.rs:120-122)
  Gaussian4dCloud.scale_opacity        [N, 4]
  Gaussian4dCloud.timestamp_timescale  [N, 2]                       (f32.rs:201-203)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Reference: src/material/spherical_harmonics.rs:44-81 — default SH degree 3:
# 16 coefficients x 3 channels = 48 f32 (already a multiple of 4, no padding).
SH_DEGREE: int = 3
SH_CHANNELS: int = 3


def num_sh_coefficients(degree: int) -> int:
    """Per-channel SH coefficient count: (degree + 1)^2.

    Reference: src/material/spherical_harmonics.rs:33-40.
    """
    return (degree + 1) ** 2


def pad_4(x: int) -> int:
    return (x + 3) // 4 * 4


SH_COEFF_COUNT_PER_CHANNEL: int = num_sh_coefficients(SH_DEGREE)  # 16
SH_COEFF_COUNT: int = pad_4(SH_COEFF_COUNT_PER_CHANNEL * SH_CHANNELS)  # 48

# -- SH degree axis (reference cargo features sh0..sh4,
#    src/material/spherical_harmonics.rs:33-120).  The reference picks ONE
#    degree at compile time; here the degree is a property of the DATA: the
#    width of ``spherical_harmonic`` encodes it (different widths are different
#    traced shapes, so jit specializes per degree exactly like the reference's
#    shader-def rebuild).  Storage widths follow the reference's pad_4 rule:
#    degree 0/1/2/3/4 -> 4/12/28/48/76 columns.
SH_MAX_DEGREE: int = 4


def sh_coeff_width(degree: int) -> int:
    """Padded [N, C] column count for a given SH degree (pad_4(3 * (d+1)^2))."""
    if not 0 <= degree <= SH_MAX_DEGREE:
        raise ValueError(f"SH degree must be in [0, {SH_MAX_DEGREE}], got {degree}")
    return pad_4(num_sh_coefficients(degree) * SH_CHANNELS)


_SH_WIDTH_TO_DEGREE = {sh_coeff_width(d): d for d in range(SH_MAX_DEGREE + 1)}


def sh_degree_from_width(width: int) -> int:
    """Inverse of :func:`sh_coeff_width` — the storage degree of a cloud's
    ``spherical_harmonic`` array."""
    try:
        return _SH_WIDTH_TO_DEGREE[int(width)]
    except KeyError:
        raise ValueError(
            f"spherical_harmonic width {width} is not a padded sh0..sh4 layout "
            f"(expected one of {sorted(_SH_WIDTH_TO_DEGREE)})"
        ) from None


def set_sh_degree(cloud: "Gaussian3dCloud", degree: int) -> "Gaussian3dCloud":
    """Convert a 3D cloud to another SH storage degree: coefficients beyond the
    target degree are dropped, missing ones are zero (exactly what rebuilding
    the reference with a different shN feature does to loaded assets)."""
    src = np.asarray(cloud.spherical_harmonic)
    width = sh_coeff_width(degree)
    keep = num_sh_coefficients(degree) * 3  # real (unpadded) coefficients
    out = np.zeros((src.shape[0], width), src.dtype)
    used = min(keep, src.shape[1])
    out[:, :used] = src[:, :used]
    return dataclasses.replace(cloud, spherical_harmonic=jnp.asarray(out))

# Reference: src/material/spherindrical_harmonics.rs:20-37 —
# SH_4D_DEGREE_TIME = 2 temporal harmonics: (deg+1)^2 * (time_deg+1) * 3 = 144.
SH_4D_DEGREE: int = 3
SH_4D_DEGREE_TIME: int = 2
SH_4D_COEFF_COUNT: int = pad_4(
    num_sh_coefficients(SH_4D_DEGREE) * (SH_4D_DEGREE_TIME + 1) * SH_CHANNELS
)  # 144

# The reference pads clouds to a multiple of 32 (src/io/ply.rs:127-129). On TPU the
# natural granule is the f32 (sublane, lane) tile — pad N to a multiple of 256 so a
# [N] vector reshapes cleanly to (N/256)x(8,128)-aligned blocks and 16x16 pixel tiles
# of gaussian chunks stay aligned.
DEFAULT_PAD_MULTIPLE: int = 256


def _pytree_dataclass(cls):
    """Register a dataclass whose fields are all array leaves as a JAX pytree."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class Gaussian3dCloud:
    """A 3DGS / 2DGS cloud (2DGS reuses the 3D structure; only the render path
    differs — reference: src/gaussian/formats/planar_3d.rs:56)."""

    position_visibility: jax.Array  # [N, 4]
    spherical_harmonic: jax.Array  # [N, SH_COEFF_COUNT]
    rotation: jax.Array  # [N, 4] (w, x, y, z)
    scale_opacity: jax.Array  # [N, 4]

    # -- accessors -------------------------------------------------------------
    @property
    def position(self) -> jax.Array:
        return self.position_visibility[:, :3]

    @property
    def visibility(self) -> jax.Array:
        return self.position_visibility[:, 3]

    @property
    def scale(self) -> jax.Array:
        return self.scale_opacity[:, :3]

    @property
    def opacity(self) -> jax.Array:
        return self.scale_opacity[:, 3]

    def __len__(self) -> int:
        return self.position_visibility.shape[0]

    # -- interface parity (reference: src/gaussian/interface.rs:9-73) ----------
    def len_sqrt_ceil(self) -> int:
        return int(np.ceil(np.sqrt(len(self))))

    def square_len(self) -> int:
        return self.len_sqrt_ceil() ** 2

    def compute_aabb(self) -> tuple[jax.Array, jax.Array]:
        """(min, max) over positions — reference interface.rs:33-49 rayon fold,
        here a pair of jnp reductions."""
        pos = self.position
        return jnp.min(pos, axis=0), jnp.max(pos, axis=0)

    def with_visibility(self, visibility: jax.Array) -> "Gaussian3dCloud":
        pv = self.position_visibility.at[:, 3].set(visibility)
        return dataclasses.replace(self, position_visibility=pv)

    def pad(self, multiple: int = DEFAULT_PAD_MULTIPLE) -> "Gaussian3dCloud":
        return pad_cloud(self, multiple)

    def astype(self, dtype) -> "Gaussian3dCloud":
        return jax.tree.map(lambda a: a.astype(dtype), self)


@_pytree_dataclass
class Gaussian4dCloud:
    """A temporal 4DGS cloud (reference: src/gaussian/formats/planar_4d.rs:40-316)."""

    position_visibility: jax.Array  # [N, 4]
    spherindrical_harmonic: jax.Array  # [N, SH_4D_COEFF_COUNT]
    isotropic_rotations: jax.Array  # [N, 8] (quat_l wxyz, quat_r wxyz)
    scale_opacity: jax.Array  # [N, 4]
    timestamp_timescale: jax.Array  # [N, 2]

    @property
    def position(self) -> jax.Array:
        return self.position_visibility[:, :3]

    @property
    def visibility(self) -> jax.Array:
        return self.position_visibility[:, 3]

    @property
    def rotation(self) -> jax.Array:
        return self.isotropic_rotations[:, :4]

    @property
    def rotation_r(self) -> jax.Array:
        return self.isotropic_rotations[:, 4:]

    @property
    def scale(self) -> jax.Array:
        return self.scale_opacity[:, :3]

    @property
    def opacity(self) -> jax.Array:
        return self.scale_opacity[:, 3]

    @property
    def timestamp(self) -> jax.Array:
        return self.timestamp_timescale[:, 0]

    @property
    def timescale(self) -> jax.Array:
        return self.timestamp_timescale[:, 1]

    def __len__(self) -> int:
        return self.position_visibility.shape[0]

    def len_sqrt_ceil(self) -> int:
        return int(np.ceil(np.sqrt(len(self))))

    def compute_aabb(self) -> tuple[jax.Array, jax.Array]:
        pos = self.position
        return jnp.min(pos, axis=0), jnp.max(pos, axis=0)

    def with_visibility(self, visibility: jax.Array) -> "Gaussian4dCloud":
        pv = self.position_visibility.at[:, 3].set(visibility)
        return dataclasses.replace(self, position_visibility=pv)

    def pad(self, multiple: int = DEFAULT_PAD_MULTIPLE) -> "Gaussian4dCloud":
        return pad_cloud(self, multiple)

    def astype(self, dtype) -> "Gaussian4dCloud":
        return jax.tree.map(lambda a: a.astype(dtype), self)


@_pytree_dataclass
class Gaussian3dCovCloud:
    """3DGS cloud with PRECOMPUTED 3D covariance storage (the reference's
    ``precompute_covariance_3d`` feature: ``Covariance3dOpacity`` attribute
    struct src/gaussian/f32.rs:232-236, packed f16 form
    ``Covariance3dOpacityPacked128`` src/gaussian/f16.rs:122-172, consumed by
    the shader via get_cov3d, src/render/gaussian_3d.wgsl:76-88).

    ``covariance_3d_opacity`` columns: upper-triangular cov3d (xx, xy, xz, yy,
    yz, zz), opacity, pad — the f32.rs field order.  NOTE the reference quirk:
    the precomputed covariance is built from quat+scale ONLY, so the render
    path uses it as-is — no model-transform conjugation and no global_scale
    (compute_cov3d's T/global-scale path is compiled out,
    gaussian_3d.wgsl:76-81)."""

    position_visibility: jax.Array  # [N, 4]
    spherical_harmonic: jax.Array  # [N, sh_coeff_width(degree)]
    covariance_3d_opacity: jax.Array  # [N, 8]

    @property
    def position(self) -> jax.Array:
        return self.position_visibility[:, :3]

    @property
    def visibility(self) -> jax.Array:
        return self.position_visibility[:, 3]

    @property
    def cov3d(self) -> jax.Array:
        return self.covariance_3d_opacity[:, :6]

    @property
    def opacity(self) -> jax.Array:
        return self.covariance_3d_opacity[:, 6]

    def __len__(self) -> int:
        return self.position_visibility.shape[0]

    def len_sqrt_ceil(self) -> int:
        return int(np.ceil(np.sqrt(len(self))))

    def square_len(self) -> int:
        return self.len_sqrt_ceil() ** 2

    def compute_aabb(self) -> tuple[jax.Array, jax.Array]:
        pos = self.position
        return jnp.min(pos, axis=0), jnp.max(pos, axis=0)

    def with_visibility(self, visibility: jax.Array) -> "Gaussian3dCovCloud":
        pv = self.position_visibility.at[:, 3].set(visibility)
        return dataclasses.replace(self, position_visibility=pv)

    def pad(self, multiple: int = DEFAULT_PAD_MULTIPLE) -> "Gaussian3dCovCloud":
        return pad_cloud(self, multiple)

    def astype(self, dtype) -> "Gaussian3dCovCloud":
        return jax.tree.map(lambda a: a.astype(dtype), self)


def precompute_covariance_3d(
    cloud: Gaussian3dCloud, f16_quantize: bool = False
) -> Gaussian3dCovCloud:
    """Convert quat+scale storage to precomputed-covariance storage
    (Covariance3dOpacity::from_gaussian, src/gaussian/f32.rs:238-250: quat +
    scale only — no transform, no global scale).

    ``f16_quantize=True`` rounds the covariance + opacity through f16, the
    quantization the packed128 gcloud storage applies (f16.rs:137-152)."""
    from bevy_gaussian_splatting_tpu.ops.covariance import compute_cov3d

    cov = compute_cov3d(cloud.rotation, cloud.scale)
    op = cloud.opacity[:, None]
    pad = jnp.zeros_like(op)
    co = jnp.concatenate([cov, op, pad], axis=1)
    if f16_quantize:
        co = co.astype(jnp.float16).astype(jnp.float32)
    return Gaussian3dCovCloud(
        position_visibility=cloud.position_visibility,
        spherical_harmonic=cloud.spherical_harmonic,
        covariance_3d_opacity=co,
    )


def pad_cloud(cloud, multiple: int = DEFAULT_PAD_MULTIPLE):
    """Pad along N with inert gaussians (opacity 0, visibility 0, identity quat).

    The reference pads with zeroed default structs (src/io/ply.rs:127-129); we
    additionally set the quaternion to identity so padded rows never produce NaNs
    in covariance math (they are masked out by opacity == 0 regardless).
    """
    n = len(cloud)
    target = (n + multiple - 1) // multiple * multiple
    if target == n:
        return cloud
    pad_n = target - n

    def pad_field(name: str, arr):
        pad_block = jnp.zeros((pad_n, arr.shape[1]), dtype=arr.dtype)
        if name in ("rotation", "isotropic_rotations"):
            pad_block = pad_block.at[:, 0].set(1.0)
            if pad_block.shape[1] == 8:
                pad_block = pad_block.at[:, 4].set(1.0)
        return jnp.concatenate([arr, pad_block], axis=0)

    return type(cloud)(
        **{
            f.name: pad_field(f.name, getattr(cloud, f.name))
            for f in dataclasses.fields(cloud)
        }
    )


# ---------------------------------------------------------------------------
# Generators (reference: src/gaussian/formats/planar_3d.rs:120-236,
# planar_4d.rs random_gaussians_4d). Distribution ranges match the reference;
# the RNG stream itself is numpy (the Rust stream is not reproducible anyway).
# ---------------------------------------------------------------------------


def _random_3d(
    rng: np.random.Generator, n: int, sh_degree: int = SH_DEGREE
) -> Gaussian3dCloud:
    pos = rng.uniform(-20.0, 20.0, (n, 3)).astype(np.float32)
    pv = np.concatenate([pos, np.ones((n, 1), np.float32)], axis=1)
    sh = rng.uniform(-1.0, 1.0, (n, sh_coeff_width(sh_degree))).astype(np.float32)
    sh[:, num_sh_coefficients(sh_degree) * 3 :] = 0.0  # pad_4 slots stay zero
    rot = rng.uniform(-1.0, 1.0, (n, 4)).astype(np.float32)
    scale = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    opacity = rng.uniform(0.0, 0.8, (n, 1)).astype(np.float32)
    so = np.concatenate([scale, opacity], axis=1)
    return Gaussian3dCloud(
        position_visibility=jnp.asarray(pv),
        spherical_harmonic=jnp.asarray(sh),
        rotation=jnp.asarray(rot),
        scale_opacity=jnp.asarray(so),
    )


def random_gaussians_3d(n: int, sh_degree: int = SH_DEGREE) -> Gaussian3dCloud:
    return _random_3d(np.random.default_rng(), n, sh_degree)


def random_gaussians_3d_seeded(
    n: int, seed: int = 0, sh_degree: int = SH_DEGREE
) -> Gaussian3dCloud:
    return _random_3d(np.random.default_rng(seed), n, sh_degree)


def _random_4d(rng: np.random.Generator, n: int) -> Gaussian4dCloud:
    pos = rng.uniform(-20.0, 20.0, (n, 3)).astype(np.float32)
    pv = np.concatenate([pos, np.ones((n, 1), np.float32)], axis=1)
    sh = rng.uniform(-1.0, 1.0, (n, SH_4D_COEFF_COUNT)).astype(np.float32)

    def rand_unit_quat(k):
        q = rng.uniform(-1.0, 1.0, (k, 4)).astype(np.float32)
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    iso = np.concatenate([rand_unit_quat(n), rand_unit_quat(n)], axis=1)
    scale = rng.uniform(0.0, 0.5, (n, 3)).astype(np.float32)
    opacity = rng.uniform(0.2, 0.8, (n, 1)).astype(np.float32)
    so = np.concatenate([scale, opacity], axis=1)
    ts = np.concatenate(
        [
            rng.uniform(0.0, 1.0, (n, 1)).astype(np.float32),
            rng.uniform(0.1, 1.0, (n, 1)).astype(np.float32),
        ],
        axis=1,
    )
    return Gaussian4dCloud(
        position_visibility=jnp.asarray(pv),
        spherindrical_harmonic=jnp.asarray(sh),
        isotropic_rotations=jnp.asarray(iso),
        scale_opacity=jnp.asarray(so),
        timestamp_timescale=jnp.asarray(ts),
    )


def random_gaussians_4d(n: int) -> Gaussian4dCloud:
    return _random_4d(np.random.default_rng(), n)


def random_gaussians_4d_seeded(n: int, seed: int = 0) -> Gaussian4dCloud:
    return _random_4d(np.random.default_rng(seed), n)


def test_model_3d(seed: Optional[int] = 42) -> Gaussian3dCloud:
    """Deterministic 9-gaussian test cloud: the 8 cube corners at +-0.5 plus a
    duplicate of the first corner (reference TestCloud::test_model,
    src/gaussian/formats/planar_3d.rs:190-247)."""
    rng = np.random.default_rng(seed)
    base_sh = rng.uniform(-1.0, 1.0, SH_COEFF_COUNT).astype(np.float32)

    rows = []
    for x in (-0.5, 0.5):
        for y in (-0.5, 0.5):
            for z in (-0.5, 0.5):
                sh = base_sh.copy()
                rng.shuffle(sh)
                rows.append((np.array([x, y, z, 1.0], np.float32), sh))
    rows.append(rows[0])

    pv = np.stack([r[0] for r in rows])
    sh = np.stack([r[1] for r in rows])
    n = len(rows)
    rot = np.tile(np.array([1.0, 0.0, 0.0, 0.0], np.float32), (n, 1))
    so = np.tile(np.array([0.125, 0.125, 0.125, 0.125], np.float32), (n, 1))
    return Gaussian3dCloud(
        position_visibility=jnp.asarray(pv),
        spherical_harmonic=jnp.asarray(sh),
        rotation=jnp.asarray(rot),
        scale_opacity=jnp.asarray(so),
    )
