"""Spherical-harmonic and spherindrical-harmonic color evaluation.

Basis constants and evaluation order transcribed from the reference shaders:
  - real SH basis ``shc[16]`` and degree <= 3 lookup with the +0.5 color bias:
    src/material/spherical_harmonics.wgsl:3-68
  - 4D spherindrical lookup (spatial SH x temporal cosine harmonics):
    src/material/spherindrical_harmonics.wgsl:11-126

SH storage is interleaved rgb per coefficient: sh[k * 3 + channel]
(src/material/spherical_harmonics.rs SphericalHarmonicCoefficients).
Evaluation is a [N, 16] basis matrix contracted against [N, 16, 3] coefficients —
a VPU multiply + small reduction that XLA fuses with the projection pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# src/material/spherical_harmonics.wgsl:3-20
SHC = np.array(
    [
        0.28209479177387814,
        -0.4886025119029199,
        0.4886025119029199,
        -0.4886025119029199,
        1.0925484305920792,
        -1.0925484305920792,
        0.31539156525252005,
        -1.0925484305920792,
        0.5462742152960396,
        -0.5900435899266435,
        2.890611442640554,
        -0.4570457994644658,
        0.3731763325901154,
        -0.4570457994644658,
        1.445305721320277,
        -0.5900435899266435,
    ],
    dtype=np.float32,
)

# Degree-4 real SH constants (standard normalization, continuing the shc
# table's sign convention).  The reference's sh4 feature STORES 25x3 coeffs
# (spherical_harmonics.rs:43-44) but its shader only evaluates through degree
# 3 (spherical_harmonics.wgsl stops at shc[15]); evaluation of these terms is
# therefore opt-in here (see spherical_harmonics_lookup eval_degree).
SHC4 = np.array(
    [
        2.5033429417967046,
        -1.7701307697799304,
        0.9461746957575601,
        -0.6690465435572892,
        0.10578554691520431,
        -0.6690465435572892,
        0.47308734787878004,
        -1.7701307697799304,
        0.6258357354491761,
    ],
    dtype=np.float32,
)


def sh_basis(direction: jnp.ndarray, degree: int = 3) -> jnp.ndarray:
    """Evaluate the scaled real SH basis shc[k] * Y_k(dir) for [..., 3] unit
    directions -> [..., (degree+1)^2].  Matches the per-term expressions in
    spherical_harmonics.wgsl:40-66 (the reference hard-codes these polynomials;
    the x/y/z conventions and signs must match exactly); degree 4 extends the
    table with the standard real-SH Y_4 polynomials (SHC4)."""
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    one = jnp.ones_like(x)
    terms = [SHC[0] * one]
    if degree >= 1:
        terms += [SHC[1] * y, SHC[2] * z, SHC[3] * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        terms += [
            SHC[4] * x * y,
            SHC[5] * y * z,
            SHC[6] * (2.0 * zz - xx - yy),
            SHC[7] * x * z,
            SHC[8] * (xx - yy),
        ]
    if degree >= 3:
        terms += [
            SHC[9] * y * (3.0 * xx - yy),
            SHC[10] * x * y * z,
            SHC[11] * y * (4.0 * zz - xx - yy),
            SHC[12] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SHC[13] * x * (4.0 * zz - xx - yy),
            SHC[14] * z * (xx - yy),
            SHC[15] * x * (xx - 3.0 * yy),
        ]
    if degree >= 4:
        xx, yy, zz = x * x, y * y, z * z
        terms += [
            SHC4[0] * x * y * (xx - yy),
            SHC4[1] * y * z * (3.0 * xx - yy),
            SHC4[2] * x * y * (7.0 * zz - 1.0),
            SHC4[3] * y * z * (7.0 * zz - 3.0),
            SHC4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            SHC4[5] * x * z * (7.0 * zz - 3.0),
            SHC4[6] * (xx - yy) * (7.0 * zz - 1.0),
            SHC4[7] * x * z * (xx - 3.0 * yy),
            SHC4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(terms, axis=-1)


def sh_storage_degree(sh: jnp.ndarray) -> int:
    """Storage degree encoded by an interleaved-rgb SH array's width."""
    from bevy_gaussian_splatting_tpu.models.cloud import sh_degree_from_width

    return sh_degree_from_width(sh.shape[-1])


def spherical_harmonics_lookup(
    direction: jnp.ndarray,
    sh: jnp.ndarray,
    degree: int | None = None,
    eval_degree: int | None = None,
) -> jnp.ndarray:
    """SH color for [..., 3] directions and [..., K] interleaved-rgb coefficients
    -> [..., 3] with the reference's +0.5 bias (spherical_harmonics.wgsl:39).

    ``degree`` defaults to the storage degree encoded by the array width
    (sh0..sh4 axis).  ``eval_degree`` caps the evaluated basis; the default
    ``min(degree, 3)`` reproduces the reference shader, which never evaluates
    degree-4 terms even under the sh4 storage feature
    (spherical_harmonics.wgsl:41-65 stops at shc[15]).  Pass ``eval_degree=4``
    for the mathematically-complete evaluation of sh4 clouds."""
    if degree is None:
        degree = sh_storage_degree(sh)
    if eval_degree is None:
        eval_degree = min(degree, 3)
    n_basis = (min(eval_degree, degree) + 1) ** 2
    basis = sh_basis(direction, min(eval_degree, degree))  # [..., n_basis]
    return 0.5 + _interleaved_contract(basis, sh, n_basis)


def _interleaved_contract(basis: jnp.ndarray, sh: jnp.ndarray, k: int):
    """sum_j basis[..., j:j+1] * sh[..., 3j:3j+3] -> [..., 3].

    Contiguous-slice accumulation measured fastest on TPU at 1M x deg-3
    (fwd+bwd 6.7 ms vs einsum 8.2 ms vs strided-lane slices 15.8 ms — the
    einsum's [N, K, 3] intermediate and the strided slices' dilated-pad
    transpose both lose; /tmp probe recorded in BASELINE.md)."""
    acc = basis[..., 0:1] * sh[..., 0:3]
    for j in range(1, k):
        acc = acc + basis[..., j : j + 1] * sh[..., 3 * j : 3 * j + 3]
    return acc


def spherindrical_harmonics_lookup(
    direction: jnp.ndarray,
    dir_t: jnp.ndarray,
    sh: jnp.ndarray,
    duration: jnp.ndarray,
    degree: int = 3,
    degree_time: int = 2,
) -> jnp.ndarray:
    """4D color: spatial SH basis modulated by temporal cosine harmonics
    cos(2 pi k theta), theta = dir_t / duration
    (spherindrical_harmonics.wgsl:77-126)."""
    n_basis = (degree + 1) ** 2
    basis = sh_basis(direction, degree)  # [..., n_basis]
    theta = dir_t / duration
    blocks = [jnp.ones_like(theta)]
    for k in range(1, degree_time + 1):
        blocks.append(jnp.cos(2.0 * jnp.pi * k * theta))
    # temporal modulation per block: full basis reused for every time harmonic
    tb = jnp.stack(blocks, axis=-1)  # [..., degree_time+1]
    full_basis = basis[..., None, :] * tb[..., :, None]  # [..., T, n_basis]
    full_basis = full_basis.reshape(*basis.shape[:-1], n_basis * (degree_time + 1))
    return 0.5 + _interleaved_contract(
        full_basis, sh, n_basis * (degree_time + 1)
    )


def srgb_to_linear(srgb: jnp.ndarray) -> jnp.ndarray:
    """Per-channel sRGB EOTF (spherical_harmonics.wgsl:22-33)."""
    return jnp.where(
        srgb <= 0.04045,
        srgb / 12.92,
        jnp.power(jnp.maximum((srgb + 0.055) / 1.055, 1e-12), 2.4),
    )


def linear_to_srgb(linear: jnp.ndarray) -> jnp.ndarray:
    """Inverse OETF — applied by the image writer to mimic the reference's
    Rgba8UnormSrgb render target encode (src/render/mod.rs:914-982)."""
    return jnp.where(
        linear <= 0.0031308,
        linear * 12.92,
        1.055 * jnp.power(jnp.maximum(linear, 1e-12), 1.0 / 2.4) - 0.055,
    )


def world_to_local_direction(direction: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Rotate a world-space ray direction into the cloud's local frame using the
    normalized model-transform basis (src/render/gaussian.wgsl:186-203)."""
    basis = transform[:3, :3]  # columns are the local axes in world space
    bx = basis[:, 0] / jnp.linalg.norm(basis[:, 0])
    by = basis[:, 1] / jnp.linalg.norm(basis[:, 1])
    bz = basis[:, 2] / jnp.linalg.norm(basis[:, 2])
    local = jnp.stack(
        [direction @ bx, direction @ by, direction @ bz],
        axis=-1,
    )
    return local / jnp.linalg.norm(local, axis=-1, keepdims=True)
