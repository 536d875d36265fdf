"""2DGS surfel projection (per the 2DGS paper's homography formulation).

Transcribes ``compute_cov2d_surfel`` / ``get_bounding_box_cov2d`` /
``surfel_fragment_power`` from src/render/gaussian_2d.wgsl:44-156.

The surfel's local tangent plane (u, v) maps to pixel space through
T = world_from_local^T . clip_from_world^T . Ks, a 3x3 homography; the fragment
power is -0.5 * min(3D ray-plane distance^2, 2 * 2D pixel distance^2).

Pixel-coordinate quirk (reproduced faithfully): the reference fragment computes
``pixel_coord = uv * radius * aspect + mean_2d`` which, after unwinding the quad
interpolation, evaluates the surfel at mean_2d + (2*dx_px, -2*(w/h)*dy_px) for a
true pixel offset (dx_px, dy_px) from the quad center — i.e. in a doubled,
y-flipped coordinate frame relative to the homography's true-pixel mean_2d.  The
oracle reproduces this exactly for parity.
"""

from __future__ import annotations

import jax.numpy as jnp

FILTER_SIZE = 0.707106  # gaussian_2d.wgsl:51


def intrinsic_matrix(clip_from_view: jnp.ndarray, viewport_size: jnp.ndarray) -> jnp.ndarray:
    """Ks [4, 3] (math layout of the WGSL mat3x4, helpers.wgsl:122-136):
    true-pixel focal lengths and the (size-1)/2 principal point."""
    w, h = viewport_size[0], viewport_size[1]
    fx = clip_from_view[0, 0] * w / 2.0
    fy = clip_from_view[1, 1] * h / 2.0
    ks = jnp.zeros((4, 3), dtype=jnp.float32)
    ks = ks.at[0, 0].set(fx)
    ks = ks.at[1, 1].set(fy)
    ks = ks.at[3, 0].set((w - 1.0) / 2.0)
    ks = ks.at[3, 1].set((h - 1.0) / 2.0)
    ks = ks.at[3, 2].set(1.0)
    return ks


def compute_cov2d_surfel(
    position_world: jnp.ndarray,  # [..., 3] transformed gaussian center
    rotation: jnp.ndarray,  # [..., 4]
    scale: jnp.ndarray,  # [..., 3]
    global_scale: float,
    model_transform: jnp.ndarray,  # [4, 4]
    clip_from_world: jnp.ndarray,  # [4, 4]
    clip_from_view: jnp.ndarray,  # [4, 4]
    viewport_size: jnp.ndarray,  # [2]
    cutoff: jnp.ndarray,  # [...]
):
    """Returns (local_to_pixel [..., 3, 3] math-layout T, mean_2d [..., 2],
    extent [..., 2], valid [...]) — gaussian_2d.wgsl:77-132."""
    # Component-wise (the [..., 3, 3]-stacked einsum formulation tiles
    # terribly on TPU and runs matmuls at default bf16 precision — see the
    # cov3d rewrite in ops/covariance.py).
    r, qx, qy, qz = (rotation[..., i] for i in range(4))
    # rows of the reference rotation matrix (helpers.wgsl get_rotation_matrix)
    R_rows = (
        (1.0 - 2.0 * (qy * qy + qz * qz), 2.0 * (qx * qy + r * qz),
         2.0 * (qx * qz - r * qy)),
        (2.0 * (qx * qy - r * qz), 1.0 - 2.0 * (qx * qx + qz * qz),
         2.0 * (qy * qz + r * qx)),
        (2.0 * (qx * qz + r * qy), 2.0 * (qy * qz - r * qx),
         1.0 - 2.0 * (qx * qx + qy * qy)),
    )
    s = tuple(scale[..., j] * global_scale for j in range(3))
    T_r = model_transform[:3, :3]
    # L = T_r @ R^T @ S; only columns 0 and 1 feed world_from_local:
    # L[i][j] = sum_k T_r[i, k] R[j][k] * s_j
    L = [
        [sum(T_r[i, k] * R_rows[j][k] for k in range(3)) * s[j]
         for j in range(2)]
        for i in range(3)
    ]

    ks = intrinsic_matrix(clip_from_view, viewport_size)  # [4, 3]
    # T = wfl^T @ (clip_from_world^T @ Ks) with wfl columns
    # (L[:,0], 0), (L[:,1], 0), (pos, 1)   (gaussian_2d.wgsl:103)
    m = clip_from_world.T @ ks  # [4, 3] constants
    pos = tuple(position_world[..., k] for k in range(3))
    t_rows = []
    for i in range(2):  # rows 0, 1 from the surfel axes
        t_rows.append(
            [sum(L[k][i] * m[k, j] for k in range(3)) for j in range(3)]
        )
    t_rows.append(
        [sum(pos[k] * m[k, j] for k in range(3)) + m[3, j] for j in range(3)]
    )
    T = jnp.stack(
        [jnp.stack(row, axis=-1) for row in t_rows], axis=-2
    )  # [..., 3, 3]

    cut2 = cutoff * cutoff
    test = jnp.stack([cut2, cut2, -jnp.ones_like(cut2)], axis=-1)  # [..., 3]
    T0, T1, T2 = T[..., :, 0], T[..., :, 1], T[..., :, 2]  # columns
    d = jnp.sum(test * T2 * T2, axis=-1)
    valid = jnp.abs(d) >= 1.0e-4
    d_safe = jnp.where(valid, d, 1.0)
    f = test / d_safe[..., None]
    mean_2d = jnp.stack(
        [jnp.sum(f * T0 * T2, axis=-1), jnp.sum(f * T1 * T2, axis=-1)], axis=-1
    )
    t = jnp.stack(
        [jnp.sum(f * T0 * T0, axis=-1), jnp.sum(f * T1 * T1, axis=-1)], axis=-1
    )
    extent = mean_2d * mean_2d - t
    valid = valid & (extent[..., 0] >= 1.0e-4) & (extent[..., 1] >= 1.0e-4)
    return T, mean_2d, extent, valid


def surfel_bounding_radius(extent: jnp.ndarray, cutoff: jnp.ndarray) -> jnp.ndarray:
    """max_radius in the reference's doubled pixel units; the quad spans
    +- max_radius/2 true pixels around the projected center
    (gaussian_2d.wgsl:44-75)."""
    from bevy_gaussian_splatting_tpu.ops.covariance import safe_sqrt

    radius = safe_sqrt(extent)
    return jnp.maximum(
        jnp.maximum(radius[..., 0], radius[..., 1]), cutoff * FILTER_SIZE
    )


def surfel_affine_coeffs(
    local_to_pixel: jnp.ndarray,  # [..., 3, 3]
    mean_2d: jnp.ndarray,  # [..., 2]
    width,
):
    """Folded affine form of the fragment homography intersection.

    (pcx*c - a) x (pcy*c - b) with a/b/c the columns of T expands to
    pcx*(bxc) + pcy*(cxa) + (axb); substituting pcx = m2x + dxn*width gives
    q = dxn*A + dyn*B + C with

        A = width*(bxc),  B = width*(cxa),  C = m2x*(bxc) + m2y*(cxa) + axb.

    One shared precompute keeps the oracle, the XLA compositor and the Pallas
    kernels bit-consistent; the expansion also removes the original cross
    product's pcx*pcy*(cxc) cancellation noise.  Returns (A, B, C), each
    [..., 3]."""
    a = local_to_pixel[..., :, 0]
    b = local_to_pixel[..., :, 1]
    c = local_to_pixel[..., :, 2]
    u = jnp.cross(b, c)
    v = jnp.cross(c, a)
    w_ = jnp.cross(a, b)
    wf = jnp.asarray(width, jnp.float32)
    m2x = mean_2d[..., 0:1]
    m2y = mean_2d[..., 1:2]
    return wf * u, wf * v, m2x * u + m2y * v + w_


def surfel_affine_power(
    A: jnp.ndarray,  # [..., 3]
    B: jnp.ndarray,
    C: jnp.ndarray,
    dxn: jnp.ndarray,  # [...] pixel offset from the splat center, NDC
    dyn: jnp.ndarray,
    width,
) -> jnp.ndarray:
    """-0.5 * min(s3d, 2 * d2) from the folded coefficients (see
    surfel_affine_coeffs); d2 = width^2*(dxn^2 + dyn^2) is the doubled-frame
    2D distance (both axes scale by width, gaussian_2d.wgsl quirk)."""
    q = dxn[..., None] * A + dyn[..., None] * B + C
    pz = jnp.where(jnp.abs(q[..., 2]) > 1e-12, q[..., 2], 1e-12)
    # one reciprocal instead of two divides — the TPU kernels, the XLA
    # compositor and this oracle all use the SAME formulation so the
    # production paths stay bit-consistent with the oracle
    inv_pz = 1.0 / pz
    us = q[..., 0] * inv_pz
    vs = q[..., 1] * inv_pz
    s3d = us * us + vs * vs
    two_w2 = 2.0 * jnp.asarray(width, jnp.float32) ** 2
    d2x2 = (dxn * dxn + dyn * dyn) * two_w2
    return -0.5 * jnp.minimum(s3d, d2x2)


def surfel_fragment_power(
    local_to_pixel: jnp.ndarray,  # [..., 3, 3]
    pixel_coord: jnp.ndarray,  # [..., 2] in the reference's fragment frame
    mean_2d: jnp.ndarray,  # [..., 2]
) -> jnp.ndarray:
    """-0.5 * min(ray-plane-3D distance^2, 2 * 2D distance^2)
    (gaussian_2d.wgsl:134-156)."""
    deltas = mean_2d - pixel_coord
    T0 = local_to_pixel[..., :, 0]
    T1 = local_to_pixel[..., :, 1]
    T2 = local_to_pixel[..., :, 2]
    hu = pixel_coord[..., 0:1] * T2 - T0
    hv = pixel_coord[..., 1:2] * T2 - T1
    p = jnp.cross(hu, hv)
    pz = jnp.where(jnp.abs(p[..., 2]) > 1e-12, p[..., 2], 1e-12)
    us = p[..., 0] / pz
    vs = p[..., 1] / pz
    sigmas_3d = us * us + vs * vs
    sigmas_2d = 2.0 * jnp.sum(deltas * deltas, axis=-1)
    return -0.5 * jnp.minimum(sigmas_3d, sigmas_2d)
