"""Covariance math: quaternion -> rotation, 3D covariance, EWA 2D projection.

Transcribes the reference formulas exactly (they are the parity target for both the
jnp oracle and the Pallas kernels):

  - rotation matrix:   src/render/helpers.wgsl:127-168 (``get_rotation_matrix``)
  - 3D covariance:     src/gaussian/covariance.rs:4-41 and
                       src/render/gaussian_3d.wgsl:49-71 (``compute_cov3d`` — the
                       shader variant additionally conjugates by the model transform)
  - EWA projection:    src/render/helpers.wgsl:8-55 (``cov2d``) including the
                       +0.3 pixel dilation on the diagonal
  - screen bounding:   src/render/helpers.wgsl:57-120 (``get_bounding_box_clip``)

Shapes are batched over a leading N axis; all math is elementwise/VPU-friendly
(no batched 3x3 matmuls — products are expanded to fused multiply-adds).

Unit convention: the reference computes 2D covariance in "viewport-scaled NDC"
units — focal = clip_from_view[0][0] * viewport.width (twice the pixel focal
length) — and evaluates the fragment quadratic form in the same units, so the
result is scale-consistent.  We keep that convention everywhere ("vp units";
1 vp unit = half a pixel) so constants like the +0.3 dilation match bit-for-bit.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(x, 0)) with finite gradients at x <= 0.

    ``jnp.sqrt(jnp.maximum(x, 0))`` back-propagates 0 * inf = NaN exactly at
    x == 0 (degenerate eigenvalues, padded splats); the double-where keeps the
    forward identical and the backward finite."""
    safe = jnp.maximum(x, 1e-12)
    return jnp.where(x > 0, jnp.sqrt(safe), 0.0)


def quat_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) [..., 4] -> rotation matrix [..., 3, 3].

    Matches get_rotation_matrix (src/render/helpers.wgsl:127-152): the WGSL builds
    columns (1-2(y²+z²), 2(xy-rz), 2(xz+ry)), ... — i.e. math matrix
    M[row][col] with M[0] = (1-2(y²+z²), 2(xy+rz), 2(xz-ry)).  The reference does
    NOT normalize the quaternion here (PLY load normalizes at import)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y + r * z), 2.0 * (x * z - r * y)],
        axis=-1,
    )
    row1 = jnp.stack(
        [2.0 * (x * y - r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z + r * x)],
        axis=-1,
    )
    row2 = jnp.stack(
        [2.0 * (x * z + r * y), 2.0 * (y * z - r * x), 1.0 - 2.0 * (x * x + y * y)],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def compute_cov3d(
    rotation: jnp.ndarray,
    scale: jnp.ndarray,
    global_scale: float = 1.0,
    model_transform: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Upper-triangular 3D covariance [..., 6] from quat [..., 4] + scale [..., 3].

    Sigma = (S R)^T (S R) with S = diag(scale * global_scale)
    (src/gaussian/covariance.rs:31-33, src/render/gaussian_3d.wgsl:60-62).
    If ``model_transform`` [4,4] is given, conjugates by its 3x3 part:
    TS = T Sigma T^T (src/render/gaussian_3d.wgsl:63-71)."""
    # Fully component-wise ([..., 3, 3] stacks + einsum measured 21.7 ms
    # fwd+bwd at 1M on TPU: tiny minor dims tile terribly, and the einsum
    # would run at default bf16 matmul precision; scalar-expanded VPU ops
    # are exact f32 and an order of magnitude faster).
    r, x, y, z = (rotation[..., i] for i in range(4))
    rows = (
        (1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y + r * z), 2.0 * (x * z - r * y)),
        (2.0 * (x * y - r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z + r * x)),
        (2.0 * (x * z + r * y), 2.0 * (y * z - r * x), 1.0 - 2.0 * (x * x + y * y)),
    )
    s2 = tuple((scale[..., k] * global_scale) ** 2 for k in range(3))
    # Sigma = (S R)^T (S R): sigma_ij = sum_k s_k^2 R[k][i] R[k][j]
    def sig(i, j):
        return sum(s2[k] * rows[k][i] * rows[k][j] for k in range(3))

    sigma = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(i, 3):
            sigma[i][j] = sigma[j][i] = sig(i, j)
    if model_transform is not None:
        T = model_transform[:3, :3]
        # TS = T Sigma T^T, expanded with the (traced) scalar T entries
        ts = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(i, 3):
                acc = 0.0
                for k in range(3):
                    for l in range(3):
                        acc = acc + T[i, k] * sigma[k][l] * T[j, l]
                ts[i][j] = ts[j][i] = acc
        sigma = ts
    return jnp.stack(
        [sigma[0][0], sigma[0][1], sigma[0][2], sigma[1][1], sigma[1][2],
         sigma[2][2]],
        axis=-1,
    )


def cov2d(
    position_world: jnp.ndarray,
    cov3d: jnp.ndarray,
    view_from_world: jnp.ndarray,
    clip_from_view: jnp.ndarray,
    viewport_size: jnp.ndarray,
) -> jnp.ndarray:
    """EWA projection of [..., 6] 3D covariance to [..., 3] 2D covariance
    (sigma_xx, sigma_xy, sigma_yy) in vp units, including the +0.3 dilation.

    Transcription of ``cov2d`` (src/render/helpers.wgsl:8-55).  The WGSL computes
    cov = T^T Vrk T with T = W J, W the transposed view rotation and J the
    (transposed) perspective Jacobian; expanded here per component.  Note the
    Jacobian's y row carries a sign flip (-focal.y/t.z) mapping view-space +y to
    screen-down +y."""
    # view-space position t = view_from_world * (pos, 1)
    rv = view_from_world[:3, :3]
    tv = view_from_world[:3, 3]
    t = position_world @ rv.T + tv
    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]

    focal_x = clip_from_view[0, 0] * viewport_size[0]
    focal_y = clip_from_view[1, 1] * viewport_size[1]

    s = 1.0 / (tz * tz)
    # J (numpy [row, col] of the WGSL column-major constructor):
    #   [[fx/tz,      0,        0],
    #    [0,         -fy/tz,    0],
    #    [-fx*tx*s,   fy*ty*s,  0]]
    j00 = focal_x / tz
    j11 = -focal_y / tz
    j20 = -focal_x * tx * s
    j21 = focal_y * ty * s

    # T = W @ J with W = rv^T  => T[:, c] = rv^T @ J[:, c]
    # col 0 of J = (j00, 0, j20); col 1 = (0, j11, j21); col 2 = 0.
    # T[i, 0] = rv[0, i] * j00 + rv[2, i] * j20
    # T[i, 1] = rv[1, i] * j11 + rv[2, i] * j21
    T0 = rv[0, :] * j00[..., None] + rv[2, :] * j20[..., None]  # [..., 3] = T[:, 0]
    T1 = rv[1, :] * j11[..., None] + rv[2, :] * j21[..., None]  # [..., 3] = T[:, 1]

    # cov2d = T^T Vrk T restricted to the upper-left 2x2:
    #   cov[a, b] = T[:, a]^T Vrk T[:, b]
    c0, c1, c2, c3, c4, c5 = (cov3d[..., i] for i in range(6))

    def vrk_mul(v):
        # Vrk @ v for v [..., 3]
        vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
        return jnp.stack(
            [
                c0 * vx + c1 * vy + c2 * vz,
                c1 * vx + c3 * vy + c4 * vz,
                c2 * vx + c4 * vy + c5 * vz,
            ],
            axis=-1,
        )

    vT0 = vrk_mul(T0)
    sxx = jnp.sum(T0 * vT0, axis=-1) + 0.3
    sxy = jnp.sum(T1 * vT0, axis=-1)
    syy = jnp.sum(T1 * vrk_mul(T1), axis=-1) + 0.3
    return jnp.stack([sxx, sxy, syy], axis=-1)


def cov2d_eigen(cov: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Eigenvalues (lambda1 >= lambda2 >= 0) of the [..., 3] 2D covariance
    (src/render/helpers.wgsl:62-74)."""
    sxx, sxy, syy = cov[..., 0], cov[..., 1], cov[..., 2]
    det = sxx * syy - sxy * sxy
    mid = 0.5 * (sxx + syy)
    term = safe_sqrt(mid * mid - det)
    lambda1 = mid + term
    lambda2 = jnp.maximum(mid - term, 0.0)
    return lambda1, lambda2


def conic_from_cov2d(cov: jnp.ndarray) -> jnp.ndarray:
    """Inverse 2D covariance (conic.x, conic.y, conic.z) — the AABB fragment path
    (src/render/gaussian.wgsl:316-325)."""
    sxx, sxy, syy = cov[..., 0], cov[..., 1], cov[..., 2]
    det_inv = 1.0 / (sxx * syy - sxy * sxy)
    return jnp.stack([syy * det_inv, -sxy * det_inv, sxx * det_inv], axis=-1)


def aabb_radius(cov: jnp.ndarray, cutoff: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned bounding radius in vp units: cutoff * sqrt(max eigenvalue)
    (src/render/helpers.wgsl:76-86)."""
    lambda1, lambda2 = cov2d_eigen(cov)
    return cutoff * jnp.maximum(safe_sqrt(lambda1), safe_sqrt(lambda2))


def obb_axes(cov: jnp.ndarray, cutoff: jnp.ndarray):
    """Oriented bounding box: (major_radius, minor_radius, eigvec1 [..., 2])
    scaled by cutoff (src/render/helpers.wgsl:88-120)."""
    sxx, sxy, syy = cov[..., 0], cov[..., 1], cov[..., 2]
    lambda1, _ = cov2d_eigen(cov)
    b = safe_sqrt((sxx - syy) ** 2 + 4.0 * sxy * sxy)
    major = safe_sqrt((sxx + syy + b) * 0.5) * cutoff
    minor = safe_sqrt((sxx + syy - b) * 0.5) * cutoff
    ev = jnp.stack([-sxy, lambda1 - sxx], axis=-1)
    norm = jnp.linalg.norm(ev, axis=-1, keepdims=True)
    ev = jnp.where(norm > 1e-12, ev / jnp.maximum(norm, 1e-12), jnp.stack([jnp.ones_like(sxy), jnp.zeros_like(sxy)], axis=-1))
    return major, minor, ev


def opacity_cutoff(opacity: jnp.ndarray, adaptive: bool) -> jnp.ndarray:
    """Splat extent cutoff in standard deviations: sqrt(9 + 2 ln(opacity)) when
    opacity-adaptive-radius is enabled, else 3 (src/render/gaussian.wgsl:229-235).

    The inner opacity clamp leaves forward values unchanged (the outer
    max(., 1e-6) already floors the result for opacity < e^-4.5) but keeps
    ``jax.grad`` finite at opacity == 0: without it the log's infinite
    derivative times the maximum's zero cotangent produces NaN."""
    if adaptive:
        return jnp.sqrt(
            jnp.maximum(9.0 + 2.0 * jnp.log(jnp.maximum(opacity, 1e-8)), 1e-6)
        )
    return jnp.full_like(opacity, 3.0)
