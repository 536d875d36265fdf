"""4DGS temporal conditioning: 4D covariance -> conditional 3D gaussian at time t.

Transcribes ``conditional_cov3d`` (src/render/gaussian_4d.wgsl:37-130): the 4D
rotation is the isotropic dual-quaternion product M_r . M_l applied to
diag(scale, timescale); the gaussian rendered at time t is the conditional
Sigma_11 - Sigma_12 Sigma_12^T / Sigma_tt with mean shifted by
Sigma_12 / Sigma_tt * dt and opacity modulated by the temporal marginal
exp(-dt^2 / (2 Sigma_tt)), masked below 0.05.

Note the reference does NOT conjugate the 4D covariance by the model transform
(unlike the 3DGS path); only the shifted mean goes through the transform.
"""

from __future__ import annotations

import jax.numpy as jnp

MARGINAL_MASK_THRESHOLD = 0.05  # gaussian_4d.wgsl:92


def _quat_mat_l(q: jnp.ndarray) -> jnp.ndarray:
    """Math-layout [..., 4, 4] of the WGSL M_l (gaussian_4d.wgsl:63-68)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([w, x, y, z], axis=-1),
            jnp.stack([-x, w, z, -y], axis=-1),
            jnp.stack([-y, -z, w, x], axis=-1),
            jnp.stack([-z, y, -x, w], axis=-1),
        ],
        axis=-2,
    )


def _quat_mat_r(q: jnp.ndarray) -> jnp.ndarray:
    """Math-layout [..., 4, 4] of the WGSL M_r (gaussian_4d.wgsl:70-75)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([w, x, y, z], axis=-1),
            jnp.stack([-x, w, -z, y], axis=-1),
            jnp.stack([-y, z, w, -x], axis=-1),
            jnp.stack([-z, -y, x, w], axis=-1),
        ],
        axis=-2,
    )


def conditional_cov3d(
    rotation: jnp.ndarray,  # [..., 4] left quat
    rotation_r: jnp.ndarray,  # [..., 4] right quat
    scale: jnp.ndarray,  # [..., 3]
    timescale: jnp.ndarray,  # [...]
    timestamp: jnp.ndarray,  # [...]
    time: jnp.ndarray,  # scalar or [...]
    global_scale: float = 1.0,
):
    """Returns dict(cov3d [..., 6], delta_mean [..., 3], opacity_modifier [...],
    dir_t [...], mask [...])."""
    dt = time - timestamp

    # Component-wise dual-quat product and covariance ([..., 4, 4] stacks +
    # einsum tile terribly on TPU and the einsum would run at default bf16
    # matmul precision — see the cov3d rewrite in ops/covariance.py).
    w, x, y, z = (rotation[..., i] for i in range(4))
    ml = (
        (w, x, y, z),
        (-x, w, z, -y),
        (-y, -z, w, x),
        (-z, y, -x, w),
    )
    wr, xr, yr, zr = (rotation_r[..., i] for i in range(4))
    mr = (
        (wr, xr, yr, zr),
        (-xr, wr, -zr, yr),
        (-yr, zr, wr, -xr),
        (-zr, -yr, xr, wr),
    )
    R = [
        [sum(mr[i][k] * ml[k][j] for k in range(4)) for j in range(4)]
        for i in range(4)
    ]
    s4 = (
        scale[..., 0] * global_scale,
        scale[..., 1] * global_scale,
        scale[..., 2] * global_scale,
        timescale,
    )

    # M = R diag(s4); sigma = M^T M: sigma_ij = s4_i s4_j sum_k R[k][i] R[k][j]
    def sig(i, j):
        return s4[i] * s4[j] * sum(R[k][i] * R[k][j] for k in range(4))

    cov_t = sig(3, 3)
    cov_t_safe = jnp.where(cov_t > 1e-12, cov_t, 1e-12)
    marginal_t = jnp.exp(-0.5 * dt * dt / cov_t_safe)
    mask = marginal_t > MARGINAL_MASK_THRESHOLD

    cov12 = [sig(i, 3) for i in range(3)]  # [..., 3] components
    inv_t = 1.0 / cov_t_safe

    def cond(i, j):
        return sig(i, j) - cov12[i] * cov12[j] * inv_t

    delta_mean = jnp.stack(
        [cov12[i] * inv_t * dt for i in range(3)], axis=-1
    )

    cov3d = jnp.stack(
        [cond(0, 0), cond(0, 1), cond(0, 2), cond(1, 1), cond(1, 2),
         cond(2, 2)],
        axis=-1,
    )
    return {
        "cov3d": cov3d,
        "delta_mean": delta_mean,
        "opacity_modifier": marginal_t,
        "dir_t": dt,
        "mask": mask,
    }
