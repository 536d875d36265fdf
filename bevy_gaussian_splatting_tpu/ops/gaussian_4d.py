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

    ml = _quat_mat_l(rotation)
    mr = _quat_mat_r(rotation_r)
    R = mr @ ml  # [..., 4, 4]
    s4 = jnp.stack(
        [
            scale[..., 0] * global_scale,
            scale[..., 1] * global_scale,
            scale[..., 2] * global_scale,
            timescale,
        ],
        axis=-1,
    )
    M = R * s4[..., None, :]  # R @ diag(s4): scale columns
    sigma = jnp.einsum("...ki,...kj->...ij", M, M)  # M^T M

    cov_t = sigma[..., 3, 3]
    cov_t_safe = jnp.where(cov_t > 1e-12, cov_t, 1e-12)
    marginal_t = jnp.exp(-0.5 * dt * dt / cov_t_safe)
    mask = marginal_t > MARGINAL_MASK_THRESHOLD

    cov12 = sigma[..., :3, 3]  # [..., 3]
    cond = sigma[..., :3, :3] - (cov12[..., :, None] * cov12[..., None, :]) / cov_t_safe[
        ..., None, None
    ]
    delta_mean = cov12 / cov_t_safe[..., None] * dt[..., None]

    cov3d = jnp.stack(
        [
            cond[..., 0, 0],
            cond[..., 0, 1],
            cond[..., 0, 2],
            cond[..., 1, 1],
            cond[..., 1, 2],
            cond[..., 2, 2],
        ],
        axis=-1,
    )
    return {
        "cov3d": cov3d,
        "delta_mean": delta_mean,
        "opacity_modifier": marginal_t,
        "dir_t": dt,
        "mask": mask,
    }
