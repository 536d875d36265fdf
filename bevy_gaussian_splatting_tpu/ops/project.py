"""Per-gaussian projection: cloud -> screen-space splat attributes.

This is the TPU equivalent of the reference's vertex stage ``vs_points``
(src/render/gaussian.wgsl:205-436): one fused, batched pass over all N gaussians
producing everything the rasterizer needs per splat.  In the reference this work
is re-done per quad vertex on the GPU; here it runs once per gaussian as
vectorized VPU math and is shared by the jnp oracle, the tiled XLA renderer and
the Pallas kernels.

Outputs ("splats" dict, all [N, ...]):
  mask        bool     survives frustum/draw-mode/4D-marginal culling
  depth2      f32      squared distance to camera (sort key basis)
  center_ndc  [N, 2]   projected center in NDC
  rgb         [N, 3]   flat per-splat color for the active rasterize mode
  alpha       f32      opacity * global_opacity (incl. 4D marginal modifier)
  cutoff      f32      sigma cutoff (3 or adaptive)
  -- 3D/4D (AABB): conic [N, 3], radius_vp f32 (bounding radius in vp units)
  -- 3D/4D (OBB):  obb_bounds [N, 2], obb_axis [N, 2] (unit major eigvec)
  -- 2D surfel:    surfel_t [N, 3, 3], mean_2d [N, 2], surfel_radius f32

Unit note: "vp units" = NDC * viewport extent (2x true pixels), the frame the
reference computes cov2d and fragment distances in — see ops/covariance.py.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from bevy_gaussian_splatting_tpu.models.camera import Camera
from bevy_gaussian_splatting_tpu.models.cloud import (
    Gaussian3dCloud,
    Gaussian3dCovCloud,
    Gaussian4dCloud,
)
from bevy_gaussian_splatting_tpu.models.settings import (
    CloudSettings,
    DrawMode,
    GaussianMode,
    GaussianColorSpace,
    RasterizeMode,
)
from bevy_gaussian_splatting_tpu.ops import color as color_ops
from bevy_gaussian_splatting_tpu.ops import covariance as cov_ops
from bevy_gaussian_splatting_tpu.ops import gaussian_2d as g2d
from bevy_gaussian_splatting_tpu.ops import gaussian_4d as g4d
from bevy_gaussian_splatting_tpu.ops import sh as sh_ops
from bevy_gaussian_splatting_tpu.ops.transforms import (
    apply_transform,
    in_frustum,
    world_to_clip,
)


def _sh_color(cloud, settings: CloudSettings, ray_dir_local, dir_t=None):
    """get_color: SH lookup + color-space conversion (src/render/planar.wgsl:91-106)."""
    if isinstance(cloud, Gaussian4dCloud):
        duration = jnp.float32(settings.time_stop - settings.time_start)
        rgb = sh_ops.spherindrical_harmonics_lookup(
            ray_dir_local, dir_t, cloud.spherindrical_harmonic, duration
        )
    else:
        rgb = sh_ops.spherical_harmonics_lookup(ray_dir_local, cloud.spherical_harmonic)
    if settings.color_space == GaussianColorSpace.SRGB_REC709_DISPLAY:
        rgb = sh_ops.srgb_to_linear(rgb)
    return rgb


def project_gaussians(
    cloud,
    camera: Camera,
    settings: CloudSettings,
    model_transform: Optional[jnp.ndarray] = None,
    aabb_min: Optional[jnp.ndarray] = None,
    aabb_max: Optional[jnp.ndarray] = None,
    depth_minmax: Optional[tuple] = None,
    delta_time: float = 1.0 / 60.0,
    time=None,
) -> dict:
    """Project a cloud to per-splat screen attributes (vs_points equivalent).

    ``time`` optionally overrides ``settings.time`` with a traced value so 4D
    playback does not re-specialize the pipeline per frame."""
    if time is None:
        time = jnp.float32(settings.time)
    if model_transform is None:
        model_transform = jnp.eye(4, dtype=jnp.float32)
    if cloud.position_visibility.dtype != jnp.float32:
        # f16/bf16 storage clouds: all projection math runs f32 (the reference
        # decodes PLANAR_F16 buffers to f32 in-shader, src/render/planar.wgsl)
        cloud = cloud.astype(jnp.float32)

    mode = settings.gaussian_mode
    if isinstance(cloud, Gaussian3dCovCloud):
        # the precompute flavor stores no quat/scale: surfel projection and
        # the normal rasterize head have nothing to read (in the reference
        # these accessors are compiled out under PRECOMPUTE_COVARIANCE_3D)
        if mode != GaussianMode.GAUSSIAN_3D:
            raise ValueError(
                "precomputed-covariance clouds support GaussianMode.GAUSSIAN_3D only"
            )
        if settings.rasterize_mode == RasterizeMode.NORMAL:
            raise ValueError(
                "RasterizeMode.NORMAL requires quat/scale storage "
                "(not precompute_covariance_3d)"
            )
    n = len(cloud)
    viewport = camera.viewport[2:]
    clip_from_world = camera.clip_from_view @ camera.view_from_world
    cam_pos = camera.world_position

    position = cloud.position
    world_pos = apply_transform(model_transform, position)
    prev_world_pos = world_pos

    opacity = cloud.opacity
    visibility = cloud.visibility
    cutoff = cov_ops.opacity_cutoff(opacity, settings.opacity_adaptive_radius)

    mask = jnp.ones((n,), dtype=bool)
    if settings.draw_mode == DrawMode.SELECTED:
        mask &= visibility >= 0.5  # gaussian.wgsl:219-221

    dir_t = None
    if mode == GaussianMode.GAUSSIAN_4D:
        cond = g4d.conditional_cov3d(
            cloud.rotation,
            cloud.rotation_r,
            cloud.scale,
            cloud.timescale,
            cloud.timestamp,
            time,
            settings.global_scale,
        )
        mask &= cond["mask"]
        # position shifted by temporal delta-mean, then transformed + projected
        # (gaussian.wgsl:262-283)
        world_pos = apply_transform(model_transform, position + cond["delta_mean"])
        proj = world_to_clip(world_pos, clip_from_world)
        mask &= in_frustum(proj[..., :3])
        opacity = opacity * cond["opacity_modifier"]
        cov3 = cond["cov3d"]  # note: no model-transform conjugation for 4D
        cov2 = cov_ops.cov2d(
            world_pos, cov3, camera.view_from_world, camera.clip_from_view, viewport
        )
        dir_t = cond["dir_t"]
    else:
        proj = world_to_clip(world_pos, clip_from_world)
        mask &= in_frustum(proj[..., :3])
        if mode == GaussianMode.GAUSSIAN_3D:
            if isinstance(cloud, Gaussian3dCovCloud):
                # precompute_covariance_3d flavor: stored covariance used
                # AS-IS — the reference's precompute path compiles out the
                # model-transform conjugation and global scale
                # (gaussian_3d.wgsl:76-81, get_cov3d)
                cov3 = cloud.cov3d
            else:
                cov3 = cov_ops.compute_cov3d(
                    cloud.rotation, cloud.scale, settings.global_scale, model_transform
                )
            cov2 = cov_ops.cov2d(
                world_pos, cov3, camera.view_from_world, camera.clip_from_view, viewport
            )

    splats = {
        "mask": mask,
        "center_ndc": proj[..., :2],
        "depth2": jnp.sum((world_pos - cam_pos) ** 2, axis=-1),
        "cutoff": cutoff,
    }

    if mode == GaussianMode.GAUSSIAN_2D:
        T, mean_2d, extent, valid = g2d.compute_cov2d_surfel(
            world_pos,
            cloud.rotation,
            cloud.scale,
            settings.global_scale,
            model_transform,
            clip_from_world,
            camera.clip_from_view,
            viewport,
            cutoff,
        )
        splats["mask"] = splats["mask"] & valid
        splats["surfel_t"] = T
        splats["mean_2d"] = mean_2d
        splats["surfel_radius"] = g2d.surfel_bounding_radius(extent, cutoff)
    else:
        if settings.aabb:
            splats["conic"] = cov_ops.conic_from_cov2d(cov2)
            splats["radius_vp"] = cov_ops.aabb_radius(cov2, cutoff)
        else:
            major, minor, axis = cov_ops.obb_axes(cov2, cutoff)
            splats["obb_bounds"] = jnp.stack([major, minor], axis=-1)
            splats["obb_axis"] = axis

    # ---- color per rasterize mode (gaussian.wgsl:312-421) --------------------
    rmode = settings.rasterize_mode
    if rmode in (RasterizeMode.COLOR, RasterizeMode.CLASSIFICATION):
        ray_dir_world = world_pos - cam_pos
        ray_dir_world = ray_dir_world / jnp.maximum(
            jnp.linalg.norm(ray_dir_world, axis=-1, keepdims=True), 1e-12
        )
        ray_dir_local = sh_ops.world_to_local_direction(ray_dir_world, model_transform)
        rgb = _sh_color(cloud, settings, ray_dir_local, dir_t)
        if rmode == RasterizeMode.CLASSIFICATION:
            rgb = color_ops.class_to_rgb(visibility, rgb, settings.num_classes)
    elif rmode == RasterizeMode.DEPTH:
        depth = jnp.sqrt(splats["depth2"])
        if depth_minmax is None:
            d = jnp.where(mask, depth, jnp.inf)
            min_d = jnp.min(d)
            max_d = jnp.max(jnp.where(mask, depth, -jnp.inf))
        else:
            min_d, max_d = depth_minmax
        rgb = color_ops.depth_to_rgb(depth, min_d, max_d)
    elif rmode == RasterizeMode.NORMAL:
        # view-space z axis of T S R (gaussian.wgsl:348-368); 4D uses the left
        # quaternion (the reference TODO's full 4D rotation decomposition)
        R = cov_ops.quat_to_rotation_matrix(cloud.rotation)
        s = cloud.scale * settings.global_scale
        # L = T @ S @ R ; local_normal = L[:, 2] (third column)
        SR = R * s[..., :, None]
        L = jnp.einsum("ik,...kj->...ij", model_transform[:3, :3], SR)
        local_normal = L[..., :, 2]
        world_normal = local_normal @ camera.view_from_world[:3, :3].T
        t = world_normal / jnp.maximum(
            jnp.linalg.norm(world_normal, axis=-1, keepdims=True), 1e-12
        )
        rgb = 0.5 * (t + 1.0)
    elif rmode == RasterizeMode.OPTICAL_FLOW:
        mv = color_ops.calculate_motion_vector(
            world_pos, prev_world_pos, clip_from_world, camera.prev_clip_from_world
        )
        rgb = color_ops.optical_flow_to_rgb(mv, delta_time)
    elif rmode == RasterizeMode.POSITION:
        if aabb_min is None or aabb_max is None:
            aabb_min, aabb_max = cloud.compute_aabb()
        rgb = (world_pos - aabb_min) / (aabb_max - aabb_min)
    elif rmode == RasterizeMode.VELOCITY:
        if mode != GaussianMode.GAUSSIAN_4D:
            raise ValueError("RasterizeMode.VELOCITY requires GaussianMode.GAUSSIAN_4D")
        # finite difference of the 4D delta-mean (gaussian.wgsl:378-405)
        time_delta = 1e-3
        cond_f = g4d.conditional_cov3d(
            cloud.rotation,
            cloud.rotation_r,
            cloud.scale,
            cloud.timescale,
            cloud.timestamp,
            time + time_delta,
            settings.global_scale,
        )
        vel = (cond_f["delta_mean"] - cond["delta_mean"]) / time_delta
        vmag = jnp.linalg.norm(vel, axis=-1)
        vdir = vel / jnp.maximum(vmag[..., None], 1e-12)
        scaled_mag = jnp.clip((vmag - 1.0) / (2.0 - 1.0), 0.0, 1.0)
        opacity = jnp.where(scaled_mag < 1e-2, 0.0, opacity)
        rgb = 0.5 * (vdir + 1.0) * scaled_mag[..., None]
    else:
        raise ValueError(f"unsupported rasterize mode {rmode}")

    alpha = opacity * settings.global_opacity
    if settings.draw_mode == DrawMode.HIGHLIGHT_SELECTED:
        selected = visibility > 0.5
        highlight = jnp.array([0.3, 1.0, 0.1], dtype=rgb.dtype)
        rgb = jnp.where(selected[..., None], highlight, rgb)
        alpha = jnp.where(selected, 1.0, alpha)

    splats["rgb"] = rgb
    splats["alpha"] = alpha
    return splats
