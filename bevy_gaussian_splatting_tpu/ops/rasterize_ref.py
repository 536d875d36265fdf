"""Reference (oracle) rasterizer: exact, slow, pure-jnp, differentiable.

This is the ground truth every production kernel is allclose'd against
(SURVEY.md §7 stage 2), and ``jax.grad`` of it is the gradient oracle for the
hand-derived backward pass.  It reproduces the reference's fragment math and
blending exactly:

  - back-to-front painter order over depth-sorted gaussians with premultiplied
    alpha ``(rgb * a, a)``, dst factor (1 - a) (src/render/mod.rs:914-982)
  - AABB path: quadratic form via the conic, quad-clipped, discard at power > 0
    (src/render/gaussian.wgsl:455-487)
  - OBB path: power = -4.5 * |uv|^2 in the eigen-rotated quad frame
    (src/render/gaussian.wgsl:489-497)
  - 2DGS surfel: min(3D ray-plane, 2x 2D) distance power
    (src/render/gaussian_2d.wgsl:134-156)
  - alpha cap 0.999 (src/render/gaussian.wgsl:499-505)

Complexity is O(N * H * W): a ``lax.scan`` over gaussians carrying the image.
Use only for tests and tiny scenes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from bevy_gaussian_splatting_tpu.models.camera import Camera
from bevy_gaussian_splatting_tpu.models.settings import (
    CloudSettings,
    GaussianMode,
    SortMode,
)
from bevy_gaussian_splatting_tpu.ops.project import project_gaussians
from bevy_gaussian_splatting_tpu.ops import sort as sort_ops

ALPHA_CAP = 0.999  # gaussian.wgsl:499


def pixel_grid_ndc(width: int, height: int):
    """NDC coordinates of pixel centers: x right, y up (row 0 = top)."""
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) * (2.0 / width) - 1.0
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) * (2.0 / height)
    return jnp.meshgrid(xs, ys, indexing="xy")  # each [H, W]


def _fragment_alpha_3d_aabb(splat, px_vp, py_vp, viewport):
    """AABB conic falloff at vp-unit pixel coords; returns ([H, W] gaussian
    term with quad clipping, [H, W] quad-edge mask) (gaussian.wgsl:455-470,
    486-495)."""
    cx = splat["center_ndc"][0] * viewport[0]
    cy = splat["center_ndc"][1] * viewport[1]
    dx = cx - px_vp
    dy = cy - py_vp
    conic = splat["conic"]
    power = (
        -0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) + conic[1] * dx * dy
    )
    r = splat["radius_vp"]
    in_quad = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
    inside = in_quad & (power <= 0.0)
    safe_r = jnp.maximum(r, 1e-12)
    edge = in_quad & (
        jnp.maximum(jnp.abs(dx), jnp.abs(dy)) / safe_r > 1.0 - 2.0 * 0.08
    )
    return jnp.where(inside, jnp.exp(power), 0.0), edge


def _fragment_alpha_3d_obb(splat, px_vp, py_vp, viewport):
    """OBB quad falloff: uv in the eigen-rotated quad, power = -|uv|^2 / (2/9)
    (gaussian.wgsl:489-497; vertex mapping helpers.wgsl:88-120)."""
    cx = splat["center_ndc"][0] * viewport[0]
    cy = splat["center_ndc"][1] * viewport[1]
    dx = px_vp - cx
    dy = py_vp - cy
    e1 = splat["obb_axis"]
    e2x, e2y = e1[1], -e1[0]  # eigvec2 = (e1.y, -e1.x) (helpers.wgsl:103-106)
    bounds = splat["obb_bounds"]
    # single-reciprocal form shared with all production evaluators
    # (cross-path bit-consistency; 1-ulp vs the WGSL's divide)
    inv1 = 1.0 / jnp.maximum(bounds[0], 1e-12)
    inv2 = 1.0 / jnp.maximum(bounds[1], 1e-12)
    u = (dx * e1[0] + dy * e1[1]) * inv1
    v = (dx * e2x + dy * e2y) * inv2
    inside = (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0) & (bounds[0] > 0.0)
    power = -4.5 * (u * u + v * v)  # sigma = 1/3 (gaussian.wgsl:490-494)
    edge = inside & (jnp.maximum(jnp.abs(u), jnp.abs(v)) > 1.0 - 2.0 * 0.08)
    return jnp.where(inside, jnp.exp(power), 0.0), edge


def _fragment_alpha_2d(splat, px_ndc, py_ndc, viewport):
    """2DGS surfel falloff in the reference's fragment frame (see
    ops/gaussian_2d.py docstring for the doubled-coordinate quirk).

    Uses the folded affine form (surfel_affine_coeffs) shared with the
    production compositors — algebraically identical to the WGSL's
    hu x hv cross product (gaussian_2d.wgsl:134-156) and better conditioned
    (the expansion removes the pcx*pcy*(c x c) cancellation term)."""
    from bevy_gaussian_splatting_tpu.ops.gaussian_2d import (
        surfel_affine_coeffs,
        surfel_affine_power,
    )

    w = viewport[0]
    mr = splat["surfel_radius"]
    cx_ndc = splat["center_ndc"][0]
    cy_ndc = splat["center_ndc"][1]
    dx_ndc = px_ndc - cx_ndc
    dy_ndc = py_ndc - cy_ndc
    # mr scaling hoisted to the per-splat side (identical formulation in the
    # XLA compositor and both Pallas kernels keeps cross-path bit-parity;
    # in the kernels it turns two [PIX, CHUNK] multiplies into row ops).
    # KNOWN strict-reference deviation (documented, all in-repo paths agree):
    # the upstream WGSL tests |d| * viewport <= mr; this |d| <= mr * (1/vp)
    # form can flip BORDERLINE fragments by 1 ulp for non-power-of-two
    # viewports.  If a future comparison against the upstream renderer chases
    # a 1-px boundary diff, suspect this reformulation first, not the kernels.
    inside = (jnp.abs(dx_ndc) <= mr * (1.0 / viewport[0])) & (
        jnp.abs(dy_ndc) <= mr * (1.0 / viewport[1])
    )
    A, B, C = surfel_affine_coeffs(splat["surfel_t"], splat["mean_2d"], w)
    power = surfel_affine_power(A, B, C, dx_ndc, dy_ndc, w)
    safe_mr = jnp.maximum(mr, 1e-12)
    uv = jnp.maximum(
        jnp.abs(dx_ndc) * viewport[0], jnp.abs(dy_ndc) * viewport[1]
    ) / safe_mr
    edge = inside & (uv > 1.0 - 2.0 * 0.08)
    return jnp.where(inside, jnp.exp(power), 0.0), edge


def composite_splats(
    splats: dict,
    order: jnp.ndarray,
    width: int,
    height: int,
    settings: CloudSettings,
    background: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Painter-blend splats over the image in ``order`` (back-to-front).

    Returns [H, W, 4] premultiplied linear RGBA."""
    viewport = jnp.array([float(width), float(height)], jnp.float32)
    px_ndc, py_ndc = pixel_grid_ndc(width, height)
    px_vp = px_ndc * viewport[0]
    py_vp = py_ndc * viewport[1]

    mode = settings.gaussian_mode
    use_2d = mode == GaussianMode.GAUSSIAN_2D

    ordered = jax.tree.map(lambda a: a[order], splats)

    if background is None:
        background = jnp.zeros((4,), jnp.float32)
    image0 = jnp.broadcast_to(background, (height, width, 4)).astype(jnp.float32)

    def blend_one(image, splat):
        if use_2d:
            g, edge = _fragment_alpha_2d(splat, px_ndc, py_ndc, viewport)
        elif settings.aabb:
            g, edge = _fragment_alpha_3d_aabb(splat, px_vp, py_vp, viewport)
        else:
            g, edge = _fragment_alpha_3d_obb(splat, px_vp, py_vp, viewport)
        alpha = jnp.minimum(g * splat["alpha"], ALPHA_CAP)
        alpha = jnp.where(splat["mask"], alpha, 0.0)
        src_rgb = splat["rgb"][None, None, :] * alpha[..., None]
        if settings.visualize_bounding_box:
            # opaque green quad borders (gaussian.wgsl:486-495)
            edge = edge & splat["mask"]
            alpha = jnp.where(edge, 1.0, alpha)
            green = jnp.array([0.3, 1.0, 0.1], jnp.float32)
            src_rgb = jnp.where(edge[..., None], green, src_rgb)
        src = jnp.concatenate([src_rgb, alpha[..., None]], axis=-1)
        image = src + image * (1.0 - alpha[..., None])
        return image, None

    image, _ = jax.lax.scan(blend_one, image0, ordered)
    return image


def render_oracle(
    cloud,
    camera: Camera,
    settings: CloudSettings,
    model_transform: Optional[jnp.ndarray] = None,
    background: Optional[jnp.ndarray] = None,
    time=None,
    width: Optional[int] = None,
    height: Optional[int] = None,
) -> jnp.ndarray:
    """Full oracle render: sort + project + composite -> [H, W, 4] linear RGBA.

    ``width``/``height`` must be passed explicitly when tracing under jit (the
    image shape is static); otherwise they are read off the camera viewport."""
    if model_transform is None:
        model_transform = jnp.eye(4, dtype=jnp.float32)

    if width is None:
        width = int(camera.viewport[2])
    if height is None:
        height = int(camera.viewport[3])
    clip_from_world = camera.clip_from_view @ camera.view_from_world

    if settings.sort_mode in (SortMode.RADIX, SortMode.NONE):
        back_key = sort_ops.radix_depth_key(
            cloud.position,
            model_transform,
            clip_from_world,
            camera.world_position,
            settings.radix_sort_depth_bits.bits,
        )
        keys, order = sort_ops.sort_entries(back_key)
        # per-GAUSSIAN sentinel mask (back_key is in cloud order; ``keys`` is in
        # sorted order and must not be mixed with unsorted splats)
        sentinel_mask = back_key != sort_ops.SENTINEL_KEY
    else:
        import numpy as np

        order = jnp.asarray(
            sort_ops.sort_gaussians_host(
                np.asarray(cloud.position),
                np.asarray(model_transform),
                np.asarray(camera.world_position),
            )
        )
        sentinel_mask = jnp.ones((len(cloud),), dtype=bool)

    # RASTERIZE_DEPTH min/max from sorted entries (gaussian.wgsl:329-347):
    # max from entry index 1, min from entry count-1 (reference quirk).
    n = len(cloud)
    first_idx = order[min(1, n - 1)]
    last_idx = order[n - 1]
    from bevy_gaussian_splatting_tpu.ops.transforms import apply_transform

    wp = apply_transform(model_transform, cloud.position)
    cam_pos = camera.world_position
    max_d = jnp.linalg.norm(wp[first_idx] - cam_pos)
    min_d = jnp.linalg.norm(wp[last_idx] - cam_pos)

    splats = project_gaussians(
        cloud,
        camera,
        settings,
        model_transform,
        depth_minmax=(min_d, max_d),
        time=time,
    )
    splats["mask"] = splats["mask"] & sentinel_mask

    return composite_splats(splats, order, width, height, settings, background)
