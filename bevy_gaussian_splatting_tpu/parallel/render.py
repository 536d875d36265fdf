"""Multi-chip sharded rendering and training over a ``jax.sharding.Mesh``.

The reference is single-GPU (SURVEY.md §2.9); this layer is new work designed
for TPU meshes per BASELINE.json:

  - **primitive-parallel**: gaussians shard across the ``tiles`` mesh axis;
    projection (the vs_points-equivalent math) runs on local shards only.
  - **pixel-parallel**: after a ``lax.all_gather`` of the compact projected
    splat parameters over ICI, each device bins and composites only its own
    horizontal band of tile rows — the sort/bin work shards with the rows.
  - **camera-parallel**: an optional leading mesh axis batches cameras
    (replaces the reference's per-camera sorted-entry chunks,
    src/sort/mod.rs:347-354).

Communication pattern (fwd): one exchange of [~14]-col f32 splat params per
frame (≪ raw cloud bytes — SH coefficients never cross ICI; color is evaluated
before the exchange), either a full ``all_gather`` (default) or the BOUNDED
band exchange (``exchange="bounded"``, parallel/exchange.py): an all_to_all
that routes each splat only to the bands its rect intersects, so per-device
volume scales with band coverage instead of N.  Backward: the all-gather
transpose (reduce-scatter) runs automatically under ``shard_map`` +
``jax.grad``; the bounded exchange carries its own custom VJP (reverse
all_to_all + scatter-free segmented reduction).  Multi-host: see
parallel/distributed.py (jax.distributed init + hybrid camera=DCN x tiles=ICI
mesh).

Training: ``make_train_step`` builds a jitted, sharded photometric-loss step
(L2 on linear premultiplied RGBA) with optax, gradients flowing through the
differentiable tiled compositor.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bevy_gaussian_splatting_tpu.models.camera import Camera
from bevy_gaussian_splatting_tpu.models.cloud import Gaussian3dCloud
from bevy_gaussian_splatting_tpu.models.settings import CloudSettings
from bevy_gaussian_splatting_tpu.ops import sort as sort_ops
from bevy_gaussian_splatting_tpu.ops.project import project_gaussians
from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
    TILE,
    bin_gaussians,
    composite_tiles,
    pack_raster_params,
    pairs_budget,
    tile_budget,
    tile_ranges,
    tile_row_range,
)

TILES_AXIS = "tiles"
CAMERA_AXIS = "camera"


def make_mesh(n_devices: Optional[int] = None, camera_parallel: int = 1) -> Mesh:
    """1D tiles mesh, or 2D (camera, tiles) when camera_parallel > 1."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    if camera_parallel > 1:
        tiles = len(devices) // camera_parallel
        return Mesh(
            devices[: camera_parallel * tiles].reshape(camera_parallel, tiles),
            (CAMERA_AXIS, TILES_AXIS),
        )
    return Mesh(devices, (TILES_AXIS,))


def shard_cloud(cloud: Gaussian3dCloud, mesh: Mesh) -> Gaussian3dCloud:
    """Place the cloud with gaussians sharded across the tiles axis (pad first
    so N divides the axis size)."""
    import math

    n_shards = mesh.shape[TILES_AXIS]
    # lane-friendly AND shard-divisible padding (non-power-of-two meshes too)
    multiple = 256 * n_shards // math.gcd(256, n_shards)
    padded = cloud.pad(multiple=multiple)
    sharding = NamedSharding(mesh, P(TILES_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), padded)


def plan_exchange(
    cloud: Gaussian3dCloud,
    cameras,
    settings: CloudSettings,
    width: int,
    height: int,
    mesh: Mesh,
    model_transform=None,
    time: float = 0.0,
    headroom: float = 1.25,
    with_pairs: bool = False,
):
    """Host-side exchange auto-planner (run once per scene / camera schedule,
    OUTSIDE jit): project the cloud for each sample camera, measure actual
    per-(source shard, band) coverage, and return ``(mode, budget)`` to pass
    to :func:`make_sharded_render` / :func:`make_train_step` —
    ``mode == "bounded"`` only when the bounded all_to_all receives fewer
    rows per device than the all-gather it replaces
    (parallel/exchange.auto_exchange_plan).  ``cameras`` may be a single
    Camera or a list (budget covers the worst camera).

    ``with_pairs=True`` additionally returns the measured worst-band
    (gaussian, tile) pair count — pass it as ``pairs_hint`` to the sharded
    pipelines so every band's expansion/pair-sort buffers scale with its
    COVERAGE instead of the full-N worst case (the dominant sharding work
    inflation: an un-hinted band pays the whole 6N-capped budget in every
    P-proportional stage)."""
    import math

    from bevy_gaussian_splatting_tpu.parallel.exchange import (
        auto_exchange_plan,
    )
    from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
        _pixel_extents,
        tile_row_range,
    )

    n_bands = mesh.shape[TILES_AXIS]
    multiple = 256 * n_bands // math.gcd(256, n_bands)
    padded = cloud.pad(multiple=multiple)
    n_total = padded.position.shape[0]
    n_local = n_total // n_bands
    band_rows = (height // n_bands) // TILE
    tx_count = width // TILE
    if model_transform is None:
        model_transform = jnp.eye(4, dtype=jnp.float32)
    if not isinstance(cameras, (list, tuple)):
        cameras = [cameras]

    mode, budget, band_pairs = "allgather", 0, 0
    for camera in cameras:
        clip_from_world = camera.clip_from_view @ camera.view_from_world
        splats = project_gaussians(
            padded, camera, settings, model_transform, time=time
        )
        back_key = sort_ops.radix_depth_key(
            padded.position, model_transform, clip_from_world,
            camera.world_position, settings.radix_sort_depth_bits.bits,
        )
        splats["mask"] = splats["mask"] & (back_key != sort_ops.SENTINEL_KEY)
        ty0, ty1, active = tile_row_range(splats, settings, width, height)
        m, b = auto_exchange_plan(
            ty0 // band_rows, ty1 // band_rows, active, n_bands, n_local,
            headroom=headroom,
        )
        budget = max(budget, b)
        if with_pairs:
            # per-band pair count: rect tile-columns x the rect's tile rows
            # that fall inside each band (same extents math as binning)
            cx, cy, rx, ry = _pixel_extents(splats, settings, width, height)
            on = (
                (cx + rx >= 0.0) & (cx - rx <= width)
                & (cy + ry >= 0.0) & (cy - ry <= height)
            )
            act = np.asarray(active & on & (rx > 0.0) & (ry > 0.0))
            tx0 = np.clip(np.floor(np.asarray(cx - rx) / TILE), 0, tx_count - 1)
            tx1 = np.clip(np.floor(np.asarray(cx + rx) / TILE), 0, tx_count - 1)
            w_tiles = np.where(act, tx1 - tx0 + 1, 0.0)
            ty0n, ty1n = np.asarray(ty0), np.asarray(ty1)
            for band in range(n_bands):
                lo, hi = band * band_rows, (band + 1) * band_rows - 1
                rows = np.maximum(
                    np.minimum(ty1n, hi) - np.maximum(ty0n, lo) + 1, 0
                )
                band_pairs = max(
                    band_pairs, int(np.sum(w_tiles * np.where(act, rows, 0)))
                )
    mode = "bounded" if n_bands * budget < n_total else "allgather"
    if with_pairs:
        return mode, budget, band_pairs
    return mode, budget


def _local_band_render(
    cloud_shard: Gaussian3dCloud,
    camera: Camera,
    settings: CloudSettings,
    model_transform,
    background,
    time,
    width: int,
    height: int,
    n_bands: int,
    compositor: str = "xla",
    exchange: str = "allgather",
    band_budget: Optional[int] = None,
    pairs_hint: Optional[int] = None,
):
    """The shard_map body: local projection -> splat exchange -> composite
    this device's band of tile rows -> [height/n_bands, width, 4].

    ``exchange``: "allgather" replicates the full projected param set to every
    device; "bounded" routes each splat only to the bands its rect intersects
    (parallel/exchange.band_exchange — all_to_all volume scales with band
    coverage, not N).  ``band_budget``: static per-(source, band) row cap for
    the bounded mode (default: the no-truncation worst case)."""
    band = jax.lax.axis_index(TILES_AXIS)
    clip_from_world = camera.clip_from_view @ camera.view_from_world

    # local projection on the gaussian shard
    splats = project_gaussians(cloud_shard, camera, settings, model_transform, time=time)
    back_key = sort_ops.radix_depth_key(
        cloud_shard.position, model_transform, clip_from_world, camera.world_position,
        settings.radix_sort_depth_bits.bits,
    )
    splats["sort_key"] = back_key
    splats["mask"] = splats["mask"] & (back_key != sort_ops.SENTINEL_KEY)
    params_local = pack_raster_params(splats, settings, width, height)
    c_params = params_local.shape[-1]
    band_h = height // n_bands

    if exchange == "bounded":
        from bevy_gaussian_splatting_tpu.parallel.exchange import band_exchange

        ty0, ty1, active = tile_row_range(splats, settings, width, height)
        band_rows_all = band_h // TILE
        b0 = ty0 // band_rows_all
        b1 = ty1 // band_rows_all
        keyf = jax.lax.bitcast_convert_type(splats["sort_key"], jnp.float32)
        # NaN-safe: inactive rows (masked projections carry NaN math) never
        # enter the expansion (span 0), so zero their payload outright
        payload = jnp.concatenate(
            [
                params_local,
                splats["center_ndc"],
                keyf[:, None],
                active.astype(jnp.float32)[:, None],
            ],
            axis=1,
        )
        payload = jnp.where(active[:, None], payload, 0.0)
        budget = band_budget if band_budget is not None else params_local.shape[0]
        received = band_exchange(
            payload, b0, b1, active, n_bands, budget, TILES_AXIS
        )
        rkey = jax.lax.bitcast_convert_type(
            received[:, c_params + 2], jnp.uint32
        )
        g_splats = {
            "mask": received[:, c_params + 3] > 0.5,
            "center_ndc": received[:, c_params : c_params + 2],
            "sort_key": jnp.where(
                received[:, c_params + 3] > 0.5, rkey, sort_ops.SENTINEL_KEY
            ),
        }
        gathered_params = received[:, :c_params]
    else:
        gathered = {
            "params": jax.lax.all_gather(params_local, TILES_AXIS).reshape(
                -1, c_params
            ),
            "center_ndc": jax.lax.all_gather(
                splats["center_ndc"], TILES_AXIS
            ).reshape(-1, 2),
            "mask": jax.lax.all_gather(splats["mask"], TILES_AXIS).reshape(-1),
            "sort_key": jax.lax.all_gather(splats["sort_key"], TILES_AXIS).reshape(-1),
        }
        # rebuild the minimal splat dict for binning on the gathered set
        g_splats = {
            "mask": gathered["mask"],
            "center_ndc": gathered["center_ndc"],
            "sort_key": gathered["sort_key"],
        }
        gathered_params = gathered["params"]

    # bbox extents come from packed params (mode-dependent slot layout)
    if settings.gaussian_mode.value == "gaussian_2d":
        g_splats["surfel_radius"] = gathered_params[:, 2]
    elif settings.aabb:
        g_splats["conic"] = gathered_params[:, 2:5]
        g_splats["radius_vp"] = gathered_params[:, 5]
    else:
        g_splats["obb_axis"] = gathered_params[:, 2:4]
        g_splats["obb_bounds"] = gathered_params[:, 4:6]

    n_total = g_splats["mask"].shape[0]

    # Binning runs in the FULL image frame windowed to this band's tile rows,
    # so the band's pair set is bit-identical to the corresponding slice of a
    # single-chip binning (a band-local ndc remap would shift tile-boundary
    # decisions by an ulp).
    y0_px = band.astype(jnp.float32) * band_h
    # pairs_hint (planner-measured worst-band pair count): without it every
    # band pays the full-N coarse budget in all P-proportional stages — the
    # dominant sharding work inflation (measured 3.4x at 1M/8 bands)
    p_max = pairs_budget(n_total, pairs_hint)
    k_max = tile_budget(n_total)
    band_rows = band_h // TILE
    use_pallas = compositor == "pallas"
    import jax as _jax

    interpret = _jax.default_backend() != "tpu"
    if use_pallas:
        from bevy_gaussian_splatting_tpu.ops.pallas.core import (
            live_grad_count,
            preferred_unpermute,
        )

        unperm = preferred_unpermute(n_total, live_grad_count(settings))
    else:
        unperm = "rank"
    bins = bin_gaussians(
        g_splats, settings, width, height, p_max,
        tile_row0=band * band_rows, band_tile_rows=band_rows,
        with_inverse=use_pallas,
        expand="pallas" if use_pallas else "xla",
        interpret=interpret, inverse_map=unperm,
    )
    g_s, tile_s, valid_s = bins[0], bins[1], bins[2]

    params_full = gathered_params  # full-image-frame params, untouched

    num_band_tiles = (width // TILE) * (band_h // TILE)
    start, end = tile_ranges(tile_s, num_band_tiles)

    if use_pallas:
        import jax as _jax

        from bevy_gaussian_splatting_tpu.ops.pallas.core import (
            get_train_core_windowed,
        )
        from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
            composite_epilogue,
        )

        # Both kernels accept unaligned tile starts (DMA base align-down +
        # prefix mask/merge) and take the band's first pixel row as a traced
        # y-offset (full_height static), so every fragment evaluates in exact
        # full-frame coordinates for all modes (incl. the 2DGS surfel
        # homography, whose NDC frame cannot be rebuilt band-locally).
        # get_train_core_windowed gives the sharded training step the
        # windowed scatter-free gradient reduction; in forward-only renders
        # the unused inverse artifacts are DCE'd.
        count = jnp.minimum(end - start, k_max)
        gidx_s, table, g0s, inv_map = bins[4:8]
        core = get_train_core_windowed(
            settings, width, band_h, interpret, k_max, full_height=height,
            unpermute=unperm,
        )
        y0_rows = (band * band_h).astype(jnp.int32).reshape(1)
        out_raw = core(
            params_full, g_s, valid_s, start, count, gidx_s, table, g0s,
            inv_map, y0_rows,
        )
        return composite_epilogue(out_raw, background, width, band_h)

    # XLA compositor: full-image-frame pixel coordinates via pixel_y0, so the
    # band's fragment math is bit-identical to the single-chip render (the
    # 2DGS doubled-frame quirk makes a band-local remap inexact in f32)
    params_sorted = params_full[g_s]
    img_band = composite_tiles(
        params_sorted, valid_s, start, end, settings, width, band_h,
        k_max=k_max, background=background, differentiable=True,
        pixel_y0=y0_px, full_height=height,
    )
    return img_band


def make_sharded_render(
    mesh: Mesh,
    settings: CloudSettings,
    width: int,
    height: int,
    compositor: str = "xla",
    exchange: str = "allgather",
    band_budget: Optional[int] = None,
    pairs_hint: Optional[int] = None,
):
    """Jitted sharded forward: (cloud sharded over tiles-axis, camera, ...) ->
    full [H, W, 4] image (replicated).  ``pairs_hint``: planner-measured
    worst-band pair count (plan_exchange(with_pairs=True)) — sizes each
    band's static pair buffers to its coverage."""
    n_bands = mesh.shape[TILES_AXIS]
    if height % (n_bands * TILE):
        raise ValueError(
            f"height {height} must be divisible by n_bands*TILE = {n_bands * TILE}"
        )

    from jax import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(TILES_AXIS), P(), P(), P(), P()),
        out_specs=P(TILES_AXIS),
        check_vma=False,
    )
    def body(cloud_shard, camera, model_transform, background, time):
        return _local_band_render(
            cloud_shard, camera, settings, model_transform, background, time,
            width, height, n_bands, compositor=compositor,
            exchange=exchange, band_budget=band_budget,
            pairs_hint=pairs_hint,
        )

    def fn(cloud, camera, model_transform=None, background=None, time=0.0):
        if model_transform is None:
            model_transform = jnp.eye(4, dtype=jnp.float32)
        if background is None:
            background = jnp.zeros((4,), jnp.float32)
        return body(cloud, camera, model_transform, background, jnp.float32(time))

    return jax.jit(fn)


def make_sharded_render_multicam(
    mesh: Mesh,
    settings: CloudSettings,
    width: int,
    height: int,
    compositor: str = "xla",
    exchange: str = "allgather",
    band_budget: Optional[int] = None,
    pairs_hint: Optional[int] = None,
):
    """Camera-parallel x pixel-parallel render on a 2D (camera, tiles) mesh.

    The camera batch splits across the ``camera`` axis (replacing the
    reference's per-camera sorted-entry chunks, src/sort/mod.rs:347-354, with
    a mesh dimension); gaussians shard across the ``tiles`` axis and are
    replicated over cameras, so each camera row runs the standard band
    pipeline (local projection -> all-gather over its tiles row -> band
    compositing).  Input cameras are a stacked pytree with leading axis C
    divisible by the camera-axis size; output is the replicated-assembly
    [C, H, W, 4]."""
    if CAMERA_AXIS not in mesh.shape:
        raise ValueError("mesh needs a camera axis (make_mesh(camera_parallel=k))")
    n_bands = mesh.shape[TILES_AXIS]
    if height % (n_bands * TILE):
        raise ValueError(
            f"height {height} must be divisible by n_bands*TILE = {n_bands * TILE}"
        )

    from jax import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(TILES_AXIS), P(CAMERA_AXIS), P(), P(), P()),
        out_specs=P(CAMERA_AXIS, TILES_AXIS),
        check_vma=False,
    )
    def body(cloud_shard, cameras_shard, model_transform, background, time):
        def one(camera):
            return _local_band_render(
                cloud_shard, camera, settings, model_transform, background,
                time, width, height, n_bands, compositor=compositor,
                exchange=exchange, band_budget=band_budget,
                pairs_hint=pairs_hint,
            )

        return jax.vmap(one)(cameras_shard)

    def fn(cloud, cameras, model_transform=None, background=None, time=0.0):
        if model_transform is None:
            model_transform = jnp.eye(4, dtype=jnp.float32)
        if background is None:
            background = jnp.zeros((4,), jnp.float32)
        return body(cloud, cameras, model_transform, background, jnp.float32(time))

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def photometric_loss(image: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((image - target) ** 2)


def make_train_step(
    mesh: Mesh,
    settings: CloudSettings,
    width: int,
    height: int,
    learning_rate: float = 1e-2,
    compositor: str = "xla",
    loss: str = "l2",
    skip_nonfinite: int = 0,
    exchange: str = "allgather",
    band_budget: Optional[int] = None,
    pairs_hint: Optional[int] = None,
):
    """Sharded differentiable train step: render -> photometric loss vs
    target -> adam update of all gaussian parameters.  Returns
    (step_fn, init_fn).

    ``skip_nonfinite``: when > 0, wrap the optimizer in
    ``optax.apply_if_finite`` — steps whose gradients contain NaN/Inf are
    skipped (parameters untouched) and training errors out only after that
    many CONSECUTIVE bad steps.  Production failure-containment for long
    unattended runs.

    ``loss``: "l2" (plain MSE) or "l1_ssim" (the standard 3DGS objective,
    train/losses.py) — the SSIM term is evaluated band-locally per device,
    so windows touching a band boundary see zero padding instead of the
    neighbor band (an approximation that vanishes as bands grow; the L1
    term is exact)."""
    import optax

    use_ssim = loss == "l1_ssim"
    n_bands = mesh.shape[TILES_AXIS]
    from jax import shard_map

    optimizer = optax.adam(learning_rate)
    if skip_nonfinite:
        optimizer = optax.apply_if_finite(optimizer, skip_nonfinite)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(TILES_AXIS), P(), P(), P(TILES_AXIS)),
        out_specs=(P(TILES_AXIS), P()),
        check_vma=False,
    )
    def loss_and_grad(cloud_shard, camera, time, target_band):
        def local_loss(shard):
            img_band = _local_band_render(
                shard, camera, settings, jnp.eye(4, dtype=jnp.float32),
                jnp.zeros((4,), jnp.float32), time, width, height, n_bands,
                compositor=compositor, exchange=exchange,
                band_budget=band_budget, pairs_hint=pairs_hint,
            )
            # differentiate only THIS band's error term: the all_gather
            # transpose (psum-scatter) already accumulates every band's
            # contribution into the shard gradient exactly once.  psum-ing the
            # loss before grad would scale gradients by the axis size.
            if use_ssim:
                from bevy_gaussian_splatting_tpu.train.losses import (
                    gaussian_splatting_loss,
                )

                return gaussian_splatting_loss(img_band, target_band) / n_bands
            return jnp.sum((img_band - target_band) ** 2) / (height * width * 4)

        loss_local, grads = jax.value_and_grad(local_loss)(cloud_shard)
        loss = jax.lax.psum(loss_local, TILES_AXIS)
        return grads, loss

    def init(cloud):
        return optimizer.init(cloud)

    def step(cloud, opt_state, camera, target, time=0.0):
        grads, loss = loss_and_grad(
            cloud, camera, jnp.float32(time), target
        )
        updates, opt_state = optimizer.update(grads, opt_state, cloud)
        cloud = optax.apply_updates(cloud, updates)
        return cloud, opt_state, loss

    return jax.jit(step), init


def make_train_step_multicam(
    mesh: Mesh,
    settings: CloudSettings,
    width: int,
    height: int,
    learning_rate: float = 1e-2,
    compositor: str = "xla",
    exchange: str = "allgather",
    band_budget: Optional[int] = None,
    pairs_hint: Optional[int] = None,
):
    """Camera-parallel x pixel-parallel training on a 2D (camera, tiles)
    mesh: the view batch splits across the camera axis (data parallelism over
    views — the multi-view 3DGS objective), gaussians shard across tiles.

    Per step: each device renders its camera shard's bands, differentiates
    its local MSE term, the all-gather transpose accumulates band
    contributions into the tile-shard gradient, and one ``psum`` over the
    camera axis all-reduces the parameter gradients (classic DP).  Targets
    are [C, H, W, 4] sharded (camera, tiles)."""
    import optax

    n_bands = mesh.shape[TILES_AXIS]
    if height % (n_bands * TILE):
        raise ValueError(
            f"height {height} must be divisible by n_bands*TILE = {n_bands * TILE}"
        )
    from jax import shard_map

    optimizer = optax.adam(learning_rate)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(TILES_AXIS), P(CAMERA_AXIS), P(), P(CAMERA_AXIS, TILES_AXIS)),
        out_specs=(P(TILES_AXIS), P()),
        check_vma=False,
    )
    def loss_and_grad(cloud_shard, cams_shard, time, target_shard):
        cams_total = target_shard.shape[0] * mesh.shape[CAMERA_AXIS]

        def local_loss(shard):
            def one(camera, tgt):
                img = _local_band_render(
                    shard, camera, settings, jnp.eye(4, dtype=jnp.float32),
                    jnp.zeros((4,), jnp.float32), time, width, height,
                    n_bands, compositor=compositor, exchange=exchange,
                    band_budget=band_budget, pairs_hint=pairs_hint,
                )
                return jnp.sum((img - tgt) ** 2)

            per_cam = jax.vmap(one)(cams_shard, target_shard)
            return jnp.sum(per_cam) / (cams_total * height * width * 4)

        loss_local, grads = jax.value_and_grad(local_loss)(cloud_shard)
        grads = jax.lax.psum(grads, CAMERA_AXIS)
        loss = jax.lax.psum(loss_local, (CAMERA_AXIS, TILES_AXIS))
        return grads, loss

    def init(cloud):
        return optimizer.init(cloud)

    def step(cloud, opt_state, cameras, targets, time=0.0):
        grads, loss = loss_and_grad(cloud, cameras, jnp.float32(time), targets)
        updates, opt_state = optimizer.update(grads, opt_state, cloud)
        cloud = optax.apply_updates(cloud, updates)
        return cloud, opt_state, loss

    return jax.jit(step), init
