"""Tile-binned production rasterizer — TPU-native, no atomics, static shapes.

Replaces the reference's GPU pipeline (global radix sort -> instanced quads ->
hardware blend, src/sort/radix.wgsl + src/render/gaussian.wgsl) with the
sort/scan formulation that suits XLA/TPU:

  1. project all N gaussians (ops/project.py — the vs_points equivalent)
  2. compute each splat's tile rectangle from its screen bbox
  3. expand (gaussian, tile) pairs into a *static* P_max-slot buffer using
     cumsum + searchsorted (replaces the WGSL atomic counters,
     src/sort/radix.wgsl:35-38 — TPU has no global atomics)
  4. one ``lax.sort`` over (tile, front-depth-key, tie-break) triples — XLA
     lowers to an on-chip sort network; this subsumes the reference's
     multi-pass LSD radix ping-pong (src/sort/radix.rs:447-607)
  5. per-tile contiguous ranges via ``searchsorted``
  6. front-to-back compositing in chunks: per-chunk exclusive cumprod of
     (1 - alpha) turns the sequential blend into VPU-parallel work; the
     transmittance carries across chunks via ``lax.scan``

The result matches the oracle painter bit-for-bit up to f32 reassociation: the
per-pair tie-break key reproduces the back-to-front stable order exactly.

Static budgets (compile-time, bucketed by N):
  P_max   total (gaussian, tile) pairs; overflow truncates farthest pairs
  K_max   per-tile splat budget; overflow drops the most-occluded splats

Differentiable via XLA AD through the scan (the hand-derived Pallas backward
replaces this on the hot path).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.models.camera import Camera
from bevy_gaussian_splatting_tpu.models.settings import (
    CloudSettings,
    GaussianMode,
    SortMode,
)
from bevy_gaussian_splatting_tpu.ops import sort as sort_ops
from bevy_gaussian_splatting_tpu.ops.project import project_gaussians
from bevy_gaussian_splatting_tpu.ops.rasterize_ref import ALPHA_CAP

TILE = 16  # pixels per tile side (16x16 = 256 px, BASELINE.json tile spec)


def _env_flag(name: str) -> bool:
    import os

    return os.environ.get(name) == "1"


def supports(settings: CloudSettings) -> bool:
    return True


def pairs_budget(
    n: int,
    hint: Optional[int] = None,
    headroom: float = 1.25,
    quantum: Optional[int] = None,
) -> int:
    """Static (gaussian, tile) pair capacity, bucketed to limit recompiles.

    Without a hint: a conservative 6N (capped).  With a hint (an exact or
    estimated pair count from :func:`pair_count`), the budget becomes the next
    1-1.5-2-3 bucket above ``headroom * hint`` — typical scenes average 1-3
    tiles per splat, so this cuts the expansion/sort/gather footprint
    several-fold.  Overflow truncates the farthest pairs (expansion is
    depth-ordered), which degrades gracefully like the reference's
    draw-indirect count cap.

    ``quantum``: fine-grained mode for configs whose pair count is measured
    for the workload itself (a training dataset's max over cameras, a fixed
    benchmark scene): round ``headroom * hint`` to the next multiple of
    ``quantum`` instead of the coarse buckets.  Every P-proportional stage
    (pair sort, expansion, gathers, inverse sort) scales with the BUDGET, not
    the real pair count, so coarse buckets can cost ~40% extra; the caller
    accepts a recompile whenever the measured count crosses a quantum.

    The hard cap (12.6M pairs ~ 2 GB of P-proportional training buffers)
    exists for memory safety at extreme N; when it binds, the farthest pairs
    are truncated (tests/test_tiled.py bounds the image error of a binding
    cap)."""
    cap = int(min(max(6 * n, 1 << 14), 3 << 22))
    if hint is None:
        return cap
    need = max(int(hint * headroom) + 1, 1 << 14)
    if quantum is not None:
        return int(min((need + quantum - 1) // quantum * quantum, cap))
    bucket = 1 << 14
    while bucket < need:
        bucket *= 2
    # refine: try 1.5x of the half-bucket (adds one intermediate step)
    if bucket // 2 * 3 // 2 >= need:
        bucket = bucket // 2 * 3 // 2
    return int(min(bucket, cap))


def pad_to_tile(v: int) -> int:
    """Next multiple of TILE at or above ``v`` (non-16-multiple heights
    render on a padded tile grid and crop — see :func:`render_tiled`)."""
    return -(-v // TILE) * TILE


def pair_count(
    cloud,
    camera: Camera,
    settings: CloudSettings,
    model_transform: Optional[jnp.ndarray] = None,
    width: Optional[int] = None,
    height: Optional[int] = None,
    time=None,
):
    """Exact (gaussian, tile) pair count for this frame — N-sized ops only
    (no expansion), so it is cheap to run as a budget-sizing prepass.

    Mirrors the active/extents logic of :func:`bin_gaussians` exactly
    (including the padded tile grid of non-16-multiple heights)."""
    if model_transform is None:
        model_transform = jnp.eye(4, dtype=jnp.float32)
    if width is None:
        width = int(camera.viewport[2])
    if height is None:
        height = int(camera.viewport[3])
    clip_from_world = camera.clip_from_view @ camera.view_from_world
    splats = project_gaussians(cloud, camera, settings, model_transform, time=time)
    back_key = sort_ops.radix_depth_key(
        cloud.position, model_transform, clip_from_world, camera.world_position,
        settings.radix_sort_depth_bits.bits,
    )
    splats["mask"] = splats["mask"] & (back_key != sort_ops.SENTINEL_KEY)

    tx_count = width // TILE
    ty_count = pad_to_tile(height) // TILE
    cx, cy, rx, ry = _pixel_extents(splats, settings, width, height)
    active = splats["mask"] & (rx > 0.0) & (ry > 0.0)
    tx0 = jnp.clip(jnp.floor((cx - rx) / TILE), 0, tx_count - 1)
    tx1 = jnp.clip(jnp.floor((cx + rx) / TILE), 0, tx_count - 1)
    ty0 = jnp.clip(jnp.floor((cy - ry) / TILE), 0, ty_count - 1)
    ty1 = jnp.clip(jnp.floor((cy + ry) / TILE), 0, ty_count - 1)
    on_screen = (
        (cx + rx >= 0.0) & (cx - rx <= width) & (cy + ry >= 0.0) & (cy - ry <= height)
    )
    active = active & on_screen
    counts = jnp.where(active, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0.0)
    return jnp.sum(counts).astype(jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)


def tile_budget(n: int) -> int:
    """Per-tile splat budget (chunk-aligned)."""
    return int(min(max(2 * n, 1 << 10), 1 << 13))


# ---------------------------------------------------------------------------
# Binning
# ---------------------------------------------------------------------------


def _pixel_extents(splats: dict, settings: CloudSettings, width, height):
    """Per-splat half-extents (rx, ry) in *pixels* and center pixel coords."""
    cx_px = (splats["center_ndc"][:, 0] + 1.0) * 0.5 * width
    cy_px = (1.0 - splats["center_ndc"][:, 1]) * 0.5 * height

    if settings.gaussian_mode == GaussianMode.GAUSSIAN_2D:
        r = splats["surfel_radius"] * 0.5  # vp -> px
        rx = ry = r
    elif settings.aabb:
        r = splats["radius_vp"] * 0.5
        rx = ry = r
    else:
        e1 = splats["obb_axis"]
        b = splats["obb_bounds"]
        # rotated-rect bbox: |e1|*b1 + |e2|*b2 with e2 = (e1.y, -e1.x)
        rx = (jnp.abs(e1[:, 0]) * b[:, 0] + jnp.abs(e1[:, 1]) * b[:, 1]) * 0.5
        ry = (jnp.abs(e1[:, 1]) * b[:, 0] + jnp.abs(e1[:, 0]) * b[:, 1]) * 0.5
    return cx_px, cy_px, rx, ry


def tile_row_range(splats: dict, settings: CloudSettings, width: int, height: int):
    """Per-splat clipped tile-row interval [ty0, ty1] and activity — EXACTLY
    the quantities :func:`bin_gaussians` windows bands on (shared so the
    bounded band exchange routes precisely the rows each band would keep;
    ty_count pads like binning does, so the invariant holds at
    non-16-multiple heights too)."""
    tx_count = width // TILE
    ty_count = pad_to_tile(height) // TILE
    cx, cy, rx, ry = _pixel_extents(splats, settings, width, height)
    active = splats["mask"] & (rx > 0.0) & (ry > 0.0)
    ty0 = jnp.clip(jnp.floor((cy - ry) / TILE), 0, ty_count - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((cy + ry) / TILE), 0, ty_count - 1).astype(jnp.int32)
    on_screen = (
        (cx + rx >= 0.0) & (cx - rx <= width) & (cy + ry >= 0.0) & (cy - ry <= height)
    )
    return ty0, ty1, active & on_screen


_NEG_INF_I32 = -(2**31 - 1)


def _cummax_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive cummax via explicit log-shift pad/max steps.

    Both ``lax.cummax`` and ``lax.associative_scan`` take minutes to COMPILE on
    the TPU backend at large sizes (measured 320-340 s at 8M elements; the
    runtime is fine).  log2(n) pad+slice+maximum ops compile in seconds and
    run identically."""
    n = x.shape[axis]
    shift = 1
    while shift < n:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (shift, 0)
        shifted = jnp.pad(x, pad, constant_values=_NEG_INF_I32)
        shifted = jax.lax.slice_in_dim(shifted, 0, n, axis=axis)
        x = jnp.maximum(x, shifted)
        shift *= 2
    return x


def _blocked_cummax(x: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """Inclusive cummax of a long 1D array: per-row log-shift scan over
    ``block`` lanes + a tiny carry scan (keeps every op lane-shaped; one full
    128-lane tile per row -> 7 passes over the data instead of log2(n))."""
    n = x.shape[0]
    pad = (-n) % block
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), _NEG_INF_I32, x.dtype)])
    rows = x.reshape((n + pad) // block, block)
    within = _cummax_axis(rows, axis=1)
    carry = _cummax_axis(within[:, -1], axis=0)
    carry_excl = jnp.concatenate(
        [jnp.full((1,), _NEG_INF_I32, x.dtype), carry[:-1]]
    )
    return jnp.maximum(within, carry_excl[:, None]).reshape(-1)[:n]


def slot_owner_scan(starts: jnp.ndarray, owner_ids: jnp.ndarray, p_max: int) -> jnp.ndarray:
    """For segments laid out back-to-back (``starts`` non-decreasing), return
    per-slot owner ids via scatter-max + blocked cumulative max.

    Replaces ``searchsorted(cum, arange(p_max))`` — XLA lowers that to a
    ~20-iteration binary-search gather loop over p_max queries (the dominant
    binning cost at 8M slots); scatter + cummax is two passes.  Owners with
    empty segments share a start with their successor; max picks the last (the
    actual owner).  Slots past the final segment keep the last owner id
    (callers mask by total)."""
    marks = jnp.zeros((p_max,), jnp.int32)
    marks = marks.at[starts].max(owner_ids + 1, mode="drop")
    return jnp.maximum(_blocked_cummax(marks) - 1, 0)


def segment_sum_contiguous(
    values: jnp.ndarray,  # [P, C]
    gidx: jnp.ndarray,  # [P] slot -> owner id (non-decreasing)
    off_cloud: jnp.ndarray,  # [N] first slot per owner
    cnt_cloud: jnp.ndarray,  # [N] slot count per owner
    max_segment: Optional[int] = None,
) -> jnp.ndarray:
    """Per-owner sums of contiguous slot runs -> [N, C], scatter-free.

    Inclusive SEGMENTED log-shift scan along slots (segment = run of equal
    ``gidx``; sums stay segment-bounded, so no cumsum-difference cancellation),
    then one gather at each owner's last slot.  Replaces XLA scatter-add
    (measured ~0.6 GB/s on TPU — 100x slower than this formulation).

    ``max_segment`` bounds the longest owner run (for pair expansion: the tile
    count — a splat can't own more pairs than there are tiles), halving the
    scan passes vs log2(P).

    The scan runs in the transposed [C, P] layout: with P in lanes every
    (8, 128) vector tile is fully utilized, vs ~8% utilization for [P, C]
    with small C (measured 2x+ end-to-end on the training reduction)."""
    p, c = values.shape
    vT = values.T  # [C, P]
    fT = jnp.concatenate(
        [jnp.ones((1,), bool), gidx[1:] != gidx[:-1]]
    )[None, :]  # [1, P] segment starts
    limit = min(p, max_segment) if max_segment else p
    shift = 1
    while shift < limit:
        vsh = jnp.pad(vT, ((0, 0), (shift, 0)))[:, :p]
        fsh = jnp.pad(fT, ((0, 0), (shift, 0)), constant_values=True)[:, :p]
        vT = vT + jnp.where(fT, 0.0, vsh)
        fT = fT | fsh
        shift *= 2
    ends = jnp.clip(off_cloud + cnt_cloud - 1, 0, p - 1)
    out = vT.T[ends]
    return jnp.where((cnt_cloud > 0)[:, None], out, 0.0)


def front_depth_perm(back_key: jnp.ndarray, active=None, carry=None):
    """Front-to-back permutation: exact reverse of the reference's stable
    back-to-front radix order (key ascending, index ascending), realized
    directly as (complemented key ascending, reversed index ascending).

    ``active``: optionally compact ALL zero-pair gaussians to the front by
    zeroing their front key (sentinel-culled gaussians land there already:
    their back key is 0xFFFFFFFF, so their front key is 0).  Actives stay in
    exact relative depth order, so the born pair sequence is unchanged; the
    active suffix is then contiguous, which the Pallas expansion kernel
    requires (owner advances <= 1 per slot).

    ``carry``: optional same-length array — or a tuple/list of arrays —
    returned permuted as carry[perm] (riding the sort as extra operands
    costs ~0.8 ns/row each at any scale vs 7-24 ns/row for a separate
    gather — the sort applies its permutation to every operand, and pos[j]
    IS that permutation in reversed coordinates)."""
    n = back_key.shape[0]
    front_key = jnp.uint32(0xFFFFFFFF) - back_key
    if active is not None:
        front_key = jnp.where(active, front_key, jnp.uint32(0))
    # ties must break by DESCENDING original index (= ascending reversed
    # index): stable-sort the REVERSED key array, then map positions back —
    # one sort operand fewer than carrying an explicit rev_idx key
    if carry is None:
        _, pos = jax.lax.sort(
            (front_key[::-1], jnp.arange(n, dtype=jnp.int32)),
            num_keys=1,
            is_stable=True,
        )
        return jnp.int32(n - 1) - pos
    multi = isinstance(carry, (tuple, list))
    carries = tuple(carry) if multi else (carry,)
    out = jax.lax.sort(
        (front_key[::-1], jnp.arange(n, dtype=jnp.int32))
        + tuple(c[::-1] for c in carries),
        num_keys=1,
        is_stable=True,
    )
    perm = jnp.int32(n - 1) - out[1]
    return (perm, tuple(out[2:])) if multi else (perm, out[2])


def back_sorted_entry_indices(back_key: jnp.ndarray):
    """Cloud indices of back-to-front sorted entries ``min(1, n-1)`` and
    ``n-1`` (the reference's depth min/max quirk reads exactly these,
    gaussian.wgsl:329-347) — via min/max reductions instead of a full sort.
    Back order is (key ascending, index ascending), sentinels included."""
    n = back_key.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    kmax = jnp.max(back_key)
    last = jnp.max(jnp.where(back_key == kmax, idx, -1))
    if n == 1:
        return jnp.int32(0), last
    kmin = jnp.min(back_key)
    i0 = jnp.min(jnp.where(back_key == kmin, idx, n))
    is_first = (back_key == kmin) & (idx == i0)
    key2 = jnp.where(is_first, jnp.uint32(0xFFFFFFFF), back_key)
    kmin2 = jnp.min(key2)
    first = jnp.min(jnp.where((key2 == kmin2) & ~is_first, idx, n))
    return first, last


def bin_gaussians(
    splats: dict,
    settings: CloudSettings,
    width: int,
    height: int,
    p_max: int,
    with_inverse: bool = False,
    tile_row0=None,
    band_tile_rows: Optional[int] = None,
    perm: Optional[jnp.ndarray] = None,
    expand: str = "xla",
    interpret: bool = False,
    inverse_map: str = "rank",
    params: Optional[jnp.ndarray] = None,
    deliver: str = "gather",
):
    """Build sorted (tile, pair) assignment with static shapes.

    ``tile_row0``/``band_tile_rows``: restrict binning to a horizontal band of
    tile rows [tile_row0, tile_row0 + band_tile_rows) with band-local tile
    ids.  The extent math stays in the FULL image frame (``height`` is the
    full height), so band pair sets are bit-identical to the corresponding
    slice of a single-chip binning.

    Returns (pair_gidx [P], pair_tile [P], pair_valid [P], num_pairs) where
    pairs are sorted by (tile, front-to-back depth, painter tie-break).

    TPU-shaped implementation: gaussians are first permuted into front-to-back
    depth order (one cheap N-element sort), so expanded pairs are born
    depth-ordered and the P-element pair sort needs only the tile id as a key
    (stable).  Slot->gaussian ownership uses scatter + cummax instead of
    searchsorted (see slot_owner_scan).

    ``with_inverse=True`` additionally returns the training-path reduction
    artifacts (all integer, non-differentiable).  XLA expansion:
      inv_pair [P]   sorted position of each pre-sort expansion slot
      off_cloud [N]  first expansion slot of each gaussian (cloud order)
      cnt_cloud [N]  expansion slot count of each gaussian (cloud order)
    Pallas expansion: (gidx_s [P] depth-rank owner per sorted pair, the
    expansion table, chunk owners g0s, and rank [N]) — the backward reorders
    per-pair gradients to slot order by re-sorting on gidx_s.  Either way the
    backward turns per-pair gradients into per-gaussian gradients with
    sort/scan machinery only — no XLA scatter-add (measured 0.6 GB/s).

    Non-16-multiple ``height`` (e.g. the reference's 1080): the tile grid
    pads to the next TILE multiple (ty_count = ceil(height/16)) while every
    pixel-frame quantity (extents, on-screen clip) stays in the TRUE
    viewport frame — the caller composites the padded grid with
    ``full_height=height`` and crops the pad rows.

    ``deliver="carry"`` (pallas expansion only, pass ``params`` [N, c]):
    rank-ordered params ride the depth sort as f32 operands, the expansion
    kernel emits each pair's param row via an exact one-hot MXU gather, and
    the pair sort carries them to tile order — ``params_sorted [P, c]`` is
    APPENDED to the return tuple and the caller skips its post-sort params
    gather entirely.  Chosen by core.preferred_params_delivery: sort
    operands cost ~0.8 ns/row at any scale while the P-row gather pays
    7-24 ns/row with a 64 MiB table-size cliff (148 ms at the 4M bench —
    the multi-M forward's dominant stage).  Carried params are
    stop-gradiented (training gradients flow through the core's custom
    VJP, not the binning)."""
    tx_count = width // TILE
    ty_count = pad_to_tile(height) // TILE
    n = splats["mask"].shape[0]

    cx, cy, rx, ry = _pixel_extents(splats, settings, width, height)
    active = splats["mask"] & (rx > 0.0) & (ry > 0.0)

    tx0 = jnp.clip(jnp.floor((cx - rx) / TILE), 0, tx_count - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((cx + rx) / TILE), 0, tx_count - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((cy - ry) / TILE), 0, ty_count - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((cy + ry) / TILE), 0, ty_count - 1).astype(jnp.int32)
    # also drop splats whose bbox is entirely off screen
    on_screen = (
        (cx + rx >= 0.0) & (cx - rx <= width) & (cy + ry >= 0.0) & (cy - ry <= height)
    )
    active = active & on_screen

    if tile_row0 is not None:
        # band window: full-frame rows -> band-local rows, drop non-overlapping
        rows = band_tile_rows
        active = active & (ty1 >= tile_row0) & (ty0 <= tile_row0 + rows - 1)
        ty0 = jnp.clip(ty0 - tile_row0, 0, rows - 1).astype(jnp.int32)
        ty1 = jnp.clip(ty1 - tile_row0, 0, rows - 1).astype(jnp.int32)
        ty_count = rows

    # ---- depth pre-sort of gaussians (front-to-back + painter tie) ----------
    # front order = exact reverse of the reference back-to-front radix order:
    # complement of the (possibly shifted) radix key (src/sort/radix.wgsl:88-99)
    # with ties broken by DESCENDING cloud index (stable painter reversed).
    # Inactive gaussians are compacted to the front (identical pair output;
    # see front_depth_perm) — the Pallas expansion requires it.
    carry_params = False
    if perm is None and tx_count <= 127 and ty_count <= 127:
        # bit-pack the five binning columns into one i32 carried THROUGH the
        # depth sort (one extra sort operand ~1.3 ms at 1M) instead of a
        # separate [N, 5] row gather by perm (~7 ms at 1M)
        # inactive rows can carry NaN-derived garbage in tx0/ty0 (masked
        # projections divide by ~0); the old gather path neutralized them via
        # the separate active column, here select the whole packed word on
        # the well-defined active bool instead (NaN comparisons are False)
        packed_pre = jnp.where(
            active,
            tx0
            | (ty0 << 7)
            | ((tx1 - tx0 + 1) << 14)
            | ((ty1 - ty0 + 1) << 21)
            | (1 << 28),
            0,
        )
        carry_params = (
            expand == "pallas" and deliver == "carry" and params is not None
        )
        if carry_params:
            import os as _os

            pc = jax.lax.stop_gradient(params)
            cols = [pc[:, j] for j in range(pc.shape[1])]
            if _os.environ.get("BGS_CARRY_SPLIT") == "1":
                # 4M carry-train anomaly experiment: split the wide carry
                # sort into two half-width sorts (same key, both stable ->
                # identical permutation, bit-exact) to halve the peak
                # operand liveness XLA must schedule around
                h = len(cols) // 2
                perm, carried1 = front_depth_perm(
                    splats["sort_key"], active=active,
                    carry=(packed_pre,) + tuple(cols[:h]),
                )
                _, carried2 = front_depth_perm(
                    splats["sort_key"], active=active,
                    carry=tuple(cols[h:]),
                )
                packed = carried1[0]
                params_rank_cols = tuple(carried1[1:]) + tuple(carried2)
            else:
                carries = (packed_pre,) + tuple(cols)
                perm, carried = front_depth_perm(
                    splats["sort_key"], active=active, carry=carries
                )
                packed = carried[0]
                params_rank_cols = carried[1:]
        else:
            perm, packed = front_depth_perm(
                splats["sort_key"], active=active, carry=packed_pre
            )
        tx0p = packed & 0x7F
        ty0p = (packed >> 7) & 0x7F
        rect_wp = (packed >> 14) & 0x7F
        rect_hp = (packed >> 21) & 0x7F
        counts = jnp.where((packed >> 28) > 0, rect_wp * rect_hp, 0)
    else:
        if deliver == "carry":
            raise ValueError(
                "deliver='carry' needs the packed-carry depth sort "
                "(internal perm, tile grid <= 127)"
            )
        if perm is None:
            perm = front_depth_perm(splats["sort_key"], active=active)
        elif expand == "pallas":
            raise ValueError(
                "pallas expansion needs the internally built compacting perm"
            )

        # ONE wide gather by perm (row gathers cost ~7 ns/row regardless of
        # width, so five 1D gathers would cost 5x this)
        pre = jnp.stack(
            [tx0, ty0, tx1 - tx0 + 1, ty1 - ty0 + 1, active.astype(jnp.int32)],
            axis=1,
        )[perm]
        tx0p = pre[:, 0]
        ty0p = pre[:, 1]
        rect_wp = pre[:, 2]
        rect_hp = pre[:, 3]
        counts = jnp.where(pre[:, 4] > 0, rect_wp * rect_hp, 0)

    cum = jnp.cumsum(counts)  # inclusive
    total = cum[-1]
    offsets = cum - counts  # exclusive

    slots = jnp.arange(p_max, dtype=jnp.int32)
    valid = slots < total

    if expand == "pallas":
        # windowed-table expansion kernel (ops/pallas/expand.py): replaces
        # the scatter-max + blocked cummax + P-row packed gather below with
        # small per-chunk DMAs and an MXU one-hot gather.  Valid because the
        # compacting perm makes the active (count > 0) gaussians contiguous.
        from bevy_gaussian_splatting_tpu.ops.pallas.expand import (
            CHUNK as EXP_CHUNK,
            CUM_PAD,
            WIN,
            pallas_expand_pairs,
        )

        num_chunks = (p_max + EXP_CHUNK - 1) // EXP_CHUNK
        # f32 table: cum is clipped to 2^24 so stored values stay
        # integer-exact (comparisons only matter below p_max < 2^24); all
        # matmul-gathered columns hold bytes (the MXU casts to bf16)
        clipf = float(1 << 24)
        cumf = jnp.minimum(cum.astype(jnp.float32), clipf)
        table = jnp.stack(
            [
                cumf,
                rect_wp.astype(jnp.float32),
                tx0p.astype(jnp.float32),
                ty0p.astype(jnp.float32),
                (perm & 0xFF).astype(jnp.float32),
                ((perm >> 8) & 0xFF).astype(jnp.float32),
                ((perm >> 16) & 0xFF).astype(jnp.float32),
                jnp.zeros((n,), jnp.float32),
            ],
            axis=0,
        )  # [8, n] gaussians in lanes
        pad = jnp.zeros((8, WIN), jnp.float32).at[0, :].set(CUM_PAD)
        table = jnp.concatenate([table, pad], axis=1)
        chunk_starts = jnp.arange(num_chunks, dtype=jnp.int32) * EXP_CHUNK
        g0s = searchsorted_wide(cum, chunk_starts, side="right")
        params_pairs = None
        if carry_params:
            from bevy_gaussian_splatting_tpu.ops.pallas.expand import (
                PARAM_ROWS,
            )

            c_par = len(params_rank_cols)
            params_t = jnp.concatenate(
                [
                    jnp.stack(params_rank_cols, axis=0),
                    jnp.zeros((PARAM_ROWS - c_par, n), jnp.float32),
                ],
                axis=0,
            )  # [PARAM_ROWS, n] rank order, params in sublanes
            params_t = jnp.concatenate(
                [params_t, jnp.zeros((PARAM_ROWS, WIN), jnp.float32)], axis=1
            )
            tile, g_orig, gidx, params_pairs = pallas_expand_pairs(
                table, g0s, p_max, tx_count, interpret=interpret,
                params_t=params_t,
            )
            params_pairs = params_pairs[:, :c_par]
        else:
            tile, g_orig, gidx = pallas_expand_pairs(
                table, g0s, p_max, tx_count, interpret=interpret
            )
    else:
        # slot -> depth-ranked gaussian via scatter + cummax, then ONE packed
        # row gather for the per-slot fields.  (A scatter+fill-forward-scan
        # variant that avoids this gather was measured SLOWER: XLA scatter
        # cost scales per element, so scattering 4-column mark rows costs
        # ~4x the 1-column owner scatter — more than the gather it saves.)
        starts = jnp.where(counts > 0, offsets, p_max)  # empty segs dropped
        gidx = slot_owner_scan(starts, jnp.arange(n, dtype=jnp.int32), p_max)
        packed = jnp.stack(
            [offsets, rect_wp, tx0p, ty0p, perm], axis=1
        )  # [n, 5]
        pg = packed[gidx]  # [p_max, 5]
        k = slots - pg[:, 0]
        tile_x = pg[:, 2] + k % pg[:, 1]
        tile_y = pg[:, 3] + k // pg[:, 1]
        g_orig = pg[:, 4]
        tile = tile_y * tx_count + tile_x
    tile = jnp.where(valid, tile, tx_count * ty_count)  # sentinel tile sorts last

    # pairs are already depth-ordered within each tile -> stable 1-key sort;
    # validity needn't ride the sort: invalid pairs carry EXACTLY the sentinel
    # tile id, so valid_s == (tile_s < sentinel)
    sentinel = tx_count * ty_count
    # (Two rejected variants, measured on TPU: packing (tile, slot) into one
    # u32 sort key was no faster than the stable multi-operand sort, and an
    # in-expansion-kernel tile histogram -- meant to replace the searchsorted
    # tile_ranges -- cost ~40 ms via its constant-index output block.)
    if not with_inverse:
        if expand == "pallas" and params_pairs is not None:
            # carry mode: g_orig need not ride the sort — no caller gathers
            # by g_s when params arrive carried (slot 0 is None so any
            # legacy use fails loudly instead of silently misindexing)
            import os as _os

            c_par = params_pairs.shape[1]
            pcols = [params_pairs[:, j] for j in range(c_par)]
            tkey = tile.astype(jnp.int32)
            if _os.environ.get("BGS_CARRY_SPLIT") == "1":
                h = c_par // 2
                out1 = jax.lax.sort(
                    (tkey,) + tuple(pcols[:h]), num_keys=1, is_stable=True
                )
                out2 = jax.lax.sort(
                    (tkey,) + tuple(pcols[h:]), num_keys=1, is_stable=True
                )
                tile_s = out1[0]
                sorted_cols = out1[1:] + out2[1:]
            else:
                out = jax.lax.sort(
                    (tkey,) + tuple(pcols), num_keys=1, is_stable=True
                )
                tile_s = out[0]
                sorted_cols = out[1:]
            # [c_par, P] kernel-native rows: stacking along axis 0 is a pure
            # concatenation of the sort outputs (no P-scale interleave)
            params_sorted = jnp.stack(sorted_cols, axis=0)
            return None, tile_s, tile_s < sentinel, total, params_sorted
        tile_s, g_s = jax.lax.sort(
            (tile.astype(jnp.int32), g_orig), num_keys=1, is_stable=True
        )
        return g_s, tile_s, tile_s < sentinel, total

    if expand == "pallas":
        # The backward reorders per-pair gradients to expansion-slot order by
        # SORTING them on the carried depth-rank owner (stable: within a rank
        # the tile-ascending pair order IS the rect enumeration order), so
        # the pair sort carries gidx instead of slots and the O(P)
        # inverse-permutation sort + P-row gradient gather disappear entirely
        # (ops/pallas/core.get_train_core_windowed) — sorts also have no
        # 64 MiB gather-rate cliff, which is what made the gather path
        # superlinear at multi-M pair budgets.
        if params_pairs is not None:
            import os as _os

            c_par = params_pairs.shape[1]
            pcols = [params_pairs[:, j] for j in range(c_par)]
            tkey = tile.astype(jnp.int32)
            if _os.environ.get("BGS_CARRY_SPLIT") == "1":
                h = c_par // 2
                out1 = jax.lax.sort(
                    (tkey, gidx) + tuple(pcols[:h]), num_keys=1,
                    is_stable=True,
                )
                out2 = jax.lax.sort(
                    (tkey,) + tuple(pcols[h:]), num_keys=1, is_stable=True
                )
                tile_s, gidx_s = out1[0], out1[1]
                sorted_cols = out1[2:] + out2[1:]
            else:
                out = jax.lax.sort(
                    (tkey, gidx) + tuple(pcols), num_keys=1, is_stable=True
                )
                tile_s, gidx_s = out[0], out[1]
                sorted_cols = out[2:]
            g_s = None  # carried params replace every g_s gather
            params_sorted = jnp.stack(sorted_cols, axis=0)  # [c_par, P]
        else:
            tile_s, g_s, gidx_s = jax.lax.sort(
                (tile.astype(jnp.int32), g_orig, gidx), num_keys=1,
                is_stable=True,
            )
            params_sorted = None
        valid_s = tile_s < sentinel
        # windowed-reduction artifacts (ops/pallas/reduce.py): the expansion
        # table + chunk owners drive the backward's segmented sum; slot 7
        # maps the depth-ordered result back to cloud order, in the form the
        # training core's unpermute formulation wants (core.preferred_
        # unpermute): "rank" = inverse of the depth pre-sort perm (built by
        # a 2-op N-sort, consumed by an N-row gather); "perm" = the perm
        # itself (consumed by a perm-keyed carry sort — no rank sort here,
        # no gather cliff there; the multi-M formulation)
        if inverse_map == "perm":
            base_out = (g_s, tile_s, valid_s, total, gidx_s, table, g0s,
                        perm)
        else:
            _, rank = jax.lax.sort(
                (perm, jnp.arange(n, dtype=jnp.int32)), num_keys=1
            )
            base_out = (g_s, tile_s, valid_s, total, gidx_s, table, g0s,
                        rank)
        if params_sorted is not None:
            return base_out + (params_sorted,)
        return base_out
    tile_s, g_s, slot_s = jax.lax.sort(
        (tile.astype(jnp.int32), g_orig, slots), num_keys=1, is_stable=True
    )
    valid_s = tile_s < sentinel
    # inverse of the pair sort: inv_pair[slot] = sorted position
    _, inv_pair = jax.lax.sort((slot_s, slots), num_keys=1)
    # depth-rank of each cloud index: inverse of the depth pre-sort perm
    _, rank = jax.lax.sort((perm, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    oc = jnp.stack([offsets, counts], axis=1)[rank]  # one gather, not two
    return (g_s, tile_s, valid_s, total, inv_pair, gidx, oc[:, 0],
            oc[:, 1])


def _serving_params_gather(params, g_s):
    """params[g_s] through the gather-cliff column-split cost model
    (ops/pallas/core.py) — matters for wide layouts whose 1M-row
    table sits above the 64 MiB gather cliff."""
    from bevy_gaussian_splatting_tpu.ops.pallas.core import gather_rows

    return gather_rows(params, g_s, params.shape[1])


def tile_ranges(pair_tile: jnp.ndarray, num_tiles: int):
    """Contiguous [start, end) per tile (replaces the radix scatter's atomic
    draw-indirect bookkeeping) via ONE :func:`searchsorted_wide` over
    ``num_tiles + 1`` queries: for integer keys ``end[t] == start[t+1]``
    (the first index >= t+1 is the first index > t), so the second
    side="right" search is redundant — at 1080p's 8160 tiles the two-call
    form paid the coarse sweep twice."""
    tids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = searchsorted_wide(pair_tile, tids, side="left")
    return bounds[:num_tiles], bounds[1:]


def searchsorted_wide(
    arr: jnp.ndarray, queries: jnp.ndarray, side: str = "left"
) -> jnp.ndarray:
    """``jnp.searchsorted`` for a sorted i32 array, restructured for TPU.

    XLA lowers vectorized searchsorted to a ~21-step loop of small gathers
    with ~0.25 ms fixed cost per step (measured ~5 ms for 4096 queries over
    1M rows).  Two wide levels replace it: (1) count the strided subsample
    elements below each query — one [Q, nblocks] comparison sweep — to find
    the stride-aligned block containing the crossing; (2) row-gather that
    block per query and count inside it.  Exact for any distribution;
    ~0.3 ms at the same size."""
    n = arr.shape[0]
    q = queries.shape[0]
    # stride: keep both the coarse sweep (q * nblocks) and the block rows
    # (q * stride) at a few million elements
    stride = 256
    while n // stride > max(4096, q):
        stride *= 2
    nblocks = (n + stride - 1) // stride
    pad = nblocks * stride - n
    if pad:
        # pad with the array dtype's own max so the sorted invariant holds
        # for any integer dtype; the final clamp handles queries == max
        arr = jnp.concatenate(
            [arr, jnp.full((pad,), jnp.iinfo(arr.dtype).max, arr.dtype)]
        )
    blocks = arr.reshape(nblocks, stride)
    sub = blocks[:, 0]  # arr[j * stride]

    if side == "left":
        def below(a, b):
            return a < b
    else:
        def below(a, b):
            return a <= b

    qcol = queries[:, None]
    coarse = jnp.sum(below(sub[None, :], qcol), axis=1)  # [Q]
    blk = jnp.clip(coarse - 1, 0, nblocks - 1)
    rows = blocks[blk]  # [Q, stride] row gather of aligned blocks
    inner = jnp.sum(below(rows, qcol), axis=1)
    # clamp to n: a side="right" query equal to the dtype max also counts
    # the pad sentinels in the last block
    return jnp.minimum(blk * stride + inner, n).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Per-splat raster parameters (packed for gather efficiency)
# ---------------------------------------------------------------------------


def pack_raster_param_cols(splats: dict, settings: CloudSettings, width, height) -> list:
    """Per-splat compositor parameters as a LIST of 1-D column arrays.

    Column-array form lets callers choose the layout with zero interleave
    cost: ``jnp.stack(cols, -1)`` -> [N, C] gather tables,
    ``jnp.stack(cols, 0)`` -> the kernel-native [C, N] rows (a pure
    concatenation — the [N, C] -> [C, N] interleave of a stacked table
    costs a real ~3.5 ns/row at multi-M N)."""
    cx_vp = splats["center_ndc"][:, 0] * width
    cy_vp = splats["center_ndc"][:, 1] * height
    rgb = splats["rgb"]
    alpha = splats["alpha"] * splats["mask"].astype(jnp.float32)

    if settings.gaussian_mode == GaussianMode.GAUSSIAN_2D:
        # Slim surfel layout: the fragment's homography intersection
        # (gaussian_2d.wgsl:134-156) is (pcx*c - a) x (pcy*c - b) with a/b/c
        # the columns of T — which expands to pcx*(bxc) + pcy*(cxa) + (axb).
        # Substituting pcx = m2x + dxn*width collapses everything into ONE
        # affine map of the pixel offset:  q = dxn*A + dyn*B + C  with
        #   A = width*(bxc), B = width*(cxa), C = m2x*(bxc) + m2y*(cxa) + axb
        # so the per-fragment work drops from 6 fma + 9-term cross product to
        # 6 fma, and the packed width from 18 to 16 columns (m2/T are folded).
        # d2 = (m2 - pc)^2 = width^2*(dxn^2 + dyn^2) needs no m2 either.
        from bevy_gaussian_splatting_tpu.ops.gaussian_2d import (
            surfel_affine_coeffs,
        )

        A, B, C = surfel_affine_coeffs(
            splats["surfel_t"], splats["mean_2d"], width
        )
        cols = [
            splats["center_ndc"][:, 0],
            splats["center_ndc"][:, 1],
            splats["surfel_radius"],
            A[:, 0], A[:, 1], A[:, 2],
            B[:, 0], B[:, 1], B[:, 2],
            C[:, 0], C[:, 1], C[:, 2],
        ]
    elif settings.aabb:
        conic = splats["conic"]
        cols = [cx_vp, cy_vp, conic[:, 0], conic[:, 1], conic[:, 2], splats["radius_vp"]]
    else:
        e1 = splats["obb_axis"]
        b = splats["obb_bounds"]
        cols = [cx_vp, cy_vp, e1[:, 0], e1[:, 1], b[:, 0], b[:, 1]]

    return cols + [rgb[:, 0], rgb[:, 1], rgb[:, 2], alpha]


def pack_raster_params(splats: dict, settings: CloudSettings, width, height) -> jnp.ndarray:
    """[N, C] packed per-splat parameters for the compositor."""
    return jnp.stack(
        pack_raster_param_cols(splats, settings, width, height), axis=-1
    )


def _eval_chunk_gaussian(params, px_vp, py_vp, px_ndc, py_ndc, settings, width, height):
    """Gaussian falloff for a chunk of splats against a tile's pixels.

    params [T, C, P]-ready: here [..., C_params]; pixel arrays [..., 256].
    Returns alpha in [0, ALPHA_CAP]."""
    if settings.gaussian_mode == GaussianMode.GAUSSIAN_2D:
        # slim affine surfel layout (see pack_raster_params):
        # [cx, cy, mr, Ax, Ay, Az, Bx, By, Bz, Cx, Cy, Cz, rgb, alpha]
        cx_ndc = params[..., 0:1]
        cy_ndc = params[..., 1:2]
        mr = params[..., 2:3]
        dxn = px_ndc - cx_ndc
        dyn = py_ndc - cy_ndc
        inside = (jnp.abs(dxn) <= mr * jnp.float32(1.0 / width)) & (
            jnp.abs(dyn) <= mr * jnp.float32(1.0 / height)
        )
        uvm = jnp.maximum(jnp.abs(dxn) * width, jnp.abs(dyn) * height) / jnp.maximum(mr, 1e-12)
        edge = inside & (uvm > 1.0 - 2.0 * 0.08)
        # q = dxn*A + dyn*B + C — the surfel_fragment_power homography
        # intersection (gaussian_2d.wgsl:134-156) in folded affine form
        px_ = dxn * params[..., 3:4] + dyn * params[..., 6:7] + params[..., 9:10]
        py_ = dxn * params[..., 4:5] + dyn * params[..., 7:8] + params[..., 10:11]
        pz_ = dxn * params[..., 5:6] + dyn * params[..., 8:9] + params[..., 11:12]
        pz_ = jnp.where(jnp.abs(pz_) > 1e-12, pz_, 1e-12)
        inv_pz = 1.0 / pz_  # same reciprocal form as the oracle/kernels
        us = px_ * inv_pz
        vs = py_ * inv_pz
        s3d = us * us + vs * vs
        # doubled-frame quirk: both axes scale by width (gaussian_2d.wgsl)
        d2x2 = (dxn * dxn + dyn * dyn) * jnp.float32(2.0 * width * width)
        power = -0.5 * jnp.minimum(s3d, d2x2)
        g = jnp.where(inside, jnp.exp(power), 0.0)
    elif settings.aabb:
        cx = params[..., 0:1]
        cy = params[..., 1:2]
        dx = cx - px_vp
        dy = cy - py_vp
        power = (
            -0.5 * (params[..., 2:3] * dx * dx + params[..., 4:5] * dy * dy)
            + params[..., 3:4] * dx * dy
        )
        r = params[..., 5:6]
        in_quad = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
        inside = in_quad & (power <= 0.0)
        edge = in_quad & (
            jnp.maximum(jnp.abs(dx), jnp.abs(dy)) / jnp.maximum(r, 1e-12)
            > 1.0 - 2.0 * 0.08
        )
        g = jnp.where(inside, jnp.exp(power), 0.0)
    else:
        cx = params[..., 0:1]
        cy = params[..., 1:2]
        dx = px_vp - cx
        dy = py_vp - cy
        e1x = params[..., 2:3]
        e1y = params[..., 3:4]
        b1 = params[..., 4:5]
        b2 = params[..., 5:6]
        # single-reciprocal form shared with the kernels (bit-consistent)
        inv1 = 1.0 / jnp.maximum(b1, 1e-12)
        inv2 = 1.0 / jnp.maximum(b2, 1e-12)
        u = (dx * e1x + dy * e1y) * inv1
        v = (dx * e1y - dy * e1x) * inv2
        inside = (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0) & (b1 > 0.0)
        edge = inside & (jnp.maximum(jnp.abs(u), jnp.abs(v)) > 1.0 - 2.0 * 0.08)
        g = jnp.where(inside, jnp.exp(-4.5 * (u * u + v * v)), 0.0)
    return g, edge


def composite_tiles(
    params_sorted: jnp.ndarray,  # [P, C] gathered into pair order
    pair_valid: jnp.ndarray,  # [P]
    tile_start: jnp.ndarray,  # [T]
    tile_end: jnp.ndarray,  # [T]
    settings: CloudSettings,
    width: int,
    height: int,
    k_max: int,
    chunk: int = 64,
    background: Optional[jnp.ndarray] = None,
    differentiable: bool = True,
    pixel_y0=None,
    full_height: Optional[int] = None,
) -> jnp.ndarray:
    """Front-to-back chunked compositing over all tiles -> [H, W, 4].

    ``pixel_y0``/``full_height``: band-sharded rendering composites a
    ``height``-row horizontal band of a ``full_height`` image starting at
    pixel row ``pixel_y0`` (traced).  Pixel coordinates are then computed in
    the FULL image frame, so every per-pixel float op is bit-identical to the
    single-chip render — no band remap enters the fragment math.

    ``differentiable=True`` runs a fixed k_max/chunk ``lax.scan`` (XLA AD can
    differentiate it); ``False`` uses a ``lax.while_loop`` bounded by the
    *actual* maximum per-tile splat count and an all-pixels-saturated early
    exit — much faster forward-only, not differentiable."""
    tx_count = width // TILE
    ty_count = height // TILE
    num_tiles = tx_count * ty_count
    p_max = params_sorted.shape[0]
    c_params = params_sorted.shape[1]

    # per-tile pixel coordinates [T, 256]
    fh = full_height if full_height is not None else height
    js = jnp.arange(width, dtype=jnp.float32) + 0.5
    is_ = jnp.arange(height, dtype=jnp.float32) + 0.5
    if pixel_y0 is not None:
        is_ = is_ + pixel_y0
    px_ndc_row = js * (2.0 / width) - 1.0  # [W]
    py_ndc_col = 1.0 - is_ * (2.0 / fh)  # [H]
    px_ndc = jnp.broadcast_to(px_ndc_row, (height, width))
    py_ndc = jnp.broadcast_to(py_ndc_col[:, None], (height, width))

    def to_tiles(a):  # [H, W] -> [T, 256]
        return (
            a.reshape(ty_count, TILE, tx_count, TILE)
            .transpose(0, 2, 1, 3)
            .reshape(num_tiles, TILE * TILE)
        )

    tpx_ndc = to_tiles(px_ndc)[:, None, :]  # [T, 1, 256]
    tpy_ndc = to_tiles(py_ndc)[:, None, :]
    tpx_vp = tpx_ndc * width
    tpy_vp = tpy_ndc * fh

    count = jnp.minimum(tile_end - tile_start, k_max)  # [T]
    n_chunks = (k_max + chunk - 1) // chunk

    # pad params so out-of-range gathers are inert (alpha 0)
    params_padded = jnp.concatenate(
        [params_sorted * pair_valid[:, None].astype(params_sorted.dtype),
         jnp.zeros((1, c_params), params_sorted.dtype)],
        axis=0,
    )

    rgb_off = c_params - 4

    def blend_chunk(carry, chunk_idx):
        accum, transmittance = carry  # [T, 256, 3], [T, 256]
        base = tile_start + chunk_idx * chunk
        idx = base[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None, :]  # [T, C]
        in_range = (jnp.arange(chunk)[None, :] + chunk_idx * chunk) < count[:, None]
        idx = jnp.where(in_range, idx, p_max)  # out-of-range -> zero pad row
        p = params_padded[idx]  # [T, C, c_params]

        # broadcasting: params[..., k:k+1] is [T, C, 1] against pixels [T, 1, 256]
        g, edge = _eval_chunk_gaussian(
            p, tpx_vp, tpy_vp, tpx_ndc, tpy_ndc, settings, width, fh
        )  # [T, C, 256]

        alpha = jnp.minimum(g * p[:, :, rgb_off + 3 : rgb_off + 4], ALPHA_CAP)
        if settings.visualize_bounding_box:
            # opaque green quad borders (gaussian.wgsl:486-495); only splats
            # with nonzero opacity carry a box
            edge = edge & (p[:, :, rgb_off + 3 : rgb_off + 4] > 0.0)
            alpha = jnp.where(edge, 1.0, alpha)
        one_minus = 1.0 - alpha
        # exclusive cumulative transmittance within the chunk (front-to-back)
        cum = jnp.cumprod(one_minus, axis=1)
        excl = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
        w = alpha * excl * transmittance[:, None, :]  # [T, C, 256]
        rgb = p[:, :, rgb_off : rgb_off + 3]  # [T, C, 3]
        if settings.visualize_bounding_box:
            green = jnp.array([0.3, 1.0, 0.1], jnp.float32)
            contrib = [
                jnp.sum(w * jnp.where(edge, green[ch], rgb[:, :, ch : ch + 1]), axis=1)
                for ch in range(3)
            ]
            accum = accum + jnp.stack(contrib, axis=-1)
        else:
            accum = accum + jnp.einsum(
                "tcp,tck->tpk", w, rgb, precision=jax.lax.Precision.HIGHEST
            )
        transmittance = transmittance * cum[:, -1, :]
        return (accum, transmittance), None

    accum0 = jnp.zeros((num_tiles, TILE * TILE, 3), jnp.float32)
    trans0 = jnp.ones((num_tiles, TILE * TILE), jnp.float32)
    if differentiable:
        # remat each chunk: the backward pass re-evaluates the chunk's alphas
        # instead of storing [T, C, 256] residuals per chunk (which is O(k_max)
        # HBM — prohibitive at 1M gaussians). This is the recompute-in-reverse
        # strategy of the hand-derived 3DGS backward, expressed via checkpoint.
        (accum, transmittance), _ = jax.lax.scan(
            jax.checkpoint(blend_chunk),
            (accum0, trans0),
            jnp.arange(n_chunks, dtype=jnp.int32),
        )
    else:
        needed_chunks = jnp.minimum(
            (jnp.max(count) + chunk - 1) // chunk, n_chunks
        ).astype(jnp.int32)

        def w_cond(state):
            i, (_, transmittance) = state
            # stop when every pixel is saturated (early termination analogue of
            # the fragment blend's transmittance cutoff)
            return (i < needed_chunks) & (jnp.max(transmittance) > 1.0 / 255.0)

        def w_body(state):
            i, carry = state
            carry, _ = blend_chunk(carry, i)
            return i + 1, carry

        _, (accum, transmittance) = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), (accum0, trans0))
        )

    alpha_out = 1.0 - transmittance
    if background is not None:
        if background.ndim == 1:
            bg_rgb = background[:3]
            bg_a = background[3]
        else:
            # full-image background [H, W, 4] (multi-cloud phase compositing)
            bg_tiles = (
                background.reshape(ty_count, TILE, tx_count, TILE, 4)
                .transpose(0, 2, 1, 3, 4)
                .reshape(num_tiles, TILE * TILE, 4)
            )
            bg_rgb = bg_tiles[..., :3]
            bg_a = bg_tiles[..., 3]
        accum = accum + transmittance[..., None] * bg_rgb
        alpha_out = alpha_out + transmittance * bg_a

    tile_img = jnp.concatenate([accum, alpha_out[..., None]], axis=-1)  # [T, 256, 4]
    img = (
        tile_img.reshape(ty_count, tx_count, TILE, TILE, 4)
        .transpose(0, 2, 1, 3, 4)
        .reshape(height, width, 4)
    )
    return img


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------


def render_tiled(
    cloud,
    camera: Camera,
    settings: CloudSettings,
    model_transform: Optional[jnp.ndarray] = None,
    background: Optional[jnp.ndarray] = None,
    time=None,
    width: Optional[int] = None,
    height: Optional[int] = None,
    chunk: int = 64,
    differentiable: bool = True,
    compositor: str = "xla",
    pairs_hint: Optional[int] = None,
    pairs_max: Optional[int] = None,
) -> jnp.ndarray:
    if model_transform is None:
        model_transform = jnp.eye(4, dtype=jnp.float32)
    if width is None:
        width = int(camera.viewport[2])
    if height is None:
        height = int(camera.viewport[3])
    if width % TILE:
        raise ValueError(f"image width must be a multiple of {TILE}")
    # non-16-multiple heights (the reference's headless default is
    # 1920x1080, examples/headless.rs:69): pad the tile GRID to the next
    # multiple while every fragment evaluates in the true viewport frame
    # (full_height), then crop the pad rows — bit-identical per-pixel math
    # to the oracle at the true size
    h_pad = pad_to_tile(height)
    if (
        h_pad != height
        and background is not None
        and getattr(background, "ndim", 1) == 3
    ):
        # full-image backgrounds (multi-cloud phase compositing) pad along
        # rows with zeros; the pad rows are cropped again below
        background = jnp.pad(
            background, ((0, h_pad - height), (0, 0), (0, 0))
        )

    n = len(cloud)
    clip_from_world = camera.clip_from_view @ camera.view_from_world

    # Depth-mode min/max quirk (back-to-front entries 1 and n-1,
    # gaussian.wgsl:329-347) via min/max reductions — no sort needed; the
    # binning depth pre-sort happens inside bin_gaussians (with inactive
    # gaussians compacted, which reductions here must NOT see).
    back_key = sort_ops.radix_depth_key(
        cloud.position, model_transform, clip_from_world, camera.world_position,
        settings.radix_sort_depth_bits.bits,
    )

    from bevy_gaussian_splatting_tpu.ops.transforms import apply_transform

    wp = apply_transform(model_transform, cloud.position)
    first_idx, last_idx = back_sorted_entry_indices(back_key)
    max_d = jnp.linalg.norm(wp[first_idx] - camera.world_position)
    min_d = jnp.linalg.norm(wp[last_idx] - camera.world_position)

    splats = project_gaussians(
        cloud, camera, settings, model_transform,
        depth_minmax=(min_d, max_d), time=time,
    )
    # the device radix keys: used for (a) sentinel culling exactly like the
    # GPU sort and (b) the per-pair front-to-back ordering (quantized to the
    # configured radix width for tie parity with the reference)
    splats["sort_key"] = back_key
    splats["mask"] = splats["mask"] & (back_key != sort_ops.SENTINEL_KEY)

    p_max = pairs_max if pairs_max is not None else pairs_budget(n, pairs_hint)
    k_max = tile_budget(n)
    if compositor == "pallas" and differentiable and settings.visualize_bounding_box:
        # the hand-derived backward kernel covers 3D/4D/2DGS; bbox-viz
        # training falls back to XLA AD (identical math, debug-only feature)
        compositor = "xla"

    import jax as _jax

    interpret = _jax.default_backend() != "tpu"
    train_pallas = compositor == "pallas" and differentiable
    params = pack_raster_params(splats, settings, width, height)
    deliver = "gather"
    if compositor == "pallas":
        from bevy_gaussian_splatting_tpu.ops.pallas.core import (
            live_grad_count,
            preferred_params_delivery,
            preferred_unpermute,
        )

        unperm = (
            preferred_unpermute(n, live_grad_count(settings))
            if train_pallas else "rank"
        )
        if width // TILE <= 127 and h_pad // TILE <= 127:
            # the packed-carry depth sort's 7-bit tile fields see the
            # PADDED grid (bin_gaussians pads ty_count)
            deliver = preferred_params_delivery(
                n, p_max, params.shape[1], training=train_pallas
            )
    else:
        unperm = "rank"
    bins = bin_gaussians(
        splats, settings, width, height, p_max, with_inverse=train_pallas,
        expand="pallas" if compositor == "pallas" else "xla",
        interpret=interpret, inverse_map=unperm,
        params=params if deliver == "carry" else None, deliver=deliver,
    )
    g_s, tile_s, valid_s = bins[0], bins[1], bins[2]
    start, end = tile_ranges(tile_s, (width // TILE) * (h_pad // TILE))

    def crop(img):
        return img[:height] if h_pad != height else img

    if compositor == "pallas":
        count = jnp.minimum(end - start, k_max)
        if train_pallas:
            # custom-VJP training core: gather + forward kernel forward;
            # backward kernel + scatter-free contiguous segment reduction
            # backward (ops/pallas/core.py).  Both kernels handle unaligned
            # tile starts (DMA base align-down + prefix mask/merge).
            from bevy_gaussian_splatting_tpu.ops.pallas.core import (
                get_train_core_windowed,
            )
            from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
                composite_epilogue,
            )

            gidx_s, table, g0s, inv_map = bins[4:8]
            core = get_train_core_windowed(
                settings, width, h_pad, interpret, k_max,
                full_height=height, unpermute=unperm, delivery=deliver,
            )
            # delivery="carry": arg 1 is the bin-carried params_sorted.
            # stop_gradient HERE is load-bearing: the core's vjp returns a
            # dense zero cotangent for this argument, and without the stop
            # XLA propagates it through the 12-operand pair sort + depth
            # sort TRANSPOSES (inverse-permutation work at P scale) before
            # hitting the stop_gradient inside binning — measured as the 4M
            # "carry-train anomaly" (+39-70 ms vs gather).
            arg1 = (
                jax.lax.stop_gradient(bins[8]) if deliver == "carry" else g_s
            )
            if deliver == "carry" and _env_flag("BGS_CARRY_BARRIER"):
                # anomaly experiment: pin the carried params as an opaque
                # buffer so XLA cannot rematerialize the producing sorts
                # inside the backward half of the training graph
                arg1 = jax.lax.optimization_barrier(arg1)
            out_raw = core(
                params, arg1, valid_s, start, count, gidx_s, table, g0s,
                inv_map, jnp.zeros((1,), jnp.int32),
            )
            return crop(composite_epilogue(out_raw, background, width, h_pad))

        # forward-only serving path: the kernel handles unaligned tile starts
        # directly, so the pair-sorted buffer is used as-is after one gather.
        # No validity zeroing needed: tile ranges never cover the sorted
        # sentinel suffix, so the kernel never reads those rows.
        from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
            pallas_composite_tiles,
        )

        # (Stacking wide layouts as separate <= 8-col tables before the
        # gather — instead of slicing one [N, 16] — was measured NEUTRAL on
        # v5e: 57.9 vs 58.2 ms 2DGS fwd.  The ~9 ns/row split-piece rate is
        # the real rate, not a slice-fusion artifact.)
        params_sorted = (
            bins[4] if deliver == "carry"
            else _serving_params_gather(params, g_s)
        )
        return crop(pallas_composite_tiles(
            params_sorted, start, count, settings, width, h_pad,
            background=background, interpret=interpret,
            transposed_params=deliver == "carry", full_height=height,
        ))

    params_sorted = _serving_params_gather(params, g_s)
    return crop(composite_tiles(
        params_sorted, valid_s, start, end, settings, width, h_pad,
        k_max=k_max, chunk=chunk, background=background,
        differentiable=differentiable, full_height=height,
    ))


def make_tiled_pipeline(
    settings: CloudSettings, width: int, height: int, differentiable: bool = False,
    compositor: str = "xla", pairs_hint: Optional[int] = None,
    pairs_max: Optional[int] = None,
):
    """Jitted forward pipeline. Default is the fast non-differentiable
    while_loop compositor (rendering/serving); pass differentiable=True for the
    AD-capable scan (training paths use the custom-VJP kernel instead).

    ``pairs_hint``: measured/estimated pair count (see :func:`pair_count`);
    sizes the static pair budget to the scene instead of the worst case.
    ``pairs_max``: exact static budget (overrides the hint bucketing)."""

    def fn(cloud, camera, model_transform, background, time):
        return render_tiled(
            cloud, camera, settings, model_transform, background, time,
            width=width, height=height, differentiable=differentiable,
            compositor=compositor, pairs_hint=pairs_hint, pairs_max=pairs_max,
        )

    return jax.jit(fn)
