"""Pallas TPU forward compositing kernel.

Replaces the XLA chunked-scan compositor (ops/rasterize_tile.composite_tiles)
on the hot path.  Why a kernel: the XLA formulation must run every tile through
the same number of chunk iterations (the max over tiles), gathering fixed-size
blocks; this kernel walks the grid one tile at a time with *per-tile* dynamic
chunk counts (scalar-prefetched tile_start/tile_count), early-exits when every
pixel in the tile saturates (transmittance < 1/255), and streams the sorted
splat parameters from HBM with double-buffered async DMA.  Work drops from
T x max_count to sum_t count_t — the reference's per-tile fragment workload.

Math is identical to composite_tiles / the oracle fragment shaders:
front-to-back premultiplied blending with within-chunk exclusive cumprod of
(1 - alpha), alpha cap 0.999 (src/render/gaussian.wgsl:455-505).

Layout (chosen for Mosaic's (8, 128) tiling):
  params_t [PW=16, P + pad] f32 — TRANSPOSED pair-sorted splat rows
      [cx_vp, cy_vp, a, b, c, d, rgb0, rgb1, rgb2, alpha, 0...]; a chunk DMA
      brings [16, CHUNK] into VMEM, so each parameter is a [1, CHUNK] lane
      vector that broadcasts against [PIX, 1] pixel columns with no transpose.
      All alpha math runs on [PIX, CHUNK] = [256, 512] blocks: pixels in
      sublanes, front-to-back gaussians in lanes; the blend scan is a
      log-depth Hillis-Steele cumprod along lanes.
  out [T*8, 256] f32 — per tile: rows 0..2 premultiplied rgb, row 3 final
      transmittance, rows 4..7 pad (background applied by the XLA epilogue).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevy_gaussian_splatting_tpu.models.settings import CloudSettings, GaussianMode

TILE = 16
PIX = TILE * TILE  # 256
PW = 16  # padded param width (3D/4D modes)
PW_2D = 16  # 2DGS slim affine surfel layout: 16 live columns (folded homography)
# Splats per DMA/compute chunk (BGS_TILE_CHUNK forces it for on-device
# A/B).  512 is the 512^2-bench optimum (avg ~1500 pairs/tile); at low
# per-tile occupancy a 512-lane chunk computes wasted fragment lanes — at
# 1080p (2.1M pairs / 8160 tiles = ~257/tile) every tile ran ONE half-empty
# chunk.  preferred_chunk picks by mean occupancy from the measured sweep
# (same-session v5e, 1M/1080p fwd / train: 512 = 74.9/165.9, 256 =
# 69.1/150.9, 128 = 71.0/154.8; 1M/512^2: 512 = 41.6/92.3, 256 =
# 44.4/95.2 — images bit-identical across chunk sizes).
import os as _os

CHUNK = int(_os.environ.get("BGS_TILE_CHUNK", 512))


def preferred_chunk(p_max: int, num_tiles: int) -> int:
    """Kernel chunk size from mean per-tile pair occupancy (see above)."""
    env = _os.environ.get("BGS_TILE_CHUNK")
    if env:
        return int(env)
    avg = p_max / max(num_tiles, 1)
    return 256 if avg <= 320 else 512


ALPHA_CAP = 0.999
TRANS_EPS = 1.0 / 255.0

_BBOX_GREEN = (0.3, 1.0, 0.1)  # gaussian.wgsl bounding-box overlay color
_EDGE_BAND = 1.0 - 2.0 * 0.08


def param_width(mode: str) -> int:
    return PW_2D if mode == "2d" else PW


def rgb_row(mode: str) -> int:
    """Row index of the first color column (alpha follows at +3)."""
    return 12 if mode == "2d" else 6


def kernel_mode(settings: CloudSettings) -> str:
    if settings.gaussian_mode == GaussianMode.GAUSSIAN_2D:
        return "2d"
    return "aabb" if settings.aabb else "obb"


def _tile_pixel_coords(t, tx_count: int, width: int, full_height: int, y0):
    """vp-unit pixel center coordinates for tile t -> ([PIX, 1], [PIX, 1]).

    ``t`` indexes the kernel's (possibly band-local) tile grid; ``y0`` is the
    band's first pixel row in the FULL image (0 single-chip) and
    ``full_height`` the full image height, so a sharded band kernel produces
    bit-identical full-frame coordinates (integer f32 adds are exact)."""
    tx = (t % tx_count).astype(jnp.float32)
    ty = (t // tx_count).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px_local = (sub % TILE).astype(jnp.float32)
    py_local = (sub // TILE).astype(jnp.float32)
    px = tx * TILE + px_local + 0.5
    py = ty * TILE + py_local + 0.5 + y0.astype(jnp.float32)
    px_vp = (px * (2.0 / width) - 1.0) * width
    py_vp = (1.0 - py * (2.0 / full_height)) * full_height
    return px_vp, py_vp


def _chunk_alpha(chunk, px_vp, py_vp, mode: str, width: int, height: int,
                 with_edge: bool = False):
    """Gaussian alpha for a param block against [PIX, 1] pixels -> [PIX, CHUNK].

    Mirrors _eval_chunk_gaussian exactly (rasterize_tile.py); ``with_edge``
    additionally returns the bounding-box edge-band mask used by
    VISUALIZE_BOUNDING_BOX (gaussian.wgsl:486-495)."""
    cx = chunk[0:1, :]
    cy = chunk[1:2, :]
    opacity = chunk[rgb_row(mode) + 3 : rgb_row(mode) + 4, :]
    edge = None
    if mode == "2d":
        # slim affine surfel (gaussian_2d.wgsl:134-156 folded; see
        # pack_raster_params): [cx, cy, mr, A, B, C (xyz each), r, g, b, alpha]
        px_ndc = px_vp * (1.0 / width)
        py_ndc = py_vp * (1.0 / height)
        # [1, CHUNK] row scalings instead of two [PIX, CHUNK] multiplies
        mrx = chunk[2:3, :] * (1.0 / width)
        mry = chunk[2:3, :] * (1.0 / height)
        dxn = px_ndc - cx
        dyn = py_ndc - cy
        inside = (jnp.abs(dxn) <= mrx) & (jnp.abs(dyn) <= mry)
        px_ = dxn * chunk[3:4, :] + dyn * chunk[6:7, :] + chunk[9:10, :]
        py_ = dxn * chunk[4:5, :] + dyn * chunk[7:8, :] + chunk[10:11, :]
        pz_ = dxn * chunk[5:6, :] + dyn * chunk[8:9, :] + chunk[11:12, :]
        pz_ = jnp.where(jnp.abs(pz_) > 1e-12, pz_, 1e-12)
        inv_pz = 1.0 / pz_  # one reciprocal instead of two divides
        us = px_ * inv_pz
        vs = py_ * inv_pz
        s3d = us * us + vs * vs
        # doubled-frame quirk: both axes scale by width (constants folded)
        d2x2 = (dxn * dxn + dyn * dyn) * (2.0 * float(width) * float(width))
        power = -0.5 * jnp.minimum(s3d, d2x2)
        g = jnp.where(inside, jnp.exp(power), 0.0)
        if with_edge:
            mr = chunk[2:3, :]
            uvm = jnp.maximum(jnp.abs(dxn) * width, jnp.abs(dyn) * height) / jnp.maximum(
                mr, 1e-12
            )
            edge = inside & (uvm > _EDGE_BAND)
    elif mode == "aabb":
        # conic quadratic form + quad clip (gaussian.wgsl:455-470)
        dx = cx - px_vp
        dy = cy - py_vp
        power = (
            -0.5 * (chunk[2:3, :] * dx * dx + chunk[4:5, :] * dy * dy)
            + chunk[3:4, :] * dx * dy
        )
        r = chunk[5:6, :]
        in_quad = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
        inside = in_quad & (power <= 0.0)
        g = jnp.where(inside, jnp.exp(power), 0.0)
        if with_edge:
            edge = in_quad & (
                jnp.maximum(jnp.abs(dx), jnp.abs(dy)) / jnp.maximum(r, 1e-12)
                > _EDGE_BAND
            )
    else:
        # eigen-rotated quad falloff (gaussian.wgsl:489-497); [1, CHUNK] row
        # reciprocals replace two full-block divides (same form as the
        # backward recompute and all other evaluators — cross-path
        # bit-consistent, 1-ulp vs a true divide)
        dx = px_vp - cx
        dy = py_vp - cy
        e1x = chunk[2:3, :]
        e1y = chunk[3:4, :]
        b1 = chunk[4:5, :]
        b2 = chunk[5:6, :]
        inv_b1 = 1.0 / jnp.maximum(b1, 1e-12)
        inv_b2 = 1.0 / jnp.maximum(b2, 1e-12)
        u = (dx * e1x + dy * e1y) * inv_b1
        v = (dx * e1y - dy * e1x) * inv_b2
        inside = (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0) & (b1 > 0.0)
        g = jnp.where(inside, jnp.exp(-4.5 * (u * u + v * v)), 0.0)
        if with_edge:
            edge = inside & (jnp.maximum(jnp.abs(u), jnp.abs(v)) > _EDGE_BAND)
    alpha = jnp.minimum(g * opacity, ALPHA_CAP)
    if with_edge:
        edge = edge & (opacity > 0.0)
        return alpha, edge
    return alpha


import os as _os

# Lane-scan formulation (BGS_SCAN=flat|blocked for on-device A/B):
#   flat    — one Hillis-Steele over the full chunk width: log2(n) steps,
#             each a full-[PIX, n] roll+mask+mul pass.
#   blocked — two-level: 7-step scans inside each 128-lane tile (each step
#             touches 1/nb of the data) + a [PIX, 1] column carry between
#             tiles.  On paper ~22% less scan work (7 steps/element vs 9);
#             MEASURED on v5e (2026-08-21, PROF_ONLY=kernels, 1.6M pairs):
#             fwd neutral (obb 16.87 flat / 16.96 blocked), bwd SLOWER
#             (obb 34.11 / 35.47, 2d 38.80 / 40.03) — the lane-tile concat
#             + 4x small-array op overhead eats the step savings.  Default
#             stays FLAT; the blocked form is kept for A/B evidence.
_SCAN_IMPL = _os.environ.get("BGS_SCAN", "flat")
_SCAN_BLOCK = 128  # one physical lane tile


def _cumprod_lanes_flat(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x * jnp.where(lane >= shift, rolled, 1.0)
        shift *= 2
    return x


def _cumprod_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative product along axis 1 (lanes) — jnp.cumprod has no
    Pallas TPU lowering.  Association differs between the two formulations by
    ~1 ulp per factor (inside every cross-path tolerance)."""
    n = x.shape[1]
    if _SCAN_IMPL != "blocked" or n <= _SCAN_BLOCK or n % _SCAN_BLOCK:
        return _cumprod_lanes_flat(x)
    blocks = []
    carry = None
    for k in range(n // _SCAN_BLOCK):
        b = _cumprod_lanes_flat(
            x[:, k * _SCAN_BLOCK : (k + 1) * _SCAN_BLOCK]
        )
        if carry is not None:
            b = b * carry
        carry = b[:, _SCAN_BLOCK - 1 :]
        blocks.append(b)
    return jnp.concatenate(blocks, axis=1)


def _composite_kernel(
    start_ref,  # scalar prefetch [T]
    count_ref,  # scalar prefetch [T]
    y0_ref,  # scalar prefetch [1] — band's first pixel row in the full image
    params_hbm,  # [PW, P_pad] in ANY/HBM
    out_ref,  # [8, 256] VMEM block for this tile (rows 4..7 pad)
    chunk_vmem,  # [2, PW, CHUNK] double buffer
    sem,  # DMA semaphores [2]
    *,
    tx_count: int,
    width: int,
    full_height: int,
    mode: str,
    bbox: bool = False,
    chunk_size: int = CHUNK,
    early_exit: bool = True,
):
    t = pl.program_id(0)
    start_raw = start_ref[t]
    # DMA base aligned down to the lane tiling; the sub-128 prefix is masked
    # out of the first chunk, so callers need not pre-align tile ranges
    base = pl.multiple_of((start_raw // 128) * 128, 128)
    prefix = start_raw - base
    count = count_ref[t]
    total = count + prefix
    px_vp, py_vp = _tile_pixel_coords(t, tx_count, width, full_height,
                                      y0_ref[0])

    n_chunks = pl.cdiv(total, chunk_size)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk_size), 1)

    def dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            params_hbm.at[:, pl.ds(base + chunk_idx * chunk_size, chunk_size)],
            chunk_vmem.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    def body(state):
        c, accum, trans = state

        @pl.when(c + 1 < n_chunks)
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(c % 2, c).wait()
        chunk = chunk_vmem[c % 2]

        if bbox:
            alpha, edge = _chunk_alpha(
                chunk, px_vp, py_vp, mode, width, full_height, with_edge=True
            )
            alpha = jnp.where(edge, 1.0, alpha)  # opaque box borders
        else:
            alpha = _chunk_alpha(chunk, px_vp, py_vp, mode, width, full_height)
        lane_idx = c * chunk_size + lane
        in_rng = (lane_idx >= prefix) & (lane_idx < total)
        alpha = jnp.where(in_rng, alpha, 0.0)

        one_minus = 1.0 - alpha
        cum = _cumprod_lanes(one_minus)  # [PIX, CHUNK]
        # exclusive shift-right: circular roll then overwrite lane 0 with ones
        excl = jnp.where(lane == 0, 1.0, pltpu.roll(cum, 1, axis=1))

        w = alpha * excl * trans  # [PIX, CHUNK] (trans [PIX, 1])

        ro = rgb_row(mode)
        if bbox:
            rgb_ch = [
                jnp.where(edge, _BBOX_GREEN[i], chunk[ro + i : ro + i + 1, :])
                for i in range(3)
            ]
        else:
            # (An MXU lane-contracting dot for this reduction was MEASURED
            # SLOWER on v5e: the 3-wide output pads to a full 128-lane MXU
            # tile and precision=HIGHEST multiplies it by 6 — ~200 MFLOP-eq
            # per chunk vs ~3 cheap VPU passes.  Keep the mul+lane-reduce.)
            rgb_ch = [chunk[ro + i : ro + i + 1, :] for i in range(3)]
        r = jnp.sum(w * rgb_ch[0], axis=1, keepdims=True)
        g = jnp.sum(w * rgb_ch[1], axis=1, keepdims=True)
        b = jnp.sum(w * rgb_ch[2], axis=1, keepdims=True)
        accum = accum + jnp.concatenate([r, g, b], axis=1)  # [PIX, 3]
        trans = trans * cum[:, -1:]
        return c + 1, accum, trans

    def cond(state):
        c, _, trans = state
        if early_exit:
            return (c < n_chunks) & (jnp.max(trans) > TRANS_EPS)
        return c < n_chunks

    accum0 = jnp.zeros((PIX, 3), jnp.float32)
    trans0 = jnp.ones((PIX, 1), jnp.float32)
    c_fin, accum, trans = jax.lax.while_loop(cond, body, (jnp.int32(0), accum0, trans0))

    # early exit leaves the prefetched chunk's DMA in flight; drain it so the
    # next grid step's DMA into the same buffer/semaphore cannot race it
    @pl.when(c_fin < n_chunks)
    def _():
        dma(c_fin % 2, c_fin).wait()

    # [PIX, 8] -> [8, 256] output block (one transpose per tile)
    packed = jnp.concatenate(
        [accum, trans, jnp.zeros((PIX, 4), jnp.float32)], axis=1
    )  # [256, 8]
    out_ref[...] = packed.T


def pallas_forward_raw(
    params_sorted: jnp.ndarray,  # [P, C] pair-sorted, invalid rows zeroed
    tile_start: jnp.ndarray,  # [T] i32
    tile_count: jnp.ndarray,  # [T] i32
    settings: CloudSettings,
    width: int,
    height: int,
    interpret: bool = False,
    chunk_size: int | None = None,
    early_exit: bool = True,
    y0=None,
    full_height: int | None = None,
    transposed_params: bool = False,
) -> jnp.ndarray:
    """Raw kernel output [T*8, PIX]: rows 0-2 rgb accum, row 3 transmittance.

    ``chunk_size=None`` picks by mean per-tile occupancy (preferred_chunk;
    256 below ~320 pairs/tile — the 1080p regime — else 512).

    ``y0``/``full_height``: full-frame pixel geometry for sharded band
    rendering (parallel/render.py) — ``height`` is then the band height that
    sizes the tile grid while all fragment math runs in full-image
    coordinates.  Defaults reproduce the single-chip behavior exactly.

    ``transposed_params``: ``params_sorted`` is already [C, P] kernel-native
    (the carry delivery's sort rows stack straight into this layout) — skips
    the [P, C] -> [C, P] interleave, a real P-scale transpose."""
    mode = kernel_mode(settings)
    if full_height is None:
        full_height = height
    if y0 is None:
        y0 = jnp.zeros((1,), jnp.int32)
    else:
        y0 = jnp.asarray(y0, jnp.int32).reshape(1)
    pw = param_width(mode)

    tx_count = width // TILE
    ty_count = height // TILE
    num_tiles = tx_count * ty_count
    if transposed_params:
        c, p = params_sorted.shape
    else:
        p, c = params_sorted.shape
    if chunk_size is None:
        chunk_size = preferred_chunk(p, num_tiles)

    # transposed + padded so any chunk DMA stays in bounds and lanes align
    p_pad = (p + chunk_size + 127) // 128 * 128
    params_t = jnp.zeros((pw, p_pad), jnp.float32)
    params_t = params_t.at[:c, :p].set(
        params_sorted if transposed_params else params_sorted.T
    )

    kernel = functools.partial(
        _composite_kernel,
        tx_count=tx_count,
        width=width,
        full_height=full_height,
        mode=mode,
        bbox=settings.visualize_bounding_box,
        chunk_size=chunk_size,
        early_exit=early_exit,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (8, PIX), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, pw, chunk_size), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles * 8, PIX), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start.astype(jnp.int32), tile_count.astype(jnp.int32), y0,
      params_t)


def composite_epilogue(
    out_raw: jnp.ndarray,  # [T*8, PIX]
    background,
    width: int,
    height: int,
) -> jnp.ndarray:
    """XLA epilogue: raw kernel rows -> [H, W, 4] with background blend.
    Differentiable in out_raw and background."""
    tx_count = width // TILE
    ty_count = height // TILE
    num_tiles = tx_count * ty_count

    out = out_raw.reshape(num_tiles, 8, PIX)
    accum = out[:, :3, :].transpose(0, 2, 1)  # [T, 256, 3]
    trans = out[:, 3, :]  # [T, 256]

    alpha_out = 1.0 - trans
    if background is not None:
        if background.ndim == 1:
            bg_rgb = background[:3]
            bg_a = background[3]
        else:
            bg_tiles = (
                background.reshape(ty_count, TILE, tx_count, TILE, 4)
                .transpose(0, 2, 1, 3, 4)
                .reshape(num_tiles, PIX, 4)
            )
            bg_rgb = bg_tiles[..., :3]
            bg_a = bg_tiles[..., 3]
        accum = accum + trans[..., None] * bg_rgb
        alpha_out = alpha_out + trans * bg_a

    tile_img = jnp.concatenate([accum, alpha_out[..., None]], axis=-1)
    return (
        tile_img.reshape(ty_count, tx_count, TILE, TILE, 4)
        .transpose(0, 2, 1, 3, 4)
        .reshape(height, width, 4)
    )


def pallas_composite_tiles(
    params_sorted: jnp.ndarray,
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    settings: CloudSettings,
    width: int,
    height: int,
    background=None,
    interpret: bool = False,
    chunk_size: int | None = None,
    early_exit: bool = True,
    y0=None,
    full_height: int | None = None,
    transposed_params: bool = False,
) -> jnp.ndarray:
    """Forward-only convenience: raw kernel + epilogue -> [H, W, 4]."""
    out_raw = pallas_forward_raw(
        params_sorted, tile_start, tile_count, settings, width, height,
        interpret=interpret, chunk_size=chunk_size, early_exit=early_exit,
        y0=y0, full_height=full_height, transposed_params=transposed_params,
    )
    return composite_epilogue(out_raw, background, width, height)
