"""Probe: how many (gaussian, tile) pairs does exact per-tile-row interval
culling remove vs the axis-aligned tile rect?

Today bin_gaussians emits every tile in the splat's rect; the fragment math
zeroes everything outside the OBB quad (rasterize_tile.py `inside` mask), so
rect-minus-quad tiles are exact zeros riding every P-proportional stage.
For a convex quad the per-tile-ROW column interval [x0(row), x1(row)] is
exact, so a (gaussian, tile-row) segment expansion can drop the overshoot.

This probe replicates the binning extents bit-for-bit, then counts:
  P_rect     current pair count (== rasterize_tile.pair_count)
  S          segment count (sum of rect heights) — the intermediate scale
  P_rowcull  pairs after exact row-interval culling (>=1 tile/row kept:
             empty rows clamp to 1 so the expansion owner-advance invariant
             holds)

CPU-only (JAX_PLATFORMS=cpu); numbers drive the round-5 build decision.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.models.settings import CloudSettings, GaussianMode
from bevy_gaussian_splatting_tpu.ops.project import project_gaussians
from bevy_gaussian_splatting_tpu.ops import sort as sort_ops
from bevy_gaussian_splatting_tpu.ops.rasterize_tile import TILE, _pixel_extents


def bench_cloud(n, seed=0):
    cloud = bgs.random_gaussians_3d_seeded(n, seed=seed)
    return dataclasses.replace(
        cloud,
        position_visibility=cloud.position_visibility * jnp.array([1.0, 1.0, 0.25, 1.0]),
        scale_opacity=cloud.scale_opacity * jnp.array([0.05, 0.05, 0.05, 1.0]),
    )


def probe(cloud, settings, width, height, time=None, label=""):
    camera = bgs.Camera.create(
        eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0), width=width, height=height
    )
    mt = jnp.eye(4, dtype=jnp.float32)
    clip_from_world = camera.clip_from_view @ camera.view_from_world
    splats = project_gaussians(cloud, camera, settings, mt, time=time)
    back_key = sort_ops.radix_depth_key(
        cloud.position, mt, clip_from_world, camera.world_position,
        settings.radix_sort_depth_bits.bits,
    )
    splats["mask"] = splats["mask"] & (back_key != sort_ops.SENTINEL_KEY)

    tx_count = width // TILE
    ty_count = height // TILE
    cx, cy, rx, ry = _pixel_extents(splats, settings, width, height)
    active = splats["mask"] & (rx > 0.0) & (ry > 0.0)
    tx0 = jnp.clip(jnp.floor((cx - rx) / TILE), 0, tx_count - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((cx + rx) / TILE), 0, tx_count - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((cy - ry) / TILE), 0, ty_count - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((cy + ry) / TILE), 0, ty_count - 1).astype(jnp.int32)
    on_screen = (
        (cx + rx >= 0.0) & (cx - rx <= width) & (cy + ry >= 0.0) & (cy - ry <= height)
    )
    active = np.asarray(active & on_screen)
    cx = np.asarray(cx); cy = np.asarray(cy)
    tx0 = np.asarray(tx0); tx1 = np.asarray(tx1)
    ty0 = np.asarray(ty0); ty1 = np.asarray(ty1)

    rect_w = (tx1 - tx0 + 1)
    rect_h = (ty1 - ty0 + 1)
    P_rect = int((rect_w * rect_h * active).sum())
    S = int((rect_h * active).sum())

    if settings.gaussian_mode == GaussianMode.GAUSSIAN_2D or settings.aabb:
        # footprint is axis-aligned (surfel square / AABB quad): rect == quad
        print(f"{label}: axis-aligned footprint — P_rect {P_rect}, no row cull")
        return

    e1 = np.asarray(splats["obb_axis"])
    b = np.asarray(splats["obb_bounds"])
    # quad in PIXEL coords (screen y down): u = 2(dx e1x - dy e1y)/b1,
    # v = 2(dx e1y + dy e1x)/b2  ->  axes a1 = b1/2 (e1x, -e1y),
    # a2 = b2/2 (e1y, e1x)
    a1 = 0.5 * b[:, 0:1] * np.stack([e1[:, 0], -e1[:, 1]], -1)
    a2 = 0.5 * b[:, 1:2] * np.stack([e1[:, 1], e1[:, 0]], -1)
    c = np.stack([cx, cy], -1)
    # vertices in order around the quad
    V = np.stack([c + a1 + a2, c + a1 - a2, c - a1 - a2, c - a1 + a2], 1)  # [N,4,2]

    max_h = int(rect_h[active].max()) if active.any() else 0
    print(f"{label}: N={len(active)} active={int(active.sum())} "
          f"P_rect={P_rect} S={S} max_rect_h={max_h} "
          f"mean_area={(P_rect / max(1, int(active.sum()))):.2f}")

    P_cull = np.zeros((), np.int64)
    idx = np.arange(len(active))
    Vx = V[:, :, 0]; Vy = V[:, :, 1]
    Qx = np.roll(Vx, -1, 1); Qy = np.roll(Vy, -1, 1)
    for r in range(max_h):
        row = ty0 + r
        has = active & (row <= ty1)
        ya = row * TILE + 0.5
        yb = row * TILE + TILE - 0.5
        # per-edge clip to the band
        ylo = np.minimum(Vy, Qy); yhi = np.maximum(Vy, Qy)
        lo = np.maximum(ya[:, None], ylo); hi = np.minimum(yb[:, None], yhi)
        ok = lo <= hi
        dy = Qy - Vy
        safe = np.where(np.abs(dy) < 1e-12, 1.0, dy)
        t0 = np.clip((lo - Vy) / safe, 0.0, 1.0)
        t1 = np.clip((hi - Vy) / safe, 0.0, 1.0)
        horiz = np.abs(dy) < 1e-12
        x0 = np.where(horiz, Vx, Vx + t0 * (Qx - Vx))
        x1 = np.where(horiz, Qx, Vx + t1 * (Qx - Vx))
        big = 1e30
        xmax = np.maximum(np.where(ok, x0, -big), np.where(ok, x1, -big)).max(1)
        xmin = np.minimum(np.where(ok, x0, big), np.where(ok, x1, big)).min(1)
        k_lo = np.ceil((xmin - (TILE - 0.5)) / TILE).astype(np.int64)
        k_hi = np.floor((xmax - 0.5) / TILE).astype(np.int64)
        k_lo = np.clip(k_lo, tx0, tx1)
        k_hi = np.clip(k_hi, tx0, tx1)
        w = np.maximum(k_hi - k_lo + 1, 1)  # clamp: >=1 tile per row
        P_cull = P_cull + (w * has).sum()
    P_cull = int(P_cull)
    print(f"{label}: P_rowcull={P_cull}  cut={1 - P_cull / max(1, P_rect):.1%} "
          f"(S+cull buffers vs P_rect: S/P={S / max(1, P_rect):.2f})")


def main():
    width = height = int(os.environ.get("PROBE_SIZE", 512))
    settings = CloudSettings()
    n = int(os.environ.get("PROBE_N", 1_000_000))
    probe(bench_cloud(n), settings, width, height, label=f"3DGS {n}")
    if os.environ.get("PROBE_4D", "1") == "1":
        c4d = bgs.random_gaussians_4d_seeded(n, seed=3)
        s4d = settings.replace(gaussian_mode=GaussianMode.GAUSSIAN_4D)
        for t in (0.25, 0.5, 0.75):
            probe(c4d, s4d, width, height, time=jnp.float32(t),
                  label=f"4DGS {n} t={t}")
    if os.environ.get("PROBE_4M", "1") == "1":
        probe(bench_cloud(4 * n), settings, width, height, label=f"3DGS {4 * n}")


if __name__ == "__main__":
    main()
