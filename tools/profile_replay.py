"""Replay-path profiler: orbit replay ms/frame at bench scale + stage
ablation of the pair-order replay frame (VERDICT r3 #4).

    python tools/profile_replay.py                # 1M, 512x512, 24 frames
    BGS_REPLAY=gather python tools/profile_replay.py   # A/B the old path
    PROF_STAGES=1 python tools/profile_replay.py       # ablate the frame

Timing protocol (relay-safe): frames are enqueued back-to-back and the
clock stops after a 1-element readback; min over windows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bevy_gaussian_splatting_tpu as bgs
    from bevy_gaussian_splatting_tpu.render.api import InteractiveRenderer

    n = int(os.environ.get("PROF_N", 1_000_000))
    size = int(os.environ.get("PROF_SIZE", 512))
    frames = int(os.environ.get("PROF_FRAMES", 24))

    cloud = bgs.random_gaussians_3d_seeded(n, seed=0)
    cloud = dataclasses.replace(
        cloud,
        position_visibility=cloud.position_visibility
        * jnp.array([1.0, 1.0, 0.25, 1.0]),
        scale_opacity=cloud.scale_opacity * jnp.array([0.05, 0.05, 0.05, 1.0]),
    )
    log(f"devices: {jax.devices()}  N={n} {size}x{size} "
        f"BGS_REPLAY={os.environ.get('BGS_REPLAY', '(default=pairs)')}")

    r = InteractiveRenderer(period_floor_ms=1e9)  # never re-bin on motion
    radius, el = 60.0, 0.2

    # bin once + compile the replay jit
    t0 = time.perf_counter()
    img = r.render_orbit(cloud, 0.0, el, radius, width=size, height=size)
    _ = np.asarray(jnp.ravel(img)[:1])
    log(f"first frame (bin + compiles): {time.perf_counter() - t0:.1f}s; "
        f"stats={r.stats}")
    # one replay to compile the replay path at a moved camera
    img = r.render_orbit(cloud, 1e-5, el, radius, width=size, height=size)
    _ = np.asarray(jnp.ravel(img)[:1])

    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(frames):
            az = 2.0 * np.pi * (i + 1) / frames + w * 1e-3
            img = r.render_orbit(cloud, az, el, radius, width=size, height=size)
        _ = np.asarray(jnp.ravel(img)[:1])
        best = min(best, (time.perf_counter() - t0) / frames)
    log(f"orbit replay throughput: {best * 1e3:.2f} ms/frame "
        f"({1.0 / best:.1f} FPS); stats={r.stats}")

    if os.environ.get("PROF_STAGES") == "1":
        # in-jit ablation of the pair-order replay frame: cumulative stages
        from bevy_gaussian_splatting_tpu.models.camera import (
            orbit_camera_device,
        )
        from bevy_gaussian_splatting_tpu.ops import rasterize_tile as rt
        from bevy_gaussian_splatting_tpu.ops import sort as sort_ops
        from bevy_gaussian_splatting_tpu.ops.project import project_gaussians
        from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
            pallas_composite_tiles,
        )

        settings = r.settings
        # grab the cached bins (pair-order mode appends cloud_pairs)
        bins = r._bins
        if len(bins) != 6:
            log("stage ablation needs the pair-order replay (BGS_REPLAY=pairs)")
            return 0
        g_s, valid_s, start, end, count, cloud_pairs = bins
        mt = jnp.eye(4, dtype=jnp.float32)
        bg = jnp.zeros((4,), jnp.float32)

        def splats_of(cloud_pairs, camera):
            bk = sort_ops.radix_depth_key(
                cloud_pairs.position, mt,
                camera.clip_from_view @ camera.view_from_world,
                camera.world_position,
                settings.radix_sort_depth_bits.bits,
            )
            splats = project_gaussians(cloud_pairs, camera, settings, mt)
            splats["mask"] = splats["mask"] & (bk != sort_ops.SENTINEL_KEY)
            return splats

        def stage_fn(which):
            def fn(cloud_pairs, orbit, start, count):
                camera = orbit_camera_device(orbit, size, size)
                splats = splats_of(cloud_pairs, camera)
                if which == "proj":
                    return splats["center_ndc"]
                cols = rt.pack_raster_param_cols(splats, settings, size, size)
                rows = jnp.stack(cols, axis=0)
                if which == "pack":
                    return rows
                return pallas_composite_tiles(
                    rows, start, count, settings, size, size, background=bg,
                    transposed_params=True,
                )

            return jax.jit(fn)

        orbit = jnp.asarray([0.3, el, radius, 0.0, 0.0, 0.0], jnp.float32)
        for which in ("proj", "pack", "full"):
            fn = stage_fn(which)
            out = fn(cloud_pairs, orbit, start, count)
            _ = np.asarray(jnp.ravel(out)[:1])
            bestw = float("inf")
            for _w in range(3):
                t0 = time.perf_counter()
                for i in range(8):
                    out = fn(cloud_pairs, orbit + i * 1e-6, start, count)
                _ = np.asarray(jnp.ravel(out)[:1])
                bestw = min(bestw, (time.perf_counter() - t0) / 8)
            log(f"replay stage [{which:<5}]: {bestw * 1e3:8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
