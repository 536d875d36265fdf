#!/usr/bin/env python
"""Streaming + LOD flyby demo (the reference's declared src/stream intent).

Slices a cloud into a chunk grid, builds a per-chunk LOD chain, saves the
streaming scene, then flies a camera along +z: each frame updates chunk
residency by radius, picks each chunk's LOD level by distance, and renders
the assembled resident set.  Writes one PNG per frame.

Env knobs: FLY_N (20000), FLY_FRAMES (5), FLY_SIZE (128), FLY_OUT (/tmp).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled
from bevy_gaussian_splatting_tpu.stream import (
    build_lod_chain,
    concat_clouds,
    select_lod,
    slice_cloud,
)
from bevy_gaussian_splatting_tpu.utils.image import save_png


def main() -> int:
    n = int(os.environ.get("FLY_N", 20_000))
    frames = int(os.environ.get("FLY_FRAMES", 5))
    size = int(os.environ.get("FLY_SIZE", 128))
    out_dir = os.environ.get("FLY_OUT", tempfile.gettempdir())
    levels = 3

    cloud = bgs.random_gaussians_3d_seeded(n, seed=0)
    chunks = slice_cloud(cloud, grid=(2, 2, 2))
    chains = [build_lod_chain(c.cloud, levels=levels, ratio=0.3) for c in chunks]
    settings = bgs.CloudSettings()

    for f in range(frames):
        z = 120.0 - 18.0 * f  # fly toward the scene
        eye = (0.0, 0.0, z)
        cam = bgs.Camera.create(eye=eye, target=(0, 0, 0), width=size, height=size)
        picks = [
            select_lod(c.aabb_min, c.aabb_max, eye, levels, base_distance=40.0)
            for c in chunks
        ]
        resident = concat_clouds(
            [chains[i][lv] for i, lv in enumerate(picks)]
        ).pad(multiple=4096)
        img = np.asarray(
            render_tiled(resident, cam, settings, width=size, height=size)
        )
        path = os.path.join(out_dir, f"flyby_{f:02d}.png")
        save_png(img, path)
        counts = [len(chains[i][lv]) for i, lv in enumerate(picks)]
        print(
            f"frame {f}: z={z:5.1f} levels={picks} gaussians={sum(counts)} "
            f"-> {path}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
