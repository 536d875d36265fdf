#!/usr/bin/env python
"""2DGS surfel vs 3DGS debug scene (reference: tools/surfel_plane.rs).

Renders the same flattened-gaussian grid in 2DGS surfel mode and 3DGS mode
side by side — the BASELINE.json config-3 fixture.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_surfel_grid(n_side: int = 4, seed: int = 5):
    import jax.numpy as jnp
    import numpy as np

    import bevy_gaussian_splatting_tpu as bgs

    rng = np.random.default_rng(seed)
    n = n_side * n_side
    xs, ys = np.meshgrid(np.linspace(-2, 2, n_side), np.linspace(-2, 2, n_side))
    pos = np.stack([xs.ravel(), ys.ravel(), np.zeros(n)], axis=1).astype(np.float32)
    pv = np.concatenate([pos, np.ones((n, 1), np.float32)], axis=1)
    sh = np.zeros((n, 48), np.float32)
    sh[:, :3] = rng.uniform(-1.0, 1.5, (n, 3))
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    # surfels: third scale axis ~0 (flat disks)
    so = np.concatenate(
        [
            np.tile(np.array([[0.35, 0.35, 1e-3]], np.float32), (n, 1)),
            np.full((n, 1), 0.85, np.float32),
        ],
        axis=1,
    )
    return bgs.Gaussian3dCloud(
        position_visibility=jnp.asarray(pv),
        spherical_harmonic=jnp.asarray(sh),
        rotation=jnp.asarray(quat),
        scale_opacity=jnp.asarray(so),
    )


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output", default="surfel_plane.png")
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args(argv)

    import numpy as np

    import bevy_gaussian_splatting_tpu as bgs
    from bevy_gaussian_splatting_tpu.models.settings import GaussianMode
    from bevy_gaussian_splatting_tpu.render.api import render
    from bevy_gaussian_splatting_tpu.utils.image import save_png

    cloud = make_surfel_grid()
    cam = bgs.Camera.create(
        eye=(2.5, 2.0, 6.0), target=(0, 0, 0), width=args.size, height=args.size
    )
    img2d = np.asarray(
        render(cloud, cam, bgs.CloudSettings(gaussian_mode=GaussianMode.GAUSSIAN_2D))
    )
    img3d = np.asarray(
        render(cloud, cam, bgs.CloudSettings(gaussian_mode=GaussianMode.GAUSSIAN_3D))
    )
    save_png(np.concatenate([img2d, img3d], axis=1), args.output)
    print(f"wrote {args.output} (left: 2DGS surfel, right: 3DGS)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
