#!/usr/bin/env python
"""AABB vs OBB bounding comparison scene (reference: tools/compare_aabb_obb.rs).

Renders a grid of anisotropic gaussians twice — axis-aligned quads vs
eigen-oriented quads — side by side into one PNG.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output", default="compare_aabb_obb.png")
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    import bevy_gaussian_splatting_tpu as bgs
    from bevy_gaussian_splatting_tpu.render.api import render
    from bevy_gaussian_splatting_tpu.utils.image import save_png

    rng = np.random.default_rng(4)
    n = 16
    xs, ys = np.meshgrid(np.linspace(-2, 2, 4), np.linspace(-2, 2, 4))
    pos = np.stack([xs.ravel(), ys.ravel(), np.zeros(n)], axis=1).astype(np.float32)
    pv = np.concatenate([pos, np.ones((n, 1), np.float32)], axis=1)
    sh = np.zeros((n, 48), np.float32)
    sh[:, :3] = rng.uniform(-1.5, 1.5, (n, 3))
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    so = np.concatenate(
        [
            np.tile(np.array([[0.4, 0.1, 0.02]], np.float32), (n, 1)),
            np.full((n, 1), 0.9, np.float32),
        ],
        axis=1,
    )
    cloud = bgs.Gaussian3dCloud(
        position_visibility=jnp.asarray(pv),
        spherical_harmonic=jnp.asarray(sh),
        rotation=jnp.asarray(quat),
        scale_opacity=jnp.asarray(so),
    )

    cam = bgs.Camera.create(
        eye=(0, 0, 6), target=(0, 0, 0), width=args.size, height=args.size
    )
    obb = np.asarray(render(cloud, cam, bgs.CloudSettings(aabb=False)))
    aabb = np.asarray(render(cloud, cam, bgs.CloudSettings(aabb=True)))
    save_png(np.concatenate([aabb, obb], axis=1), args.output)
    print(f"wrote {args.output} (left: AABB, right: OBB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
