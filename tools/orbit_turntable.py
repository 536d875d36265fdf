#!/usr/bin/env python
"""Orbit turntable renderer — the interactive viewer's pan-orbit camera as a
batch render (reference: viewer/viewer.rs pan-orbit + screenshot hotkey).

Renders N camera positions on a circular orbit around the cloud into a
contact sheet and (optionally) an animated GIF.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-cloud", default=None)
    p.add_argument("--gaussian-count", type=int, default=5000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--test-model", action="store_true")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--radius", type=float, default=None,
                   help="orbit radius (default: 3x cloud extent)")
    p.add_argument("--elevation", type=float, default=0.3,
                   help="camera height as a fraction of radius")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--gif", action="store_true", help="also write a GIF")
    p.add_argument("-o", "--output", default="turntable.png")
    args = p.parse_args(argv)

    import numpy as np

    import bevy_gaussian_splatting_tpu as bgs
    from bevy_gaussian_splatting_tpu.render.multi_camera import render_multi_camera
    from bevy_gaussian_splatting_tpu.utils.image import save_png, to_srgb_u8

    if args.input_cloud:
        from bevy_gaussian_splatting_tpu.io.loader import load_cloud

        cloud = load_cloud(args.input_cloud)
    elif args.test_model:
        cloud = bgs.test_model_3d()
    else:
        cloud = bgs.random_gaussians_3d_seeded(args.gaussian_count, args.seed)

    mn, mx = cloud.compute_aabb()
    center = (np.asarray(mn) + np.asarray(mx)) / 2.0
    extent = float(np.abs(np.asarray(mx) - np.asarray(mn)).max())
    radius = args.radius or max(3.0 * extent, 1.0)

    cams = []
    for i in range(args.frames):
        theta = 2.0 * np.pi * i / args.frames
        eye = center + radius * np.array(
            [np.cos(theta), args.elevation, np.sin(theta)]
        )
        cams.append(
            bgs.Camera.create(
                eye=tuple(eye), target=tuple(center),
                width=args.size, height=args.size,
            )
        )

    batch = np.asarray(render_multi_camera(cloud, cams))
    save_png(np.concatenate(list(batch), axis=1), args.output)
    print(f"wrote {args.output} ({args.frames} frames)")

    if args.gif:
        from PIL import Image

        frames = [Image.fromarray(to_srgb_u8(f)) for f in batch]
        gif_path = os.path.splitext(args.output)[0] + ".gif"
        frames[0].save(
            gif_path, save_all=True, append_images=frames[1:], duration=120, loop=0
        )
        print(f"wrote {gif_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
