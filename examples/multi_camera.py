#!/usr/bin/env python
"""Multi-camera example (reference: examples/multi_camera.rs): two cameras
rendered as one batch, composed side by side."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.render.multi_camera import render_multi_camera
from bevy_gaussian_splatting_tpu.utils.image import save_png


def main() -> int:
    cloud = bgs.random_gaussians_3d_seeded(10_000, seed=0)
    cameras = [
        bgs.Camera.create(eye=(0.0, 1.5, 60.0), width=256, height=256),
        bgs.Camera.create(eye=(40.0, 10.0, 40.0), width=256, height=256),
    ]
    batch = np.asarray(render_multi_camera(cloud, cameras))
    save_png(np.concatenate(list(batch), axis=1), "multi_camera.png")
    print("wrote multi_camera.png (left/right viewports)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
