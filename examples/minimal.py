#!/usr/bin/env python
"""Minimal example (reference: examples/minimal.rs): generate a random cloud,
render it, write a PNG."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.render.api import render
from bevy_gaussian_splatting_tpu.utils.image import save_png


def main() -> int:
    cloud = bgs.random_gaussians_3d_seeded(10_000, seed=0)
    camera = bgs.Camera.create(eye=(0.0, 0.0, 60.0), width=512, height=512)
    image = render(cloud, camera)
    save_png(np.asarray(image), "minimal.png")
    print("wrote minimal.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
