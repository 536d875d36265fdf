#!/usr/bin/env python
"""Differentiable-rendering example (new capability beyond the reference):
recover perturbed gaussian positions by gradient descent through the
hand-derived Pallas backward kernel."""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled
from bevy_gaussian_splatting_tpu.utils.image import save_png


def main() -> int:
    W = H = 64
    target_cloud = bgs.test_model_3d(seed=11)
    cam = bgs.Camera.create(eye=(0, 1.5, 5), width=W, height=H)
    settings = bgs.CloudSettings(aabb=True)
    target = render_tiled(target_cloud, cam, settings, width=W, height=H)

    cloud = dataclasses.replace(
        target_cloud,
        position_visibility=target_cloud.position_visibility
        + jnp.array([0.25, -0.15, 0.1, 0.0]),
    )
    opt = optax.adam(2e-2)
    state = opt.init(cloud)

    from bevy_gaussian_splatting_tpu.train.losses import (
        gaussian_splatting_loss,
    )

    @jax.jit
    def step(cloud, state):
        def loss(c):
            img = render_tiled(
                c, cam, settings, width=W, height=H,
                differentiable=True, compositor="pallas",
            )
            # standard 3DGS photometric objective: 0.8 L1 + 0.2 (1 - SSIM)
            return gaussian_splatting_loss(img, target)

        value, grads = jax.value_and_grad(loss)(cloud)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(cloud, updates), state, value

    for i in range(60):
        cloud, state, value = step(cloud, state)
        if i % 10 == 0:
            print(f"step {i:3d}  loss {float(value):.3e}")

    final = render_tiled(cloud, cam, settings, width=W, height=H)
    save_png(
        np.concatenate([np.asarray(final), np.asarray(target)], axis=1),
        "training.png",
    )
    print("wrote training.png (optimized | target)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
