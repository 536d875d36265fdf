#!/usr/bin/env python
"""From-scratch multi-view 3DGS training (capability beyond the reference,
which is forward-only and delegates training to a sister project,
reference README.md:100).

Fits a randomly initialized cloud to orbit renders of the deterministic test
model using the standard 3DGS recipe: L1 + D-SSIM photometric loss, adam,
and periodic adaptive density control (clone/split/prune).  Prints the PSNR
trajectory and writes a side-by-side target/result image.

Env knobs: TRAIN_STEPS (default 300), TRAIN_VIEWS (6), TRAIN_N (256),
TRAIN_SIZE (64).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled
from bevy_gaussian_splatting_tpu.train.densify import (
    accumulate_stats,
    densify_and_prune,
    init_densify_state,
)
from bevy_gaussian_splatting_tpu.train.losses import gaussian_splatting_loss
from bevy_gaussian_splatting_tpu.utils.image import save_png


def orbit_cameras(n_views: int, radius: float, width: int, height: int):
    cams = []
    for i in range(n_views):
        a = 2.0 * np.pi * i / n_views
        eye = (radius * np.sin(a), 1.0, radius * np.cos(a))
        cams.append(
            bgs.Camera.create(eye=eye, target=(0, 0, 0), width=width, height=height)
        )
    return cams


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))


def main() -> int:
    steps = int(os.environ.get("TRAIN_STEPS", 300))
    n_views = int(os.environ.get("TRAIN_VIEWS", 6))
    n = int(os.environ.get("TRAIN_N", 256))
    W = H = int(os.environ.get("TRAIN_SIZE", 64))
    settings = bgs.CloudSettings(aabb=True)

    target_cloud = bgs.test_model_3d(seed=11)
    cams = orbit_cameras(n_views, radius=5.0, width=W, height=H)
    targets = [
        render_tiled(target_cloud, c, settings, width=W, height=H) for c in cams
    ]

    # random init inside the target's bounds, half the slots dead (densify
    # capacity); small isotropic scales, mid opacity
    rng = np.random.default_rng(0)
    live = n // 2
    lo, hi = (np.asarray(a) for a in target_cloud.compute_aabb())
    pv = np.zeros((n, 4), np.float32)
    pv[:live, :3] = rng.uniform(lo, hi, (live, 3))
    pv[:live, 3] = 1.0
    so = np.zeros((n, 4), np.float32)
    so[:live, :3] = 0.25
    so[:live, 3] = 0.5
    rot = np.zeros((n, 4), np.float32)
    rot[:, 0] = 1.0
    sh = np.zeros((n, target_cloud.spherical_harmonic.shape[1]), np.float32)
    sh[:live] = rng.normal(0.0, 0.2, (live, sh.shape[1])).astype(np.float32)
    cloud = bgs.Gaussian3dCloud(
        position_visibility=jnp.asarray(pv),
        spherical_harmonic=jnp.asarray(sh),
        rotation=jnp.asarray(rot),
        scale_opacity=jnp.asarray(so),
    )

    opt = optax.adam(1e-2)
    opt_state = opt.init(cloud)
    dstate = init_densify_state(n)

    @jax.jit
    def step(cloud, opt_state, dstate, camera, target):
        # the camera is a pytree of arrays, so one compiled step serves
        # every view
        def loss_for(c):
            img = render_tiled(
                c, camera, settings, width=W, height=H, differentiable=True
            )
            return gaussian_splatting_loss(img, target)

        value, grads = jax.value_and_grad(loss_for)(cloud)
        dstate = accumulate_stats(dstate, grads)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(cloud, updates), opt_state, dstate, value

    for i in range(steps):
        v = i % n_views
        cloud, opt_state, dstate, value = step(
            cloud, opt_state, dstate, cams[v], targets[v]
        )
        if (i + 1) % 100 == 0 and i + 1 < steps:
            cloud, dstate, stats = densify_and_prune(
                cloud, dstate, k_budget=n // 8, scene_extent=float(np.max(hi - lo))
            )
            # densify rewrites slots, so the per-slot adam moments no longer
            # describe their gaussians — reset them (the original recipe
            # zeroes moments for modified slots; full reset is the simple
            # safe form at this scale)
            opt_state = opt.init(cloud)
        if i % 50 == 0 or i == steps - 1:
            img0 = np.asarray(
                render_tiled(cloud, cams[0], settings, width=W, height=H)
            )
            p = psnr(img0, np.asarray(targets[0]))
            print(f"step {i:4d}  loss {float(value):.4e}  view0 PSNR {p:.2f} dB")

    final = np.asarray(render_tiled(cloud, cams[0], settings, width=W, height=H))
    side = np.concatenate([np.asarray(targets[0]), final], axis=1)
    out = os.environ.get("TRAIN_OUT", "/tmp/train_multiview.png")
    save_png(side, out)
    print(f"wrote {out} (target | trained)  final view0 PSNR "
          f"{psnr(final, np.asarray(targets[0])):.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
