"""Adaptive density control (train/densify.py): static-shape clone/split/prune."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled
from bevy_gaussian_splatting_tpu.train import (
    accumulate_stats,
    densify_and_prune,
    init_densify_state,
)


def _np(x):
    return np.asarray(x)


CAM = bgs.Camera.create(eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0), width=64, height=64)
SETTINGS = bgs.CloudSettings()


def _with_capacity(cloud, capacity):
    """Grow the buffer to `capacity` with dead (opacity-0) rows."""
    n = len(cloud)
    pad = capacity - n

    def grow(a):
        return jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])

    return dataclasses.replace(
        cloud,
        position_visibility=grow(cloud.position_visibility),
        spherical_harmonic=grow(cloud.spherical_harmonic),
        rotation=grow(cloud.rotation),
        scale_opacity=grow(cloud.scale_opacity),
    )


class TestDensify:
    def _train_state(self, n=64, capacity=256):
        cloud = _with_capacity(bgs.random_gaussians_3d_seeded(n, seed=3), capacity)
        target = render_tiled(cloud, CAM, SETTINGS, width=64, height=64) * 0.7

        @jax.jit
        def grads(c):
            def loss(c):
                img = render_tiled(
                    c, CAM, SETTINGS, width=64, height=64, differentiable=True
                )
                return jnp.mean((img - target) ** 2)

            return jax.value_and_grad(loss)(c)

        return cloud, grads

    def test_densify_splits_and_clones_into_dead_slots(self):
        cloud, grads = self._train_state()
        state = init_densify_state(len(cloud))
        for _ in range(3):
            _, g = grads(cloud)
            state = accumulate_stats(state, g)
        live_before = int(jnp.sum(cloud.scale_opacity[:, 3] > 0))
        new_cloud, new_state, stats = densify_and_prune(
            cloud, state, k_budget=32, grad_threshold=0.0, scene_extent=10.0
        )
        live_after = int(stats["live"])
        assert int(stats["added"]) > 0
        assert live_after == live_before + int(stats["added"]) - int(stats["pruned"])
        assert int(stats["added"]) == int(stats["split"]) + int(stats["cloned"])
        # accumulators reset
        assert float(jnp.sum(new_state.grad_accum)) == 0.0
        # render still finite and non-empty
        img = render_tiled(new_cloud, CAM, SETTINGS, width=64, height=64)
        assert np.isfinite(_np(img)).all()
        assert (_np(img)[..., 3] > 0).any()

    def test_never_overwrites_live_gaussians(self):
        cloud, grads = self._train_state(n=250, capacity=256)  # only 6 dead slots
        state = init_densify_state(len(cloud))
        _, g = grads(cloud)
        state = accumulate_stats(state, g)
        new_cloud, _, stats = densify_and_prune(
            cloud, state, k_budget=64, grad_threshold=0.0, scene_extent=10.0,
            prune_opacity=0.0,
        )
        assert int(stats["added"]) <= 6
        # all original live rows still present (positions unchanged for
        # non-split parents; opacity preserved since prune disabled)
        live = _np(cloud.scale_opacity[:, 3] > 0)
        np.testing.assert_array_equal(
            _np(new_cloud.scale_opacity[:, 3] > 0)[live], True
        )

    def test_prune_kills_dim_gaussians(self):
        cloud, _ = self._train_state()
        so = cloud.scale_opacity
        so = so.at[0, 3].set(0.001)  # below prune threshold
        cloud = dataclasses.replace(cloud, scale_opacity=so)
        state = init_densify_state(len(cloud))
        state = state._replace(count=state.count + 1)  # pretend observed
        new_cloud, _, stats = densify_and_prune(
            cloud, state, k_budget=8, grad_threshold=1e9  # no densify
        )
        assert int(stats["added"]) == 0
        assert int(stats["pruned"]) >= 1
        assert float(new_cloud.scale_opacity[0, 3]) == 0.0
        assert float(new_cloud.position_visibility[0, 3]) == 0.0

    def test_densified_training_reduces_loss_further(self):
        # end-to-end: sparse start, train, densify, train more
        target_cloud = bgs.random_gaussians_3d_seeded(128, seed=8)
        target = render_tiled(target_cloud, CAM, SETTINGS, width=64, height=64)
        cloud = _with_capacity(bgs.random_gaussians_3d_seeded(32, seed=9), 256)

        @jax.jit
        def step(c):
            def loss(c):
                img = render_tiled(
                    c, CAM, SETTINGS, width=64, height=64, differentiable=True
                )
                return jnp.mean((img - target) ** 2)

            return jax.value_and_grad(loss)(c)

        def sgd(c, g, lr=2.0):
            return dataclasses.replace(
                c,
                position_visibility=c.position_visibility - lr * g.position_visibility,
                scale_opacity=c.scale_opacity - lr * g.scale_opacity,
                spherical_harmonic=c.spherical_harmonic - lr * g.spherical_harmonic,
            )

        state = init_densify_state(len(cloud))
        losses = []
        for i in range(6):
            l, g = step(cloud)
            losses.append(float(l))
            state = accumulate_stats(state, g)
            cloud = sgd(cloud, g)
        cloud, state, stats = densify_and_prune(
            cloud, state, k_budget=64, grad_threshold=0.0, scene_extent=10.0
        )
        assert int(stats["added"]) > 0
        for i in range(6):
            l, g = step(cloud)
            losses.append(float(l))
            cloud = sgd(cloud, g)
        assert losses[-1] < losses[0], losses
        assert all(np.isfinite(losses)), losses


class TestConvergenceQuality:
    """Standing training-quality floor (VERDICT r4 #3): the fixed-seed
    multiview fit must keep converging to its known PSNR.  Pointwise
    gradient-allclose tests can miss dynamics-level damage (a biased term
    that is tiny at the test point); this catches it."""

    def test_convergence_psnr_floor(self):
        from bevy_gaussian_splatting_tpu.train.quality import (
            convergence_psnr,
        )

        out = convergence_psnr(steps=60, size=48, n=192)
        # measured 17.78 dB on this protocol (deterministic on CPU);
        # VERDICT spec: fail if convergence degrades > 0.5 dB
        assert out["psnr_db"] >= 17.28, out
        # densify happened and training actually moved from init (~13.8 dB)
        assert out["psnr_db"] > 15.0

    def test_loss_usable_across_jits(self):
        """Regression: the SSIM window lru_cache captured a tracer when the
        first call happened under a jit trace, poisoning every later jit in
        the process (UnexpectedTracerError on the second training run)."""
        from bevy_gaussian_splatting_tpu.train.losses import (
            _gaussian_window,
            gaussian_splatting_loss,
        )

        _gaussian_window.cache_clear()
        a = jnp.zeros((32, 32, 4))
        b = jnp.ones((32, 32, 4)) * 0.5
        l1 = jax.jit(gaussian_splatting_loss)(a, b)
        l2 = jax.jit(lambda x, y: gaussian_splatting_loss(x, y) * 2.0)(a, b)
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))
