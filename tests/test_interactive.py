"""Frame-coherent serving (render/api.InteractiveRenderer): the reference's
sort-throttle semantics (src/sort/mod.rs:76-86, 153-194) — re-bin only on
throttled camera movement, replay frames reuse the cached binning artifacts
with fresh per-frame projection."""

import numpy as np

import jax.numpy as jnp

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.render.api import InteractiveRenderer, render


def _np(x):
    return np.asarray(x)


def _scene(n=1024, seed=0):
    return bgs.random_gaussians_3d_seeded(n, seed=seed)


def _cam(eye, width=64, height=64):
    return bgs.Camera.create(
        eye=eye, target=(0.0, 0.0, 0.0), width=width, height=height
    )


class TestInteractiveRenderer:
    def test_fresh_bins_match_full_pipeline(self):
        cloud = _scene()
        cam = _cam((0.0, 0.0, 60.0))
        r = InteractiveRenderer()
        got = _np(r.render(cloud, cam))
        want = _np(render(cloud, cam, impl="tiled"))
        np.testing.assert_allclose(got, want, atol=2e-6)
        assert r.stats["bins"] == 1 and r.stats["replays"] == 0

    def test_replay_same_camera_is_exact_and_cached(self):
        cloud = _scene()
        cam = _cam((0.0, 0.0, 60.0))
        r = InteractiveRenderer()
        first = _np(r.render(cloud, cam))
        second = _np(r.render(cloud, cam))
        np.testing.assert_array_equal(first, second)
        assert r.stats == {"bins": 1, "replays": 1, "oneshots": 0}

    def test_stale_bins_after_subthreshold_motion(self):
        """Within the throttle period a moved camera replays the STALE bins
        with fresh projection; for sub-threshold motion the image must stay
        close to a fresh-bin render (the reference's staleness class)."""
        cloud = _scene()
        cam0 = _cam((0.0, 0.0, 60.0))
        r = InteractiveRenderer(period_floor_ms=1e9)  # never re-bin on motion
        r.render(cloud, cam0)
        cam1 = _cam((1e-4, 0.0, 60.0))
        stale = _np(r.render(cloud, cam1))
        assert r.stats["replays"] == 1  # moved but throttled -> replay
        fresh = _np(render(cloud, cam1, impl="tiled"))
        assert np.isfinite(stale).all()
        np.testing.assert_allclose(stale, fresh, atol=2e-3)

    def test_elapsed_motion_rebins(self):
        cloud = _scene()
        r = InteractiveRenderer(period_floor_ms=0.0)
        r.render(cloud, _cam((0.0, 0.0, 60.0)))
        r.period_ms = 0.0  # first call resets to the floor; force immediate
        img = _np(r.render(cloud, _cam((5.0, 0.0, 60.0))))
        assert r.stats["bins"] == 2
        want = _np(render(cloud, _cam((5.0, 0.0, 60.0)), impl="tiled"))
        np.testing.assert_allclose(img, want, atol=2e-6)

    def test_time_change_rebins(self):
        cloud = bgs.random_gaussians_4d_seeded(512, seed=1)
        settings = bgs.CloudSettings(
            gaussian_mode=bgs.GaussianMode.GAUSSIAN_4D
        )
        cam = _cam((0.0, 0.0, 60.0))
        r = InteractiveRenderer(settings, period_floor_ms=1e9)
        r.render(cloud, cam, time=0.0)
        # temporal frames route to the FUSED one-shot pipeline (a sweep
        # re-bins every frame; the bin+replay split costs ~5.5x at bench
        # scale) — still re-sorted per frame, the reference 4D semantics
        img = _np(r.render(cloud, cam, time=0.25))
        assert r.stats["bins"] == 1 and r.stats["oneshots"] == 1
        want = _np(
            render(cloud, cam, settings.replace(time=0.25), impl="tiled")
        )
        assert np.isfinite(img).all()
        np.testing.assert_allclose(img, want, atol=2e-6)
        # settled time: ONE re-bin, bit-identical to the one-shot frame,
        # then replays
        img2 = _np(r.render(cloud, cam, time=0.25))
        assert r.stats["bins"] == 2 and r.stats["oneshots"] == 1
        np.testing.assert_array_equal(img2, img)
        img3 = _np(r.render(cloud, cam, time=0.25))
        assert r.stats["replays"] == 1
        np.testing.assert_array_equal(img3, img2)

    def test_cloud_change_rebins(self):
        cam = _cam((0.0, 0.0, 60.0))
        r = InteractiveRenderer(period_floor_ms=1e9)
        r.render(_scene(seed=0), cam)
        c2 = _scene(seed=3)
        img = _np(r.render(c2, cam))
        assert r.stats["bins"] == 2
        np.testing.assert_allclose(
            img, _np(render(c2, cam, impl="tiled")), atol=2e-6
        )


class TestPairOrderReplay:
    def test_pair_order_matches_gather_replay_bitwise(self):
        """The pair-order replay (project/SH/pack on pair-ordered cloud
        rows) must reproduce the gather replay EXACTLY: every per-row op is
        elementwise, so duplicated rows compute the per-gaussian values
        bit-for-bit."""
        import os

        cloud = _scene()
        cam0 = _cam((0.0, 0.0, 60.0))
        cam1 = _cam((1e-4, 0.0, 60.0))  # replay with stale bins
        frames = {}
        for mode in ("gather", "pairs"):
            os.environ["BGS_REPLAY"] = mode
            try:
                r = InteractiveRenderer(period_floor_ms=1e9)
                r.render(cloud, cam0)
                frames[mode] = _np(r.render(cloud, cam1))
                assert r.stats == {"bins": 1, "replays": 1, "oneshots": 0}
            finally:
                del os.environ["BGS_REPLAY"]
        np.testing.assert_array_equal(frames["pairs"], frames["gather"])

    def test_pair_order_replay_is_default(self):
        from bevy_gaussian_splatting_tpu.render.api import (
            make_replay_pipeline,
        )

        import bevy_gaussian_splatting_tpu as bgs

        pipes = make_replay_pipeline(bgs.CloudSettings(), 64, 64, "xla", 8192)
        cloud = _scene(512)
        cam = _cam((0.0, 0.0, 60.0))
        bins = pipes[0](cloud, cam, jnp.eye(4), jnp.float32(0.0))
        assert len(bins) == 6  # bins include the pair-ordered cloud rows


class TestRenderOrbit:
    def test_orbit_matches_host_camera_render(self):
        """The on-device orbit camera must reproduce the host-built Camera
        path (identical math modulo fp association: per-pixel differences
        stay tiny and almost all pixels match tightly)."""
        import math

        cloud = _scene()
        az, el, radius = 0.35, 0.2, 60.0
        r = InteractiveRenderer()
        got = _np(
            r.render_orbit(cloud, az, el, radius, width=64, height=64)
        )
        eye = (
            radius * math.cos(el) * math.sin(az),
            radius * math.sin(el),
            radius * math.cos(el) * math.cos(az),
        )
        cam = _cam(eye)
        want = _np(render(cloud, cam, impl="tiled"))
        diff = np.abs(got - want)
        assert float(diff.mean()) < 1e-3
        assert float((diff < 1e-2).mean()) > 0.995

    def test_orbit_honors_non_tiled_impl(self):
        """impl='oracle' must route render_orbit through the one-shot
        oracle path (ADVICE r3: it silently used the tiled replay)."""
        import math

        cloud = _scene(512)
        r = InteractiveRenderer(impl="oracle")
        az, el, radius = 0.3, 0.2, 60.0
        got = _np(r.render_orbit(cloud, az, el, radius, width=64, height=64))
        eye = (
            radius * math.cos(el) * math.sin(az),
            radius * math.sin(el),
            radius * math.cos(el) * math.cos(az),
        )
        want = _np(render(cloud, _cam(eye), impl="oracle"))
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert r.stats == {"bins": 0, "replays": 0, "oneshots": 0}  # no replay pipeline

    def test_orbit_replay_reuses_bins(self):
        cloud = _scene()
        r = InteractiveRenderer(period_floor_ms=1e9)
        r.render_orbit(cloud, 0.0, 0.3, 60.0, width=64, height=64)
        img = _np(
            r.render_orbit(cloud, 1e-4, 0.3, 60.0, width=64, height=64)
        )
        assert r.stats == {"bins": 1, "replays": 1, "oneshots": 0}
        assert np.isfinite(img).all()
