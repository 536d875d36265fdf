"""Auxiliary subsystem tests: visualize_bounding_box, sort throttle,
training checkpoints, turntable tool."""

import subprocess
import sys
import time

import jax.numpy as jnp
import numpy as np

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.ops.rasterize_ref import render_oracle
from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled
from bevy_gaussian_splatting_tpu.ops.sort import SortSchedule
from bevy_gaussian_splatting_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _np(x):
    return np.asarray(x)


class TestVisualizeBoundingBox:
    def test_green_borders_and_parity(self):
        cloud = bgs.test_model_3d(seed=2)
        cam = bgs.Camera.create(eye=(0, 1.5, 5), width=64, height=64)
        for s in (
            bgs.CloudSettings(visualize_bounding_box=True),
            bgs.CloudSettings(aabb=True, visualize_bounding_box=True),
        ):
            o = _np(render_oracle(cloud, cam, s))
            t = _np(render_tiled(cloud, cam, s))
            np.testing.assert_allclose(t, o, atol=2e-5)
            green = ((o[..., 1] > 0.9) & (o[..., 3] > 0.9)).sum()
            assert green > 50, green

    def test_off_by_default(self):
        cloud = bgs.test_model_3d(seed=2)
        cam = bgs.Camera.create(eye=(0, 1.5, 5), width=64, height=64)
        o = _np(render_oracle(cloud, cam, bgs.CloudSettings()))
        assert ((o[..., 1] > 0.9) & (o[..., 3] > 0.9)).sum() == 0


class TestSortSchedule:
    def test_throttle_policy(self):
        cloud = bgs.random_gaussians_3d_seeded(100, seed=1)
        sched = SortSchedule(period_ms=1000.0)
        eye0 = np.array([0.0, 0.0, 50.0])
        mt = np.eye(4)
        o1 = sched.maybe_sort(cloud.position, mt, eye0, now_ms=0.0)
        assert o1 is not None and len(o1) == 100
        # same camera: cached even after the period
        o2 = sched.maybe_sort(cloud.position, mt, eye0, now_ms=5000.0)
        assert o2 is o1
        # moved camera but inside the period: cached
        eye1 = np.array([10.0, 0.0, 50.0])
        o3 = sched.maybe_sort(cloud.position, mt, eye1, now_ms=500.0)
        assert o3 is o1
        # moved camera past the period: re-sorts
        o4 = sched.maybe_sort(cloud.position, mt, eye1, now_ms=1500.0)
        assert o4 is not o1
        assert sched.period_ms >= 1000.0  # reference floor


class TestCheckpoint:
    def test_roundtrip_with_optimizer(self, tmp_path):
        import optax

        cloud = bgs.random_gaussians_3d_seeded(32, seed=5)
        opt = optax.adam(1e-2)
        state = opt.init(cloud)
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, cloud, state, step=7, extra={"loss": 0.5})

        template = opt.init(cloud)
        cloud2, state2, step, extra = load_checkpoint(path, template)
        assert step == 7
        assert float(extra["loss"]) == 0.5
        np.testing.assert_array_equal(
            _np(cloud2.position_visibility), _np(cloud.position_visibility)
        )
        for a, b in zip(
            __import__("jax").tree.leaves(state), __import__("jax").tree.leaves(state2)
        ):
            np.testing.assert_array_equal(_np(a), _np(b))

    def test_cloud_only(self, tmp_path):
        cloud = bgs.random_gaussians_4d_seeded(16, seed=5)
        path = str(tmp_path / "c.npz")
        save_checkpoint(path, cloud)
        cloud2, state, step, extra = load_checkpoint(path)
        assert state is None and step == 0
        assert type(cloud2) is type(cloud)
        np.testing.assert_array_equal(
            _np(cloud2.spherindrical_harmonic), _np(cloud.spherindrical_harmonic)
        )


class TestTurntable:
    def test_cli(self, tmp_path):
        import os

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        out = str(tmp_path / "t.png")
        r = subprocess.run(
            [sys.executable, "tools/orbit_turntable.py", "--test-model",
             "--frames", "4", "--size", "64", "-o", out],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stderr
        from bevy_gaussian_splatting_tpu.utils.image import load_png

        img = load_png(out)
        assert img.shape == (64, 256, 4)
        # orbit frames differ
        f0, f2 = img[:, :64], img[:, 128:192]
        assert not np.allclose(f0, f2)


class TestTraceDiagnostics:
    """utils/trace.py — FPS EMA (FrameTimeDiagnostics analogue) + spans."""

    def test_frame_diagnostics_ema(self):
        import time as _t

        from bevy_gaussian_splatting_tpu.utils.trace import FrameDiagnostics

        d = FrameDiagnostics(smoothing=5)
        assert d.tick() is None
        for _ in range(6):
            _t.sleep(0.002)
            ema = d.tick()
        assert ema is not None and 0.5 < ema < 100.0
        assert d.fps and d.fps > 5.0
        assert d.frames == 7

    def test_stage_timer_spans(self):
        import time as _t

        from bevy_gaussian_splatting_tpu.utils.trace import StageTimer

        t = StageTimer()
        for _ in range(2):
            with t.span("a"):
                _t.sleep(0.001)
        with t.span("b"):
            pass
        assert t.counts == {"a": 2, "b": 1}
        assert t.totals_ms["a"] >= 2.0 * 0.9
        assert "a=" in t.report() and "b=" in t.report()
