"""Streaming / LOD layer tests (the reference's src/stream + LOD intent,
implemented for real here — SURVEY.md §5 "long axis" notes)."""

import numpy as np
import pytest

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.stream import (
    StreamingCloudScene,
    build_lod_chain,
    concat_clouds,
    select_lod,
    slice_cloud,
)
from bevy_gaussian_splatting_tpu.stream.scene import save_streaming_scene


def _np(x):
    return np.asarray(x)


CLOUD = bgs.random_gaussians_3d_seeded(500, seed=3)


class TestSlice:
    def test_partition_exact(self):
        chunks = slice_cloud(CLOUD, grid=(2, 2, 2))
        assert sum(len(c) for c in chunks) == len(CLOUD)
        # every member position inside its chunk AABB
        for ch in chunks:
            p = _np(ch.cloud.position)
            assert (p >= ch.aabb_min - 1e-6).all()
            assert (p <= ch.aabb_max + 1e-6).all()

    def test_concat_roundtrip(self):
        chunks = slice_cloud(CLOUD, grid=(2, 1, 2))
        merged = concat_clouds([c.cloud for c in chunks])
        assert len(merged) == len(CLOUD)
        # same multiset of gaussians: compare position-sorted rows
        a = _np(CLOUD.position_visibility)
        b = _np(merged.position_visibility)
        ka = np.lexsort(a.T)
        kb = np.lexsort(b.T)
        np.testing.assert_allclose(a[ka], b[kb], rtol=0, atol=0)

    def test_render_parity_after_slice(self):
        # rendering the concatenated chunks == rendering the original
        # (order differs -> tiny blend reassociation tolerance)
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled

        cam = bgs.Camera.create(
            eye=(0, 0, 60.0), target=(0, 0, 0), width=64, height=64
        )
        chunks = slice_cloud(CLOUD, grid=(2, 2, 1))
        merged = concat_clouds([c.cloud for c in chunks])
        s = bgs.CloudSettings()
        a = _np(render_tiled(CLOUD, cam, s, width=64, height=64))
        b = _np(render_tiled(merged, cam, s, width=64, height=64))
        np.testing.assert_allclose(b, a, atol=3e-5)


class TestLod:
    def test_chain_sizes_and_importance(self):
        chain = build_lod_chain(CLOUD, levels=3, ratio=0.25)
        assert len(chain) == 3
        assert len(chain[0]) == len(CLOUD)
        assert len(chain[1]) == max(1, round(len(CLOUD) * 0.25))
        assert len(chain[2]) == max(1, round(len(CLOUD) * 0.0625))
        # level 1 keeps the top-score gaussians
        from bevy_gaussian_splatting_tpu.stream.lod import importance_scores

        scores = importance_scores(CLOUD)
        kept = set(np.argsort(-scores)[: len(chain[1])])
        lv1_pos = {tuple(r) for r in _np(chain[1].position).round(6)}
        src_pos = [tuple(r) for r in _np(CLOUD.position).round(6)]
        for i in kept:
            assert src_pos[i] in lv1_pos

    def test_compensation_bounded(self):
        chain = build_lod_chain(CLOUD, levels=2, ratio=0.1, compensate=True)
        op = _np(chain[1].opacity)
        assert (op <= 1.0 + 1e-6).all()
        # compensated level carries more opacity mass than the raw subset
        raw = build_lod_chain(CLOUD, levels=2, ratio=0.1, compensate=False)
        assert op.sum() >= _np(raw[1].opacity).sum() - 1e-6

    def test_select_lod_doubling(self):
        lo, hi = np.zeros(3), np.ones(3)
        assert select_lod(lo, hi, (0.5, 0.5, 0.5), 4, base_distance=2.0) == 0
        assert select_lod(lo, hi, (0.0, 0.0, 2.5), 4, base_distance=2.0) == 0
        assert select_lod(lo, hi, (0.0, 0.0, 4.0), 4, base_distance=2.0) == 1
        assert select_lod(lo, hi, (0.0, 0.0, 9.0), 4, base_distance=2.0) == 3
        assert select_lod(lo, hi, (0.0, 0.0, 1e6), 4, base_distance=2.0) == 3


class TestStreamingScene:
    def _scene_dir(self, tmp_path):
        chunks = slice_cloud(CLOUD, grid=(3, 1, 1))
        save_streaming_scene(chunks, str(tmp_path))
        return chunks

    def test_manifest_roundtrip(self, tmp_path):
        chunks = self._scene_dir(tmp_path)
        scene = StreamingCloudScene(str(tmp_path), radius=1e9, background=False)
        assert len(scene.entries) == len(chunks)
        scene.update((0.0, 0.0, 0.0))
        scene.wait_idle()
        assert scene.resident_ids() == list(range(len(chunks)))
        merged = scene.resident_cloud(bucket=False)
        assert len(merged) == len(CLOUD)

    def test_radius_prefetch_and_evict(self, tmp_path):
        self._scene_dir(tmp_path)
        scene = StreamingCloudScene(
            str(tmp_path), radius=2.0, evict_factor=1.5, background=False
        )
        # positions span roughly [-16, 16] in x; camera near the -x block
        scene.update((-16.0, 0.0, 0.0))
        scene.wait_idle()
        near = set(scene.resident_ids())
        assert near, "nothing resident near the -x end"
        assert len(near) < len(scene.entries), "radius should exclude far chunks"
        # move to +x: far chunks evicted, new ones loaded
        scene.update((16.0, 0.0, 0.0))
        scene.wait_idle()
        after = set(scene.resident_ids())
        assert after and after != near

    def test_background_thread(self, tmp_path):
        self._scene_dir(tmp_path)
        scene = StreamingCloudScene(str(tmp_path), radius=1e9, background=True)
        try:
            scene.update((0.0, 0.0, 0.0))
            scene.wait_idle()
            assert len(scene.resident_ids()) == len(scene.entries)
            cloud = scene.resident_cloud()
            # bucketed: padded to a power of two >= 256
            assert len(cloud) >= len(CLOUD)
            assert (len(cloud) & (len(cloud) - 1)) == 0
        finally:
            scene.close()

    def test_viewer_serves_streaming_scene(self, tmp_path):
        # end-to-end HTTP drive: the interactive viewer refreshes chunk
        # residency per frame and serves a PNG of the resident set
        import os
        import signal
        import subprocess
        import time
        import urllib.request

        self._scene_dir(tmp_path)
        env = dict(
            os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS=""
        )
        port = 8000 + (os.getpid() % 2000)
        proc = subprocess.Popen(
            [
                "python", "-m", "bevy_gaussian_splatting_tpu.viewer.serve",
                "--input-stream", str(tmp_path), "--stream-radius", "1e9",
                "--eye", "0", "0", "60", "--width", "64", "--height", "64",
                "--port", str(port),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, start_new_session=True,
        )
        try:
            png = None
            deadline = time.monotonic() + 240
            while time.monotonic() < deadline:
                time.sleep(2)
                if proc.poll() is not None:
                    raise AssertionError(
                        "viewer exited: " + proc.stdout.read()[-1500:]
                    )
                try:
                    png = urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/frame?az=0&el=0.2&r=60",
                        timeout=10,
                    ).read()
                    break
                except Exception:
                    continue
            assert png is not None and png[:4] == b"\x89PNG"
        finally:
            os.killpg(proc.pid, signal.SIGTERM)
            proc.wait(timeout=10)

    def test_lod_render_close_at_distance(self, tmp_path):
        # a far camera renders the decimated level close to the full cloud
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled

        chain = build_lod_chain(CLOUD, levels=2, ratio=0.3)
        cam = bgs.Camera.create(
            eye=(0, 0, 220.0), target=(0, 0, 0), width=64, height=64
        )
        s = bgs.CloudSettings()
        full = _np(render_tiled(chain[0], cam, s, width=64, height=64))
        lod = _np(render_tiled(chain[1], cam, s, width=64, height=64))
        # coarse level is an approximation: bulk of pixels must stay close
        err = np.abs(full - lod)
        assert err.mean() < 0.02, err.mean()
