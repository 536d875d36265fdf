"""URL/base64 asset ingestion + viewer selection interactions.

Reference: input parsing viewer/viewer.rs:84-137 (url-safe base64 +
percent-decoding, unit tests :796-813), bevy web_asset http loading, and the
viewer selection hotkeys / SaveSelectionEvent (viewer/viewer.rs:611-677,
src/query/select.rs:118-176)."""

import os
import signal
import subprocess
import threading
import time
import urllib.request
from functools import partial
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.io.loader import (
    fetch_bytes,
    is_url,
    load_any,
    resolve_input,
    save_cloud,
)


class TestResolveInput:
    def test_decodes_percent_encoded_input_url(self):
        # viewer.rs:801-806
        encoded = "https%3A%2F%2Fmitchell.mosure.me%2Ftrellis.glb"
        assert resolve_input(encoded) == "https://mitchell.mosure.me/trellis.glb"

    def test_keeps_plain_relative_path(self):
        # viewer.rs:808-813
        assert resolve_input("trellis.glb") == "trellis.glb"

    def test_decodes_base64_url(self):
        import base64

        url = "https://example.com/scene.gcloud"
        encoded = base64.urlsafe_b64encode(url.encode()).decode()
        assert resolve_input(encoded) == url

    def test_is_url(self):
        assert is_url("https://x/y.ply") and is_url("http://x/y.ply")
        assert not is_url("/tmp/y.ply")


@pytest.fixture
def http_dir(tmp_path):
    handler = partial(SimpleHTTPRequestHandler, directory=str(tmp_path))
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield tmp_path, f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


class TestHttpIngestion:
    def test_load_cloud_from_url(self, http_dir):
        tmp_path, base = http_dir
        cloud = bgs.random_gaussians_3d_seeded(40, seed=1)
        save_cloud(cloud, str(tmp_path / "c.gcloud"))
        out = load_any(f"{base}/c.gcloud")
        np.testing.assert_array_equal(
            np.asarray(out.position_visibility), np.asarray(cloud.position_visibility)
        )

    def test_load_scene_from_base64_url(self, http_dir):
        import base64

        from bevy_gaussian_splatting_tpu.io.scene import (
            write_khr_gaussian_scene_glb,
        )

        tmp_path, base = http_dir
        cloud = bgs.random_gaussians_3d_seeded(16, seed=2)
        write_khr_gaussian_scene_glb(
            [("c", cloud, np.eye(4, dtype=np.float32))], str(tmp_path / "s.glb")
        )
        url = f"{base}/s.glb"
        encoded = base64.urlsafe_b64encode(url.encode()).decode()
        scene = load_any(encoded)
        assert len(scene.clouds) == 1
        assert len(scene.clouds[0].cloud) == 16

    def test_fetch_cache(self, http_dir, tmp_path):
        tmp, base = http_dir
        (tmp / "a.bin").write_bytes(b"hello")
        cache = str(tmp_path / "cache")
        a = fetch_bytes(f"{base}/a.bin", cache_dir=cache)
        # mutate the origin; the cached copy must be served
        (tmp / "a.bin").write_bytes(b"changed")
        b = fetch_bytes(f"{base}/a.bin", cache_dir=cache)
        assert a == b == b"hello"


class TestGallery:
    def test_build_and_serve_gallery(self, tmp_path):
        """tools/build_www.py renders manifest thumbnails + generates the
        gallery page; the viewer serves it and /example/<id> switches the
        live scene (reference: tools/build_www.sh + www/examples gallery)."""
        import json as _json
        import sys

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(bgs.__file__)))
        manifest = {
            "schema_version": 1,
            "examples": [
                {
                    "id": "test-model",
                    "title": "test model",
                    "description": "deterministic corner cloud",
                    "tags": ["test"],
                    "thumbnail": "thumbnails/test-model.png",
                    "args": ["--test-model", "--eye", "1.2", "1.5", "3"],
                },
                {
                    "id": "seeded",
                    "title": "seeded",
                    "description": "seeded random cloud",
                    "tags": ["3d"],
                    "thumbnail": "thumbnails/seeded.png",
                    "args": ["--gaussian-count", "500", "--seed", "7",
                             "--eye", "0", "0", "60"],
                },
            ],
        }
        mpath = tmp_path / "examples.json"
        mpath.write_text(_json.dumps(manifest))
        www = tmp_path / "www"
        env = dict(
            os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
            PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        r = subprocess.run(
            [sys.executable, os.path.join(repo_root, "tools", "build_www.py"),
             "--manifest", str(mpath), "--out", str(www), "--size", "64"],
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert (www / "index.html").exists()
        assert (www / "thumbnails" / "test-model.png").exists()
        assert (www / "examples" / "examples.json").exists()
        page = (www / "index.html").read_text()
        assert "/example/test-model" in page and "seeded random cloud" in page

        # serve it and drive the example switch over HTTP
        port = 8000 + ((os.getpid() + 31) % 2000)
        proc = subprocess.Popen(
            [sys.executable, "-m", "bevy_gaussian_splatting_tpu.viewer.serve",
             "--test-model", "--width", "64", "--height", "64",
             "--port", str(port), "--gallery", str(www)],
            cwd=str(tmp_path), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            start_new_session=True,
        )

        def get(route):
            return urllib.request.urlopen(
                f"http://127.0.0.1:{port}{route}", timeout=15
            )

        try:
            deadline = time.monotonic() + 240
            while time.monotonic() < deadline:
                time.sleep(2)
                if proc.poll() is not None:
                    raise AssertionError(
                        "viewer exited: " + proc.stdout.read()[-1500:]
                    )
                try:
                    get("/info")
                    break
                except Exception:
                    continue
            body = get("/gallery").read().decode()
            assert "example gallery" in body
            png = get("/thumbnails/test-model.png").read()
            assert png[:4] == b"\x89PNG"
            # switch the live scene to the seeded example (302 -> /)
            get("/example/seeded")
            import json as _j

            info = _j.loads(get("/info").read())
            assert info["gaussians"] == 500
            frame = get("/frame?az=0&el=0.3&r=60").read()
            assert frame[:4] == b"\x89PNG"
        finally:
            os.killpg(proc.pid, signal.SIGTERM)
            proc.wait(timeout=10)


class TestViewerSelection:
    def test_http_selection_drive(self, tmp_path):
        """Drive select -> save -> invert -> clear over HTTP; the subset lands
        in live_output.gcloud (the reference's SaveSelectionEvent filename)."""
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(bgs.__file__)))
        env = dict(
            os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
            PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        port = 8000 + ((os.getpid() + 7) % 2000)
        proc = subprocess.Popen(
            [
                "python", "-m", "bevy_gaussian_splatting_tpu.viewer.serve",
                "--test-model", "--width", "64", "--height", "64",
                "--port", str(port),
            ],
            cwd=str(tmp_path), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            start_new_session=True,
        )

        def get(route):
            return urllib.request.urlopen(
                f"http://127.0.0.1:{port}{route}", timeout=10
            ).read().decode()

        try:
            deadline = time.monotonic() + 240
            up = False
            while time.monotonic() < deadline:
                time.sleep(2)
                if proc.poll() is not None:
                    raise AssertionError(
                        "viewer exited: " + proc.stdout.read()[-1500:]
                    )
                try:
                    get("/info")
                    up = True
                    break
                except Exception:
                    continue
            assert up
            # full-frame rect: all 9 test-model gaussians project on screen
            msg = get("/select?x0=0&y0=0&x1=64&y1=64&az=0&el=0.3&r=3")
            assert "selected 9" in msg, msg
            msg = get("/select/save")
            assert "saved 9 gaussians" in msg, msg
            out = tmp_path / "live_output.gcloud"
            assert out.exists()
            from bevy_gaussian_splatting_tpu.io.loader import load_cloud

            subset = load_cloud(str(out))
            assert len(subset) == 9
            # invert: none remain selected
            msg = get("/select/invert")
            assert "selected 0" in msg, msg
            msg = get("/select/save")
            assert "nothing selected" in msg, msg
            get("/select/clear")
            import json

            info = json.loads(get("/info"))
            assert info["selected"] == info["gaussians"]
        finally:
            os.killpg(proc.pid, signal.SIGTERM)
            proc.wait(timeout=10)
