"""Asset loading with extension dispatch (reference: src/io/loader.rs:17-116).

  .ply            -> 3D cloud (PLY parse + activations)
  .gcloud         -> 3D cloud (flexbuffers decode)
  .ply4d          -> 4D cloud
  .gc4d           -> 4D cloud
  .npz            -> either (columnar fast path)
  .gltf / .glb    -> KHR_gaussian_splatting scene (io/scene.py)
"""

from __future__ import annotations

import os
from typing import Union

from bevy_gaussian_splatting_tpu.io import gcloud as gcloud_codec
from bevy_gaussian_splatting_tpu.io import ply as ply_codec
from bevy_gaussian_splatting_tpu.models.cloud import (
    Gaussian3dCloud,
    Gaussian3dCovCloud,
    Gaussian4dCloud,
)


def resolve_input(input_file: str) -> str:
    """Normalize a CLI/viewer input string into a path or URI — the
    reference's parse_input_file (viewer/viewer.rs:84-105): try url-safe
    base64 (decoding to a utf-8 URI), then percent-decoding; otherwise the
    string is already a plain path/URL."""
    import base64 as _b64

    try:
        decoded = _b64.b64decode(
            input_file.encode("ascii"), altchars=b"-_", validate=True
        )
        return decoded.decode("utf-8")
    except Exception:
        pass
    decoded = _percent_decode(input_file)
    if decoded is not None:
        return decoded
    return input_file


def _percent_decode(value: str) -> Union[str, None]:
    """decode_percent_encoded (viewer/viewer.rs:108-137): returns None when
    the string contains no %XX escapes or any escape is malformed."""
    out = bytearray()
    data = value.encode("utf-8")
    i = 0
    changed = False
    while i < len(data):
        if data[i : i + 1] == b"%":
            if i + 2 >= len(data):
                return None
            try:
                out.append(int(data[i + 1 : i + 3].decode("ascii"), 16))
            except ValueError:
                return None
            i += 3
            changed = True
        else:
            out.append(data[i])
            i += 1
    if not changed:
        return None
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return None


def is_url(path: str) -> bool:
    return path.startswith("http://") or path.startswith("https://")


def fetch_bytes(url: str, cache_dir: Union[str, None] = None, timeout: float = 60.0) -> bytes:
    """Fetch a remote asset (the reference's bevy web_asset layer).  With
    ``cache_dir`` (or $BGS_ASSET_CACHE), responses are cached on disk keyed by
    the URL hash — the scene-download cache of tests/headless_examples.rs:243-292."""
    import hashlib
    import urllib.request

    cache_dir = cache_dir or os.environ.get("BGS_ASSET_CACHE")
    cache_path = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        key = hashlib.sha256(url.encode()).hexdigest()[:24]
        cache_path = os.path.join(
            cache_dir, key + os.path.splitext(url.split("?")[0])[1]
        )
        if os.path.exists(cache_path):
            with open(cache_path, "rb") as f:
                return f.read()
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        data = resp.read()
    if cache_path:
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, cache_path)
    return data


def _read_source(path: str) -> tuple[bytes, str]:
    """(bytes, extension) for a local path or http(s) URL."""
    if is_url(path):
        ext = os.path.splitext(path.split("?")[0])[1].lower()
        return fetch_bytes(path), ext
    with open(path, "rb") as f:
        return f.read(), os.path.splitext(path)[1].lower()


def load_cloud(path: str) -> Union[Gaussian3dCloud, Gaussian4dCloud]:
    data, ext = _read_source(path)
    if ext == ".ply":
        return ply_codec.parse_ply_3d(data)
    if ext == ".ply4d":
        return ply_codec.parse_ply_4d(data)
    if ext == ".gcloud":
        # codec sniff: the bincode2 alternate codec is gzip-wrapped (magic
        # 1f 8b); flexbuffers is the default (src/io/gcloud/mod.rs features).
        # The precompute_covariance_3d storage flavor carries a packed
        # covariance column instead of rotation/scale (planar_3d.rs:76-85).
        if data[:2] == b"\x1f\x8b":
            from bevy_gaussian_splatting_tpu.io import bincode2

            return bincode2.decode_bincode_3d(data)
        if gcloud_codec.gcloud_is_cov3d(data):
            return gcloud_codec.decode_gcloud_cov3d(data)
        return gcloud_codec.decode_gcloud_3d(data)
    if ext == ".gc4d":
        if data[:2] == b"\x1f\x8b":
            from bevy_gaussian_splatting_tpu.io import bincode2

            return bincode2.decode_bincode_4d(data)
        return gcloud_codec.decode_gcloud_4d(data)
    if ext == ".npz":
        return gcloud_codec.decode_npz(data)
    raise ValueError(f"unsupported cloud extension {ext!r} for {path}")


def load_scene(path: str):
    """Load a KHR_gaussian_splatting glTF/GLB scene (src/io/scene.rs:206-226)."""
    from bevy_gaussian_splatting_tpu.io.scene import load_khr_gaussian_scene

    if is_url(path):
        return load_khr_gaussian_scene(fetch_bytes(path))
    return load_khr_gaussian_scene(path)


def load_any(path: str):
    """Extension dispatch across clouds and scenes; scenes return GaussianScene.

    Accepts local paths, http(s) URLs, and base64/percent-encoded forms of
    either (the reference viewer's input pipeline, viewer/viewer.rs:84-137 +
    bevy web_asset)."""
    path = resolve_input(path)
    ext = os.path.splitext(path.split("?")[0] if is_url(path) else path)[1].lower()
    if ext in (".gltf", ".glb"):
        return load_scene(path)
    return load_cloud(path)


def save_cloud(cloud, path: str, codec: str = "flexbuffers") -> int:
    """CloudCodec::write_to_file equivalent (src/io/codec.rs:8-17). Returns the
    byte count written.

    ``codec``: 'flexbuffers' (default) or 'bincode2' (gzip-compressed
    alternate codec; same extensions, auto-detected on load)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".gcloud":
        if isinstance(cloud, Gaussian3dCovCloud):
            if codec == "bincode2":
                raise ValueError(
                    "precomputed-covariance clouds use the flexbuffers codec"
                )
            data = gcloud_codec.encode_gcloud_cov3d(cloud)
        elif not isinstance(cloud, Gaussian3dCloud):
            raise ValueError(".gcloud stores 3D clouds")
        elif codec == "bincode2":
            from bevy_gaussian_splatting_tpu.io import bincode2

            data = bincode2.encode_bincode_3d(cloud)
        else:
            data = gcloud_codec.encode_gcloud_3d(cloud)
    elif ext == ".gc4d":
        if not isinstance(cloud, Gaussian4dCloud):
            raise ValueError(".gc4d stores 4D clouds")
        if codec == "bincode2":
            from bevy_gaussian_splatting_tpu.io import bincode2

            data = bincode2.encode_bincode_4d(cloud)
        else:
            data = gcloud_codec.encode_gcloud_4d(cloud)
    elif ext == ".ply":
        data = ply_codec.write_ply_3d(cloud)
    elif ext == ".npz":
        data = gcloud_codec.encode_npz(cloud)
    else:
        raise ValueError(f"unsupported cloud extension {ext!r} for {path}")
    with open(path, "wb") as f:
        f.write(data)
    return len(data)
