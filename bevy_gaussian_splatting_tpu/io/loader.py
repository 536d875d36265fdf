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
from bevy_gaussian_splatting_tpu.models.cloud import Gaussian3dCloud, Gaussian4dCloud


def load_cloud(path: str) -> Union[Gaussian3dCloud, Gaussian4dCloud]:
    ext = os.path.splitext(path)[1].lower()
    with open(path, "rb") as f:
        data = f.read()
    if ext == ".ply":
        return ply_codec.parse_ply_3d(data)
    if ext == ".ply4d":
        return ply_codec.parse_ply_4d(data)
    if ext == ".gcloud":
        # codec sniff: the bincode2 alternate codec is gzip-wrapped (magic
        # 1f 8b); flexbuffers is the default (src/io/gcloud/mod.rs features)
        if data[:2] == b"\x1f\x8b":
            from bevy_gaussian_splatting_tpu.io import bincode2

            return bincode2.decode_bincode_3d(data)
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

    return load_khr_gaussian_scene(path)


def load_any(path: str):
    """Extension dispatch across clouds and scenes; scenes return GaussianScene."""
    ext = os.path.splitext(path)[1].lower()
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
        if not isinstance(cloud, Gaussian3dCloud):
            raise ValueError(".gcloud stores 3D clouds")
        if codec == "bincode2":
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
