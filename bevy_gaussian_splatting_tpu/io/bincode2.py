"""bincode2 + gzip ``.gcloud`` codec — the reference's alternate cloud codec
(src/io/gcloud/bincode2.rs:11-66: gzip(bincode-serialize(PlanarCloud)) with a
raw-bincode fallback on gzip failure).

Encoding follows bincode 2 "standard" configuration for the serde data model:
  - struct: fields serialized in declaration order, no tags
  - Vec<T>: varint length then elements
  - fixed arrays [T; N]: N elements, no length prefix
  - f32: 4 bytes little-endian
  - varint: < 251 one byte; 251 => u16 LE; 252 => u32 LE; 253 => u64 LE

Field order matches the reference's struct declarations (src/gaussian/f32.rs):
  PlanarGaussian3d { position_visibility, spherical_harmonic, rotation,
                     scale_opacity }
  PlanarGaussian4d { position_visibility, spherindrical_harmonic,
                     isotropic_rotations, scale_opacity, timestamp_timescale }

Row encodings are pure fixed-width f32 runs, so encode/decode are vectorized
numpy slices (no per-element boxing — this codec is the fast-compressed path).
"""

from __future__ import annotations

import gzip as _gzip
import struct

import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.models.cloud import (
    Gaussian3dCloud,
    Gaussian4dCloud,
)

# spherical_harmonic width None = degree axis (sh0..sh4): the encoder uses the
# array's actual width; the decoder infers it from the remaining byte budget
# (every other field is fixed-width and shares the same row count)
_FIELDS_3D = [("position_visibility", 4), ("spherical_harmonic", None),
              ("rotation", 4), ("scale_opacity", 4)]
_FIELDS_4D = [("position_visibility", 4), ("spherindrical_harmonic", 144),
              ("isotropic_rotations", 8), ("scale_opacity", 4),
              ("timestamp_timescale", 2)]


def _write_varint(out: bytearray, v: int) -> None:
    if v < 251:
        out.append(v)
    elif v < (1 << 16):
        out.append(251)
        out += struct.pack("<H", v)
    elif v < (1 << 32):
        out.append(252)
        out += struct.pack("<I", v)
    else:
        out.append(253)
        out += struct.pack("<Q", v)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    b = data[pos]
    if b < 251:
        return b, pos + 1
    if b == 251:
        return struct.unpack_from("<H", data, pos + 1)[0], pos + 3
    if b == 252:
        return struct.unpack_from("<I", data, pos + 1)[0], pos + 5
    if b == 253:
        return struct.unpack_from("<Q", data, pos + 1)[0], pos + 9
    raise ValueError("unsupported varint discriminant")


def _encode(cloud, fields) -> bytes:
    out = bytearray()
    for name, width in fields:
        arr = np.ascontiguousarray(np.asarray(getattr(cloud, name)), np.float32)
        assert width is None or arr.shape[1] == width, (name, arr.shape)
        _write_varint(out, arr.shape[0])
        out += arr.tobytes()
    return bytes(out)


def _varint_size(v: int) -> int:
    return 1 if v < 251 else 3 if v < (1 << 16) else 5 if v < (1 << 32) else 9


def _decode(data: bytes, fields) -> dict:
    pos = 0
    arrays = {}
    for i, (name, width) in enumerate(fields):
        n, pos = _read_varint(data, pos)
        if width is None:
            # infer from the remaining budget: every later field is
            # fixed-width with the same row count and its own varint
            rest = sum(w for _, w in fields[i + 1 :])
            tail = _varint_size(n) * (len(fields) - 1 - i) + n * rest * 4
            floats = len(data) - pos - tail
            if n == 0:
                width = 48  # empty cloud: default degree-3 layout
            elif floats < 0 or floats % (4 * n):
                raise ValueError("cannot infer variable field width")
            else:
                width = floats // (4 * n)
        nbytes = n * width * 4
        arr = np.frombuffer(data, np.float32, count=n * width, offset=pos)
        arrays[name] = jnp.asarray(arr.reshape(n, width))
        pos += nbytes
    if pos != len(data):
        raise ValueError(f"trailing bytes: {len(data) - pos}")
    return arrays


def encode_bincode_3d(cloud: Gaussian3dCloud, compress: bool = True) -> bytes:
    raw = _encode(cloud, _FIELDS_3D)
    return _gzip.compress(raw, compresslevel=4) if compress else raw


def encode_bincode_4d(cloud: Gaussian4dCloud, compress: bool = True) -> bytes:
    raw = _encode(cloud, _FIELDS_4D)
    return _gzip.compress(raw, compresslevel=4) if compress else raw


def _maybe_gunzip(data: bytes) -> bytes:
    # the reference decodes gzip first and falls back to raw bincode
    # (src/io/gcloud/bincode2.rs:40-57)
    if data[:2] == b"\x1f\x8b":
        try:
            return _gzip.decompress(data)
        except OSError:
            pass
    return data


def decode_bincode_3d(data: bytes) -> Gaussian3dCloud:
    return Gaussian3dCloud(**_decode(_maybe_gunzip(data), _FIELDS_3D))


def decode_bincode_4d(data: bytes) -> Gaussian4dCloud:
    return Gaussian4dCloud(**_decode(_maybe_gunzip(data), _FIELDS_4D))
