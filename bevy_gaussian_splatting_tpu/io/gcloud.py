"""``.gcloud`` / ``.gc4d`` codec — flexbuffers serialization of the SoA cloud.

The reference encodes its planar cloud assets with serde + flexbuffers
(src/io/gcloud/flexbuffers.rs:10-37): the root is the serde map of the
``PlanarGaussian3d``/``PlanarGaussian4d`` struct, whose fields are vectors of the
per-attribute structs (field names from src/gaussian/f32.rs):

  PlanarGaussian3d { position_visibility: [{position: [f32;3], visibility: f32}],
                     spherical_harmonic:  [[f32; 48]],        (tuple serializer)
                     rotation:            [{rotation: [f32;4]}],
                     scale_opacity:       [{scale: [f32;3], opacity: f32}] }

  PlanarGaussian4d { position_visibility, spherindrical_harmonic: [[f32;144]],
                     isotropic_rotations: [{rotation: [f32;4], rotation_r: [f32;4]}],
                     scale_opacity, timestamp_timescale: [{timestamp, timescale}] }

Encoding walks numpy, decoding is tolerant of typed vs untyped vectors.  A fast
raw-numpy sidecar format (``.gcloud.npz``) is also provided for large clouds
where flexbuffers' per-element boxing is too slow.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flatbuffers import flexbuffers

from bevy_gaussian_splatting_tpu.models.cloud import (
    Gaussian3dCloud,
    Gaussian3dCovCloud,
    Gaussian4dCloud,
)


def _typed_f32_vec(b, values):
    b.TypedVectorFromElements([float(v) for v in values], element_type=flexbuffers.Type.FLOAT)


def encode_gcloud_3d(cloud: Gaussian3dCloud, use_native: bool = True) -> bytes:
    pv = np.asarray(cloud.position_visibility, np.float32)
    sh = np.asarray(cloud.spherical_harmonic, np.float32)
    rot = np.asarray(cloud.rotation, np.float32)
    so = np.asarray(cloud.scale_opacity, np.float32)

    if use_native:
        from bevy_gaussian_splatting_tpu import native

        data = native.encode_gcloud_3d_native(pv, sh, rot, so)
        if data is not None:
            return data

    b = flexbuffers.Builder()
    with b.Map():
        b.Key("position_visibility")
        with b.Vector():
            for row in pv:
                with b.Map():
                    b.Key("position")
                    _typed_f32_vec(b, row[:3])
                    b.Key("visibility")
                    b.Float(float(row[3]))
        b.Key("spherical_harmonic")
        with b.Vector():
            for row in sh:
                with b.Map():
                    b.Key("coefficients")
                    _typed_f32_vec(b, row)
        b.Key("rotation")
        with b.Vector():
            for row in rot:
                with b.Map():
                    b.Key("rotation")
                    _typed_f32_vec(b, row)
        b.Key("scale_opacity")
        with b.Vector():
            for row in so:
                with b.Map():
                    b.Key("scale")
                    _typed_f32_vec(b, row[:3])
                    b.Key("opacity")
                    b.Float(float(row[3]))
    return bytes(b.Finish())


def encode_gcloud_4d(cloud: Gaussian4dCloud, use_native: bool = True) -> bytes:
    pv = np.asarray(cloud.position_visibility, np.float32)
    sh = np.asarray(cloud.spherindrical_harmonic, np.float32)
    iso = np.asarray(cloud.isotropic_rotations, np.float32)
    so = np.asarray(cloud.scale_opacity, np.float32)
    ts = np.asarray(cloud.timestamp_timescale, np.float32)

    if use_native:
        from bevy_gaussian_splatting_tpu import native

        data = native.encode_gcloud_4d_native(pv, sh, iso, so, ts)
        if data is not None:
            return data

    b = flexbuffers.Builder()
    with b.Map():
        b.Key("position_visibility")
        with b.Vector():
            for row in pv:
                with b.Map():
                    b.Key("position")
                    _typed_f32_vec(b, row[:3])
                    b.Key("visibility")
                    b.Float(float(row[3]))
        b.Key("spherindrical_harmonic")
        with b.Vector():
            for row in sh:
                with b.Map():
                    b.Key("coefficients")
                    _typed_f32_vec(b, row)
        b.Key("isotropic_rotations")
        with b.Vector():
            for row in iso:
                with b.Map():
                    b.Key("rotation")
                    _typed_f32_vec(b, row[:4])
                    b.Key("rotation_r")
                    _typed_f32_vec(b, row[4:])
        b.Key("scale_opacity")
        with b.Vector():
            for row in so:
                with b.Map():
                    b.Key("scale")
                    _typed_f32_vec(b, row[:3])
                    b.Key("opacity")
                    b.Float(float(row[3]))
        b.Key("timestamp_timescale")
        with b.Vector():
            for row in ts:
                with b.Map():
                    b.Key("timestamp")
                    b.Float(float(row[0]))
                    b.Key("timescale")
                    b.Float(float(row[1]))
    return bytes(b.Finish())


def _as_list(v):
    """Materialize a flexbuffers vector/typed-vector as a python list."""
    if hasattr(v, "Value"):
        return v.Value
    return list(v)


def _rows_to_array(rows, extract) -> np.ndarray:
    return np.asarray([extract(r) for r in rows], dtype=np.float32)


def decode_gcloud_3d(data: bytes, use_native: bool = True) -> Gaussian3dCloud:
    if use_native:
        from bevy_gaussian_splatting_tpu import native

        d = native.decode_gcloud_native(data)
        if d is not None and not d["is4d"]:
            return Gaussian3dCloud(
                position_visibility=jnp.asarray(d["pv"]),
                spherical_harmonic=jnp.asarray(d["sh"]),
                rotation=jnp.asarray(d["rot"]),
                scale_opacity=jnp.asarray(d["so"]),
            )

    root = flexbuffers.GetRoot(data).AsMap

    pv_rows = root["position_visibility"].AsVector
    pv = _rows_to_array(
        pv_rows,
        lambda r: list(_as_list(r.AsMap["position"].AsTypedVector))
        + [r.AsMap["visibility"].AsFloat],
    )
    sh_rows = root["spherical_harmonic"].AsVector
    sh = _rows_to_array(sh_rows, lambda r: _as_list(r.AsMap["coefficients"].AsTypedVector))
    rot_rows = root["rotation"].AsVector
    rot = _rows_to_array(rot_rows, lambda r: _as_list(r.AsMap["rotation"].AsTypedVector))
    so_rows = root["scale_opacity"].AsVector
    so = _rows_to_array(
        so_rows,
        lambda r: list(_as_list(r.AsMap["scale"].AsTypedVector))
        + [r.AsMap["opacity"].AsFloat],
    )
    return Gaussian3dCloud(
        position_visibility=jnp.asarray(pv),
        spherical_harmonic=jnp.asarray(sh),
        rotation=jnp.asarray(rot),
        scale_opacity=jnp.asarray(so),
    )


def decode_gcloud_4d(data: bytes, use_native: bool = True) -> Gaussian4dCloud:
    if use_native:
        from bevy_gaussian_splatting_tpu import native

        d = native.decode_gcloud_native(data)
        if d is not None and d["is4d"]:
            return Gaussian4dCloud(
                position_visibility=jnp.asarray(d["pv"]),
                spherindrical_harmonic=jnp.asarray(d["sh"]),
                isotropic_rotations=jnp.asarray(d["iso"]),
                scale_opacity=jnp.asarray(d["so"]),
                timestamp_timescale=jnp.asarray(d["ts"]),
            )

    root = flexbuffers.GetRoot(data).AsMap

    pv = _rows_to_array(
        root["position_visibility"].AsVector,
        lambda r: list(_as_list(r.AsMap["position"].AsTypedVector))
        + [r.AsMap["visibility"].AsFloat],
    )
    sh = _rows_to_array(
        root["spherindrical_harmonic"].AsVector,
        lambda r: _as_list(r.AsMap["coefficients"].AsTypedVector),
    )
    iso = _rows_to_array(
        root["isotropic_rotations"].AsVector,
        lambda r: list(_as_list(r.AsMap["rotation"].AsTypedVector))
        + list(_as_list(r.AsMap["rotation_r"].AsTypedVector)),
    )
    so = _rows_to_array(
        root["scale_opacity"].AsVector,
        lambda r: list(_as_list(r.AsMap["scale"].AsTypedVector))
        + [r.AsMap["opacity"].AsFloat],
    )
    ts = _rows_to_array(
        root["timestamp_timescale"].AsVector,
        lambda r: [r.AsMap["timestamp"].AsFloat, r.AsMap["timescale"].AsFloat],
    )
    return Gaussian4dCloud(
        position_visibility=jnp.asarray(pv),
        spherindrical_harmonic=jnp.asarray(sh),
        isotropic_rotations=jnp.asarray(iso),
        scale_opacity=jnp.asarray(so),
        timestamp_timescale=jnp.asarray(ts),
    )


# -- precompute_covariance_3d flavor ------------------------------------------
# Serde layout of the reference's (feature-gated) Cloud3d with
# Covariance3dOpacityPacked128 rows {cov3d: [u32; 3], opacity: u32}
# (src/gaussian/formats/planar_3d.rs:76-85, src/gaussian/f16.rs:122-134):
# f16 pairs packed into u32 words — the compressed covariance storage.


def encode_gcloud_cov3d(cloud: Gaussian3dCovCloud) -> bytes:
    from bevy_gaussian_splatting_tpu.models.f16 import pack_covariance_3d_opacity

    pv = np.asarray(cloud.position_visibility, np.float32)
    sh = np.asarray(cloud.spherical_harmonic, np.float32)
    co = np.asarray(cloud.covariance_3d_opacity, np.float32)
    packed = pack_covariance_3d_opacity(co[:, :6], co[:, 6])

    b = flexbuffers.Builder()
    with b.Map():
        b.Key("covariance_3d_opacity_packed128")
        with b.Vector():
            for row in packed:
                with b.Map():
                    b.Key("cov3d")
                    b.TypedVectorFromElements(
                        [int(v) for v in row[:3]], element_type=flexbuffers.Type.UINT
                    )
                    b.Key("opacity")
                    b.UInt(int(row[3]), 4)
        b.Key("position_visibility")
        with b.Vector():
            for row in pv:
                with b.Map():
                    b.Key("position")
                    _typed_f32_vec(b, row[:3])
                    b.Key("visibility")
                    b.Float(float(row[3]))
        b.Key("spherical_harmonic")
        with b.Vector():
            for row in sh:
                with b.Map():
                    b.Key("coefficients")
                    _typed_f32_vec(b, row)
    return bytes(b.Finish())


def decode_gcloud_cov3d(data: bytes) -> Gaussian3dCovCloud:
    from bevy_gaussian_splatting_tpu.models.f16 import unpack_covariance_3d_opacity

    root = flexbuffers.GetRoot(data).AsMap
    pv = _rows_to_array(
        root["position_visibility"].AsVector,
        lambda r: list(_as_list(r.AsMap["position"].AsTypedVector))
        + [r.AsMap["visibility"].AsFloat],
    )
    sh = _rows_to_array(
        root["spherical_harmonic"].AsVector,
        lambda r: _as_list(r.AsMap["coefficients"].AsTypedVector),
    )
    rows = root["covariance_3d_opacity_packed128"].AsVector
    packed = np.asarray(
        [
            list(_as_list(r.AsMap["cov3d"].AsTypedVector)) + [r.AsMap["opacity"].AsInt]
            for r in rows
        ],
        dtype=np.uint32,
    )
    cov3d, opacity = unpack_covariance_3d_opacity(packed)
    co = np.concatenate(
        [cov3d, opacity[:, None], np.zeros((len(cov3d), 1), np.float32)], axis=1
    )
    return Gaussian3dCovCloud(
        position_visibility=jnp.asarray(pv),
        spherical_harmonic=jnp.asarray(sh),
        covariance_3d_opacity=jnp.asarray(co),
    )


def gcloud_is_cov3d(data: bytes) -> bool:
    """Sniff the precompute_covariance_3d schema (packed cov column present)."""
    try:
        root = flexbuffers.GetRoot(data).AsMap
        root["covariance_3d_opacity_packed128"]
        return True
    except Exception:
        return False


# -- fast raw sidecar (TPU-native bulk path) ----------------------------------


def encode_npz(cloud) -> bytes:
    """Columnar npz: zero-copy-ish bulk format for million-gaussian clouds."""
    import io as _io
    import dataclasses

    buf = _io.BytesIO()
    arrays = {
        f.name: np.asarray(getattr(cloud, f.name))
        for f in dataclasses.fields(cloud)
    }
    fmt = (
        "4d" if isinstance(cloud, Gaussian4dCloud)
        else "3dcov" if isinstance(cloud, Gaussian3dCovCloud)
        else "3d"
    )
    arrays["__format__"] = np.array([fmt])
    np.savez(buf, **arrays)
    return buf.getvalue()


def decode_npz(data: bytes):
    import io as _io

    with np.load(_io.BytesIO(data)) as z:
        fmt = str(z["__format__"][0])
        fields = {k: jnp.asarray(z[k]) for k in z.files if k != "__format__"}
    cls = (
        Gaussian4dCloud if fmt == "4d"
        else Gaussian3dCovCloud if fmt == "3dcov"
        else Gaussian3dCloud
    )
    return cls(**fields)
