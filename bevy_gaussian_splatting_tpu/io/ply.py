"""PLY import/export for 3D and 4D gaussian clouds.

Parses the standard INRIA-style 3DGS PLY schema and the reference's 4D schema
with the exact activation pipeline of the reference loader (src/io/ply.rs):

  3D (parse_ply_3d, src/io/ply.rs:76-132):
    - opacity: sigmoid 1 / (1 + e^-v)                    (ply.rs:40-42)
    - scale:   clamp to mean +- 4 (MAX_SIZE_VARIANCE), then exp (ply.rs:105-116)
    - rotation quaternion: normalized                     (ply.rs:118-124)
    - f_rest_i channel-planar -> interleaved remap        (ply.rs:56-66)
    - pad with default gaussians to a multiple of 32      (ply.rs:127-129)

  4D (parse_ply_4d, src/io/ply.rs:185-247):
    - x/y/z/t/st, feat_[rgb]_i spherindrical coefficients, sx/sy/sz raw scale,
      raw opacity (no sigmoid), dual quaternions normalized.

Reference-faithful quirks (reproduced so images match the reference renderer,
toggle with ``strict_reference=False`` for the mathematically-correct variants):
  - the f_rest channel index divides by 16 (SH_COEFF_COUNT_PER_CHANNEL) while
    the coefficient index wraps modulo 15 — for the standard 45-coefficient
    layout this collides (e.g. i=0 and i=15 both land on slot 3, later wins)
    and mixes channels at the 15/30 boundaries (ply.rs:60-66)
  - padding always appends at least one gaussian: pad = 32 - len % 32 adds a
    full block of 32 when len is already a multiple (ply.rs:127-128)

Implementation is pure numpy (vectorized struct decode); no per-vertex Python
loops.  A binary-little-endian writer is provided for tooling round-trips
(standard channel-planar layout, inverse activations).
"""

from __future__ import annotations

import io as _io
from typing import BinaryIO, Optional, Union

import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.models.cloud import (
    SH_4D_COEFF_COUNT,
    SH_MAX_DEGREE,
    Gaussian3dCloud,
    Gaussian4dCloud,
    num_sh_coefficients,
    sh_coeff_width,
)

MAX_SIZE_VARIANCE = 4.0  # src/io/ply.rs:21

_PLY_DTYPES = {
    "float": "<f4",
    "float32": "<f4",
    "double": "<f8",
    "float64": "<f8",
    "char": "<i1",
    "int8": "<i1",
    "uchar": "<u1",
    "uint8": "<u1",
    "short": "<i2",
    "int16": "<i2",
    "ushort": "<u2",
    "uint16": "<u2",
    "int": "<i4",
    "int32": "<i4",
    "uint": "<u4",
    "uint32": "<u4",
}


def _read_header(f: BinaryIO):
    magic = f.readline().strip()
    if magic != b"ply":
        raise ValueError("not a PLY file")
    fmt = None
    elements = []  # list of (name, count, [(prop_name, dtype_str)])
    current = None
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unexpected EOF in PLY header")
        parts = line.decode("ascii", "replace").strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "comment" or parts[0] == "obj_info":
            continue
        elif parts[0] == "element":
            current = (parts[1], int(parts[2]), [])
            elements.append(current)
        elif parts[0] == "property":
            if current is None:
                raise ValueError("property before element")
            if parts[1] == "list":
                current[2].append((parts[-1], ("list", parts[2], parts[3])))
            else:
                current[2].append((parts[-1], _PLY_DTYPES[parts[1]]))
        elif parts[0] == "end_header":
            break
    return fmt, elements


def _read_vertex_data(f: BinaryIO, fmt: str, elements) -> dict:
    """Read all elements; return the vertex element as a dict of numpy columns."""
    vertex = None
    for name, count, props in elements:
        if any(isinstance(d, tuple) for _, d in props):
            raise ValueError("list properties are not supported in gaussian PLYs")
        if fmt == "ascii":
            rows = np.loadtxt(
                _io.StringIO(
                    "\n".join(f.readline().decode("ascii") for _ in range(count))
                ),
                dtype=np.float64,
                ndmin=2,
            )
            data = {p: rows[:, i].astype(np.float32) for i, (p, _) in enumerate(props)}
        elif fmt == "binary_little_endian":
            dt = np.dtype([(p, d) for p, d in props])
            raw = f.read(dt.itemsize * count)
            arr = np.frombuffer(raw, dtype=dt, count=count)
            data = {p: arr[p].astype(np.float32) for p, _ in props}
        else:
            raise ValueError(f"unsupported PLY format {fmt}")
        if name == "vertex":
            vertex = data
    if vertex is None:
        raise ValueError("missing vertex element")
    return vertex


def _require(data: dict, names) -> None:
    missing = [n for n in names if n not in data]
    if missing:
        raise ValueError(f"missing required properties: {missing}")


def _pad_rows(n: int) -> int:
    """Reference padding rule: always appends 1..32 rows (ply.rs:127-128)."""
    return 32 - (n % 32)


def _infer_sh_degree_from_rest(n_rest: int) -> int:
    """Smallest SH degree whose layout holds ``n_rest`` f_rest properties
    (n_rest = ((d+1)^2 - 1) * 3 for a full file), capped at SH_MAX_DEGREE —
    the data-driven stand-in for the reference's compile-time shN feature."""
    per_ch = n_rest // 3 + 1
    degree = 0
    while degree < SH_MAX_DEGREE and num_sh_coefficients(degree) < per_ch:
        degree += 1
    return degree


def _header_rest_count(source: bytes) -> int:
    """Count f_rest_* vertex properties by scanning only the header bytes.

    Both type spellings the parsers accept ("float" and "float32") are
    counted — a file declaring ``property float32 f_rest_N`` previously
    inferred degree 0 and silently dropped every coefficient."""
    end = source.find(b"end_header")
    head = source[: end if end >= 0 else 4096]
    return head.count(b"property float f_rest_") + head.count(
        b"property float32 f_rest_"
    )


def parse_ply_3d(
    source: Union[bytes, BinaryIO], strict_reference: bool = True,
    use_native: bool = True, sh_degree: Optional[int] = None,
) -> Gaussian3dCloud:
    """``sh_degree``: target SH storage degree (the reference's sh0..sh4
    compile feature, spherical_harmonics.rs:33-120).  ``None`` infers it from
    the file's f_rest property count; an explicit degree truncates or
    zero-extends exactly like rebuilding the reference with that feature."""
    if isinstance(source, (bytes, bytearray)) and use_native:
        # fast path: multithreaded C++ decoder (native/gsplat_native.cpp);
        # silently falls back for ascii/list-property/exotic files
        deg = (
            sh_degree
            if sh_degree is not None
            else _infer_sh_degree_from_rest(_header_rest_count(bytes(source)))
        )
        try:
            from bevy_gaussian_splatting_tpu import native as _native

            out = _native.parse_ply_3d_native(
                bytes(source), strict_reference,
                sh_width=sh_coeff_width(deg),
                sh_per_channel=num_sh_coefficients(deg),
            )
        except Exception:
            out = None
        if out is not None:
            pv, sh_arr, rot_arr, so_arr = out
            return Gaussian3dCloud(
                position_visibility=jnp.asarray(pv),
                spherical_harmonic=jnp.asarray(sh_arr),
                rotation=jnp.asarray(rot_arr),
                scale_opacity=jnp.asarray(so_arr),
            )

    f = _io.BytesIO(source) if isinstance(source, (bytes, bytearray)) else source
    fmt, elements = _read_header(f)
    data = _read_vertex_data(f, fmt, elements)
    # required set per parse_ply_3d (ply.rs:81-85)
    _require(
        data,
        ["x", "y", "z", "f_dc_0", "f_dc_1", "f_dc_2", "scale_0", "scale_1",
         "opacity", "rot_0", "rot_1", "rot_2", "rot_3"],
    )
    n = len(data["x"])

    pos = np.stack([data["x"], data["y"], data["z"]], axis=1)
    vis = data.get("visibility", np.ones(n, np.float32))
    pv = np.concatenate([pos, vis[:, None]], axis=1).astype(np.float32)

    if sh_degree is None:
        n_rest_props = sum(1 for k in data if k.startswith("f_rest_"))
        sh_degree = _infer_sh_degree_from_rest(n_rest_props)
    sh_width = sh_coeff_width(sh_degree)
    sh = np.zeros((n, sh_width), np.float32)
    sh[:, 0] = data["f_dc_0"]
    sh[:, 1] = data["f_dc_1"]
    sh[:, 2] = data["f_dc_2"]
    per_ch = num_sh_coefficients(sh_degree)  # 16 at the default degree 3
    for key, col in data.items():
        if not key.startswith("f_rest_") or per_ch <= 1:
            continue
        i = int(key[7:])
        if strict_reference:
            channel = i // per_ch  # reference quirk: /16, not /15 (ply.rs:60)
            coefficient = (i % (per_ch - 1)) + 1
        else:
            channel = i // (per_ch - 1)
            coefficient = (i % (per_ch - 1)) + 1
        idx = coefficient * 3 + channel
        if idx < sh_width:
            sh[:, idx] = col

    rot = np.stack([data["rot_0"], data["rot_1"], data["rot_2"], data["rot_3"]], axis=1)
    norm = np.linalg.norm(rot, axis=1, keepdims=True)
    rot = (rot / norm).astype(np.float32)

    scale = np.stack(
        [data["scale_0"], data["scale_1"], data.get("scale_2", data["scale_1"])], axis=1
    )
    mean_scale = scale.mean(axis=1, keepdims=True)
    scale = np.clip(scale, mean_scale - MAX_SIZE_VARIANCE, mean_scale + MAX_SIZE_VARIANCE)
    scale = np.exp(scale)
    opacity = 1.0 / (1.0 + np.exp(-data["opacity"]))
    so = np.concatenate([scale, opacity[:, None]], axis=1).astype(np.float32)

    pad = _pad_rows(n)
    pv = np.concatenate([pv, np.zeros((pad, 4), np.float32)])
    sh = np.concatenate([sh, np.zeros((pad, sh_width), np.float32)])
    rot_pad = np.zeros((pad, 4), np.float32)
    rot = np.concatenate([rot, rot_pad])
    so = np.concatenate([so, np.zeros((pad, 4), np.float32)])

    return Gaussian3dCloud(
        position_visibility=jnp.asarray(pv),
        spherical_harmonic=jnp.asarray(sh),
        rotation=jnp.asarray(rot),
        scale_opacity=jnp.asarray(so),
    )


def parse_ply_4d(source: Union[bytes, BinaryIO]) -> Gaussian4dCloud:
    f = _io.BytesIO(source) if isinstance(source, (bytes, bytearray)) else source
    fmt, elements = _read_header(f)
    data = _read_vertex_data(f, fmt, elements)
    _require(
        data,
        ["x", "y", "z", "t", "st", "sx", "sy", "sz", "opacity",
         "rot_x", "rot_y", "rot_z", "rot_w", "rot_r_x", "rot_r_y", "rot_r_z", "rot_r_w"],
    )
    n = len(data["x"])

    pos = np.stack([data["x"], data["y"], data["z"]], axis=1)
    vis = data.get("visibility", np.ones(n, np.float32))
    pv = np.concatenate([pos, vis[:, None]], axis=1).astype(np.float32)

    sh = np.zeros((n, SH_4D_COEFF_COUNT), np.float32)
    for key, col in data.items():
        if not key.startswith("feat_"):
            continue
        channel = {"r": 0, "g": 1, "b": 2}[key[5]]
        i = int(key[7:])
        idx = i * 3 + channel
        if idx < SH_4D_COEFF_COUNT:
            sh[:, idx] = col

    def unit(q):
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    # reference property order rot_{x,y,z,w}: stored as-is into rotation[0..3]
    # (ply.rs:204-213) — the shader then reads component 0 as w
    rot_l = unit(np.stack([data["rot_x"], data["rot_y"], data["rot_z"], data["rot_w"]], axis=1))
    rot_r = unit(
        np.stack([data["rot_r_x"], data["rot_r_y"], data["rot_r_z"], data["rot_r_w"]], axis=1)
    )
    iso = np.concatenate([rot_l, rot_r], axis=1).astype(np.float32)

    so = np.stack([data["sx"], data["sy"], data["sz"], data["opacity"]], axis=1).astype(
        np.float32
    )
    ts = np.stack([data["t"], data["st"]], axis=1).astype(np.float32)

    pad = _pad_rows(n)
    return Gaussian4dCloud(
        position_visibility=jnp.asarray(np.concatenate([pv, np.zeros((pad, 4), np.float32)])),
        spherindrical_harmonic=jnp.asarray(
            np.concatenate([sh, np.zeros((pad, SH_4D_COEFF_COUNT), np.float32)])
        ),
        isotropic_rotations=jnp.asarray(np.concatenate([iso, np.zeros((pad, 8), np.float32)])),
        scale_opacity=jnp.asarray(np.concatenate([so, np.zeros((pad, 4), np.float32)])),
        timestamp_timescale=jnp.asarray(np.concatenate([ts, np.zeros((pad, 2), np.float32)])),
    )


def write_ply_3d(cloud: Gaussian3dCloud, include_padding: bool = True) -> bytes:
    """Standard channel-planar 3DGS PLY (binary little endian) with inverse
    activations (log scale, logit opacity) so ``parse_ply_3d(write_ply_3d(c),
    strict_reference=False)`` round-trips."""
    n = len(cloud)
    pv = np.asarray(cloud.position_visibility)
    sh = np.asarray(cloud.spherical_harmonic)
    rot = np.asarray(cloud.rotation)
    so = np.asarray(cloud.scale_opacity)

    from bevy_gaussian_splatting_tpu.models.cloud import sh_degree_from_width

    per_ch = num_sh_coefficients(sh_degree_from_width(sh.shape[1]))
    n_rest = (per_ch - 1) * 3
    props = (
        ["x", "y", "z", "visibility", "f_dc_0", "f_dc_1", "f_dc_2"]
        + [f"f_rest_{i}" for i in range(n_rest)]
        + ["scale_0", "scale_1", "scale_2", "opacity", "rot_0", "rot_1", "rot_2", "rot_3"]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    ).encode("ascii")

    cols = [pv[:, 0], pv[:, 1], pv[:, 2], pv[:, 3], sh[:, 0], sh[:, 1], sh[:, 2]]
    for i in range(n_rest):
        channel = i // (per_ch - 1)
        coefficient = (i % (per_ch - 1)) + 1
        cols.append(sh[:, coefficient * 3 + channel])
    eps = 1e-12
    log_scale = np.log(np.maximum(so[:, :3], eps))
    op = np.clip(so[:, 3], 1e-6, 1.0 - 1e-6)
    logit_op = np.log(op / (1.0 - op))
    cols += [log_scale[:, 0], log_scale[:, 1], log_scale[:, 2], logit_op,
             rot[:, 0], rot[:, 1], rot[:, 2], rot[:, 3]]

    body = np.stack(cols, axis=1).astype("<f4").tobytes()
    return header + body
