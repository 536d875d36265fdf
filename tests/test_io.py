"""IO tests — round-trip equality (reference analogue: tests/io.rs,
tests/gaussian.rs) and PLY activation-pipeline conformance."""

import io

import numpy as np
import pytest

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.io import gcloud as gcloud_codec
from bevy_gaussian_splatting_tpu.io import ply as ply_codec
from bevy_gaussian_splatting_tpu.io.loader import load_cloud, save_cloud


def _np(x):
    return np.asarray(x)


def assert_clouds_equal(a, b, atol=0.0):
    import dataclasses

    assert type(a) is type(b)
    for f in dataclasses.fields(a):
        np.testing.assert_allclose(
            _np(getattr(a, f.name)), _np(getattr(b, f.name)), atol=atol, err_msg=f.name
        )


class TestGcloudRoundTrip:
    """tests/io.rs: encode/decode equality for random 3D and 4D clouds."""

    def test_3d_roundtrip_small(self):
        cloud = bgs.random_gaussians_3d_seeded(100, seed=2)
        data = gcloud_codec.encode_gcloud_3d(cloud)
        out = gcloud_codec.decode_gcloud_3d(data)
        assert_clouds_equal(cloud, out)

    def test_4d_roundtrip_small(self):
        cloud = bgs.random_gaussians_4d_seeded(100, seed=2)
        data = gcloud_codec.encode_gcloud_4d(cloud)
        out = gcloud_codec.decode_gcloud_4d(data)
        assert_clouds_equal(cloud, out)

    def test_bincode2_roundtrip(self):
        """Alternate gzip(bincode) codec (src/io/gcloud/bincode2.rs) with
        magic-sniffed load dispatch and the raw (uncompressed) fallback."""
        from bevy_gaussian_splatting_tpu.io import bincode2

        c3 = bgs.random_gaussians_3d_seeded(300, seed=5)
        data = bincode2.encode_bincode_3d(c3)
        assert data[:2] == b"\x1f\x8b"  # gzip magic
        assert_clouds_equal(c3, bincode2.decode_bincode_3d(data))
        # raw fallback path
        raw = bincode2.encode_bincode_3d(c3, compress=False)
        assert_clouds_equal(c3, bincode2.decode_bincode_3d(raw))

        c4 = bgs.random_gaussians_4d_seeded(70, seed=5)
        assert_clouds_equal(c4, bincode2.decode_bincode_4d(bincode2.encode_bincode_4d(c4)))

    def test_bincode2_file_dispatch(self, tmp_path):
        cloud = bgs.random_gaussians_3d_seeded(64, seed=6)
        p = str(tmp_path / "c.gcloud")
        n = save_cloud(cloud, p, codec="bincode2")
        assert n > 0
        assert_clouds_equal(cloud, load_cloud(p))
        # flexbuffers file at the same extension still loads
        save_cloud(cloud, p)
        assert_clouds_equal(cloud, load_cloud(p))

    def test_npz_roundtrip(self):
        for cloud in (
            bgs.random_gaussians_3d_seeded(1000, seed=3),
            bgs.random_gaussians_4d_seeded(1000, seed=3),
        ):
            out = gcloud_codec.decode_npz(gcloud_codec.encode_npz(cloud))
            assert_clouds_equal(cloud, out)

    def test_loader_dispatch(self, tmp_path):
        cloud = bgs.random_gaussians_3d_seeded(64, seed=4)
        p = str(tmp_path / "c.gcloud")
        nbytes = save_cloud(cloud, p)
        assert nbytes > 0
        out = load_cloud(p)
        assert_clouds_equal(cloud, out)

        c4 = bgs.random_gaussians_4d_seeded(64, seed=4)
        p4 = str(tmp_path / "c.gc4d")
        save_cloud(c4, p4)
        assert_clouds_equal(c4, load_cloud(p4))

        pn = str(tmp_path / "c.npz")
        save_cloud(cloud, pn)
        assert_clouds_equal(cloud, load_cloud(pn))

    def test_loader_rejects_unknown_extension(self, tmp_path):
        with pytest.raises(ValueError):
            save_cloud(bgs.random_gaussians_3d_seeded(8), str(tmp_path / "c.xyz"))


def make_ply_bytes(n=4, rng=None, fmt="binary", type_name="float"):
    """Build a minimal INRIA-style 3DGS PLY with raw (pre-activation) values."""
    rng = rng or np.random.default_rng(0)
    cols = {}
    cols["x"], cols["y"], cols["z"] = (rng.normal(size=n).astype(np.float32) for _ in range(3))
    for i in range(3):
        cols[f"f_dc_{i}"] = rng.normal(size=n).astype(np.float32)
    for i in range(45):
        cols[f"f_rest_{i}"] = rng.normal(size=n).astype(np.float32)
    for i in range(3):
        cols[f"scale_{i}"] = rng.normal(size=n).astype(np.float32)
    cols["opacity"] = rng.normal(size=n).astype(np.float32)
    for i in range(4):
        cols[f"rot_{i}"] = rng.normal(size=n).astype(np.float32)

    names = list(cols)
    if fmt == "binary":
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            + "".join(f"property {type_name} {p}\n" for p in names)
            + "end_header\n"
        ).encode()
        body = np.stack([cols[p] for p in names], axis=1).astype("<f4").tobytes()
    else:
        header = (
            "ply\nformat ascii 1.0\n"
            f"element vertex {n}\n"
            + "".join(f"property float {p}\n" for p in names)
            + "end_header\n"
        ).encode()
        rows = np.stack([cols[p] for p in names], axis=1)
        body = "\n".join(" ".join(f"{v:.9g}" for v in r) for r in rows).encode() + b"\n"
    return header + body, cols


class TestPly3d:
    def test_activations_match_reference(self):
        """sigmoid opacity (ply.rs:40-42), clamp+exp scale (ply.rs:105-116),
        normalized quat (ply.rs:118-124), pad to 32 (ply.rs:127-129)."""
        data, cols = make_ply_bytes(n=5)
        cloud = ply_codec.parse_ply_3d(data)
        assert len(cloud) == 32  # 5 + pad 27

        op = _np(cloud.opacity)[:5]
        np.testing.assert_allclose(op, 1.0 / (1.0 + np.exp(-cols["opacity"])), rtol=1e-5)

        raw_scale = np.stack([cols[f"scale_{i}"] for i in range(3)], axis=1)
        mean = raw_scale.mean(axis=1, keepdims=True)
        expect = np.exp(np.clip(raw_scale, mean - 4.0, mean + 4.0))
        np.testing.assert_allclose(_np(cloud.scale)[:5], expect, rtol=1e-5)

        rot = _np(cloud.rotation)[:5]
        np.testing.assert_allclose(np.linalg.norm(rot, axis=1), 1.0, rtol=1e-5)

        # padding rows are zeroed defaults (reference Gaussian3d::default)
        assert np.all(_np(cloud.scale_opacity)[5:] == 0.0)

    def test_pad_rule_always_appends(self):
        """len % 32 == 0 still appends a full block (ply.rs:127-128 quirk)."""
        data, _ = make_ply_bytes(n=32)
        cloud = ply_codec.parse_ply_3d(data)
        assert len(cloud) == 64

    def test_ascii_matches_binary(self):
        rng = np.random.default_rng(7)
        data_b, _ = make_ply_bytes(n=6, rng=np.random.default_rng(7))
        data_a, _ = make_ply_bytes(n=6, rng=np.random.default_rng(7), fmt="ascii")
        cb = ply_codec.parse_ply_3d(data_b)
        ca = ply_codec.parse_ply_3d(data_a)
        assert_clouds_equal(cb, ca, atol=1e-5)

    def test_float32_type_spelling_keeps_sh(self):
        """A binary PLY declaring ``property float32 f_rest_N`` must infer
        the same SH degree as the ``float`` spelling — the header-only rest
        counter previously missed it and silently dropped every coefficient
        (advisor round-2 finding)."""
        seed = 13
        data_f, _ = make_ply_bytes(n=5, rng=np.random.default_rng(seed))
        data_f32, _ = make_ply_bytes(
            n=5, rng=np.random.default_rng(seed), type_name="float32"
        )
        ref = ply_codec.parse_ply_3d(data_f)
        got = ply_codec.parse_ply_3d(data_f32)
        assert got.spherical_harmonic.shape == ref.spherical_harmonic.shape
        assert_clouds_equal(ref, got)

    def test_missing_required_property_raises(self):
        data, _ = make_ply_bytes(n=3)
        # strip the rot_3 property (name + column) from the stream
        bad = data.replace(b"property float rot_3\n", b"property float qq_3\n")
        with pytest.raises(ValueError, match="missing required"):
            ply_codec.parse_ply_3d(bad)

    def test_f_rest_reference_remap_collision(self):
        """The reference's channel = i/16 quirk: i=0 and i=15 both target
        interleaved slot 3; the later property wins (ply.rs:56-66)."""
        data, cols = make_ply_bytes(n=3)
        cloud = ply_codec.parse_ply_3d(data)
        sh = _np(cloud.spherical_harmonic)[:3]
        np.testing.assert_allclose(sh[:, 3], cols["f_rest_15"], rtol=1e-6)
        # strict=False uses the correct planar mapping: slot 3 <- f_rest_0
        fixed = ply_codec.parse_ply_3d(data, strict_reference=False)
        np.testing.assert_allclose(
            _np(fixed.spherical_harmonic)[:3, 3], cols["f_rest_0"], rtol=1e-6
        )

    def test_writer_roundtrip(self):
        cloud = bgs.random_gaussians_3d_seeded(20, seed=6)
        data = ply_codec.write_ply_3d(cloud)
        out = ply_codec.parse_ply_3d(data, strict_reference=False)
        n = 20
        np.testing.assert_allclose(
            _np(out.position_visibility)[:n], _np(cloud.position_visibility), atol=1e-4
        )
        np.testing.assert_allclose(
            _np(out.spherical_harmonic)[:n], _np(cloud.spherical_harmonic), atol=1e-5
        )
        np.testing.assert_allclose(_np(out.scale_opacity)[:n], _np(cloud.scale_opacity), atol=1e-4)
        # quaternions were random (unnormalized) — compare directions
        qa = _np(out.rotation)[:n]
        qb = _np(cloud.rotation)
        qb = qb / np.linalg.norm(qb, axis=1, keepdims=True)
        np.testing.assert_allclose(np.abs(np.sum(qa * qb, axis=1)), 1.0, atol=1e-4)


class TestPly4d:
    def _make(self, n=5, rng=None):
        rng = rng or np.random.default_rng(1)
        cols = {}
        for k in ["x", "y", "z", "t", "st", "sx", "sy", "sz", "opacity"]:
            cols[k] = rng.normal(size=n).astype(np.float32)
        for k in ["rot_x", "rot_y", "rot_z", "rot_w", "rot_r_x", "rot_r_y", "rot_r_z", "rot_r_w"]:
            cols[k] = rng.normal(size=n).astype(np.float32)
        for ch in "rgb":
            for i in range(48):
                cols[f"feat_{ch}_{i}"] = rng.normal(size=n).astype(np.float32)
        names = list(cols)
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n" + "".join(f"property float {p}\n" for p in names) + "end_header\n"
        ).encode()
        body = np.stack([cols[p] for p in names], axis=1).astype("<f4").tobytes()
        return header + body, cols

    def test_parse_4d(self):
        data, cols = self._make(n=5)
        cloud = ply_codec.parse_ply_4d(data)
        assert len(cloud) == 32
        # raw opacity, no sigmoid (ply.rs:196)
        np.testing.assert_allclose(_np(cloud.opacity)[:5], cols["opacity"], rtol=1e-6)
        # both quats normalized
        iso = _np(cloud.isotropic_rotations)[:5]
        np.testing.assert_allclose(np.linalg.norm(iso[:, :4], axis=1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(iso[:, 4:], axis=1), 1.0, rtol=1e-5)
        # feat_g_2 -> interleaved slot 2*3+1
        np.testing.assert_allclose(
            _np(cloud.spherindrical_harmonic)[:5, 2 * 3 + 1], cols["feat_g_2"], rtol=1e-6
        )
        np.testing.assert_allclose(_np(cloud.timestamp)[:5], cols["t"], rtol=1e-6)


class TestNative:
    """C++ native IO layer (bevy_gaussian_splatting_tpu/native)."""

    def test_native_ply_matches_python(self):
        from bevy_gaussian_splatting_tpu import native

        if not native.available():
            import pytest

            pytest.skip("no C++ toolchain")
        cloud = bgs.random_gaussians_3d_seeded(500, seed=8)
        data = ply_codec.write_ply_3d(cloud)
        a = ply_codec.parse_ply_3d(data, use_native=True)
        b = ply_codec.parse_ply_3d(data, use_native=False)
        assert_clouds_equal(a, b, atol=1e-5)

    def test_native_gcloud_cross_impl(self):
        """C++ and Python flexbuffers codecs must interoperate both ways."""
        from bevy_gaussian_splatting_tpu import native

        if not native.available():
            import pytest

            pytest.skip("no C++ toolchain")
        c3 = bgs.random_gaussians_3d_seeded(120, seed=9)
        c4 = bgs.random_gaussians_4d_seeded(90, seed=9)
        for cloud, enc, dec in (
            (c3, gcloud_codec.encode_gcloud_3d, gcloud_codec.decode_gcloud_3d),
            (c4, gcloud_codec.encode_gcloud_4d, gcloud_codec.decode_gcloud_4d),
        ):
            data_native = enc(cloud, use_native=True)
            data_python = enc(cloud, use_native=False)
            assert data_native != data_python  # different valid encodings
            # native encode -> python decode
            assert_clouds_equal(cloud, dec(data_native, use_native=False))
            # python encode -> native decode
            assert_clouds_equal(cloud, dec(data_python, use_native=True))
            # native round trip
            assert_clouds_equal(cloud, dec(data_native, use_native=True))

    def test_native_radix_sort_stable_ascending(self, rng):
        from bevy_gaussian_splatting_tpu import native

        k = rng.integers(0, 2**32, 10_000, dtype=np.uint32)
        v = np.arange(10_000, dtype=np.uint32)
        ks, vs = native.radix_sort_pairs(k.copy(), v.copy())
        order = np.argsort(k, kind="stable")
        np.testing.assert_array_equal(ks, k[order])
        np.testing.assert_array_equal(vs, v[order])
