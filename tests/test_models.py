"""Data-model tests (reference analogue: tests/gaussian.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.models.cloud import (
    DEFAULT_PAD_MULTIPLE,
    SH_4D_COEFF_COUNT,
    SH_COEFF_COUNT,
    Gaussian3dCloud,
    random_gaussians_3d_seeded,
    random_gaussians_4d_seeded,
    test_model_3d as make_test_model,
)
from bevy_gaussian_splatting_tpu.models.settings import (
    CloudSettings,
    PlaybackMode,
    RadixSortDepthBits,
)
from bevy_gaussian_splatting_tpu.models.camera import Camera


def test_sh_constants():
    assert SH_COEFF_COUNT == 48
    assert SH_4D_COEFF_COUNT == 144


def test_random_cloud_shapes_and_ranges():
    cloud = random_gaussians_3d_seeded(100, seed=7)
    assert len(cloud) == 100
    assert cloud.spherical_harmonic.shape == (100, 48)
    pos = np.asarray(cloud.position)
    assert pos.min() >= -20.0 and pos.max() <= 20.0
    op = np.asarray(cloud.opacity)
    assert op.min() >= 0.0 and op.max() <= 0.8
    assert np.all(np.asarray(cloud.visibility) == 1.0)


def test_random_4d_cloud():
    cloud = random_gaussians_4d_seeded(64, seed=3)
    assert cloud.spherindrical_harmonic.shape == (64, 144)
    assert cloud.isotropic_rotations.shape == (64, 8)
    norms = np.linalg.norm(np.asarray(cloud.rotation), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_test_model_matches_reference_layout():
    # 8 corners + duplicate of the first (planar_3d.rs:190-247)
    cloud = make_test_model()
    assert len(cloud) == 9
    pos = np.asarray(cloud.position)
    np.testing.assert_allclose(pos[0], pos[8])
    np.testing.assert_allclose(np.abs(pos[:8]), 0.5)
    np.testing.assert_allclose(np.asarray(cloud.scale_opacity), 0.125)


def test_pad_cloud():
    cloud = random_gaussians_3d_seeded(10, seed=1)
    padded = cloud.pad()
    assert len(padded) == DEFAULT_PAD_MULTIPLE
    # padded rows are inert: opacity 0, visibility 0, identity quaternion
    assert np.all(np.asarray(padded.opacity[10:]) == 0.0)
    assert np.all(np.asarray(padded.visibility[10:]) == 0.0)
    np.testing.assert_allclose(
        np.asarray(padded.rotation[10:]), [[1, 0, 0, 0]] * (len(padded) - 10)
    )
    # original data untouched
    np.testing.assert_allclose(
        np.asarray(padded.position_visibility[:10]),
        np.asarray(cloud.position_visibility),
    )


def test_cloud_is_pytree():
    cloud = random_gaussians_3d_seeded(8, seed=1)
    mapped = jax.tree.map(lambda a: a * 2.0, cloud)
    assert isinstance(mapped, Gaussian3dCloud)
    np.testing.assert_allclose(
        np.asarray(mapped.position), 2.0 * np.asarray(cloud.position)
    )


def test_compute_aabb():
    cloud = make_test_model()
    mn, mx = cloud.compute_aabb()
    np.testing.assert_allclose(np.asarray(mn), [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(np.asarray(mx), [0.5, 0.5, 0.5])


def test_settings_defaults_match_reference():
    # src/gaussian/settings.rs:110-132
    s = CloudSettings()
    assert s.aabb is False
    assert s.global_opacity == 1.0
    assert s.opacity_adaptive_radius is True
    assert s.radix_sort_depth_bits is RadixSortDepthBits.BITS_32
    assert s.num_classes == 1
    assert s.time_stop == 1.0
    assert isinstance(hash(s.static_key()), int)


def test_playback_update():
    from bevy_gaussian_splatting_tpu.models.settings import playback_update

    s = CloudSettings(playback_mode=PlaybackMode.LOOP, time=0.9, time_stop=1.0)
    s2 = playback_update(s, delta_seconds=0.05, elapsed_seconds=0.0)
    assert abs(s2.time - 0.95) < 1e-6
    s3 = playback_update(s2, delta_seconds=0.2, elapsed_seconds=0.0)
    assert s3.time == s.time_start  # looped

    still = CloudSettings(playback_mode=PlaybackMode.STILL, time=0.5)
    assert playback_update(still, 1.0, 1.0).time == 0.5


def test_camera_projection_reverse_z():
    cam = Camera.create(eye=(0.0, 0.0, 5.0), target=(0.0, 0.0, 0.0), width=64, height=64)
    # point at the near plane projects to ndc z == 1; far points to z -> 0
    from bevy_gaussian_splatting_tpu.ops.transforms import world_to_clip

    near_pt = jnp.array([[0.0, 0.0, 5.0 - 0.1]])
    far_pt = jnp.array([[0.0, 0.0, -100.0]])
    ndc_near = world_to_clip(near_pt, cam.clip_from_world)
    ndc_far = world_to_clip(far_pt, cam.clip_from_world)
    assert abs(float(ndc_near[0, 2]) - 1.0) < 2e-3  # f32 cancellation near plane
    assert float(ndc_far[0, 2]) < 0.01
    # center of view projects to ndc origin
    np.testing.assert_allclose(np.asarray(ndc_far[0, :2]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.world_position), [0.0, 0.0, 5.0], atol=1e-5)
