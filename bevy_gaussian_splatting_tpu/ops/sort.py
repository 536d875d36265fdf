"""Depth sorting — key generation and device/host sort backends.

The key function is a bit-exact transcription of the GPU radix sort's key
generation (src/sort/radix.wgsl:86-103):

    dist2 = |transformed_position - camera_position|^2
    key   = in_frustum ? (0xFFFFFFFF - f32_bits(dist2)) : 0xFFFFFFFF
    key >>= (32 - depth_bits)

Ascending key order = far-to-near (back-to-front painter order); the sentinel
0xFFFFFFFF marks culled entries, discarded at draw time
(src/render/gaussian.wgsl:215).  The reference's CPU mirror tests
(tests/radix.rs:9-106) port directly against this module.

On TPU the multi-pass LSD radix pipeline (8 ping-pong bind groups, global
atomics) is replaced by a single ``jax.lax.sort`` over (key, index) — XLA lowers
this to an on-chip bitonic/merge network with no atomics.  The host backends
mirror the reference's Rayon/Std CPU sorts (src/sort/rayon.rs:27-130,
std_sort.rs:27-130): float distance, descending (back-to-front).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.ops.transforms import (
    apply_transform,
    in_frustum,
    world_to_clip,
)

SENTINEL_KEY = np.uint32(0xFFFFFFFF)


def radix_depth_key(
    position: jnp.ndarray,  # [N, 3] cloud-local positions
    model_transform: jnp.ndarray,  # [4, 4]
    clip_from_world: jnp.ndarray,  # [4, 4]
    camera_position: jnp.ndarray,  # [3]
    depth_bits: int = 32,
) -> jnp.ndarray:
    """u32 depth keys [N] exactly as radix_sort_a computes them
    (src/sort/radix.wgsl:86-103)."""
    world = apply_transform(model_transform, position)
    clip = world_to_clip(world, clip_from_world)
    visible = in_frustum(clip[..., :3])

    diff = world - camera_position
    dist2 = jnp.sum(diff * diff, axis=-1)
    dist_bits = jax.lax.bitcast_convert_type(dist2, jnp.uint32)
    key_distance = jnp.uint32(0xFFFFFFFF) - dist_bits
    key = jnp.where(visible, key_distance, jnp.uint32(0xFFFFFFFF))
    shift = np.uint32(32 - depth_bits)
    return (key >> shift).astype(jnp.uint32)


def sort_entries(keys: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stable ascending sort; returns (sorted_keys, sorted_indices) — the
    ``SortedEntries`` {key, index} pairs (src/sort/mod.rs:324-339)."""
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    sorted_keys, sorted_idx = jax.lax.sort((keys, idx), num_keys=1, is_stable=True)
    return sorted_keys, sorted_idx


def sort_gaussians_radix(
    position: jnp.ndarray,
    model_transform: jnp.ndarray,
    clip_from_world: jnp.ndarray,
    camera_position: jnp.ndarray,
    depth_bits: int = 32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full device sort: key gen + sort. Back-to-front order with culled entries
    (sentinel keys) at the end."""
    keys = radix_depth_key(
        position, model_transform, clip_from_world, camera_position, depth_bits
    )
    return sort_entries(keys)


def sort_gaussians_host(
    position: np.ndarray,
    model_transform: np.ndarray,
    camera_position: np.ndarray,
) -> np.ndarray:
    """Host reference sort mirroring SortMode::Std / SortMode::Rayon
    (src/sort/std_sort.rs:27-130): per-gaussian squared distance to camera,
    descending (back-to-front).  No frustum culling in the CPU paths."""
    world = position @ np.asarray(model_transform)[:3, :3].T + np.asarray(
        model_transform
    )[:3, 3]
    diff = world - np.asarray(camera_position)
    dist2 = np.sum(diff * diff, axis=-1)
    return np.argsort(-dist2, kind="stable").astype(np.uint32)


# -- radix digit bookkeeping (for the reference's tests/radix.rs parity) -------


def digit_places(depth_bits: int) -> int:
    """Reference: ShaderDefines::for_radix_depth_bits (src/render/mod.rs:715-722)."""
    return depth_bits // 8


def key_shift(depth_bits: int) -> int:
    return 32 - depth_bits


def digit_of(key: np.ndarray, place: int, bits_per_digit: int = 8) -> np.ndarray:
    """Digit extraction as in radix_sort_a (src/sort/radix.wgsl:100-102)."""
    base = (1 << bits_per_digit) - 1
    return (key >> np.uint32(place * bits_per_digit)) & np.uint32(base)


def final_pass_parity(depth_bits: int) -> int:
    """Ping-pong parity invariant: which buffer the last pass writes
    (src/render/mod.rs radix_initial_parity; tested in tests/radix.rs:65-79).
    The final pass must land in ``sorted_entries``; with digit_places passes the
    initial parity is digit_places % 2."""
    return digit_places(depth_bits) % 2


# -- host re-sort scheduling (reference SortConfig / SortTrigger) -------------


class SortSchedule:
    """Adaptive host-sort throttle mirroring the reference's policy
    (src/sort/mod.rs:76-86, 153-194; std_sort.rs:121-129):

      - re-sort when the camera moved and at least ``period_ms`` elapsed
      - after each sort, period_ms = max(1000, 4 * measured sort duration)

    Device sorts re-sort every frame (they are effectively free); this is for
    the CPU SortMode.STD / SortMode.RAYON paths on huge clouds."""

    def __init__(self, period_ms: float = 1000.0):
        self.period_ms = period_ms
        self.last_sort_ms: float = -1e30
        self.last_camera_position = None
        self.order = None

    def needs_sort(self, camera_position, now_ms: float) -> bool:
        import numpy as _np

        if self.order is None or self.last_camera_position is None:
            return True
        moved = not _np.allclose(
            _np.asarray(camera_position), self.last_camera_position, atol=1e-6
        )
        return moved and (now_ms - self.last_sort_ms) >= self.period_ms

    def maybe_sort(self, position, model_transform, camera_position, now_ms=None):
        """Returns the (possibly cached) back-to-front order."""
        import time as _time

        import numpy as _np

        if now_ms is None:
            now_ms = _time.perf_counter() * 1e3
        if self.needs_sort(camera_position, now_ms):
            t0 = _time.perf_counter()
            self.order = sort_gaussians_host(
                _np.asarray(position), _np.asarray(model_transform),
                _np.asarray(camera_position),
            )
            duration_ms = (_time.perf_counter() - t0) * 1e3
            # reference: period >= max(1000ms, 4x sort duration)
            self.period_ms = max(1000.0, 4.0 * duration_ms)
            self.last_sort_ms = now_ms
            self.last_camera_position = _np.asarray(camera_position).copy()
        return self.order
