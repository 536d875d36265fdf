"""Particle behaviors: jerk -> acceleration -> velocity -> position integrator.

Reference: src/morph/particle.rs + src/morph/particle.wgsl:23-53.  The WGSL
kernel integrates each behavior's cubic motion into ``position_visibility`` via
a read-write storage binding; here it is a functional ``step``: scatter-add of
the per-behavior deltas into the cloud (TPU scatter, no atomics needed since
behavior->point is one-to-one in the reference's usage).

Faithful quirk: the reference adds the *vec4* delta to position_visibility, so
a nonzero ``velocity.w`` drifts the visibility channel too (particle.wgsl:37-47).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.models.cloud import Gaussian3dCloud


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class ParticleBehaviors:
    """SoA mirror of the reference's ParticleBehavior storage buffer."""

    indices: jax.Array  # [B] int32, negative = inert (particle.wgsl:41-43)
    velocity: jax.Array  # [B, 4]
    acceleration: jax.Array  # [B, 4]
    jerk: jax.Array  # [B, 4]

    @staticmethod
    def random(n: int, seed: int = 0, scale: float = 0.1) -> "ParticleBehaviors":
        rng = np.random.default_rng(seed)
        z = np.zeros((n, 1), np.float32)

        def vec(s):
            return jnp.asarray(
                np.concatenate([rng.normal(0, s, (n, 3)).astype(np.float32), z], axis=1)
            )

        return ParticleBehaviors(
            indices=jnp.arange(n, dtype=jnp.int32),
            velocity=vec(scale),
            acceleration=vec(scale * 0.1),
            jerk=vec(scale * 0.01),
        )


def apply_particle_behaviors(
    cloud: Gaussian3dCloud,
    behaviors: ParticleBehaviors,
    delta_time: float,
) -> tuple[Gaussian3dCloud, ParticleBehaviors]:
    """One integration step (particle.wgsl:23-53)."""
    dt = jnp.float32(delta_time)
    v, a, j = behaviors.velocity, behaviors.acceleration, behaviors.jerk

    delta_position = v * dt + 0.5 * a * dt * dt + (1.0 / 6.0) * j * dt * dt * dt
    new_velocity = v + a * dt + 0.5 * j * dt * dt
    new_acceleration = a + j * dt

    active = behaviors.indices >= 0
    idx = jnp.clip(behaviors.indices, 0, len(cloud) - 1)
    delta = jnp.where(active[:, None], delta_position, 0.0)

    pv = cloud.position_visibility.at[idx].add(delta)
    new_cloud = dataclasses.replace(cloud, position_visibility=pv)
    new_behaviors = ParticleBehaviors(
        indices=behaviors.indices,
        velocity=jnp.where(active[:, None], new_velocity, v),
        acceleration=jnp.where(active[:, None], new_acceleration, a),
        jerk=behaviors.jerk,
    )
    return new_cloud, new_behaviors
