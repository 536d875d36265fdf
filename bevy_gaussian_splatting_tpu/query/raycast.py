"""Point-in-mesh testing via Möller–Trumbore ray-triangle parity.

Reference: src/query/raycast.rs:54-124 — casts a +x ray from each point and
counts triangle intersections; odd parity = inside.  Vectorized over
points x triangles in jnp (the reference loops triangles serially per point).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-6  # raycast.rs:92


def ray_intersects_triangle(
    ray_origin: jnp.ndarray,  # [..., 3]
    ray_direction: jnp.ndarray,  # [3]
    v0: jnp.ndarray,  # [..., 3]
    v1: jnp.ndarray,
    v2: jnp.ndarray,
) -> jnp.ndarray:
    """Möller–Trumbore (raycast.rs:91-124), broadcastable."""
    edge1 = v1 - v0
    edge2 = v2 - v0
    h = jnp.cross(jnp.broadcast_to(ray_direction, edge2.shape), edge2)
    a = jnp.sum(edge1 * h, axis=-1)
    non_parallel = jnp.abs(a) > EPSILON
    f = 1.0 / jnp.where(non_parallel, a, 1.0)
    s = ray_origin - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, edge1)
    v = f * jnp.sum(ray_direction * q, axis=-1)
    t = f * jnp.sum(edge2 * q, axis=-1)
    return (
        non_parallel
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > EPSILON)
    )


def points_in_mesh(
    points: jnp.ndarray,  # [P, 3]
    vertices: jnp.ndarray,  # [V, 3]
    indices: jnp.ndarray,  # [F, 3] int
    mesh_transform: jnp.ndarray | None = None,  # [4, 4] mesh-to-world
) -> jnp.ndarray:
    """bool [P]: odd +x-ray crossing parity (raycast.rs:54-90).  Points are
    transformed into mesh-local space like the reference's inverse-transform."""
    if mesh_transform is not None:
        inv = jnp.linalg.inv(mesh_transform)
        points = points @ inv[:3, :3].T + inv[:3, 3]

    tri = vertices[indices]  # [F, 3, 3]
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    ray_dir = jnp.array([1.0, 0.0, 0.0], jnp.float32)

    def per_point(p):
        hits = ray_intersects_triangle(p, ray_dir, v0, v1, v2)
        return jnp.sum(hits.astype(jnp.int32)) % 2 == 1

    return jax.vmap(per_point)(points)


def select_in_mesh(cloud, vertices, indices, mesh_transform=None):
    """Selection of gaussians whose centers fall inside the mesh."""
    import numpy as np

    from bevy_gaussian_splatting_tpu.query.select import Select

    inside = points_in_mesh(cloud.position, jnp.asarray(vertices), jnp.asarray(indices), mesh_transform)
    return Select(np.nonzero(np.asarray(inside))[0])
