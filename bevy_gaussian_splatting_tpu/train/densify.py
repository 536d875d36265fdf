"""Adaptive density control — clone / split / prune for 3DGS training.

The reference is a renderer and does not train; this module supplies the
standard 3DGS densification loop (Kerbl et al. §5.2) re-designed for TPU
static shapes:

  - the cloud lives in a FIXED-capacity buffer; dead rows carry opacity 0 and
    visibility 0 (exactly how the renderer already masks padded rows)
  - each densify step has a static budget of K insertions: the top-K
    highest-gradient candidates clone (small splats) or split (large splats)
    into dead slots, selected with ``jax.lax.top_k`` — no dynamic shapes, no
    host sync, fully jittable
  - prune zeroes opacity/visibility instead of compacting; the renderer's
    mask and the pair expansion drop dead rows, so render cost tracks the
    LIVE count, not capacity

State: per-gaussian accumulators of the screen-space positional gradient norm
and an observation count, reset after each densify (matching the original's
``xyz_gradient_accum / denom``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


class DensifyState(NamedTuple):
    grad_accum: jax.Array  # [N] accumulated ||d position||
    count: jax.Array  # [N] observations since last densify
    key: jax.Array  # PRNG state for split sampling


def init_densify_state(capacity: int, seed: int = 0) -> DensifyState:
    return DensifyState(
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        count=jnp.zeros((capacity,), jnp.int32),
        key=jax.random.PRNGKey(seed),
    )


def accumulate_stats(state: DensifyState, grads) -> DensifyState:
    """Fold one step's positional gradients into the accumulators.

    ``grads`` is the cloud-pytree gradient from the training step; the
    densification signal is the norm of d(position)."""
    gnorm = jnp.linalg.norm(grads.position_visibility[:, :3], axis=-1)
    seen = gnorm > 0.0
    return state._replace(
        grad_accum=state.grad_accum + gnorm,
        count=state.count + seen.astype(jnp.int32),
    )


def _quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v [K, 3] by unit quaternions q [K, 4] (w, x, y, z)."""
    w, x, y, z = q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4]
    u = jnp.concatenate([x, y, z], axis=-1)
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def densify_and_prune(
    cloud,
    state: DensifyState,
    k_budget: int = 1024,
    grad_threshold: float = 2e-4,
    percent_dense: float = 0.01,
    scene_extent: float = 1.0,
    prune_opacity: float = 0.005,
    split_scale_shrink: float = 1.6,
):
    """One adaptive-density step -> (new_cloud, new_state, stats dict).

    Top-``k_budget`` gaussians with mean positional gradient above
    ``grad_threshold`` are densified: splats with max scale below
    ``percent_dense * scene_extent`` are CLONED (duplicate nudged along the
    gradient direction is approximated by an identical copy, as in the
    original), larger ones are SPLIT (new sample drawn from the splat's own
    distribution, scales divided by ``split_scale_shrink``; the original
    splits into 2 and replaces — here the parent keeps one shrunken copy and
    the child takes the sample).  Gaussians with opacity below
    ``prune_opacity`` are pruned (opacity+visibility zeroed).
    """
    n = len(cloud)
    k_budget = min(k_budget, n)
    live = cloud.scale_opacity[:, 3] > 0.0

    mean_grad = state.grad_accum / jnp.maximum(state.count.astype(jnp.float32), 1.0)
    score = jnp.where(live & (state.count > 0), mean_grad, -1.0)
    top_score, src = jax.lax.top_k(score, k_budget)
    eligible = top_score > grad_threshold  # [K]

    # dead slots to write children into: smallest opacity first (dead rows
    # have opacity 0; if fewer than K dead slots exist, the extra writes are
    # disabled rather than overwriting live gaussians)
    neg_opacity = -cloud.scale_opacity[:, 3]
    _, dst = jax.lax.top_k(neg_opacity, k_budget)
    dst_dead = cloud.scale_opacity[dst, 3] <= 0.0
    write = eligible & dst_dead

    src_pv = cloud.position_visibility[src]
    src_sh = cloud.spherical_harmonic[src]
    src_rot = cloud.rotation[src]
    src_so = cloud.scale_opacity[src]

    max_scale = jnp.max(src_so[:, :3], axis=-1)
    do_split = max_scale > percent_dense * scene_extent  # else clone

    key, sub = jax.random.split(state.key)
    # split sample: x ~ N(mean, Sigma) via rotating a scale-weighted normal
    eps = jax.random.normal(sub, (k_budget, 3)) * src_so[:, :3]
    offset = _quat_rotate(src_rot / jnp.maximum(
        jnp.linalg.norm(src_rot, axis=-1, keepdims=True), 1e-12), eps)
    child_pos = jnp.where(do_split[:, None], src_pv[:, :3] + offset, src_pv[:, :3])
    child_scale = jnp.where(
        do_split[:, None], src_so[:, :3] / split_scale_shrink, src_so[:, :3]
    )
    child_pv = jnp.concatenate([child_pos, src_pv[:, 3:4]], axis=-1)
    child_so = jnp.concatenate([child_scale, src_so[:, 3:4]], axis=-1)

    # masked scatter of children into dead slots
    def put(arr, rows):
        rows = jnp.where(write[:, None], rows, arr[dst])
        return arr.at[dst].set(rows)

    new_pv = put(cloud.position_visibility, child_pv)
    new_sh = put(cloud.spherical_harmonic, src_sh)
    new_rot = put(cloud.rotation, src_rot)
    new_so = put(cloud.scale_opacity, child_so)

    # split parents also shrink in place
    parent_scale = jnp.where(
        (write & do_split)[:, None],
        src_so[:, :3] / split_scale_shrink,
        new_so[src, :3],
    )
    new_so = new_so.at[src, :3].set(parent_scale)

    # prune: zero opacity AND visibility (render mask) for dim live splats
    prune = live & (new_so[:, 3] < prune_opacity)
    new_so = jnp.where(prune[:, None], new_so * jnp.array([1, 1, 1, 0.0]), new_so)
    new_pv = jnp.where(prune[:, None], new_pv * jnp.array([1, 1, 1, 0.0]), new_pv)

    new_cloud = dataclasses.replace(
        cloud,
        position_visibility=new_pv,
        spherical_harmonic=new_sh,
        rotation=new_rot,
        scale_opacity=new_so,
    )
    new_state = DensifyState(
        grad_accum=jnp.zeros_like(state.grad_accum),
        count=jnp.zeros_like(state.count),
        key=key,
    )
    stats = {
        "added": jnp.sum(write.astype(jnp.int32)),
        "split": jnp.sum((write & do_split).astype(jnp.int32)),
        "cloned": jnp.sum((write & ~do_split).astype(jnp.int32)),
        "pruned": jnp.sum(prune.astype(jnp.int32)),
        "live": jnp.sum((new_so[:, 3] > 0.0).astype(jnp.int32)),
    }
    return new_cloud, new_state, stats
