"""Bounded band exchange: deliver each projected splat only to the devices
whose tile-row band its screen rect intersects.

Replaces the naive ``lax.all_gather`` of the FULL projected-param set (every
device receives all N rows) with an ``all_to_all`` of per-destination
compacted slices: device d receives ``n_bands * budget`` rows — the rows
whose rect intersects band d (exactly the set the band's binning window would
keep) — so the collective volume scales with the band's *coverage*, not with
N.  This is the SURVEY §7 "bounded per-tile-band gather"; on a multi-host
mesh it is the difference between shipping the whole scene over DCN per frame
and shipping each host only its band's working set.

TPU-shaped construction (no atomics, no scatter):
  1. span expansion — (splat, band) pairs born in LOCAL INDEX order via
     cumsum + scatter-max/cummax slot ownership (ops/rasterize_tile
     machinery); a splat spanning k bands is duplicated k times;
  2. ONE stable 1-key sort by destination band; within a destination, pairs
     stay index-ordered, so the all_to_all concatenation (sources stacked in
     rank order) leaves the receiver's rows sorted by GLOBAL cloud index —
     bit-identical ordering to slicing a full all-gather;
  3. per-destination ``dynamic_slice`` of the static ``budget`` rows
     (validity-masked; overflow truncates the highest-index pairs — size the
     budget from :func:`band_pair_count` with headroom);
  4. ``lax.all_to_all`` (tiled) over the mesh axis.

The whole exchange is a ``jax.custom_vjp``: the backward runs the SAME
all_to_all in reverse, rebuilds per-pair gradients with ascending
``dynamic_update_slice`` (later segments overwrite earlier overrun rows —
non-overlapping by construction), inverse-permutes via the sort's inverse
(one integer sort), and reduces duplicated pairs per splat with the
scatter-free contiguous segmented sum — the same formulation as the training
core's gradient reduction (ops/rasterize_tile.segment_sum_contiguous).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
    searchsorted_wide,
    segment_sum_contiguous,
    slot_owner_scan,
)


def band_interval(ty0: jnp.ndarray, ty1: jnp.ndarray, rows_per_band: int):
    """First/last intersecting band for per-splat tile-row ranges."""
    return ty0 // rows_per_band, ty1 // rows_per_band


def band_pairs_budget(n_local: int, hint: Optional[int] = None,
                      headroom: float = 1.25) -> int:
    """Static (splat, band) pair capacity per device.  Without a hint, assume
    an average span of 2 bands (64+ px bands make >1-band rects rare)."""
    if hint is None:
        return max(2 * n_local, 256)
    return min(max(int(hint * headroom) + 1, 256), 8 * n_local)


def exchange_bytes_per_device(n_total: int, n_bands: int, cols: int,
                              budget: Optional[int] = None) -> dict:
    """Collective-volume accounting: received bytes per device per frame for
    the full all-gather vs the bounded exchange."""
    out = {"allgather": n_total * cols * 4}
    if budget is not None:
        out["bounded"] = n_bands * budget * cols * 4
    return out


def _plan(b0, b1, active, n_local, p_band, n_bands):
    """Non-differentiable exchange plan: slot ownership, destinations, sort,
    per-destination segment starts."""
    span = jnp.where(active, b1 - b0 + 1, 0).astype(jnp.int32)
    cum = jnp.cumsum(span)
    total = cum[-1]
    offsets = cum - span

    slots = jnp.arange(p_band, dtype=jnp.int32)
    valid = slots < jnp.minimum(total, p_band)
    starts = jnp.where(span > 0, offsets, p_band)
    gidx = slot_owner_scan(starts, jnp.arange(n_local, dtype=jnp.int32), p_band)
    k = slots - offsets[gidx]
    dest = jnp.clip(b0[gidx] + k, 0, n_bands - 1)
    dest = jnp.where(valid, dest, n_bands)  # sentinel sorts last

    # stable sort by destination; pairs born index-ordered stay index-ordered
    # within each destination segment
    dest_s, gidx_s, slot_s = jax.lax.sort(
        (dest, gidx, slots), num_keys=1, is_stable=True
    )
    # inverse of the pair sort (for the backward's un-permute)
    _, inv_pair = jax.lax.sort((slot_s, slots), num_keys=1)
    seg_starts = searchsorted_wide(dest_s, jnp.arange(n_bands, dtype=jnp.int32),
                                   side="left")
    seg_ends = searchsorted_wide(dest_s, jnp.arange(n_bands, dtype=jnp.int32),
                                 side="right")
    return gidx, gidx_s, inv_pair, seg_starts, seg_ends, offsets, span


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def band_exchange(payload, b0, b1, active, n_bands, budget, axis_name):
    """payload [N_local, C] -> received [n_bands * budget, C].

    Device d's output stacks, per source rank, the source's splats whose band
    interval [b0, b1] contains d (index-ordered, validity-zeroed, truncated
    at ``budget`` rows per source)."""
    out, _ = _band_exchange_fwd(payload, b0, b1, active, n_bands, budget,
                                axis_name)
    return out


def _send_buffer(pair_payload_s, seg_starts, seg_ends, n_bands, budget):
    def one(d):
        start = seg_starts[d]
        rows = jax.lax.dynamic_slice(
            pair_payload_s, (start, 0), (budget, pair_payload_s.shape[1])
        )
        ok = (start + jnp.arange(budget, dtype=jnp.int32)) < seg_ends[d]
        return rows * ok[:, None].astype(rows.dtype)

    return jnp.stack([one(d) for d in range(n_bands)])  # [n_bands, B, C]


def _band_exchange_fwd(payload, b0, b1, active, n_bands, budget, axis_name):
    n_local = payload.shape[0]
    p_band = band_pairs_budget(n_local)
    plan = _plan(b0, b1, active, n_local, p_band, n_bands)
    gidx, gidx_s, inv_pair, seg_starts, seg_ends, offsets, span = plan

    pair_payload_s = payload[gidx_s]  # ONE wide row gather, in sorted order
    send = _send_buffer(pair_payload_s, seg_starts, seg_ends, n_bands, budget)
    received = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=True
    )  # [n_bands * budget, C] after reshape
    received = received.reshape(n_bands * budget, payload.shape[1])
    residuals = (gidx, inv_pair, seg_starts, seg_ends, offsets, span,
                 payload.shape)
    return received, residuals


def _band_exchange_bwd(n_bands, budget, axis_name, residuals, d_received):
    gidx, inv_pair, seg_starts, seg_ends, offsets, span, pshape = residuals
    n_local, cols = pshape
    p_band = gidx.shape[0]

    d_recv = d_received.reshape(n_bands, budget, cols)
    # reverse the all_to_all (self-transpose for symmetric split/concat axes)
    d_send = jax.lax.all_to_all(
        d_recv, axis_name, split_axis=0, concat_axis=0, tiled=True
    )
    # place the per-destination slices back into sorted pair order via
    # read-merge-write windows: rows outside the segment keep the current
    # value, so overrun rows and dynamic_slice START-CLAMPING (segments near
    # the buffer end) can never clobber other segments
    d_pairs_sorted = jnp.zeros((p_band, cols), d_send.dtype)
    for d in range(n_bands):
        ok = (seg_starts[d] + jnp.arange(budget, dtype=jnp.int32)) < seg_ends[d]
        cur = jax.lax.dynamic_slice(
            d_pairs_sorted, (seg_starts[d], 0), (budget, cols)
        )
        merged = jnp.where(ok[:, None], d_send[d], cur)
        d_pairs_sorted = jax.lax.dynamic_update_slice(
            d_pairs_sorted, merged, (seg_starts[d], 0)
        )
    # un-permute to born (index-major) order, then reduce duplicates per splat
    d_pairs_born = d_pairs_sorted[inv_pair]
    d_payload = segment_sum_contiguous(
        d_pairs_born, gidx, offsets, span, max_segment=n_bands
    )
    f0 = jax.dtypes.float0  # int/bool operands take symbolic-zero cotangents

    def nil(shape):
        return np.zeros(shape, dtype=f0)

    return (d_payload, nil((n_local,)), nil((n_local,)), nil((n_local,)))


band_exchange.defvjp(_band_exchange_fwd, _band_exchange_bwd)


def band_pair_count(b0, b1, active) -> jnp.ndarray:
    """Exact (splat, band) pair count for budget sizing (cheap N-sized op)."""
    return jnp.sum(jnp.where(active, b1 - b0 + 1, 0).astype(jnp.int32))
