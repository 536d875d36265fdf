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
    # one search over n_bands + 1 integer queries: seg_ends[b] ==
    # seg_starts[b+1] (first index >= b+1 is the first index > b)
    bounds = searchsorted_wide(
        dest_s, jnp.arange(n_bands + 1, dtype=jnp.int32), side="left"
    )
    seg_starts = bounds[:n_bands]
    seg_ends = bounds[1:]
    return gidx, gidx_s, dest_s, inv_pair, seg_starts, seg_ends, offsets, span


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
    """[n_bands, budget, C] per-destination slices — ONE vectorized row
    gather (no per-destination ``dynamic_slice`` loop: serial slices were a
    compile/latency wall at 64+ bands, and start-clamping near the buffer end
    silently shipped earlier segments' rows marked valid).  Out-of-segment
    rows ``where``-select to zero (NOT a multiply: a mask multiply would
    canonicalize bitcast sort keys whose pattern lands on a NaN encoding)."""
    p_band, cols = pair_payload_s.shape
    idx = seg_starts[:, None] + jnp.arange(budget, dtype=jnp.int32)[None, :]
    ok = idx < seg_ends[:, None]  # [n_bands, budget]
    rows = pair_payload_s[jnp.clip(idx.reshape(-1), 0, p_band - 1)]
    rows = jnp.where(ok.reshape(-1)[:, None], rows, 0.0)
    return rows.reshape(n_bands, budget, cols)


def _band_exchange_fwd(payload, b0, b1, active, n_bands, budget, axis_name):
    n_local = payload.shape[0]
    p_band = band_pairs_budget(n_local)
    plan = _plan(b0, b1, active, n_local, p_band, n_bands)
    gidx, gidx_s, dest_s, inv_pair, seg_starts, seg_ends, offsets, span = plan

    pair_payload_s = payload[gidx_s]  # ONE wide row gather, in sorted order
    send = _send_buffer(pair_payload_s, seg_starts, seg_ends, n_bands, budget)
    received = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=True
    )  # [n_bands * budget, C] after reshape
    received = received.reshape(n_bands * budget, payload.shape[1])
    residuals = (gidx, dest_s, inv_pair, seg_starts, offsets, span,
                 payload.shape)
    return received, residuals


def _band_exchange_bwd(n_bands, budget, axis_name, residuals, d_received):
    gidx, dest_s, inv_pair, seg_starts, offsets, span, pshape = residuals
    n_local, cols = pshape
    p_band = gidx.shape[0]

    d_recv = d_received.reshape(n_bands, budget, cols)
    # reverse the all_to_all (self-transpose for symmetric split/concat axes)
    d_send = jax.lax.all_to_all(
        d_recv, axis_name, split_axis=0, concat_axis=0, tiled=True
    )
    # place the per-destination slices back into sorted pair order with ONE
    # vectorized gather: sorted position p belongs to segment dest_s[p] at
    # within-segment offset p - seg_starts[dest], i.e. flat send-buffer row
    # dest * budget + off.  Sentinel pairs (dest == n_bands) and rows the
    # forward truncated (off >= budget) read the trailing zero row.
    d_flat = jnp.concatenate(
        [d_send.reshape(n_bands * budget, cols),
         jnp.zeros((1, cols), d_send.dtype)], axis=0
    )
    pos = jnp.arange(p_band, dtype=jnp.int32)
    safe_dest = jnp.minimum(dest_s, n_bands - 1)
    off = pos - seg_starts[safe_dest]
    ok = (dest_s < n_bands) & (off < budget)
    flat_idx = jnp.where(ok, safe_dest * budget + off, n_bands * budget)
    d_pairs_sorted = d_flat[flat_idx]
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


def auto_exchange_plan(b0, b1, active, n_bands: int, n_local: int,
                       headroom: float = 1.25, quantum: int = 256):
    """Host-side prepass: size the static per-(source, dest) ``budget`` from
    the ACTUAL band coverage and pick bounded vs all-gather by received
    volume.

    ``b0``/``b1``/``active`` are FULL-cloud (padded, shard-concatenated) band
    intervals — rows ``[s*n_local, (s+1)*n_local)`` belong to source shard
    ``s``.  The budget bounds ``max_{s,d} |{i in shard s : band d in
    [b0_i, b1_i]}|`` with ``headroom``, rounded up to ``quantum`` so nearby
    scenes/cameras reuse the jit cache.  Returns ``(mode, budget)`` where
    ``mode == "bounded"`` iff each device would RECEIVE fewer rows
    (``n_bands * budget``) than the all-gather it replaces (``n_total``) —
    the default previously used (budget = n_local) was strictly WORSE than
    all-gather; this planner makes "bounded" mean bounded."""
    b0 = np.asarray(b0)
    b1 = np.asarray(b1)
    act = np.asarray(active).astype(bool)
    n_total = b0.shape[0]
    if n_total % n_local:
        raise ValueError(f"n_total {n_total} not a multiple of n_local {n_local}")
    n_src = n_total // n_local
    d = np.arange(n_bands)
    cover = act[:, None] & (b0[:, None] <= d) & (d <= b1[:, None])  # [N, bands]
    counts = cover.reshape(n_src, n_local, n_bands).sum(axis=1)  # [src, dest]
    maxcount = int(counts.max()) if counts.size else 0
    budget = -(-max(int(maxcount * headroom), 1) // quantum) * quantum
    budget = min(budget, band_pairs_budget(n_local))  # cannot exceed pair cap
    mode = "bounded" if n_bands * budget < n_total else "allgather"
    return mode, budget
