"""custom_vjp wrapper: differentiable Pallas compositing core.

``composite_core(params_aligned, aligned_start, count)`` runs the forward
kernel and, on the backward pass, the hand-derived backward kernel
(tile_bwd.py) — replacing XLA AD's rematerialized scan on the hot training
path.  The surrounding pipeline stays XLA-differentiable: the parameter gather
transpose accumulates the per-pair gradients into per-gaussian gradients, and
the epilogue provides the transmittance/background cotangents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.models.settings import CloudSettings
from bevy_gaussian_splatting_tpu.ops.pallas import tile_bwd, tile_fwd

# XLA row-gather throughput on v5e has a sharp table-size cliff (measured,
# tools/profile_bwd_gather.py + BASELINE.md): tables <= 64 MiB gather rows at
# ~7 ns/row, larger ones at ~24 ns/row, independent of row width — but only
# up to ~40-byte rows.  Round-4 production ablation (PROF_ONLY=fwd,
# 2026-08-21): a [1M, 16] f32 gather (64 B rows, 61 MB table — "sub-cliff")
# ran at 22.9 ns/row while [1M, 10] (40 B rows) ran at 9.3 and <=8-col
# pieces at ~7 — the width-independence claim breaks AT 64 B, which made
# the un-split 16-col 2DGS params gather the hidden 2DGS-forward whale
# (+34 ms of its 62 ms).
_GATHER_CLIFF_BYTES = 64 * 1024 * 1024
_FAST_NS, _MID_NS, _SLOW_NS = 7.0, 9.3, 24.0


def _gather_rate(p: int, w: int) -> float:
    """Modeled ns/row for gathering [p, w] f32 pieces (cliff + row width).

    Round-5 clarification: these rates price the PRODUCTION regime, where
    the gathered rows are materialized and consumed in the kernel-native
    [C, P] layout — NOT raw DMA reads.  A gather fused into a reduction
    (output never materialized) reads [1M, 16] at ~8.6 ns/row with no
    width dependence at all (tools/probe_gather_width.py), while the same
    width in production measures ~23: the "width cliff" is the cost of
    materializing + transposing wide gather outputs, which XLA fuses into
    narrow per-piece gathers but not into wide ones.  Same-session 2DGS
    A/B: split 8+8 59.81 ms vs forced single-16 80.46 (barrier 81.35)."""
    if p * w * 4 > _GATHER_CLIFF_BYTES:
        return _SLOW_NS
    if w <= 8:
        return _FAST_NS
    if w <= 10:
        return _MID_NS
    return _SLOW_NS  # 64 B rows measured 22.9 ns/row even sub-cliff


def _gather_col_splits(p: int, c: int) -> list:
    """Column slices for gathering a [p, c] f32 table by ~p indices, chosen
    by the measured cliff+width model: pick the piece width w minimizing
    ceil(c/w) * rate(w).  In-jit at the 2M-pair budget the 8-col split
    saves ~24 ms (119 -> 95 ms params-leaf step,
    tools/profile_bwd_gather.py); at 4M-row tables only narrower pieces
    stay sub-cliff (e.g. [4M, 4] = 64 MiB); 2DGS's 16-col table splits
    8+8 (see _gather_rate)."""
    def rate(w):
        return _gather_rate(p, w)

    best_w, best_cost = c, c and rate(c)
    for w in (8, 4, 2):
        if w >= c:
            continue
        cost = -(-c // w) * rate(w)
        if cost < best_cost:
            best_w, best_cost = w, cost
    if best_w >= c:
        return [(0, c)]
    return [(i * best_w, min((i + 1) * best_w, c)) for i in range(-(-c // best_w))]


_ROW_SPLIT_ENABLED = False  # see _row_split_count


def _row_split_count(p: int, cols: int) -> int:
    """Sub-cliff ROW split for multi-M tables — MEASURED REGRESSION, default
    OFF.  The idea: a [p, cols<=8] piece above the cliff even at 8 columns
    could be split into k row blocks that each gather at the fast rate
    (k * 7 ns/row vs 24 ns/row for k <= 3).  On-device (2026-08-20, 4M bench)
    the ``optimization_barrier`` needed to stop XLA from fusing the row slice
    back into a full-table gather also serializes the surrounding graph:
    4M fwd regressed 253 -> 470 ms.  Kept behind _ROW_SPLIT_ENABLED for
    future re-evaluation with a barrier-free formulation (e.g. donated
    pre-split tables)."""
    if not _ROW_SPLIT_ENABLED:
        return 1
    piece_bytes = p * min(cols, 8) * 4
    if piece_bytes <= _GATHER_CLIFF_BYTES:
        return 1
    k = -(-piece_bytes // _GATHER_CLIFF_BYTES)
    return int(k) if k * _FAST_NS < _SLOW_NS else 1


def _gather_piece(piece, idx, n_rows: int):
    """piece[idx] with the sub-cliff row split (no-op when k == 1).

    ``optimization_barrier`` pins each row block as its own buffer so XLA
    cannot fuse the slice back into a gather on the full-size table (which
    would re-pay the above-cliff rate)."""
    k = _row_split_count(n_rows, piece.shape[1])
    if k == 1:
        return piece[idx]
    rp = -(-n_rows // k)
    out = None
    for i in range(k):
        blk = jax.lax.optimization_barrier(piece[i * rp : min((i + 1) * rp, n_rows)])
        local = jnp.clip(idx - i * rp, 0, blk.shape[0] - 1)
        g = blk[local]
        if out is None:
            out = g
        else:
            sel = idx >= i * rp
            out = jnp.where(sel[:, None], g, out)
    return out


def gather_rows(table, idx, c_live: int):
    """table[idx] restricted to the first ``c_live`` columns, split per the
    cliff model (column split into <= 8-col pieces; row split into sub-cliff
    blocks for multi-M tables) -> [len(idx), c_live].

    Public helper: the serving-path params gather (ops/rasterize_tile.py)
    and the training cores below share this cost model."""
    p = table.shape[0]
    splits = _gather_col_splits(p, c_live)
    if len(splits) == 1 and _row_split_count(p, c_live) == 1:
        sliced = table[:, :c_live] if c_live < table.shape[1] else table
        return sliced[idx]
    barrier = _os.environ.get("BGS_GATHER_PIECE_BARRIER") == "1"

    def piece(a, b):
        t = table[:, a:b]
        if barrier:
            # A/B experiment: force each column piece to MATERIALIZE as its
            # own compact buffer — without this XLA may fuse the slice back
            # into a strided gather of the wide table, paying the wide-row
            # rate the split was meant to dodge
            t = jax.lax.optimization_barrier(t)
        return _gather_piece(t, idx, p)

    return jnp.concatenate([piece(a, b) for a, b in splits], axis=1)


_gather_rows = gather_rows  # back-compat alias


# lax.sort applies its permutation to every carried operand at a measured
# ~1.3 ms per operand at 1.6M rows (~0.8 ns/row/operand, NO table-size
# cliff) — tools/profile_sorts.py.  ABOVE ~9 operands the marginal cost
# steepens (measured 2026-08-21 at 1.6M: 9 ops 14.7 ms, 11 ops 19.9,
# 16 ops 22.5).
_SORT_NS_PER_ROW_OP = 0.85

# complex64 carries (two f32 columns per operand) are bit-exact through the
# sort incl. NaN payloads/subnormals/+-0/inf (verified on device) but NOT
# cheaper: XLA decomposes complex sort operands into f32 pairs, and the 1M
# production A/B measured identical times packed vs unpacked.  (An earlier
# probe read a ~flat c64 cost — a DCE artifact: its unused carry outputs
# were dropped from the sort.)  Kept for the record:
_SORT_NS_PER_ROW_PACKED = _SORT_NS_PER_ROW_OP  # per f32 column; no win


def _gather_cost_ns(rows: int, table_rows: int, cols: int) -> float:
    """Modeled cost of gathering ``rows`` rows from a [table_rows, cols] f32
    table under the 64 MiB cliff + column-split model."""
    total = 0.0
    for a, b in _gather_col_splits(table_rows, cols):
        total += rows * _gather_rate(table_rows, b - a)
    return total


def preferred_unpermute(n: int, c_live: int, env_override: bool = True) -> str:
    """Choose how the training backward maps per-RANK gradient sums back to
    cloud order (both exact; cost model picks the cheaper formulation):

      - "rank": inverse-permutation N-row gather — needs ``rank`` (a 2-op
        N-sort in binning) plus a [N, c_live] gather that pays the 64 MiB
        cliff at multi-M N (the 4M superlinearity).
      - "perm": ONE perm-keyed lax.sort carrying the c_live gradient rows —
        no rank sort, no gather, no cliff; costs ~(1 + c_live) sort operands.

    ``BGS_UNPERMUTE=rank|perm`` overrides for on-device A/B.

    Measured on v5e at 1M/1.6M-pair (2026-08-21): rank 99.9 ms step vs perm
    94.0 — the rank path's [cw, N] -> [N, cw] transpose (~3.5 ns/row,
    unmodeled before) tips it; both paths pay ~1.5 ns/row materializing the
    [N, c] output."""
    if env_override:
        forced = _os.environ.get("BGS_UNPERMUTE", "")
        if forced in ("rank", "perm"):
            return forced
    rank_cost = (
        2 * n * _SORT_NS_PER_ROW_OP  # rank N-sort in binning
        + _gather_cost_ns(n, n, c_live)
        + n * 3.5  # drank transpose to gather layout
    )
    perm_cost = (1 + c_live) * n * _SORT_NS_PER_ROW_OP + n * 1.5  # stack
    return "perm" if perm_cost < rank_cost else "rank"


def preferred_params_delivery(n: int, p: int, c_par: int,
                              env_override: bool = True,
                              training: bool = False) -> str:
    """How per-pair raster params reach the compositor kernel (both exact):

      - "gather": one post-pair-sort P-row gather from the [N, c] cloud-order
        table — 7 ns/row sub-cliff, 24 ns/row above 64 MiB (the 4M bench
        measured 148 ms for this single stage).
      - "carry": params ride the depth sort (+c operands x N), are emitted
        per pair by the expansion kernel's exact one-hot MXU gather, and
        ride the pair sort (+c operands x P) — ~0.8 ns/row/operand at any
        scale, no cliff.

    ``BGS_PARAMS_DELIVERY=gather|carry`` overrides for on-device A/B."""
    if env_override:
        forced = _os.environ.get("BGS_PARAMS_DELIVERY", "")
        if forced in ("gather", "carry"):
            return forced
    if training:
        # round-3 4M A/B: unpacked carry won the serving forward
        # (297 -> 262 ms) but LOST inside the training graph (439 gather vs
        # 509 carry) — keep the gather for training until the round-4
        # c64-packed A/B re-judges it (BGS_PARAMS_DELIVERY forces).
        return "gather"
    gather_cost = _gather_cost_ns(p, n, c_par)
    # Measured 1M forced-carry A/B (2026-08-21, v5e): 66.6 ms fwd vs 43.5
    # gather — IDENTICAL with and without c64 packing (XLA decomposes
    # complex sort operands back into f32 pairs; the packed probe's "flat"
    # cost was a DCE artifact).  Keep the per-f32-column operand price.
    carry_cost = c_par * (n + p) * _SORT_NS_PER_ROW_OP + p * 1.0
    return "carry" if carry_cost < gather_cost else "gather"


def live_grad_count(settings: CloudSettings) -> int:
    """Number of live (non-identically-zero) per-pair gradient rows — the
    operand count of the unpermute carry sort (mask-only params drop out:
    aabb radius, 2DGS surfel radius)."""
    mode = tile_fwd.kernel_mode(settings)
    return {"obb": 10, "aabb": 9, "2d": 15}[mode]


# Backward-kernel chunk size: auto (mean-occupancy policy shared with the
# forward, tile_fwd.preferred_chunk; BGS_BWD_CHUNK forces it for A/B) —
# resolution lives in tile_bwd.pallas_composite_backward.
import os as _os


_CORE_CACHE: dict = {}


def get_composite_core(settings: CloudSettings, width: int, height: int, interpret: bool):
    """A cached custom_vjp function for this pipeline specialization."""
    key = (settings.static_key(), width, height, interpret)
    fn = _CORE_CACHE.get(key)
    if fn is not None:
        return fn

    @jax.custom_vjp
    def core(params_aligned, aligned_start, count):
        return tile_fwd.pallas_forward_raw(
            params_aligned, aligned_start, count, settings, width, height,
            interpret=interpret,
        )

    def core_fwd(params_aligned, aligned_start, count):
        out_raw = tile_fwd.pallas_forward_raw(
            params_aligned, aligned_start, count, settings, width, height,
            interpret=interpret,
        )
        return out_raw, (params_aligned, aligned_start, count, out_raw)

    def core_bwd(res, g_out):
        params_aligned, aligned_start, count, out_raw = res
        num_tiles = (width // tile_fwd.TILE) * (height // tile_fwd.TILE)
        g = g_out.reshape(num_tiles, 8, tile_fwd.PIX)
        o = out_raw.reshape(num_tiles, 8, tile_fwd.PIX)
        # rows 0-2: ghat_rgb; row 3: ghat_T; rows 4-6: total rgb; row 7: T_fin
        gbar = jnp.concatenate([g[:, :4, :], o[:, :3, :], o[:, 3:4, :]], axis=1)
        dparams = tile_bwd.pallas_composite_backward(
            params_aligned, aligned_start, count, gbar, settings, width, height,
            interpret=interpret,
        )
        f0 = jax.dtypes.float0
        return (
            dparams,
            np.zeros(aligned_start.shape, dtype=f0),
            np.zeros(count.shape, dtype=f0),
        )

    core.defvjp(core_fwd, core_bwd)
    _CORE_CACHE[key] = core
    return core


_WINDOWED_CORE_CACHE: dict = {}


def get_train_core_windowed(settings: CloudSettings, width: int, height: int,
                            interpret: bool, k_max: int,
                            full_height: int | None = None,
                            unpermute: str = "rank",
                            delivery: str = "gather"):
    """custom_vjp training core for the pallas-expansion pipeline:

      fwd: params_sorted = params[g_s]; forward kernel -> out_raw
      bwd: backward kernel -> per-pair grads (sorted layout, [C, P] rows) ->
           ONE stable sort keyed on the carried depth-rank owner (gidx_s)
           that reorders every live gradient column to expansion-slot order
           -> windowed segmented-sum kernel (ops/pallas/reduce.py) ->
           per-RANK grads -> per-gaussian grads in cloud order, via one of
           two exact formulations chosen by :func:`preferred_unpermute`:
             unpermute="rank": N-row gather by the inverse permutation
               (arg 9 of the core = ``rank`` from bin_gaussians)
             unpermute="perm": ONE perm-keyed lax.sort carrying the live
               gradient rows (arg 9 = ``perm``; no rank sort, no gather,
               no 64 MiB cliff — the multi-M win)

    Why a SORT instead of the earlier inverse-permutation gather: lax.sort
    applies its permutation to every carried operand at ~1 ms/operand per
    1M rows with NO table-size cliff, while building inv_pair costs a 2-op
    P-sort and the [P, C] gradient gather pays the 7-24 ns/row gather wall
    (24 above 64 MiB — the multi-M superlinearity).  Stability makes the
    rank-keyed sort reproduce slot order exactly: within a rank, tile-
    ascending pair order IS the rect enumeration order."""
    if full_height is None:
        full_height = height
    key = (settings.static_key(), width, height, interpret, k_max,
           full_height, unpermute, delivery)
    fn = _WINDOWED_CORE_CACHE.get(key)
    if fn is not None:
        return fn

    from bevy_gaussian_splatting_tpu.ops.pallas.reduce import (
        pallas_segment_reduce,
    )

    num_tiles = (width // tile_fwd.TILE) * (height // tile_fwd.TILE)
    # gradient rows that are identically zero (mask-only params) need not
    # ride the reorder sort: aabb radius (row 5), 2DGS surfel radius (row 2)
    mode = tile_fwd.kernel_mode(settings)
    zero_rows = {"aabb": (5,), "2d": (2,)}.get(mode, ())

    carry = delivery == "carry"

    @jax.custom_vjp
    def core(params, g_s, valid_s, start, count, gidx_s, table, g0s, rank,
             y0):
        # delivery="carry": arg 1 IS params_sorted in the kernel-native
        # [C, P] row layout (bin-carried, bit-equal to params[g_s];
        # stop-gradiented — the true gradient is this VJP)
        params_sorted = (
            g_s if carry else _gather_rows(params, g_s, params.shape[1])
        )
        return tile_fwd.pallas_forward_raw(
            params_sorted, start, count, settings, width, height,
            interpret=interpret, y0=y0, full_height=full_height,
            transposed_params=carry,
        )

    def core_fwd(params, g_s, valid_s, start, count, gidx_s, table, g0s,
                 rank, y0):
        params_sorted = (
            g_s if carry else _gather_rows(params, g_s, params.shape[1])
        )
        out_raw = tile_fwd.pallas_forward_raw(
            params_sorted, start, count, settings, width, height,
            interpret=interpret, y0=y0, full_height=full_height,
            transposed_params=carry,
        )
        res = (params_sorted, start, count, out_raw, valid_s, gidx_s, table,
               g0s, rank, y0)
        return out_raw, res

    def core_bwd(res, g_out):
        (params_sorted, start, count, out_raw, valid_s, gidx_s, table, g0s,
         rank, y0) = res
        n = rank.shape[0]
        c_par = params_sorted.shape[0] if carry else params_sorted.shape[1]
        g = g_out.reshape(num_tiles, 8, tile_fwd.PIX)
        o = out_raw.reshape(num_tiles, 8, tile_fwd.PIX)
        gbar = jnp.concatenate([g[:, :4, :], o[:, :3, :], o[:, 3:4, :]],
                               axis=1)
        dsorted_t = tile_bwd.pallas_composite_backward(
            params_sorted, start, count, gbar, settings, width, height,
            interpret=interpret, y0=y0, full_height=full_height,
            transposed=True,
            transposed_params=carry,
        )  # [c_par, P]
        # sorted pair order -> pre-sort slot order via ONE stable sort on the
        # depth-rank owner; invalid pairs (zero rows) key to the sentinel n
        # so they land on the tail slots exactly like the expansion's
        sort_key = jnp.where(valid_s, gidx_s, jnp.int32(n))
        live = [i for i in range(c_par) if i not in zero_rows]
        sorted_ops = jax.lax.sort(
            (sort_key,) + tuple(dsorted_t[i] for i in live),
            num_keys=1, is_stable=True,
        )
        it = iter(sorted_ops[1:])
        rows = [
            jnp.zeros_like(sort_key, dtype=jnp.float32)
            if i in zero_rows else next(it)
            for i in range(c_par)
        ]
        # the lane-major reduce DMAs [cw, CHUNK] slices: cw must be a sublane
        # multiple, so pad the row count up to a multiple of 8
        if c_par % 8:
            rows += [rows[0] * 0.0] * (8 - c_par % 8)
        dslot_t = jnp.stack(rows, axis=0)
        drank = pallas_segment_reduce(dslot_t, table, g0s, n,
                                      interpret=interpret)
        if unpermute == "perm":
            # arg 9 is the depth-sort permutation: ONE unique-key sort
            # carries every live per-rank gradient row back to cloud order
            # (rank[i] = position of key i in ascending perm order, so
            # sorting by perm applies the inverse permutation exactly)
            sorted_back = jax.lax.sort(
                (rank,) + tuple(drank[i] for i in live), num_keys=1
            )
            it2 = iter(sorted_back[1:])
            cloud_rows = [
                jnp.zeros((n,), jnp.float32) if i in zero_rows else next(it2)
                for i in range(c_par)
            ]
            dparams = jnp.stack(cloud_rows, axis=1)
        else:
            # rank gather through the same cliff model (live columns only)
            dparams = _gather_rows(drank[:c_par].T, rank, c_par)
        f0 = jax.dtypes.float0

        def nil(a):
            return np.zeros(a.shape, dtype=f0)

        # table is f32 (its cotangent must be a real zero array, not float0);
        # it is int-derived and unused upstream, so XLA DCEs it (same for
        # the carried params_sorted in delivery="carry")
        d_gs = jnp.zeros_like(params_sorted) if carry else nil(gidx_s)
        return (dparams, d_gs, nil(gidx_s), nil(start),
                nil(count), nil(gidx_s), jnp.zeros_like(table), nil(g0s),
                nil(rank), nil(y0))

    core.defvjp(core_fwd, core_bwd)
    _WINDOWED_CORE_CACHE[key] = core
    return core


_TRAIN_CORE_CACHE: dict = {}


def get_train_core(settings: CloudSettings, width: int, height: int,
                   interpret: bool, k_max: int):
    """custom_vjp over gather + forward kernel, with a hand-built backward:

      fwd: params_sorted = where(valid, params[g_s], 0); kernel -> out_raw
      bwd: backward kernel -> per-pair grads (sorted layout, zeros where no
           tile covers a slot), one gather to pre-sort slot order (where each
           gaussian's pairs are contiguous), segmented-scan reduction to
           per-gaussian grads.  No XLA scatter anywhere (scatter-add measured
           ~0.6 GB/s at 6M rows — it was 80% of the training step).

    All index arguments are non-differentiable byproducts of binning."""
    key = (settings.static_key(), width, height, interpret, k_max)
    fn = _TRAIN_CORE_CACHE.get(key)
    if fn is not None:
        return fn

    from bevy_gaussian_splatting_tpu.ops import rasterize_tile as rt

    num_tiles = (width // tile_fwd.TILE) * (height // tile_fwd.TILE)

    @jax.custom_vjp
    def core(params, g_s, valid_s, start, count, inv_pair, gidx, off_cloud,
             cnt_cloud):
        # no validity zeroing: tile ranges never cover the sorted sentinel
        # suffix (kernel reads only covered ranges; uncovered backward rows
        # are donated zeros and segments only span real slots)
        params_sorted = params[g_s]
        return tile_fwd.pallas_forward_raw(
            params_sorted, start, count, settings, width, height,
            interpret=interpret,
        )

    def core_fwd(params, g_s, valid_s, start, count, inv_pair, gidx, off_cloud,
                 cnt_cloud):
        # no validity zeroing: tile ranges never cover the sorted sentinel
        # suffix (kernel reads only covered ranges; uncovered backward rows
        # are donated zeros and segments only span real slots)
        params_sorted = params[g_s]
        out_raw = tile_fwd.pallas_forward_raw(
            params_sorted, start, count, settings, width, height,
            interpret=interpret,
        )
        res = (params_sorted, start, count, out_raw, inv_pair, gidx,
               off_cloud, cnt_cloud)
        return out_raw, res

    def core_bwd(res, g_out):
        (params_sorted, start, count, out_raw, inv_pair, gidx, off_cloud,
         cnt_cloud) = res
        g = g_out.reshape(num_tiles, 8, tile_fwd.PIX)
        o = out_raw.reshape(num_tiles, 8, tile_fwd.PIX)
        # rows 0-2: ghat_rgb; row 3: ghat_T; rows 4-6: total rgb; row 7: T_fin
        gbar = jnp.concatenate([g[:, :4, :], o[:, :3, :], o[:, 3:4, :]], axis=1)
        # full kernel width (16/24 cols): 64-byte-multiple rows keep the
        # inv_pair reorder at the fast row-gather rate; the zero pad columns
        # ride the scan for free and are dropped at the end
        dsorted = tile_bwd.pallas_composite_backward(
            params_sorted, start, count, gbar, settings, width, height,
            interpret=interpret, full_width=True,
        )
        # sorted pair order -> pre-sort slot order (contiguous per gaussian)
        dslot = dsorted[inv_pair]
        dparams = rt.segment_sum_contiguous(
            dslot, gidx, off_cloud, cnt_cloud, max_segment=num_tiles
        )[:, : params_sorted.shape[1]]
        f0 = jax.dtypes.float0

        def nil(a):
            return np.zeros(a.shape, dtype=f0)

        return (dparams, nil(inv_pair), nil(inv_pair), nil(start), nil(count),
                nil(inv_pair), nil(gidx), nil(off_cloud), nil(cnt_cloud))

    core.defvjp(core_fwd, core_bwd)
    _TRAIN_CORE_CACHE[key] = core
    return core
