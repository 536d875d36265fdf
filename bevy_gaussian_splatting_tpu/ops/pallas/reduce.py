"""Pallas segmented pair->gaussian gradient reduction.

Sums per-pair gradient rows (slot order, segments contiguous per gaussian)
into per-gaussian totals — replacing the XLA lane-major segmented log-shift
scan + segment-end gather + offsets/counts gathers (~28 ms in-graph at 2M
pairs) with windowed one-hot matmuls (~5 ms).

Same windowing argument as the expansion kernel (ops/pallas/expand.py): the
depth pre-sort compacts zero-pair gaussians, so the owning gaussian of slot s
advances <= 1 per slot and a 512-slot chunk's owners span <= 512 consecutive
columns.  Per chunk:

  out_window[ch, r] += sum_i dslot[ch, i] * onehot(owner_i == r)

computed as one MXU matmul with ``precision=HIGHEST`` (measured exact for f32
operands through Mosaic; the default path casts to bf16).  Chunk-boundary
segments straddle windows, so each chunk read-merges the existing output
window: columns before the chunk's first owner are preserved, the first-owner
column accumulates, and later columns overwrite (their segments cannot have
earlier contributions: offsets[r > g0] = cum[r-1] >= cum[g0] > chunk_start).

The output is indexed by DEPTH RANK; the caller maps rank -> cloud order with
one N-row gather by the inverse permutation.  Uncovered ranks stay exactly
zero via the donated zero output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevy_gaussian_splatting_tpu.ops.pallas.expand import CHUNK, WIN


def _reduce_kernel(
    g0_ref,  # scalar prefetch [num_chunks] i32 (shared with expansion)
    dslot_hbm,  # [CW, P_pad] f32 ANY — per-pair grads, slots in lanes
    table_hbm,  # [8, N_pad] f32 ANY — row 0 = cum (shared with expansion)
    zeros_hbm,  # [CW, N_out] f32 ANY — donated into out (unread)
    out_hbm,  # [CW, N_out] f32 ANY output (zeros-aliased)
    dch_vmem,  # [2, CW, CHUNK]
    cum_vmem,  # [2, 8, WIN]
    acc_vmem,  # [CW, WIN] merge/accumulate staging
    dsem,  # DMA sems [2]
    csem,  # DMA sems [2]
    msem,  # merge-read sem
    osem,  # output-write sem
    *,
    num_chunks: int,
):
    c = pl.program_id(0)

    def base_of(chunk_idx):
        g1 = jnp.maximum(g0_ref[chunk_idx] - 1, 0)
        return pl.multiple_of((g1 // 128) * 128, 128)

    def dma_dslot(slot, chunk_idx):
        return pltpu.make_async_copy(
            dslot_hbm.at[:, pl.ds(chunk_idx * CHUNK, CHUNK)],
            dch_vmem.at[slot],
            dsem.at[slot],
        )

    def dma_cum(slot, chunk_idx):
        return pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(base_of(chunk_idx), WIN)],
            cum_vmem.at[slot],
            csem.at[slot],
        )

    @pl.when(c == 0)
    def _():
        dma_dslot(0, 0).start()
        dma_cum(0, 0).start()

    @pl.when(c + 1 < num_chunks)
    def _():
        dma_dslot((c + 1) % 2, c + 1).start()
        dma_cum((c + 1) % 2, c + 1).start()

    base = base_of(c)
    # read-merge: the previous chunk's (synchronously completed) window write
    # overlaps this one when segments straddle the boundary
    merge_dma = pltpu.make_async_copy(
        out_hbm.at[:, pl.ds(base, WIN)], acc_vmem, msem
    )
    merge_dma.start()

    dma_dslot(c % 2, c).wait()
    dma_cum(c % 2, c).wait()
    dch = dch_vmem[c % 2]  # [CW, CHUNK]
    cum_row = cum_vmem[c % 2][0:1, :]  # [1, WIN]

    slot_col = jnp.float32(c * CHUNK) + jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, 1), 0
    ).astype(jnp.float32)
    le = cum_row <= slot_col  # [CHUNK, WIN]
    owner_col = jnp.sum(le.astype(jnp.float32), axis=1, keepdims=True)
    jota = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1).astype(
        jnp.float32
    )
    oh = (owner_col == jota).astype(jnp.float32)  # [CHUNK, WIN]

    # local[ch, r] = sum_i dch[ch, i] oh[i, r] — f32-exact on the MXU
    local = jax.lax.dot_general(
        dch,
        oh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [CW, WIN]

    j0 = (g0_ref[c] - base).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1).astype(
        jnp.float32
    )
    merge_dma.wait()
    existing = acc_vmem[...]
    merged = jnp.where(
        lane < j0, existing, jnp.where(lane == j0, existing + local, local)
    )
    acc_vmem[...] = merged
    out_dma = pltpu.make_async_copy(
        acc_vmem, out_hbm.at[:, pl.ds(base, WIN)], osem
    )
    out_dma.start()
    out_dma.wait()


def pallas_segment_reduce(
    dslot_t: jnp.ndarray,  # [CW, P] f32 per-pair grads, slot order in lanes
    table: jnp.ndarray,  # [8, N_pad] f32 expansion table (row 0 = cum)
    g0s: jnp.ndarray,  # [num_chunks] i32 expansion chunk owners
    n: int,  # gaussian count (output columns before padding)
    interpret: bool = False,
) -> jnp.ndarray:
    """-> [CW, n] per-rank gradient sums (depth order)."""
    cw, p = dslot_t.shape
    num_chunks = int(g0s.shape[0])
    p_pad = num_chunks * CHUNK
    if p_pad != p:
        dslot_t = jnp.pad(dslot_t, ((0, 0), (0, p_pad - p)))
    n_out = ((n + WIN + 127) // 128) * 128

    kernel = functools.partial(_reduce_kernel, num_chunks=num_chunks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),  # donated zeros
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, cw, CHUNK), jnp.float32),
            pltpu.VMEM((2, 8, WIN), jnp.float32),
            pltpu.VMEM((cw, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cw, n_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        # flattened inputs: [g0s, dslot_t, table, zeros] -> zeros (index 3)
        # donated as output 0
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        g0s.astype(jnp.int32),
        dslot_t,
        table,
        jnp.zeros((cw, n_out), jnp.float32),
    )
    return out[:, :n]
