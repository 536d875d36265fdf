"""Pallas pair-expansion kernel: slot -> (tile, gaussian, owner) without
scatter or P-row gathers.

The XLA expansion (rasterize_tile.bin_gaussians) costs ~30 ms at 1M gaussians:
a scatter-max (per-element cost), a blocked cummax over P, and a P-row
``packed[gidx]`` gather (~7-13 ns/row).  This kernel replaces all three with
windowed table reads + an MXU one-hot gather:

  * Gaussians are depth-sorted with ALL inactive (zero-pair) gaussians
    compacted to the front (the caller folds the active flag into the sort
    key), so along the slot axis the owning gaussian index advances by AT
    MOST ONE per slot.  A 512-slot chunk therefore touches at most 512
    consecutive rows of the per-gaussian table.
  * Per chunk: DMA the table window starting at the chunk's first owner
    (scalar-prefetched, computed by one small searchsorted over the
    cumulative pair counts), compute each slot's owner by counting
    ``cum <= slot`` inside the window, and gather the owner columns with a
    one-hot matmul on the MXU.  The MXU casts operands to bf16 (integers
    are exact only up to 256), so every matmul-gathered column is kept
    <= 255: the cloud id rides as three byte columns, the segment offset is
    recovered exactly on the VPU as max(cum where cum <= slot) (offsets[g]
    == cum[g-1]), and the owner's depth rank is the window base plus the
    owner count itself.

Replaces the WGSL atomic-counter expansion (src/sort/radix.wgsl:35-38) like
the XLA path, but at vector/MXU throughput instead of scatter throughput.

Table layout [8, N_pad] f32, gaussians in lanes (pad columns: cum = +BIG so
they never own a slot).  All matmul-gathered columns (1-6) hold integers
<= 255 so the MXU's bf16 operand cast is lossless:
  0 cum        inclusive cumulative pair count (compared on the VPU only)
  1 rect_w     tile-rect width (<= tile-grid axis <= 256... exact: bf16
               represents integers through 256)
  2 tx0        tile-rect left (<= 255)
  3 ty0        tile-rect top (<= 255)
  4 id_b0      cloud index bits 0-7
  5 id_b1      cloud index bits 8-15
  6 id_b2      cloud index bits 16-23
  7 pad

**Params emission** (``params_t`` input): an optional SECOND table
[PARAM_ROWS, N_pad] holding the rank-ordered f32 raster params.  The same
one-hot gathers the owner's param row with ``precision=HIGHEST`` — exact for
arbitrary f32 (exactly one 1.0 weight per row; the 6-pass bf16 expansion
reproduces the f32 operand bit-exactly).  This is the multi-M "carry"
delivery: per-pair params are BORN in the expansion and ride the pair sort
as operands (~0.8 ns/row each) instead of a post-sort P-row gather that pays
the 64 MiB table cliff (measured 148 ms at the 4M/6.4M-pair bench vs
~52 ms of carry operands)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Per-chunk slot count (BGS_EXPAND_CHUNK for on-device A/B).  The kernel's
# VPU work is P * WIN with WIN = CHUNK + 128 (alignment slack), so smaller
# chunks do LESS total comparison work (384 vs 640 lanes per slot at 256)
# at the price of more grid steps / DMA issues.
CHUNK = int(_os.environ.get("BGS_EXPAND_CHUNK", 512))
# owner advances <= 1 per slot, so a chunk's owners span <= CHUNK table
# columns; the DMA base is aligned down to the 128-lane tiling, so the
# window carries up to 127 extra leading columns
WIN = CHUNK + 128
N_COLS = 8
PARAM_ROWS = 16  # padded param-table rows (sublane multiple)
CUM_PAD = float(1 << 30)  # table pad rows: never `<= slot`


def _expand_kernel(
    g0_ref,  # scalar prefetch [num_chunks] i32: first owner col per chunk
    table_hbm,  # [8, N_pad] f32 in ANY/HBM (gaussians in lanes)
    out_ref,  # [CHUNK, out_cols] VMEM block for this chunk
    win_vmem,  # [2, 8, WIN] double-buffered table windows
    sem,  # DMA sems [2]
    *,
    tx_count: int,
    num_chunks: int,
    params_hbm=None,  # optional [PARAM_ROWS, N_pad] f32 ANY
    pwin_vmem=None,  # [2, PARAM_ROWS, WIN]
    psem=None,  # DMA sems [2]
):
    c = pl.program_id(0)

    def base_of(chunk_idx):
        # include the column BEFORE the first owner: offs = cum[owner-1]
        # must be in-window even when g0 is already 128-aligned
        g1 = jnp.maximum(g0_ref[chunk_idx] - 1, 0)
        return pl.multiple_of((g1 // 128) * 128, 128)

    def dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(base_of(chunk_idx), WIN)],
            win_vmem.at[slot],
            sem.at[slot],
        )

    def pdma(slot, chunk_idx):
        return pltpu.make_async_copy(
            params_hbm.at[:, pl.ds(base_of(chunk_idx), WIN)],
            pwin_vmem.at[slot],
            psem.at[slot],
        )

    @pl.when(c == 0)
    def _():
        dma(0, 0).start()
        if params_hbm is not None:
            pdma(0, 0).start()

    @pl.when(c + 1 < num_chunks)
    def _():
        dma((c + 1) % 2, c + 1).start()
        if params_hbm is not None:
            pdma((c + 1) % 2, c + 1).start()

    dma(c % 2, c).wait()
    win = win_vmem[c % 2]  # [8, WIN] rows = table fields, lanes = gaussians

    # owner[i] = #{j in window : cum[j] <= slot_i}  (searchsorted-right;
    # the sub-128 window prefix belongs to gaussians at or before the
    # chunk's first owner, whose cum <= every slot here, so they are
    # counted and the index stays window-relative)
    slot_col = jnp.float32(c * CHUNK) + jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, 1), 0
    ).astype(jnp.float32)  # [CHUNK, 1] slots in sublanes
    cum_row = win[0:1, :]  # [1, WIN] window cum in lanes
    le = cum_row <= slot_col  # [CHUNK, WIN]
    lef = le.astype(jnp.float32)
    owner_col = jnp.sum(lef, axis=1, keepdims=True)  # [CHUNK, 1] f32

    # offsets[owner] == cum[owner-1] == max cum <= slot (0 when owner is the
    # global first column) — exact on the VPU, no matmul precision concerns
    offs = jnp.max(jnp.where(le, cum_row, 0.0), axis=1, keepdims=True)

    # one-hot gather of the owner columns: oh[i, j] = (owner_i == j)
    jota = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1).astype(
        jnp.float32
    )
    oh = (owner_col == jota).astype(jnp.float32)  # [CHUNK, WIN]
    # selected[i, col] = sum_j oh[i, j] * win[col, j]  (contract lanes: oh @
    # win^T, an MXU-native rhs-transposed matmul; operands are 0/1 and
    # bytes, so the MXU's bf16 cast is lossless)
    selected = jax.lax.dot_general(
        oh,
        win,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [CHUNK, 8]

    rect_w = jnp.maximum(selected[:, 1:2], 1.0)
    tx0 = selected[:, 2:3]
    ty0 = selected[:, 3:4]
    g_cloud = (
        selected[:, 4:5]
        + selected[:, 5:6] * 256.0
        + selected[:, 6:7] * 65536.0
    )
    base = (jnp.maximum(g0_ref[c] - 1, 0) // 128) * 128
    rank = jnp.float32(base) + owner_col  # window-relative -> global

    # k < rect area <= num_tiles (small), so f32 floor-div is exact
    k = slot_col - offs
    div = jnp.floor((k + 0.5) / rect_w)
    rem = k - div * rect_w
    tile = (ty0 + div) * jnp.float32(tx_count) + tx0 + rem

    head = jnp.concatenate(
        [tile, g_cloud, rank, jnp.zeros((CHUNK, 5), jnp.float32)], axis=1
    )
    if params_hbm is None:
        out_ref[...] = head
        return
    pdma(c % 2, c).wait()
    pwin = pwin_vmem[c % 2]  # [PARAM_ROWS, WIN]
    # exact f32 one-hot gather: HIGHEST forces the 6-pass bf16 expansion,
    # and with exactly one 1.0 weight per output row the product/sum chain
    # reconstructs the f32 operand bit-exactly
    sel_params = jax.lax.dot_general(
        oh,
        pwin,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [CHUNK, PARAM_ROWS]
    out_ref[...] = jnp.concatenate([head, sel_params], axis=1)


def pallas_expand_pairs(
    table: jnp.ndarray,  # [8, N_pad] f32 (see module docstring layout)
    g0s: jnp.ndarray,  # [num_chunks] i32 first owner row per 512-slot chunk
    p_max: int,
    tx_count: int,
    interpret: bool = False,
    params_t: jnp.ndarray | None = None,  # [PARAM_ROWS, N_pad] f32
):
    """Run the expansion kernel -> (tile [P], g_cloud [P], rank [P]) i32,
    plus ``params_pairs [P, PARAM_ROWS]`` f32 when ``params_t`` is given
    (the "carry" params delivery — see module docstring).

    ``p_max`` need not be chunk-aligned; the padded tail is sliced off.
    Validity/sentinel handling stays with the caller (slots >= total carry
    in-bounds garbage that the caller masks exactly like the XLA path)."""
    num_chunks = (p_max + CHUNK - 1) // CHUNK
    p_pad = num_chunks * CHUNK
    with_params = params_t is not None
    out_cols = N_COLS + (PARAM_ROWS if with_params else 0)

    scratch = [
        pltpu.VMEM((2, N_COLS, WIN), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if with_params:
        scratch += [
            pltpu.VMEM((2, PARAM_ROWS, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]

        def kernel(g0_ref, table_hbm, params_hbm, out_ref, win_vmem, sem,
                   pwin_vmem, psem):
            _expand_kernel(
                g0_ref, table_hbm, out_ref, win_vmem, sem,
                tx_count=tx_count, num_chunks=num_chunks,
                params_hbm=params_hbm, pwin_vmem=pwin_vmem, psem=psem,
            )

        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        operands = (g0s.astype(jnp.int32), table, params_t)
    else:
        kernel = functools.partial(
            _expand_kernel, tx_count=tx_count, num_chunks=num_chunks
        )
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        operands = (g0s.astype(jnp.int32), table)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (CHUNK, out_cols), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p_pad, out_cols), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*operands)

    tile = out[:p_max, 0].astype(jnp.int32)
    g_cloud = out[:p_max, 1].astype(jnp.int32)
    rank = out[:p_max, 2].astype(jnp.int32)
    if with_params:
        return tile, g_cloud, rank, out[:p_max, N_COLS:]
    return tile, g_cloud, rank
