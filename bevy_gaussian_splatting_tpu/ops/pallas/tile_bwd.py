"""Hand-derived Pallas backward kernel for tile compositing.

The BASELINE.json centerpiece: gradients of the front-to-back alpha blend
w.r.t. the per-splat raster parameters, computed by re-walking each tile's
splat list front-to-back (recompute-in-reverse — no O(count) residuals, only
the forward's per-pixel totals).

Derivation (per pixel, splats i in front-to-back order within a tile):

    out_rgb = sum_i c_i a_i T_i,   T_i = prod_{j<i} (1 - a_j),   T_fin = T_N

    dL/dc_i = a_i T_i ghat_rgb
    dL/da_i = ghat_rgb . (c_i T_i - S_i / (1 - a_i)) - ghat_T T_fin / (1 - a_i)
        where S_i = sum_{j>i} c_j a_j T_j  (suffix sum; computed as
        total - prefix - own term), and ghat_T is the cotangent of the final
        transmittance (the epilogue's alpha-channel and background terms).

    a_i(p) gates/chains into the parameter gradients exactly as the forward:
      AABB: a = op exp(power), power = -a dx^2/2 - c dy^2/2 + b dx dy
      OBB:  a = op exp(-4.5 (u^2 + v^2))
    with the inside masks and the 0.999 cap zeroing gradients (matching
    XLA AD of the forward's jnp.where / jnp.minimum).

Kernel layout mirrors tile_fwd: params_t [PW, P] in HBM, per-tile grid with
scalar-prefetched starts/counts, [PIX, CHUNK] compute blocks, and the
per-parameter pixel reductions producing a [PW, CHUNK] gradient block that is
DMA'd back to the dparams_t output.

Unaligned tile starts are handled exactly like the forward kernel: the chunk
DMA base is aligned down to the 128-lane tiling and the sub-128 prefix is
masked out of the gradient math.  Because the aligned-down first chunk
overlaps the previous tile's already-written tail, the first chunk is a
read-merge-write: the existing dparams lanes below the prefix are DMA'd in and
preserved.  This is safe because TPU grid iterations execute sequentially on
the core (tile t's output DMA completes before tile t+1 runs) — do NOT mark
the grid dimension "parallel".  The output is input-output-aliased with a
zeros buffer so pair slots no tile covers (k_max-truncated tails, the
sorted-invalid suffix) hold exact zero gradients.

Per chunk the blend math needs two lane scans: the forward's cumprod of
(1 - a) and ONE exclusive cumsum of q = (sum_ch ghat_ch c_ch) w — the three
per-channel suffix sums collapse because ghat is constant along lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevy_gaussian_splatting_tpu.models.settings import CloudSettings, GaussianMode
from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
    ALPHA_CAP,
    CHUNK,
    PIX,
    PW,
    TILE,
    TRANS_EPS,
    _cumprod_lanes,
    _tile_pixel_coords,
)


def _cumsum_lanes_inclusive_flat(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    y = x
    while shift < n:
        rolled = pltpu.roll(y, shift, axis=1)
        y = y + jnp.where(lane >= shift, rolled, 0.0)
        shift *= 2
    return y


def _cumsum_lanes_inclusive(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum along lanes (Hillis-Steele).

    Same two-level blocked formulation switch as tile_fwd._cumprod_lanes
    (7 steps per 128-lane tile + a column carry, vs log2(n) full-width
    steps).  The backward consumes the INCLUSIVE form directly
    (qS_after = total - prefix - inclusive), saving the exclusive
    conversion's roll+select passes."""
    from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
        _SCAN_BLOCK,
        _SCAN_IMPL,
    )

    n = x.shape[1]
    if _SCAN_IMPL != "blocked" or n <= _SCAN_BLOCK or n % _SCAN_BLOCK:
        return _cumsum_lanes_inclusive_flat(x)
    blocks = []
    carry = None
    for k in range(n // _SCAN_BLOCK):
        b = _cumsum_lanes_inclusive_flat(
            x[:, k * _SCAN_BLOCK : (k + 1) * _SCAN_BLOCK]
        )
        if carry is not None:
            b = b + carry
        carry = b[:, _SCAN_BLOCK - 1 :]
        blocks.append(b)
    return jnp.concatenate(blocks, axis=1)


def _alpha_and_partials(chunk, px_vp, py_vp, mode: str, width: int, height: int):
    """Forward alpha plus the partials needed for the parameter chain.

    Returns (alpha, aux) with aux mode-specific tensors, all [PIX, CHUNK]."""
    from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import rgb_row

    cx = chunk[0:1, :]
    cy = chunk[1:2, :]
    opacity = chunk[rgb_row(mode) + 3 : rgb_row(mode) + 4, :]
    if mode == "2d":
        # slim affine surfel (folded homography; see pack_raster_params /
        # tile_fwd._chunk_alpha): q = dxn*A + dyn*B + C
        px_ndc = px_vp * (1.0 / width)
        py_ndc = py_vp * (1.0 / height)
        mrx = chunk[2:3, :] * (1.0 / width)
        mry = chunk[2:3, :] * (1.0 / height)
        dxn = px_ndc - cx
        dyn = py_ndc - cy
        inside = (jnp.abs(dxn) <= mrx) & (jnp.abs(dyn) <= mry)
        A = [chunk[3 + i : 4 + i, :] for i in range(3)]
        B = [chunk[6 + i : 7 + i, :] for i in range(3)]
        px_ = dxn * A[0] + dyn * B[0] + chunk[9:10, :]
        py_ = dxn * A[1] + dyn * B[1] + chunk[10:11, :]
        pz_raw = dxn * A[2] + dyn * B[2] + chunk[11:12, :]
        pz_ = jnp.where(jnp.abs(pz_raw) > 1e-12, pz_raw, 1e-12)
        # backward-only recompute: one reciprocal instead of two divides
        # (1-ulp association differences are inside the gradient tolerance)
        inv_pz = 1.0 / pz_
        us = px_ * inv_pz
        vs = py_ * inv_pz
        s3d = us * us + vs * vs
        # same folded-constant form as the forward kernel so the min-branch
        # selection matches it bit-exactly
        d2x2 = (dxn * dxn + dyn * dyn) * (2.0 * float(width) * float(width))
        power = -0.5 * jnp.minimum(s3d, d2x2)
        g = jnp.where(inside, jnp.exp(power), 0.0)
        raw = g * opacity
        capped = raw >= ALPHA_CAP
        alpha = jnp.minimum(raw, ALPHA_CAP)
        return alpha, {
            "g": g, "capped": capped, "dxn": dxn, "dyn": dyn, "A": A, "B": B,
            "us": us, "vs": vs, "inv_pz": inv_pz, "pz_raw": pz_raw,
            "s3d": s3d, "d2x2": d2x2,
        }
    if mode == "aabb":
        dx = cx - px_vp
        dy = cy - py_vp
        a_ = chunk[2:3, :]
        b_ = chunk[3:4, :]
        c_ = chunk[4:5, :]
        power = -0.5 * (a_ * dx * dx + c_ * dy * dy) + b_ * dx * dy
        r = chunk[5:6, :]
        inside = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r) & (power <= 0.0)
        g = jnp.where(inside, jnp.exp(power), 0.0)
        raw = g * opacity
        capped = raw >= ALPHA_CAP
        alpha = jnp.minimum(raw, ALPHA_CAP)
        return alpha, {"g": g, "dx": dx, "dy": dy, "capped": capped}
    else:
        dx = px_vp - cx
        dy = py_vp - cy
        e1x = chunk[2:3, :]
        e1y = chunk[3:4, :]
        # [1, CHUNK] reciprocals: all u/v/gradient terms then multiply —
        # no [PIX, CHUNK] divide anywhere in the obb backward
        inv_b1 = 1.0 / jnp.maximum(chunk[4:5, :], 1e-12)
        inv_b2 = 1.0 / jnp.maximum(chunk[5:6, :], 1e-12)
        u = (dx * e1x + dy * e1y) * inv_b1
        v = (dx * e1y - dy * e1x) * inv_b2
        inside = (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0) & (chunk[4:5, :] > 0.0)
        g = jnp.where(inside, jnp.exp(-4.5 * (u * u + v * v)), 0.0)
        raw = g * opacity
        capped = raw >= ALPHA_CAP
        alpha = jnp.minimum(raw, ALPHA_CAP)
        return alpha, {
            "g": g, "u": u, "v": v, "dx": dx, "dy": dy,
            "inv_b1": inv_b1, "inv_b2": inv_b2, "capped": capped,
        }


def _backward_kernel(
    start_ref,  # scalar prefetch [T]
    count_ref,  # scalar prefetch [T]
    y0_ref,  # scalar prefetch [1] — band's first pixel row in the full image
    params_hbm,  # [PW, P_pad] ANY
    gbar_ref,  # [8, PIX] VMEM: rows 0-2 ghat_rgb, 3 ghat_T, 4-6 total_rgb, 7 T_fin
    zeros_hbm,  # [PW, P_pad] ANY — donated into dparams_hbm (unread)
    dparams_hbm,  # [PW, P_pad] ANY output (zeros-aliased)
    chunk_vmem,  # [2, PW, CHUNK]
    dchunk_vmem,  # [2, PW, CHUNK] gradient staging (double-buffered writeback)
    merge_vmem,  # [PW, CHUNK] existing-dparams staging (first-chunk merge)
    sem,  # DMA sems [2]
    merge_sem,  # merge DMA sem
    out_sem,  # output DMA sems [2]
    *,
    tx_count: int,
    width: int,
    full_height: int,
    mode: str,
    chunk_size: int = CHUNK,
):
    from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import rgb_row

    ro = rgb_row(mode)
    t = pl.program_id(0)
    start_raw = start_ref[t]
    # align the DMA base down to the lane tiling; the sub-128 prefix lanes
    # belong to the PREVIOUS tile and are masked out / merge-preserved
    base = pl.multiple_of((start_raw // 128) * 128, 128)
    prefix = start_raw - base
    count = count_ref[t]
    total = count + prefix
    px_vp, py_vp = _tile_pixel_coords(t, tx_count, width, full_height,
                                      y0_ref[0])

    ghat_rgb = [gbar_ref[i : i + 1, :].T for i in range(3)]  # [PIX, 1] each
    ghat_T = gbar_ref[3:4, :].T
    total_rgb = [gbar_ref[4 + i : 5 + i, :].T for i in range(3)]
    t_fin = gbar_ref[7:8, :].T

    # (Reformulating the per-parameter pixel reductions as MXU moment
    # matmuls against centered pixel monomials was MEASURED SLOWER on v5e
    # (2026-08-20): each [few, PIX] @ [PIX, CHUNK] dot pads its small axis to
    # a full 128 MXU tile and precision=HIGHEST — required for f32-faithful
    # gradients — multiplies that by 6, so every dot costs ~200 MFLOP-eq vs
    # the ~2-pass VPU mul+sublane-reduce it replaces.  Keep the VPU form.)

    n_chunks = jnp.where(count > 0, pl.cdiv(total, chunk_size), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk_size), 1)

    def dma_in(slot, chunk_idx):
        return pltpu.make_async_copy(
            params_hbm.at[:, pl.ds(base + chunk_idx * chunk_size, chunk_size)],
            chunk_vmem.at[slot],
            sem.at[slot],
        )

    def dma_out(slot, chunk_idx):
        return pltpu.make_async_copy(
            dchunk_vmem.at[slot],
            dparams_hbm.at[:, pl.ds(base + chunk_idx * chunk_size, chunk_size)],
            out_sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, 0).start()
        # previous tile's tail shares the first 128-lane block: fetch what is
        # already there so the prefix lanes can be written back unchanged
        pltpu.make_async_copy(
            dparams_hbm.at[:, pl.ds(base, chunk_size)], merge_vmem, merge_sem
        ).start()

    # dalpha needs sum_ch ghat_ch * S_after_ch; since ghat is per-PIXEL (lane
    # independent) the three per-channel suffix scans collapse into ONE scan
    # of q = sum_ch ghat_ch * c_ch * w, with Q_total = sum_ch ghat_ch * total_ch
    q_total = sum(ghat_rgb[ch] * total_rgb[ch] for ch in range(3))  # [PIX, 1]
    # per-tile constant: the transmittance cotangent's dalpha term
    # (ghat_T * T_fin) is lane-independent — fold it once into the column
    # that qS_after subtracts instead of two full-block passes per chunk
    gt_col = ghat_T * t_fin  # [PIX, 1]

    def body(state):
        c, trans, q_prefix = state

        @pl.when(c + 1 < n_chunks)
        def _():
            dma_in((c + 1) % 2, c + 1).start()

        dma_in(c % 2, c).wait()
        chunk = chunk_vmem[c % 2]

        alpha, aux = _alpha_and_partials(chunk, px_vp, py_vp, mode, width,
                                         full_height)
        lane_idx = c * chunk_size + lane
        in_rng = (lane_idx >= prefix) & (lane_idx < total)
        alpha = jnp.where(in_rng, alpha, 0.0)

        one_minus = 1.0 - alpha
        cum = _cumprod_lanes(one_minus)
        excl = jnp.where(lane == 0, 1.0, pltpu.roll(cum, 1, axis=1))
        T_i = excl * trans  # [PIX, CHUNK] transmittance in front of splat i
        w = alpha * T_i

        crgb = [chunk[ro + ch : ro + ch + 1, :] for ch in range(3)]

        # dL/dc_i: reduce over pixels
        dc = [jnp.sum(w * ghat_rgb[ch], axis=0, keepdims=True) for ch in range(3)]

        # ghat-weighted color sum gc_i = sum_ch ghat_ch c_ch,i; q_i = gc_i w_i
        gc = sum(ghat_rgb[ch] * crgb[ch] for ch in range(3))
        q = gc * w
        inv_om = 1.0 / jnp.maximum(one_minus, 1e-6)
        local_incl = _cumsum_lanes_inclusive(q)
        # sum_ch ghat_ch S_after PLUS the ghat_T T_fin term, folded into one
        # subtracted column (1-ulp reassociations vs the explicit form are
        # inside the gradient tolerances):
        #   dalpha = gc T_i - (S_after + ghat_T T_fin) / (1 - a)
        qS_eff = (q_total - q_prefix + gt_col) - local_incl
        dalpha = gc * T_i - qS_eff * inv_om
        q_prefix = q_prefix + jnp.sum(q, axis=1, keepdims=True)
        # cap + row masking zero the gradient exactly like the forward's min()
        dalpha = jnp.where(aux["capped"], 0.0, dalpha)
        dalpha = jnp.where(in_rng, dalpha, 0.0)

        g = aux["g"]
        opacity = chunk[ro + 3 : ro + 4, :]
        dag = dalpha * g  # shared by dop and dpower (bit-identical assoc)
        dop = jnp.sum(dag, axis=0, keepdims=True)
        dpower = dag * opacity  # == dalpha * alpha_raw (pre-cap)

        zeros = jnp.zeros_like(dop)
        if mode == "aabb":
            dx, dy = aux["dx"], aux["dy"]
            da = jnp.sum(dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
            db = jnp.sum(dpower * (dx * dy), axis=0, keepdims=True)
            dcc = jnp.sum(dpower * (-0.5 * dy * dy), axis=0, keepdims=True)
            a_ = chunk[2:3, :]
            b_ = chunk[3:4, :]
            c_ = chunk[4:5, :]
            dpdx = -a_ * dx + b_ * dy
            dpdy = -c_ * dy + b_ * dx
            dcx = jnp.sum(dpower * dpdx, axis=0, keepdims=True)  # ddx/dcx=+1
            dcy = jnp.sum(dpower * dpdy, axis=0, keepdims=True)
            head = [dcx, dcy, da, db, dcc, zeros]  # radius: mask-only, grad 0
        elif mode == "2d":
            # slim surfel chain: power = -1/2 min(s3d, 2 d2);
            # s3d = us^2 + vs^2 with (us, vs) = (qx, qy)/qz and
            # q = dxn*A + dyn*B + C; d2 = W^2 (dxn^2 + dyn^2)
            us, vs = aux["us"], aux["vs"]
            A, B = aux["A"], aux["B"]
            dxn, dyn = aux["dxn"], aux["dyn"]
            take3d = aux["s3d"] <= aux["d2x2"]  # min() picks s3d branch
            ds3d = jnp.where(take3d, -0.5 * dpower, 0.0)
            # power = -0.5*d2x2 on the 2D branch with d2x2 = 2 w^2 (dxn^2 +
            # dyn^2), so d(power)/d(dxn) = -2 w^2 dxn — identical chain to
            # the old 2*d2 form
            dd2 = jnp.where(take3d, 0.0, -dpower)

            inv_pz = aux["inv_pz"]  # shared with the alpha recompute
            dus = ds3d * 2.0 * us
            dvs = ds3d * 2.0 * vs
            dq0 = dus * inv_pz
            dq1 = dvs * inv_pz
            dq2 = -(dus * us + dvs * vs) * inv_pz
            # clamp transpose: no gradient where |pz_raw| <= 1e-12
            dq2 = jnp.where(jnp.abs(aux["pz_raw"]) > 1e-12, dq2, 0.0)
            dq = (dq0, dq1, dq2)
            # q_k = dxn*A_k + dyn*B_k + C_k
            dA = [jnp.sum(dq[k] * dxn, axis=0, keepdims=True) for k in range(3)]
            dB = [jnp.sum(dq[k] * dyn, axis=0, keepdims=True) for k in range(3)]
            dC = [jnp.sum(dq[k], axis=0, keepdims=True) for k in range(3)]
            w2 = float(width) * float(width)
            ddxn = dd2 * 2.0 * w2 * dxn + sum(dq[k] * A[k] for k in range(3))
            ddyn = dd2 * 2.0 * w2 * dyn + sum(dq[k] * B[k] for k in range(3))
            # dxn = px_ndc - cx ; dyn = py_ndc - cy
            dcx = jnp.sum(-ddxn, axis=0, keepdims=True)
            dcy = jnp.sum(-ddyn, axis=0, keepdims=True)
            head = [dcx, dcy, zeros] + dA + dB + dC  # mr: mask-only, grad 0
        else:
            u, v = aux["u"], aux["v"]
            dx, dy = aux["dx"], aux["dy"]
            # every downstream term divides by b1/b2 — fold the per-lane
            # reciprocals AND the -9 constant into [1, CHUNK] row factors
            # (full-block passes: 2 per du/dv instead of 3; the original
            # form additionally had 12 block divides — none remain)
            rub = -9.0 * aux["inv_b1"]  # [1, CHUNK]
            rvb = -9.0 * aux["inv_b2"]
            dub = (dpower * u) * rub
            dvb = (dpower * v) * rvb
            d2 = jnp.sum(dub * dx - dvb * dy, axis=0, keepdims=True)  # e1x
            d3 = jnp.sum(dub * dy + dvb * dx, axis=0, keepdims=True)  # e1y
            # b1/b2 grads: negate AFTER the reduction ([1, CHUNK] rows)
            # instead of negating full blocks (exact: negation is sign-flip)
            d4 = -jnp.sum(dub * u, axis=0, keepdims=True)  # b1
            d5 = -jnp.sum(dvb * v, axis=0, keepdims=True)  # b2
            # centers: du/dcx = -e1x/b1, dv/dcx = -e1y/b2 ; du/dcy = -e1y/b1,
            # dv/dcy = +e1x/b2  (dx = px - cx, dy = py - cy)
            e1x = chunk[2:3, :]
            e1y = chunk[3:4, :]
            dcx = -jnp.sum(dub * e1x + dvb * e1y, axis=0, keepdims=True)
            dcy = jnp.sum(dvb * e1x - dub * e1y, axis=0, keepdims=True)
            head = [dcx, dcy, d2, d3, d4, d5]

        pw = dchunk_vmem.shape[1]
        rows = head + [dc[0], dc[1], dc[2], dop]
        rows += [zeros] * (pw - len(rows))
        dgrad = jnp.concatenate(rows, axis=0)  # [pw, CHUNK]
        # in_rng already zeroed out-of-range gradient lanes; additionally the
        # first chunk must PRESERVE the previous tile's prefix lanes
        @pl.when(c == 0)
        def _():
            pltpu.make_async_copy(
                dparams_hbm.at[:, pl.ds(base, chunk_size)], merge_vmem, merge_sem
            ).wait()

        merged = jnp.where((c == 0) & (lane < prefix), merge_vmem[...], dgrad)
        # double-buffered writeback: before reusing this slot's staging
        # buffer, wait for the DMA issued two chunks ago from the same slot
        @pl.when(c >= 2)
        def _():
            dma_out(c % 2, c - 2).wait()

        dchunk_vmem[c % 2] = merged
        dma_out(c % 2, c).start()

        trans = trans * cum[:, -1:]
        return c + 1, trans, q_prefix

    def cond(state):
        # Early exit once every pixel saturates: beyond that point T_i, w and
        # t_fin are ~0, so the true gradients are ~0 — and the zeros-donated
        # output already holds exact zeros for unwritten chunks, so skipping
        # both the compute AND the writes is safe (matches the forward
        # kernel's early exit; XLA-AD reference differs by <1e-8).
        c, trans, *_ = state
        return (c < n_chunks) & (jnp.max(trans) > TRANS_EPS)

    c_fin, *_ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.ones((PIX, 1), jnp.float32),
                     jnp.zeros((PIX, 1), jnp.float32))
    )

    # drain the in-flight prefetch on early exit (same hazard as tile_fwd:
    # an unwaited DMA could race the next grid step's reuse of the buffer)
    @pl.when(c_fin < n_chunks)
    def _():
        dma_in(c_fin % 2, c_fin).wait()

    # drain the (up to two) outstanding writeback DMAs: the next grid step
    # reuses the staging buffers AND its merge-read overlaps this tile's last
    # written block, so every write must land before the body returns
    @pl.when(c_fin >= 1)
    def _():
        dma_out((c_fin - 1) % 2, c_fin - 1).wait()

    @pl.when(c_fin >= 2)
    def _():
        dma_out((c_fin - 2) % 2, c_fin - 2).wait()


def pallas_composite_backward(
    params_sorted: jnp.ndarray,  # [P, C] pair-sorted (no alignment required)
    tile_start: jnp.ndarray,  # [T]
    count: jnp.ndarray,  # [T]
    gbar: jnp.ndarray,  # [T, 8, PIX] packed cotangents + residuals
    settings: CloudSettings,
    width: int,
    height: int,
    interpret: bool = False,
    full_width: bool = False,
    y0=None,
    full_height: int | None = None,
    transposed: bool = False,
    chunk_size: int | None = None,
    transposed_params: bool = False,
) -> jnp.ndarray:
    """Run the backward kernel -> dparams [P, C] in the same sorted layout
    (``transposed=True``: the kernel-native [C, P] layout, whose rows are the
    1-D per-column arrays the training core feeds to the grad reorder sort).

    Pair slots no tile covers (k_max-truncated tails, sorted-invalid suffix)
    come back as exact zeros via the donated zero-initialized output.

    ``full_width=True`` returns the kernel's native padded width [P, PW]
    (zero gradient columns kept) for tooling; the production training core
    takes the default live-width view — row-gather rate depends only on the
    TABLE SIZE (sharp 64 MiB cliff, tools/profile_bwd_gather.py), so the
    caller column-splits gathers instead of padding rows to 64 B.

    ``y0``/``full_height``: full-frame pixel geometry for sharded band
    rendering (see pallas_forward_raw); defaults are single-chip exact."""
    from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
        kernel_mode,
        param_width,
    )

    mode = kernel_mode(settings)
    if full_height is None:
        full_height = height
    if y0 is None:
        y0 = jnp.zeros((1,), jnp.int32)
    else:
        y0 = jnp.asarray(y0, jnp.int32).reshape(1)
    pw = param_width(mode)
    tx_count = width // TILE
    ty_count = height // TILE
    num_tiles = tx_count * ty_count
    if transposed_params:
        c, p = params_sorted.shape
    else:
        p, c = params_sorted.shape
    if chunk_size is None:
        # BGS_BWD_CHUNK forces it for A/B; otherwise mean-occupancy policy
        # (tile_fwd.preferred_chunk — the bwd sweep agreed with the fwd one:
        # 1080p train 512/256/128 = 165.9/150.9/154.8)
        import os as _os

        env = _os.environ.get("BGS_BWD_CHUNK")
        from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
            preferred_chunk,
        )

        chunk_size = int(env) if env else preferred_chunk(p, num_tiles)

    p_pad = (p + chunk_size + 127) // 128 * 128
    params_t = jnp.zeros((pw, p_pad), jnp.float32)
    params_t = params_t.at[:c, :p].set(
        params_sorted if transposed_params else params_sorted.T
    )

    kernel = functools.partial(
        _backward_kernel,
        tx_count=tx_count,
        width=width,
        full_height=full_height,
        mode=mode,
        chunk_size=chunk_size,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, PIX), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # donated zeros
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, pw, chunk_size), jnp.float32),
            pltpu.VMEM((2, pw, chunk_size), jnp.float32),
            pltpu.VMEM((pw, chunk_size), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    dparams_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((pw, p_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        # flattened inputs (scalar-prefetch operands count): [start, count,
        # y0, params_t, gbar, zeros] -> the zeros buffer (index 5) is donated
        # as output 0
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_start.astype(jnp.int32),
        count.astype(jnp.int32),
        y0,
        params_t,
        gbar.reshape(num_tiles * 8, PIX),
        jnp.zeros((pw, p_pad), jnp.float32),
    )

    if transposed:
        return dparams_t[:c, :p]
    if full_width:
        return dparams_t[:, :p].T
    return dparams_t[:c, :p].T
