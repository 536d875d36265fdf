"""Stage-level TPU profiler for the tiled pipeline.

Decomposes the forward (and optionally backward) hot path into timed stages so
optimization effort follows measured cost, not guesses.  Timing uses the
relay-safe discipline from bench.py: enqueue ITERS executions back-to-back,
stop the clock after a small readback, take the min over windows.

Run:  python tools/profile_stages.py            (full decomposition)
      PROF_ONLY=gathers python tools/profile_stages.py   (gather micro-bench)
"""

from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.models.settings import CloudSettings
from bevy_gaussian_splatting_tpu.ops import sort as sort_ops
from bevy_gaussian_splatting_tpu.ops import rasterize_tile as rt
from bevy_gaussian_splatting_tpu.ops.project import project_gaussians


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _tiny_readback(out):
    """Device-side slice -> 1-element host transfer (relay-safe: never pull a
    whole array through the tunnel)."""
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jnp.ravel(leaf)[:1])


def timeit(name, fn, *args, iters=8, windows=3):
    """fn must return a jax array (or pytree); times iters chained calls."""
    out = fn(*args)
    _ = _tiny_readback(out)
    best = float("inf")
    for _w in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = _tiny_readback(out)
        t1 = time.perf_counter()
        best = min(best, (t1 - t0) / iters)
    log(f"{name:<44} {best * 1e3:9.2f} ms")
    return best


def make_scene(n, width, height):
    cloud = bgs.random_gaussians_3d_seeded(n, seed=0)
    cloud = dataclasses.replace(
        cloud,
        position_visibility=cloud.position_visibility
        * jnp.array([1.0, 1.0, 0.25, 1.0]),
        scale_opacity=cloud.scale_opacity * jnp.array([0.05, 0.05, 0.05, 1.0]),
    )
    camera = bgs.Camera.create(
        eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0), width=width, height=height
    )
    return cloud, camera


def main():
    n = int(os.environ.get("PROF_N", 1_000_000))
    width = height = int(os.environ.get("PROF_SIZE", 512))
    # non-square override (e.g. the reference's 1080p: PROF_W=1920 PROF_H=1088)
    width = int(os.environ.get("PROF_W", width))
    height = int(os.environ.get("PROF_H", height))
    only = os.environ.get("PROF_ONLY", "")
    settings = CloudSettings()
    cloud, camera = make_scene(n, width, height)
    mt = jnp.eye(4, dtype=jnp.float32)
    bg = jnp.zeros((4,), jnp.float32)
    log(f"devices={jax.devices()} N={n} {width}x{height}")

    p_max = rt.pairs_budget(n)

    # ---- shared prefix: project + keys (returns splats dict) ----------------
    @jax.jit
    def prefix(cloud, t):
        clip_from_world = camera.clip_from_view @ camera.view_from_world
        keys, order = sort_ops.sort_gaussians_radix(
            cloud.position, mt, clip_from_world, camera.world_position,
            settings.radix_sort_depth_bits.bits,
        )
        from bevy_gaussian_splatting_tpu.ops.transforms import apply_transform

        wp = apply_transform(mt, cloud.position)
        first_idx = order[min(1, n - 1)]
        last_idx = order[n - 1]
        max_d = jnp.linalg.norm(wp[first_idx] - camera.world_position)
        min_d = jnp.linalg.norm(wp[last_idx] - camera.world_position)
        splats = project_gaussians(
            cloud, camera, settings, mt, depth_minmax=(min_d, max_d), time=t
        )
        back_key = sort_ops.radix_depth_key(
            cloud.position, mt, clip_from_world, camera.world_position,
            settings.radix_sort_depth_bits.bits,
        )
        splats["sort_key"] = back_key
        splats["mask"] = splats["mask"] & (back_key != sort_ops.SENTINEL_KEY)
        return splats

    splats = jax.block_until_ready(prefix(cloud, jnp.float32(0.0)))

    if only in ("", "stages"):
        timeit("prefix: sort+project+keys", prefix, cloud, jnp.float32(1e-7))

        @jax.jit
        def binning(splats):
            return rt.bin_gaussians(splats, settings, width, height, p_max)

        g_s, tile_s, valid_s, total = jax.block_until_ready(binning(splats))
        log(f"  actual pair total = {int(total)} / budget {p_max}")
        timeit("binning (expand+sort)", binning, splats)

        # binning sub-stages
        @jax.jit
        def bin_nosort(splats):
            # copy of bin_gaussians up to (tile, g, valid) before lax.sort
            tx_count = width // rt.TILE
            ty_count = height // rt.TILE
            cx, cy, rx, ry = rt._pixel_extents(splats, settings, width, height)
            active = splats["mask"] & (rx > 0.0) & (ry > 0.0)
            tx0 = jnp.clip(jnp.floor((cx - rx) / rt.TILE), 0, tx_count - 1).astype(jnp.int32)
            tx1 = jnp.clip(jnp.floor((cx + rx) / rt.TILE), 0, tx_count - 1).astype(jnp.int32)
            ty0 = jnp.clip(jnp.floor((cy - ry) / rt.TILE), 0, ty_count - 1).astype(jnp.int32)
            ty1 = jnp.clip(jnp.floor((cy + ry) / rt.TILE), 0, ty_count - 1).astype(jnp.int32)
            on_screen = (
                (cx + rx >= 0.0) & (cx - rx <= width) & (cy + ry >= 0.0) & (cy - ry <= height)
            )
            active = active & on_screen
            front_key = jnp.uint32(0xFFFFFFFF) - splats["sort_key"]
            rev_idx = jnp.uint32(n - 1) - jnp.arange(n, dtype=jnp.uint32)
            _, _, perm = jax.lax.sort(
                (front_key, rev_idx, jnp.arange(n, dtype=jnp.int32)), num_keys=2
            )
            tx0p = tx0[perm]
            ty0p = ty0[perm]
            rect_wp = (tx1 - tx0 + 1)[perm]
            rect_hp = (ty1 - ty0 + 1)[perm]
            counts = jnp.where(active[perm], rect_wp * rect_hp, 0)
            cum = jnp.cumsum(counts)
            total = cum[-1]
            offsets = cum - counts
            starts = jnp.where(counts > 0, offsets, p_max)
            gidx = rt.slot_owner_scan(starts, jnp.arange(n, dtype=jnp.int32), p_max)
            slots = jnp.arange(p_max, dtype=jnp.int32)
            valid = slots < total
            packed = jnp.stack([offsets, rect_wp, tx0p, ty0p, perm], axis=1)
            pg = packed[gidx]
            k = slots - pg[:, 0]
            tile_x = pg[:, 2] + k % pg[:, 1]
            tile_y = pg[:, 3] + k // pg[:, 1]
            tile = tile_y * tx_count + tile_x
            tile = jnp.where(valid, tile, tx_count * ty_count)
            return tile, pg[:, 4], valid

        tile_u, g_u, valid_u = jax.block_until_ready(bin_nosort(splats))
        timeit("  expand only (no pair sort)", bin_nosort, splats)

        @jax.jit
        def pair_sort(tile, g, valid):
            return jax.lax.sort((tile, g, valid), num_keys=1, is_stable=True)

        timeit("  pair sort alone", pair_sort, tile_u, g_u, valid_u)

        @jax.jit
        def packparams(splats):
            return rt.pack_raster_params(splats, settings, width, height)

        params = jax.block_until_ready(packparams(splats))
        timeit("pack_raster_params", packparams, splats)

        num_tiles = (width // rt.TILE) * (height // rt.TILE)

        @jax.jit
        def ranges(tile_s):
            return rt.tile_ranges(tile_s, num_tiles)

        start, end = jax.block_until_ready(ranges(tile_s))
        timeit("tile_ranges searchsorted", ranges, tile_s)

        # align machinery (from render_tiled pallas branch)
        @jax.jit
        def align(g_s, start, end, params):
            count = jnp.minimum(end - start, rt.tile_budget(n))
            aligned_count = (count + 127) // 128 * 128
            aligned_start = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned_count)[:-1].astype(jnp.int32)]
            )
            p_aligned = p_max + 128 * num_tiles
            slots = jnp.arange(p_aligned, dtype=jnp.int32)
            t_starts = jnp.where(aligned_count > 0, aligned_start, p_aligned)
            t_of_slot = rt.slot_owner_scan(
                t_starts, jnp.arange(num_tiles, dtype=jnp.int32), p_aligned
            )
            tpack = jnp.stack([aligned_start, count, start], axis=1)[t_of_slot]
            j = slots - tpack[:, 0]
            slot_valid = (j >= 0) & (j < tpack[:, 1])
            src = jnp.clip(tpack[:, 2] + j, 0, g_s.shape[0] - 1)
            g_aligned = jnp.where(slot_valid, g_s[src], 0)
            params_aligned = jnp.where(slot_valid[:, None], params[g_aligned], 0.0)
            return params_aligned, aligned_start, count

        params_aligned, astart, acount = jax.block_until_ready(
            align(g_s, start, end, params)
        )
        timeit("align machinery + params gather", align, g_s, start, end, params)

        @jax.jit
        def just_gather(params, g_s):
            return params[g_s]

        timeit("  params[g_s] row gather [P,C] f32", just_gather, params, g_s)

        # Pallas kernel alone (aligned path, fwd)
        from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
            pallas_forward_raw,
        )

        interp = jax.default_backend() != "tpu"

        @jax.jit
        def kernel_only(params_aligned, astart, acount):
            return pallas_forward_raw(
                params_aligned, astart, acount, settings, width, height,
                interpret=interp,
            )

        jax.block_until_ready(kernel_only(params_aligned, astart, acount))
        timeit("pallas fwd kernel alone", kernel_only, params_aligned, astart, acount)

        @jax.jit
        def kernel_noee(params_aligned, astart, acount):
            return pallas_forward_raw(
                params_aligned, astart, acount, settings, width, height,
                early_exit=False, interpret=interp,
            )

        timeit("pallas fwd kernel (no early exit)", kernel_noee,
               params_aligned, astart, acount)

        # full fwd for reference
        pipe = rt.make_tiled_pipeline(settings, width, height, compositor="pallas")
        timeit("FULL fwd (pallas)", pipe, cloud, camera, mt, bg, jnp.float32(1e-7))

    if only in ("", "gathers"):
        log("--- gather micro-bench ---")
        rng = np.random.default_rng(0)
        idx = jnp.asarray(rng.integers(0, n, size=p_max), dtype=jnp.int32)
        tbl16 = jnp.asarray(rng.standard_normal((n, 16)), dtype=jnp.float32)
        tbl8i = jnp.asarray(rng.integers(0, 2**31, size=(n, 8)), dtype=jnp.int32)
        tblT = tbl16.T  # [16, n]

        def rate(name, t, bytes_):
            log(f"    -> {bytes_ / t / 1e9:7.2f} GB/s gathered ({name})")

        t = timeit("gather rows [N,16]f32 -> [P,16]", jax.jit(lambda a, i: a[i]), tbl16, idx)
        rate("rows16", t, p_max * 64)
        t = timeit("gather rows [N,8]i32 -> [P,8]", jax.jit(lambda a, i: a[i]), tbl8i, idx)
        rate("rows8", t, p_max * 32)
        t = timeit("gather 1D [N] -> [P] x1", jax.jit(lambda a, i: a[:, 0][i]), tbl16, idx)
        rate("1d", t, p_max * 4)

        @jax.jit
        def cols16(aT, i):
            return jnp.stack([aT[c][i] for c in range(16)], axis=0)

        t = timeit("gather 16x 1D cols -> [16,P]", cols16, tblT, idx)
        rate("cols16", t, p_max * 64)

        @jax.jit
        def take_fill(a, i):
            return jnp.take(a, i, axis=0, mode="fill", fill_value=0.0)

        t = timeit("jnp.take mode=fill rows [N,16]", take_fill, tbl16, idx)
        rate("take", t, p_max * 64)

        # sorted indices (locality)
        idx_sorted = jnp.sort(idx)
        t = timeit("gather rows16, SORTED idx", jax.jit(lambda a, i: a[i]), tbl16, idx_sorted)
        rate("rows16-sorted", t, p_max * 64)

        log("--- scatter micro-bench (bwd reduction candidates) ---")
        upd16 = jnp.asarray(rng.standard_normal((p_max, 16)), dtype=jnp.float32)

        @jax.jit
        def scat_add(upd, i):
            return jnp.zeros((n, 16), jnp.float32).at[i].add(upd)

        t = timeit("scatter-add [P,16] -> [N,16]", scat_add, upd16, idx)
        rate("scatter-add", t, p_max * 64)

        @jax.jit
        def segsum_contig(upd):
            # contiguous segment-sum via blocked cumsum + boundary gather
            P = upd.shape[0]
            block = 512
            nb = P // block
            b = upd[: nb * block].reshape(nb, block, 16)
            within = jnp.cumsum(b, axis=1)
            carry = jnp.cumsum(within[:, -1, :], axis=0)
            carry = jnp.concatenate([jnp.zeros((1, 16)), carry[:-1]], axis=0)
            cum = (within + carry[:, None, :]).reshape(nb * block, 16)
            # fake contiguous offsets: n segments of P//n
            seg = P // n
            ends = (jnp.arange(n, dtype=jnp.int32) + 1) * seg - 1
            starts = ends - seg
            s0 = jnp.where((starts >= 0)[:, None], cum[jnp.maximum(starts, 0)], 0.0)
            return cum[ends] - s0

        t = timeit("contig segsum (cumsum+2 gathers)", segsum_contig, upd16)
        rate("segsum", t, p_max * 64)

        @jax.jit
        def segsum_flags(upd):
            from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
                segment_sum_contiguous,
            )

            P = upd.shape[0]
            seg = P // n
            gidx_s = jnp.arange(P, dtype=jnp.int32) // seg
            offs = jnp.arange(n, dtype=jnp.int32) * seg
            cnts = jnp.full((n,), seg, jnp.int32)
            return segment_sum_contiguous(upd, gidx_s, offs, cnts, max_segment=1024)

        t = timeit("segmented-flag scan reduction", segsum_flags, upd16)
        rate("segsum-flags", t, p_max * 64)

        # ownership scatter variants (bin_gaussians slot_owner_scan input);
        # strictly increasing starts so the sorted+unique hints are honest
        starts = jnp.sort(
            jnp.asarray(rng.integers(0, p_max - n, size=n), jnp.int32)
        ) + jnp.arange(n, dtype=jnp.int32)
        vals = jnp.arange(n, dtype=jnp.int32) + 1

        @jax.jit
        def scat_max_plain(starts, vals):
            return jnp.zeros((p_max,), jnp.int32).at[starts].max(vals, mode="drop")

        timeit("scatter-max 1M -> P plain", scat_max_plain, starts, vals)

        @jax.jit
        def scat_max_hinted(starts, vals):
            return jnp.zeros((p_max,), jnp.int32).at[starts].max(
                vals, mode="drop", unique_indices=True, indices_are_sorted=True
            )

        timeit("scatter-max 1M -> P sorted+unique", scat_max_hinted, starts, vals)

        @jax.jit
        def blocked_cummax_p(x):
            return rt._blocked_cummax(x)

        marks = scat_max_plain(starts, vals)
        timeit("blocked cummax over P", blocked_cummax_p, marks)

    if only in ("", "train"):
        log("--- training step (fwd+bwd) ---")
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
            make_tiled_pipeline,
            pair_count,
            pairs_budget,
            render_tiled,
        )

        total = int(
            jax.jit(
                lambda c: pair_count(c, camera, settings, width=width, height=height)
            )(cloud)
        )
        for label, budget in (
            ("static budget", None),
            ("adaptive budget", pairs_budget(n, total)),
        ):
            fwd_pipe = make_tiled_pipeline(
                settings, width, height, differentiable=False,
                compositor="pallas", pairs_max=budget,
            )
            timeit(f"fwd pallas ({label})", fwd_pipe, cloud, camera,
                   jnp.eye(4), bg, jnp.float32(1e-7))
            target = fwd_pipe(cloud, camera, jnp.eye(4), bg, jnp.float32(0.0))

            @jax.jit
            def fwd_bwd(c, t, budget=budget, target=target):
                def loss(c):
                    img = render_tiled(
                        c, camera, settings, None, bg, t,
                        width=width, height=height, differentiable=True,
                        compositor="pallas", pairs_max=budget,
                    )
                    return jnp.mean((img - target) ** 2)

                return jax.value_and_grad(loss)(c)

            timeit(f"fwd+bwd pallas ({label})", fwd_bwd, cloud, jnp.float32(1e-7))

    if only in ("train3",):
        # In-jit ablation of the training step: replace pieces of the
        # custom-VJP backward with cheap stand-ins INSIDE the full jit, so
        # each delta reflects fused in-graph cost (stage-level timings across
        # jit boundaries were shown to mislead: layout/materialization
        # artifacts at the boundary).
        import dataclasses as _dc

        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
            bin_gaussians as _bin,
            make_tiled_pipeline,
            pack_raster_params as _pack,
            pair_count as _pc,
            pairs_budget as _pb,
            segment_sum_contiguous,
            tile_budget as _tb,
            tile_ranges as _tr,
        )
        from bevy_gaussian_splatting_tpu.ops.pallas import tile_bwd, tile_fwd
        from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
            composite_epilogue,
            pallas_forward_raw,
        )

        total = int(jax.jit(
            lambda c: _pc(c, camera, settings, width=width, height=height))(cloud))
        budget = _pb(n, total)
        num_tiles = (width // rt.TILE) * (height // rt.TILE)
        k_max = _tb(n)
        log(f"budget {budget}")

        fwd_pipe = make_tiled_pipeline(
            settings, width, height, differentiable=False,
            compositor="pallas", pairs_max=budget,
        )
        target = fwd_pipe(cloud, camera, jnp.eye(4), bg, jnp.float32(0.0))
        interp = jax.default_backend() != "tpu"

        def make_step(bwd_variant: str):
            @jax.custom_vjp
            def core(params, g_s, valid_s, start, count, inv_pair, gidx,
                     off_cloud, cnt_cloud):
                params_sorted = params[g_s]
                return pallas_forward_raw(
                    params_sorted, start, count, settings, width, height,
                    interpret=interp)

            def core_fwd(params, g_s, valid_s, start, count, inv_pair, gidx,
                         off_cloud, cnt_cloud):
                params_sorted = params[g_s]
                out_raw = pallas_forward_raw(
                    params_sorted, start, count, settings, width, height,
                    interpret=interp)
                return out_raw, (params_sorted, start, count, out_raw,
                                 inv_pair, gidx, off_cloud, cnt_cloud)

            def core_bwd(res, g_out):
                (params_sorted, start, count, out_raw, inv_pair, gidx,
                 off_cloud, cnt_cloud) = res
                c_par = params_sorted.shape[1]
                g = g_out.reshape(num_tiles, 8, 256)
                o = out_raw.reshape(num_tiles, 8, 256)
                gbar = jnp.concatenate(
                    [g[:, :4, :], o[:, :3, :], o[:, 3:4, :]], axis=1)
                if bwd_variant == "full":
                    dsorted = tile_bwd.pallas_composite_backward(
                        params_sorted, start, count, gbar, settings, width,
                        height, interpret=interp, full_width=True)
                elif bwd_variant in ("nokernel", "nothing"):
                    # data-dependent stand-in (not constant-foldable)
                    pw = tile_fwd.param_width(tile_fwd.kernel_mode(settings))
                    dsorted = jnp.pad(
                        params_sorted * (1e-9 * gbar[0, 0, 0]),
                        ((0, 0), (0, pw - c_par)))
                if bwd_variant == "nothing":
                    dparams = dsorted[:off_cloud.shape[0], :c_par] * 1.0
                else:
                    dslot = dsorted[inv_pair]
                    dparams = segment_sum_contiguous(
                        dslot, gidx, off_cloud, cnt_cloud,
                        max_segment=num_tiles)[:, :c_par]
                f0 = jax.dtypes.float0

                def nil(a):
                    return np.zeros(a.shape, dtype=f0)

                return (dparams, nil(inv_pair), nil(inv_pair), nil(start),
                        nil(count), nil(inv_pair), nil(gidx), nil(off_cloud),
                        nil(cnt_cloud))

            core.defvjp(core_fwd, core_bwd)

            @jax.jit
            def fwd_bwd(c, t):
                def loss(c):
                    clip_from_world = (
                        camera.clip_from_view @ camera.view_from_world)
                    back_key = sort_ops.radix_depth_key(
                        c.position, jnp.eye(4), clip_from_world,
                        camera.world_position,
                        settings.radix_sort_depth_bits.bits)
                    perm = rt.front_depth_perm(back_key)
                    from bevy_gaussian_splatting_tpu.ops.transforms import (
                        apply_transform,
                    )

                    wp = apply_transform(jnp.eye(4), c.position)
                    max_d = jnp.linalg.norm(
                        wp[perm[n - 2]] - camera.world_position)
                    min_d = jnp.linalg.norm(
                        wp[perm[0]] - camera.world_position)
                    splats = project_gaussians(
                        c, camera, settings, jnp.eye(4),
                        depth_minmax=(min_d, max_d), time=t)
                    splats["sort_key"] = back_key
                    splats["mask"] = splats["mask"] & (
                        back_key != sort_ops.SENTINEL_KEY)
                    bins = _bin(splats, settings, width, height, budget,
                                with_inverse=True, perm=perm)
                    g_s, tile_s, valid_s = bins[0], bins[1], bins[2]
                    params = _pack(splats, settings, width, height)
                    start, end = _tr(tile_s, num_tiles)
                    count = jnp.minimum(end - start, k_max)
                    out_raw = core(params, g_s, valid_s, start, count,
                                   bins[4], bins[5], bins[6], bins[7])
                    img = composite_epilogue(out_raw, bg, width, height)
                    return jnp.mean((img - target) ** 2)

                return jax.value_and_grad(loss)(c)

            return fwd_bwd

        @jax.jit
        def fwd_value_only(c, t):
            img = rt.render_tiled(
                c, camera, settings, None, bg, t,
                width=width, height=height, differentiable=True,
                compositor="pallas", pairs_max=budget,
            )
            return jnp.mean((img - target) ** 2)

        @jax.jit
        def fwd_bwd_leaf(c, t):
            # grad w.r.t. the loss stopping at the packed params leaf:
            # measures the full production step minus projection/pack AD
            def upto_params(c):
                clip_from_world = camera.clip_from_view @ camera.view_from_world
                back_key = sort_ops.radix_depth_key(
                    c.position, jnp.eye(4), clip_from_world,
                    camera.world_position, settings.radix_sort_depth_bits.bits)
                splats = project_gaussians(c, camera, settings, jnp.eye(4),
                                           time=t)
                splats["sort_key"] = back_key
                splats["mask"] = splats["mask"] & (
                    back_key != sort_ops.SENTINEL_KEY)
                bins = _bin(splats, settings, width, height, budget,
                            with_inverse=True, expand="pallas")
                params = _pack(splats, settings, width, height)
                return bins, params

            bins, params = jax.lax.stop_gradient(upto_params(c))
            g_s, tile_s, valid_s = bins[0], bins[1], bins[2]
            start, end = _tr(tile_s, num_tiles)
            count = jnp.minimum(end - start, k_max)
            from bevy_gaussian_splatting_tpu.ops.pallas.core import (
                get_train_core_windowed,
            )

            core = get_train_core_windowed(settings, width, height, False,
                                           k_max)

            def loss(params):
                out_raw = core(params, g_s, valid_s, start, count, bins[4],
                               bins[5], bins[6], bins[7],
                               jnp.zeros((1,), jnp.int32))
                img = composite_epilogue(out_raw, bg, width, height)
                return jnp.mean((img - target) ** 2)

            return jax.value_and_grad(loss)(params)

        timeit("fwd (diff pipeline, value only)", fwd_value_only, cloud,
               jnp.float32(1e-7))
        timeit("fwd+bwd [params leaf]", fwd_bwd_leaf, cloud, jnp.float32(1e-7))
        for variant in ("nothing", "nokernel", "full"):
            fn = make_step(variant)
            timeit(f"fwd+bwd [{variant}]", fn, cloud, jnp.float32(1e-7))

    if only == "proj":
        # projection + pack AD in isolation (the training step's ~31 ms
        # XLA-AD block): forward, then grad of a scalar through it
        @jax.jit
        def proj_fwd(c, t):
            splats = project_gaussians(c, camera, settings, mt, time=t)
            params = rt.pack_raster_params(splats, settings, width, height)
            return jnp.sum(params * 1e-6)

        @jax.jit
        def proj_bwd(c, t):
            return jax.grad(lambda c: proj_fwd_inner(c, t))(c)

        def proj_fwd_inner(c, t):
            splats = project_gaussians(c, camera, settings, mt, time=t)
            params = rt.pack_raster_params(splats, settings, width, height)
            return jnp.sum(params * 1e-6)

        timeit("project+pack fwd", proj_fwd, cloud, jnp.float32(1e-7))
        timeit("project+pack fwd+bwd", proj_bwd, cloud, jnp.float32(1e-7))

        # sub-chains
        from bevy_gaussian_splatting_tpu.ops import sh as sh_ops

        @jax.jit
        def sh_only_bwd(c):
            def f(c):
                dirs = c.position / (
                    jnp.linalg.norm(c.position, axis=-1, keepdims=True) + 1e-8
                )
                rgb = sh_ops.spherical_harmonics_lookup(
                    dirs, c.spherical_harmonic
                )
                return jnp.sum(rgb * 1e-6)

            return jax.grad(f)(c)

        timeit("SH eval fwd+bwd", sh_only_bwd, cloud)

        from bevy_gaussian_splatting_tpu.ops import covariance as cov_ops

        @jax.jit
        def cov_bwd(c):
            def f(c):
                cov3d = cov_ops.compute_cov3d(c.rotation, c.scale)
                return jnp.sum(cov3d * 1e-6)

            return jax.grad(f)(c)

        timeit("cov3d fwd+bwd", cov_bwd, cloud)

    if only == "proj2":
        from bevy_gaussian_splatting_tpu.ops import covariance as cov_ops
        from bevy_gaussian_splatting_tpu.ops import transforms as tf_ops

        @jax.jit
        def cov3d_bwd(c):
            return jax.grad(
                lambda c: jnp.sum(
                    cov_ops.compute_cov3d(c.rotation, c.scale) * 1e-6
                )
            )(c)

        timeit("cov3d fwd+bwd (component-wise)", cov3d_bwd, cloud)

        cfw = camera.clip_from_view @ camera.view_from_world

        @jax.jit
        def w2c_bwd(c):
            return jax.grad(
                lambda c: jnp.sum(tf_ops.world_to_clip(c.position, cfw) * 1e-6)
            )(c)

        timeit("world_to_clip fwd+bwd", w2c_bwd, cloud)

        @jax.jit
        def cov2d_bwd(c):
            def f(c):
                c3 = cov_ops.compute_cov3d(c.rotation, c.scale)
                c2 = cov_ops.cov2d(
                    c.position, c3, camera.view_from_world,
                    camera.clip_from_view,
                    jnp.array([float(width), float(height)]),
                )
                return jnp.sum(c2 * 1e-6)

            return jax.grad(f)(c)

        timeit("cov3d+cov2d fwd+bwd", cov2d_bwd, cloud)

        @jax.jit
        def proj_bwd2(c, t):
            def f(c):
                splats = project_gaussians(c, camera, settings, mt, time=t)
                params = rt.pack_raster_params(splats, settings, width, height)
                return jnp.sum(params * 1e-6)

            return jax.grad(f)(c)

        timeit("project+pack fwd+bwd (new)", proj_bwd2, cloud,
               jnp.float32(1e-7))

    if only == "kernels":
        # forward/backward kernel cost per mode at IDENTICAL pair workloads:
        # isolates the 2DGS fragment-math overhead from prestage differences
        from bevy_gaussian_splatting_tpu.models.settings import GaussianMode
        from bevy_gaussian_splatting_tpu.ops.pallas import tile_bwd
        from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
            pallas_forward_raw,
        )

        p_work = int(os.environ.get("PROF_PAIRS", 1_605_632))
        num_tiles = (width // rt.TILE) * (height // rt.TILE)
        rng = np.random.default_rng(0)
        per = p_work // num_tiles
        start = jnp.asarray(np.arange(num_tiles) * per, jnp.int32)
        count = jnp.full((num_tiles,), per, jnp.int32)

        for label, s in (
            ("obb", CloudSettings()),
            ("aabb", CloudSettings(aabb=True)),
            ("2d", CloudSettings(gaussian_mode=GaussianMode.GAUSSIAN_2D)),
        ):
            from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
                kernel_mode, param_width, rgb_row,
            )

            mode = kernel_mode(s)
            pw = param_width(mode)
            params = np.zeros((p_work, pw), np.float32)
            # plausible centers / shape params so alpha math exercises the
            # real code paths (inside tests partially pass, no saturation)
            params[:, 0] = rng.uniform(-width, width, p_work)
            params[:, 1] = rng.uniform(-height, height, p_work)
            if mode == "2d":
                params[:, 2] = rng.uniform(0.01, 0.1, p_work)  # mr
                params[:, 3:12] = rng.standard_normal((p_work, 9)) * 10.0
            elif mode == "aabb":
                params[:, 2] = rng.uniform(0.001, 0.01, p_work)
                params[:, 4] = rng.uniform(0.001, 0.01, p_work)
                params[:, 5] = rng.uniform(5.0, 30.0, p_work)
            else:
                th = rng.uniform(0, np.pi, p_work)
                params[:, 2] = np.cos(th)
                params[:, 3] = np.sin(th)
                params[:, 4] = rng.uniform(5.0, 30.0, p_work)
                params[:, 5] = rng.uniform(5.0, 30.0, p_work)
            ro = rgb_row(mode)
            params[:, ro : ro + 3] = rng.uniform(0, 1, (p_work, 3))
            params[:, ro + 3] = rng.uniform(0.005, 0.02, p_work)  # low alpha
            pj = jnp.asarray(params)

            @jax.jit
            def fwd_k(pj, start, count, s=s):
                return pallas_forward_raw(pj, start, count, s, width, height)

            out_raw = jax.block_until_ready(fwd_k(pj, start, count))
            timeit(f"fwd kernel [{label}] {p_work // 1000}k pairs", fwd_k,
                   pj, start, count)

            g_out = jnp.ones_like(out_raw)

            @jax.jit
            def bwd_k(pj, start, count, out_raw, g_out, s=s):
                g = g_out.reshape(num_tiles, 8, 256)
                o = out_raw.reshape(num_tiles, 8, 256)
                gbar = jnp.concatenate(
                    [g[:, :4, :], o[:, :3, :], o[:, 3:4, :]], axis=1)
                return tile_bwd.pallas_composite_backward(
                    pj, start, count, gbar, s, width, height,
                    transposed=True)

            jax.block_until_ready(bwd_k(pj, start, count, out_raw, g_out))
            timeit(f"bwd kernel [{label}]", bwd_k, pj, start, count,
                   out_raw, g_out)

    if only == "fwd":
        # In-jit cumulative ablation of the PRODUCTION serving forward for
        # any mode (PROF_MODE=obb|aabb|2d): proj+pack / +bin / +gather /
        # full kernel.  Uses the bench's fine-quantum budget discipline.
        from bevy_gaussian_splatting_tpu.models.settings import GaussianMode
        from bevy_gaussian_splatting_tpu.ops.pallas.core import gather_rows
        from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
            pallas_composite_tiles,
        )

        pmode = os.environ.get("PROF_MODE", "obb")
        s = CloudSettings()
        if pmode == "2d":
            s = CloudSettings(gaussian_mode=GaussianMode.GAUSSIAN_2D)
        elif pmode == "aabb":
            s = CloudSettings(aabb=True)
        elif pmode == "4d":
            s = CloudSettings(gaussian_mode=GaussianMode.GAUSSIAN_4D)
            cloud = bgs.random_gaussians_4d_seeded(n, seed=3)
        pcount = int(jax.jit(lambda c: rt.pair_count(
            c, camera, s, width=width, height=height,
            time=jnp.float32(0.5)))(cloud))
        budget = rt.pairs_budget(n, pcount, headroom=1.10, quantum=4096)
        log(f"mode={pmode} pair count {pcount} -> budget {budget}")

        def fwd_upto(which):
            def fn(cloud, t):
                clip_from_world = (
                    camera.clip_from_view @ camera.view_from_world
                )
                back_key = sort_ops.radix_depth_key(
                    cloud.position, mt, clip_from_world,
                    camera.world_position, s.radix_sort_depth_bits.bits,
                )
                from bevy_gaussian_splatting_tpu.ops.transforms import (
                    apply_transform,
                )

                wp = apply_transform(mt, cloud.position)
                fi, li = rt.back_sorted_entry_indices(back_key)
                max_d = jnp.linalg.norm(wp[fi] - camera.world_position)
                min_d = jnp.linalg.norm(wp[li] - camera.world_position)
                splats = project_gaussians(
                    cloud, camera, s, mt, depth_minmax=(min_d, max_d),
                    time=t,
                )
                splats["sort_key"] = back_key
                splats["mask"] = splats["mask"] & (
                    back_key != sort_ops.SENTINEL_KEY
                )
                params = rt.pack_raster_params(splats, s, width, height)
                if which == "proj":
                    return params
                interp = jax.default_backend() != "tpu"
                bins = rt.bin_gaussians(
                    splats, s, width, height, budget, expand="pallas",
                    interpret=interp,
                )
                g_s, tile_s = bins[0], bins[1]
                start, end = rt.tile_ranges(
                    tile_s, (width // rt.TILE) * (height // rt.TILE)
                )
                if which == "bin":
                    return params, g_s, start, end
                params_sorted = gather_rows(params, g_s, params.shape[1])
                if which == "gather":
                    return params_sorted
                count = jnp.minimum(end - start, rt.tile_budget(n))
                return pallas_composite_tiles(
                    params_sorted, start, count, s, width, height,
                    background=bg, interpret=interp,
                )

            return jax.jit(fn)

        t_base = 0.5 if pmode == "4d" else 0.0
        for which in ("proj", "bin", "gather", "full"):
            fn = fwd_upto(which)
            out = jax.block_until_ready(fn(cloud, jnp.float32(t_base)))
            timeit(f"fwd[{pmode}] upto {which:<6}", fn, cloud,
                   jnp.float32(t_base + 1e-7))

    if only == "train4":
        # In-jit ablation of the PRODUCTION windowed training backward
        # (core.get_train_core_windowed) at the bench's fine-quantum budget:
        # cumulative variants isolate bwd kernel / grad-reorder sort /
        # windowed reduce / rank gather as in-graph deltas.
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
            bin_gaussians as _bin,
            make_tiled_pipeline,
            pack_raster_params as _pack,
            pair_count as _pc,
            pairs_budget as _pb,
            tile_budget as _tb,
            tile_ranges as _tr,
        )
        from bevy_gaussian_splatting_tpu.ops.pallas import tile_bwd, tile_fwd
        from bevy_gaussian_splatting_tpu.ops.pallas.core import (
            _gather_rows,
        )
        from bevy_gaussian_splatting_tpu.ops.pallas.reduce import (
            pallas_segment_reduce,
        )
        from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
            composite_epilogue,
            pallas_forward_raw,
        )

        total = int(jax.jit(
            lambda c: _pc(c, camera, settings, width=width, height=height))(cloud))
        budget = _pb(n, total, headroom=1.10, quantum=4096)
        num_tiles = (width // rt.TILE) * (height // rt.TILE)
        k_max = _tb(n)
        log(f"fine budget {budget} (pairs {total})")

        fwd_pipe = make_tiled_pipeline(
            settings, width, height, differentiable=False,
            compositor="pallas", pairs_max=budget,
        )
        target = fwd_pipe(cloud, camera, jnp.eye(4), bg, jnp.float32(0.0))
        interp = jax.default_backend() != "tpu"

        # binning cost with vs without the training inverse artifacts
        @jax.jit
        def bin_fwdonly(splats):
            return _bin(splats, settings, width, height, budget,
                        expand="pallas", interpret=interp)

        @jax.jit
        def bin_train(splats):
            return _bin(splats, settings, width, height, budget,
                        with_inverse=True, expand="pallas", interpret=interp)

        jax.block_until_ready(bin_fwdonly(splats))
        timeit("bin fwd-only (pallas expand)", bin_fwdonly, splats)
        jax.block_until_ready(bin_train(splats))
        timeit("bin with_inverse (+rank sort, +gidx op)", bin_train, splats)

        def make_step(variant: str):
            stages = {
                "none": (),
                "kernel": ("kernel",),
                "kernel+sort": ("kernel", "sort"),
                "kernel+sort+reduce": ("kernel", "sort", "reduce"),
                "full": ("kernel", "sort", "reduce", "rankg"),
            }[variant]
            mode = tile_fwd.kernel_mode(settings)
            zero_rows = {"aabb": (5,), "2d": (2,)}.get(mode, ())

            @jax.custom_vjp
            def core(params, g_s, valid_s, start, count, gidx_s, table, g0s,
                     rank, y0):
                params_sorted = _gather_rows(params, g_s, params.shape[1])
                return pallas_forward_raw(
                    params_sorted, start, count, settings, width, height,
                    interpret=interp)

            def core_fwd(params, g_s, valid_s, start, count, gidx_s, table,
                         g0s, rank, y0):
                params_sorted = _gather_rows(params, g_s, params.shape[1])
                out_raw = pallas_forward_raw(
                    params_sorted, start, count, settings, width, height,
                    interpret=interp)
                return out_raw, (params_sorted, start, count, out_raw,
                                 valid_s, gidx_s, table, g0s, rank)

            def core_bwd(res, g_out):
                (params_sorted, start, count, out_raw, valid_s, gidx_s,
                 table, g0s, rank) = res
                c_par = params_sorted.shape[1]
                g = g_out.reshape(num_tiles, 8, 256)
                o = out_raw.reshape(num_tiles, 8, 256)
                gbar = jnp.concatenate(
                    [g[:, :4, :], o[:, :3, :], o[:, 3:4, :]], axis=1)
                if "kernel" in stages:
                    dsorted_t = tile_bwd.pallas_composite_backward(
                        params_sorted, start, count, gbar, settings, width,
                        height, interpret=interp, transposed=True)
                else:
                    dsorted_t = params_sorted.T * (1e-9 * gbar[0, 0, 0])
                if "sort" in stages:
                    sort_key = jnp.where(valid_s, gidx_s, jnp.int32(n))
                    live = [i for i in range(c_par) if i not in zero_rows]
                    sorted_ops = jax.lax.sort(
                        (sort_key,) + tuple(dsorted_t[i] for i in live),
                        num_keys=1, is_stable=True)
                    it = iter(sorted_ops[1:])
                    rows = [jnp.zeros_like(sort_key, dtype=jnp.float32)
                            if i in zero_rows else next(it)
                            for i in range(c_par)]
                else:
                    rows = [dsorted_t[i] for i in range(c_par)]
                if c_par % 8:
                    rows += [rows[0] * 0.0] * (8 - c_par % 8)
                dslot_t = jnp.stack(rows, axis=0)
                if "reduce" in stages:
                    drank = pallas_segment_reduce(dslot_t, table, g0s, n,
                                                  interpret=interp)
                else:
                    drank = dslot_t[:, :n]
                if "rankg" in stages:
                    dparams = _gather_rows(drank[:c_par].T, rank, c_par)
                else:
                    dparams = drank[:c_par].T * 1.0
                f0 = jax.dtypes.float0

                def nil(a):
                    return np.zeros(a.shape, dtype=f0)

                return (dparams, nil(gidx_s), nil(gidx_s), nil(start),
                        nil(count), nil(gidx_s), jnp.zeros_like(table),
                        nil(g0s), nil(rank), np.zeros((1,), dtype=f0))

            core.defvjp(core_fwd, core_bwd)

            @jax.jit
            def fwd_bwd(c, t):
                def loss(c):
                    clip_from_world = (
                        camera.clip_from_view @ camera.view_from_world)
                    back_key = sort_ops.radix_depth_key(
                        c.position, jnp.eye(4), clip_from_world,
                        camera.world_position,
                        settings.radix_sort_depth_bits.bits)
                    sp = project_gaussians(c, camera, settings, jnp.eye(4),
                                           time=t)
                    sp["sort_key"] = back_key
                    sp["mask"] = sp["mask"] & (
                        back_key != sort_ops.SENTINEL_KEY)
                    bins = _bin(sp, settings, width, height, budget,
                                with_inverse=True, expand="pallas",
                                interpret=interp)
                    g_s, tile_s, valid_s = bins[0], bins[1], bins[2]
                    params = _pack(sp, settings, width, height)
                    start, end = _tr(tile_s, num_tiles)
                    count = jnp.minimum(end - start, k_max)
                    out_raw = core(params, g_s, valid_s, start, count,
                                   bins[4], bins[5], bins[6], bins[7],
                                   jnp.zeros((1,), jnp.int32))
                    img = composite_epilogue(out_raw, bg, width, height)
                    return jnp.mean((img - target) ** 2)

                return jax.value_and_grad(loss)(c)

            return fwd_bwd

        for variant in ("none", "kernel", "kernel+sort",
                        "kernel+sort+reduce", "full"):
            fn = make_step(variant)
            timeit(f"fwd+bwd windowed [{variant}]", fn, cloud,
                   jnp.float32(1e-7))

    if only in ("", "train2"):
        log("--- training backward decomposition (adaptive budget) ---")
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
            bin_gaussians as _bin,
            pack_raster_params as _pack,
            pair_count as _pc,
            pairs_budget as _pb,
            segment_sum_contiguous,
            tile_budget as _tb,
            tile_ranges as _tr,
        )
        from bevy_gaussian_splatting_tpu.ops.pallas.tile_bwd import (
            pallas_composite_backward,
        )
        from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
            pallas_forward_raw,
        )

        total = int(jax.jit(
            lambda c: _pc(c, camera, settings, width=width, height=height))(cloud))
        budget = _pb(n, total)
        num_tiles = (width // rt.TILE) * (height // rt.TILE)
        k_max = _tb(n)

        @jax.jit
        def train_prestage(splats):
            bins = _bin(splats, settings, width, height, budget, with_inverse=True)
            g_s, tile_s, valid_s = bins[0], bins[1], bins[2]
            params = _pack(splats, settings, width, height)
            start, end = _tr(tile_s, num_tiles)
            count = jnp.minimum(end - start, k_max)
            params_sorted = params[g_s]
            return params_sorted, start, count, bins[4], bins[5], bins[6], bins[7]

        ps, start, count, inv_pair, gidx, offc, cntc = jax.block_until_ready(
            train_prestage(splats)
        )
        timeit("train prestage (bin+inv+gather)", train_prestage, splats)

        @jax.jit
        def fwd_raw(ps, start, count):
            return pallas_forward_raw(ps, start, count, settings, width, height)

        out_raw = jax.block_until_ready(fwd_raw(ps, start, count))

        g_out = jnp.ones_like(out_raw)

        @jax.jit
        def bwd_kernel(ps, start, count, out_raw, g_out):
            g = g_out.reshape(num_tiles, 8, 256)
            o = out_raw.reshape(num_tiles, 8, 256)
            gbar = jnp.concatenate([g[:, :4, :], o[:, :3, :], o[:, 3:4, :]], axis=1)
            return pallas_composite_backward(
                ps, start, count, gbar, settings, width, height,
                full_width=True,
            )

        dsorted = jax.block_until_ready(bwd_kernel(ps, start, count, out_raw, g_out))
        timeit("bwd kernel alone (full width)", bwd_kernel, ps, start, count,
               out_raw, g_out)

        @jax.jit
        def reduction(dsorted, inv_pair, gidx, offc, cntc):
            dslot = dsorted[inv_pair]
            return segment_sum_contiguous(dslot, gidx, offc, cntc,
                                          max_segment=num_tiles)[:, :10]

        timeit("pair->gaussian reduction", reduction, dsorted, inv_pair, gidx,
               offc, cntc)

        @jax.jit
        def red_gather(dsorted, inv_pair):
            return dsorted[inv_pair]

        dslot = jax.block_until_ready(red_gather(dsorted, inv_pair))
        timeit("  dslot gather alone", red_gather, dsorted, inv_pair)

        @jax.jit
        def red_scan(dslot, gidx):
            p, c = dslot.shape
            vT = dslot.T
            fT = jnp.concatenate(
                [jnp.ones((1,), bool), gidx[1:] != gidx[:-1]]
            )[None, :]
            shift = 1
            while shift < num_tiles:
                vsh = jnp.pad(vT, ((0, 0), (shift, 0)))[:, :p]
                fsh = jnp.pad(fT, ((0, 0), (shift, 0)), constant_values=True)[:, :p]
                vT = vT + jnp.where(fT, 0.0, vsh)
                fT = fT | fsh
                shift *= 2
            return vT

        vT = jax.block_until_ready(red_scan(dslot, gidx))
        timeit("  segmented scan alone", red_scan, dslot, gidx)

        @jax.jit
        def red_ends(vT, offc, cntc):
            p = vT.shape[1]
            ends = jnp.clip(offc + cntc - 1, 0, p - 1)
            out = vT.T[ends]
            return jnp.where((cntc > 0)[:, None], out, 0.0)

        jax.block_until_ready(red_ends(vT, offc, cntc))
        timeit("  ends gather alone", red_ends, vT, offc, cntc)

    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
