"""In-jit ablation of the training backward's dsorted[inv_pair] gather.

The standalone gather probe (see BASELINE.md) shows a sharp table-size cliff:
<= 64 MiB tables gather rows at ~7 ns/row, larger ones at ~24 ns/row,
independent of row width.  The windowed training core currently gathers
[P, 16] f32 (128 MiB at the 2M-pair budget — above the cliff).  This tool
times the FULL params-leaf fwd+bwd step (forward kernel + backward kernel +
gather + windowed reduce + rank gather) per gather layout, inside one jit —
stage timings across jit boundaries mislead (NOTES_r1.md).

Variants:
  base   [P, 16] f32 single gather (current production)
  v10    [P, 10] f32 single gather (live columns only; 80 MiB — above cliff)
  v8x2   [P, 8] + [P, 2] f32 double gather (64 + 16 MiB — both below cliff)
  nogath backward without the reorder (wrong grads; lower bound)

Run on TPU:  python tools/profile_bwd_gather.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.models.settings import CloudSettings
from bevy_gaussian_splatting_tpu.ops import rasterize_tile as rt
from bevy_gaussian_splatting_tpu.ops import sort as sort_ops
from bevy_gaussian_splatting_tpu.ops.pallas import tile_bwd, tile_fwd
from bevy_gaussian_splatting_tpu.ops.pallas.reduce import pallas_segment_reduce
from bevy_gaussian_splatting_tpu.ops.project import project_gaussians


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(name, fn, *args, iters=8, windows=3):
    out = fn(*args)
    _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
    best = float("inf")
    for _w in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
        t1 = time.perf_counter()
        best = min(best, (t1 - t0) / iters)
    log(f"{name:<44} {best * 1e3:9.2f} ms")
    return best


def main():
    n = int(os.environ.get("PROF_N", 1_000_000))
    width = height = int(os.environ.get("PROF_SIZE", 512))
    settings = CloudSettings()
    log(f"devices={jax.devices()}  N={n} {width}x{height}")

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
    total_pairs = int(
        jax.jit(
            lambda c: rt.pair_count(c, camera, settings, width=width, height=height)
        )(cloud)
    )
    budget = rt.pairs_budget(n, total_pairs, headroom=1.10, quantum=4096)
    k_max = rt.tile_budget(n)
    num_tiles = (width // rt.TILE) * (height // rt.TILE)
    log(f"pairs {total_pairs} -> budget {budget} "
        f"(16-col table {budget * 64 / 2**20:.0f} MiB)")

    @jax.jit
    def prep(c, t):
        clip_from_world = camera.clip_from_view @ camera.view_from_world
        back_key = sort_ops.radix_depth_key(
            c.position, jnp.eye(4), clip_from_world, camera.world_position,
            settings.radix_sort_depth_bits.bits,
        )
        splats = project_gaussians(c, camera, settings, jnp.eye(4), time=t)
        splats["sort_key"] = back_key
        splats["mask"] = splats["mask"] & (back_key != sort_ops.SENTINEL_KEY)
        bins = rt.bin_gaussians(
            splats, settings, width, height, budget,
            with_inverse=True, expand="pallas",
        )
        params = rt.pack_raster_params(splats, settings, width, height)
        g_s, tile_s = bins[0], bins[1]
        start, end = rt.tile_ranges(tile_s, num_tiles)
        count = jnp.minimum(end - start, k_max)
        return (params, g_s, start, count, bins[4], bins[5], bins[6], bins[7])

    params, g_s, start, count, inv_pair, table, g0s, rank = jax.block_until_ready(
        prep(cloud, jnp.float32(0.0))
    )
    bg = jnp.zeros((4,), jnp.float32)
    c_par = params.shape[1]

    def make_step(variant):
        @jax.custom_vjp
        def core(params, g_s, start, count, inv_pair, table, g0s, rank):
            return tile_fwd.pallas_forward_raw(
                params[g_s], start, count, settings, width, height
            )

        def core_fwd(params, g_s, start, count, inv_pair, table, g0s, rank):
            params_sorted = params[g_s]
            out_raw = tile_fwd.pallas_forward_raw(
                params_sorted, start, count, settings, width, height
            )
            return out_raw, (params_sorted, start, count, out_raw, inv_pair,
                             table, g0s, rank)

        def core_bwd(res, g_out):
            (params_sorted, start, count, out_raw, inv_pair, table, g0s,
             rank) = res
            nn = rank.shape[0]
            g = g_out.reshape(num_tiles, 8, tile_fwd.PIX)
            o = out_raw.reshape(num_tiles, 8, tile_fwd.PIX)
            gbar = jnp.concatenate([g[:, :4, :], o[:, :3, :], o[:, 3:4, :]],
                                   axis=1)
            dsorted = tile_bwd.pallas_composite_backward(
                params_sorted, start, count, gbar, settings, width, height,
                full_width=True,
            )
            def pad16(dt):
                # the lane-major reduce DMAs [cw, CHUNK] slices: cw must be
                # a sublane multiple (Mosaic tiling) -> pad rows to 16
                return jnp.pad(dt, ((0, 16 - dt.shape[0]), (0, 0)))

            if variant == "prod":
                # production path (ops/pallas/core.py): live-width kernel
                # view + cliff-model gather split + sublane pad
                from bevy_gaussian_splatting_tpu.ops.pallas.core import (
                    _gather_rows,
                )

                dslot_t = _gather_rows(dsorted, inv_pair, c_par).T
                if dslot_t.shape[0] % 8:
                    dslot_t = jnp.pad(
                        dslot_t, ((0, 8 - dslot_t.shape[0] % 8), (0, 0))
                    )
            elif variant == "base":
                dslot_t = dsorted[inv_pair].T
            elif variant == "v10":
                dslot_t = pad16(dsorted[:, :c_par][inv_pair].T)
            elif variant == "v8x2":
                a = dsorted[:, :8][inv_pair]
                b = dsorted[:, 8:c_par][inv_pair]
                dslot_t = pad16(jnp.concatenate([a, b], axis=1).T)
            elif variant == "nogath":
                dslot_t = dsorted[:, :c_par].T * (1.0 + 1e-9 * inv_pair[0])
                dslot_t = pad16(dslot_t)
            drank = pallas_segment_reduce(dslot_t, table, g0s, nn)
            dparams = drank.T[rank][:, :c_par]
            f0 = jax.dtypes.float0

            def nil(a):
                return np.zeros(a.shape, dtype=f0)

            return (dparams, nil(inv_pair), nil(start), nil(count),
                    nil(inv_pair), jnp.zeros_like(table), nil(g0s), nil(rank))

        core.defvjp(core_fwd, core_bwd)

        @jax.jit
        def fwd_bwd(params, g_s, start, count, inv_pair, table, g0s, rank):
            def loss(params):
                out_raw = core(params, g_s, start, count, inv_pair, table,
                               g0s, rank)
                img = tile_fwd.composite_epilogue(out_raw, bg, width, height)
                return jnp.mean(img ** 2)

            return jax.value_and_grad(loss)(params)

        return fwd_bwd

    results = {}
    grads = {}
    for variant in ("prod", "base", "v8x2", "nogath"):
        fn = make_step(variant)
        t = timeit(f"params-leaf fwd+bwd [{variant}]", fn, params, g_s, start,
                   count, inv_pair, table, g0s, rank)
        results[variant] = t
        l, g = fn(params, g_s, start, count, inv_pair, table, g0s, rank)
        grads[variant] = np.asarray(g[:, :c_par])

    for v in ("base", "v8x2"):
        err = np.abs(grads[v] - grads["prod"]).max()
        log(f"grad parity {v} vs prod: max|diff| = {err:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
