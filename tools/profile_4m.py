"""4M carry-train anomaly experiments (VERDICT r3 #2).

Times the production 1-step train (and fwd) at BENCH-style 4M scale under
delivery/experiment combinations, and prints the compiled programs' peak
memory (XLA memory_analysis) — testing the round-3 suspects: operand
liveness of the wide carry sorts (BGS_CARRY_SPLIT halves them) and
rematerialization pressure.

    PROF_CONFIGS=gather,carry,carry_split python tools/profile_4m.py
    PROF_N=4000000 PROF_TRAIN=1 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bevy_gaussian_splatting_tpu as bgs
    from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
        make_tiled_pipeline,
        pair_count,
        pairs_budget,
        render_tiled,
    )

    n = int(os.environ.get("PROF_N", 4_000_000))
    width = height = int(os.environ.get("PROF_SIZE", 512))
    do_train = os.environ.get("PROF_TRAIN", "1") == "1"
    configs = os.environ.get(
        "PROF_CONFIGS", "gather,carry,carry_split"
    ).split(",")
    settings = bgs.CloudSettings()

    cloud = bgs.random_gaussians_3d_seeded(n, seed=0)
    cloud = dataclasses.replace(
        cloud,
        position_visibility=cloud.position_visibility
        * jnp.array([1.0, 1.0, 0.25, 1.0]),
        scale_opacity=cloud.scale_opacity * jnp.array([0.05, 0.05, 0.05, 1.0]),
    )
    camera = bgs.Camera.create(
        eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0), width=width,
        height=height,
    )
    mt = jnp.eye(4, dtype=jnp.float32)
    bg = jnp.zeros((4,), jnp.float32)
    pcount = int(jax.jit(lambda c: pair_count(
        c, camera, settings, width=width, height=height))(cloud))
    budget = pairs_budget(n, pcount, headroom=1.10, quantum=4096)
    log(f"devices={jax.devices()} N={n} pairs {pcount} -> budget {budget}")

    def timeit(name, fn, *args, iters=3, windows=3, readback=None):
        out = fn(*args)
        _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
        best = float("inf")
        k = 0
        for _w in range(windows):
            t0 = time.perf_counter()
            for _i in range(iters):
                k += 1
                out = fn(*args[:-1] + (jnp.float32(k * 1e-7),))
            _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
            best = min(best, (time.perf_counter() - t0) / iters)
        log(f"{name:<40} {best * 1e3:9.2f} ms")
        return best

    def mem_report(name, jitted, *args):
        try:
            compiled = jitted.lower(*args).compile()
            ma = compiled.memory_analysis()
            log(f"{name:<40} peak {ma.temp_size_in_bytes / 1e9:.2f} GB temp, "
                f"{ma.argument_size_in_bytes / 1e9:.2f} GB args, "
                f"{ma.output_size_in_bytes / 1e9:.2f} GB out")
            if os.environ.get("PROF_HLO") == "1":
                # count sort ops + their operand rows in the optimized HLO:
                # duplicated multi-M sorts = the rematerialization smoking gun
                import re

                txt = compiled.as_text()
                sorts = re.findall(r"= \([^)]*\) sort\(|= [sfpu]\d[^=]*sort\(", txt)
                big = re.findall(r"sort\([^)]*f32\[(\d{6,})\]", txt)
                log(f"{name}: HLO sort ops = {len(sorts)}; "
                    f"multi-100k sort operand rows: "
                    f"{sorted(set(int(b) for b in big))[:8]}")
                counts = {}
                for m in re.finditer(
                    r"f32\[(\d{7,})\]\{0\} sort", txt
                ):
                    counts[m.group(1)] = counts.get(m.group(1), 0) + 1
                log(f"{name}: sort result shapes {counts}")
        except Exception as e:
            log(f"{name}: memory_analysis unavailable ({e})")

    for cfg in configs:
        os.environ["BGS_PARAMS_DELIVERY"] = (
            "carry" if cfg.startswith("carry") else "gather"
        )
        if cfg == "carry_split":
            os.environ["BGS_CARRY_SPLIT"] = "1"
        else:
            os.environ.pop("BGS_CARRY_SPLIT", None)

        fwd = make_tiled_pipeline(
            settings, width, height, differentiable=False,
            compositor="pallas", pairs_max=budget,
        )
        timeit(f"[{cfg}] fwd", fwd, cloud, camera, mt, bg, jnp.float32(0.0))

        if os.environ.get("PROF_TRAINFWD") == "1":
            # the TRAINING pipeline's forward half alone (differentiable
            # graph, custom_vjp fwd, with_inverse artifacts — but no grad):
            # splits the carry-train anomaly's blame between the fwd and
            # bwd halves of the combined program
            tf = make_tiled_pipeline(
                settings, width, height, differentiable=True,
                compositor="pallas", pairs_max=budget,
            )
            timeit(f"[{cfg}] train-fwd (no grad)", tf, cloud, camera, mt,
                   bg, jnp.float32(0.0))

        if not do_train:
            continue
        tgt = fwd(cloud, camera, mt, bg, jnp.float32(0.0))

        @jax.jit
        def fb(c, t):
            def loss(c):
                img = render_tiled(
                    c, camera, settings, mt, bg, t,
                    width=width, height=height, differentiable=True,
                    compositor="pallas", pairs_max=budget,
                )
                return jnp.mean((img - tgt) ** 2)

            return jax.value_and_grad(loss)(c)

        mem_report(f"[{cfg}] train memory", fb, cloud, jnp.float32(0.0))
        timeit(f"[{cfg}] train", fb, cloud, jnp.float32(0.0))

        if os.environ.get("PROF_STAGED") == "1":
            # two-stage training step: projection+pack in its own jit, the
            # pipeline-core loss/grad w.r.t. the packed PARAMS in a second,
            # and the proj/pack VJP in a third — tests whether the carry
            # anomaly / gather discount is a combined-program scheduling
            # artifact (each stage scheduled alone).
            from bevy_gaussian_splatting_tpu.models.settings import (
                RasterizeMode,
            )
            from bevy_gaussian_splatting_tpu.ops import (
                rasterize_tile as rt,
            )
            from bevy_gaussian_splatting_tpu.ops import sort as sort_ops
            from bevy_gaussian_splatting_tpu.ops.project import (
                project_gaussians,
            )

            def _proj(c, t):
                clip_from_world = (
                    camera.clip_from_view @ camera.view_from_world
                )
                back_key = sort_ops.radix_depth_key(
                    c.position, mt, clip_from_world, camera.world_position,
                    settings.radix_sort_depth_bits.bits,
                )
                splats = project_gaussians(c, camera, settings, mt, time=t)
                splats["sort_key"] = back_key
                splats["mask"] = splats["mask"] & (
                    back_key != sort_ops.SENTINEL_KEY
                )
                params = rt.pack_raster_params(
                    splats, settings, width, height
                )
                aux = {
                    k: splats[k]
                    for k in ("mask", "center_ndc", "sort_key", "obb_axis",
                              "obb_bounds")
                }
                return params, aux

            proj_jit = jax.jit(_proj)

            @jax.jit
            def core_loss_grad(params, aux, t):
                def loss_of(params):
                    splats = dict(aux)
                    from bevy_gaussian_splatting_tpu.ops.pallas.core import (
                        get_train_core_windowed,
                        live_grad_count,
                        preferred_unpermute,
                    )
                    from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
                        composite_epilogue,
                    )

                    n_ = params.shape[0]
                    unperm = preferred_unpermute(
                        n_, live_grad_count(settings)
                    )
                    deliver = (
                        "carry" if cfg.startswith("carry") else "gather"
                    )
                    bins = rt.bin_gaussians(
                        splats, settings, width, height, budget,
                        with_inverse=True, expand="pallas",
                        interpret=jax.default_backend() != "tpu",
                        inverse_map=unperm,
                        params=params if deliver == "carry" else None,
                        deliver=deliver,
                    )
                    g_s, tile_s, valid_s = bins[0], bins[1], bins[2]
                    start, end = rt.tile_ranges(
                        tile_s, (width // rt.TILE) * (height // rt.TILE)
                    )
                    k_max = rt.tile_budget(n_)
                    count = jnp.minimum(end - start, k_max)
                    gidx_s, table, g0s, inv_map = bins[4:8]
                    interp = jax.default_backend() != "tpu"
                    core = get_train_core_windowed(
                        settings, width, height, interp, k_max,
                        unpermute=unperm, delivery=deliver,
                    )
                    arg1 = (
                        jax.lax.stop_gradient(bins[8])
                        if deliver == "carry" else g_s
                    )
                    out_raw = core(
                        params, arg1, valid_s, start, count, gidx_s, table,
                        g0s, inv_map, jnp.zeros((1,), jnp.int32),
                    )
                    img = composite_epilogue(out_raw, bg, width, height)
                    return jnp.mean((img - tgt) ** 2)

                return jax.value_and_grad(loss_of)(params)

            @jax.jit
            def proj_vjp(c, t, dparams):
                _, vjp = jax.vjp(lambda c: _proj(c, t)[0], c)
                return vjp(dparams)[0]

            def staged(c, t):
                params, aux = proj_jit(c, t)
                l, dparams = core_loss_grad(params, aux, t)
                return l, proj_vjp(c, t, dparams)

            l, g = staged(cloud, jnp.float32(0.0))
            _ = float(l)
            best = float("inf")
            k = 0
            for _w in range(3):
                t0 = time.perf_counter()
                for _i in range(3):
                    k += 1
                    l, g = staged(cloud, jnp.float32(k * 1e-7))
                _ = float(l)
                _ = np.asarray(
                    jnp.ravel(jax.tree_util.tree_leaves(g)[0])[:1]
                )
                t1 = time.perf_counter()
                best = min(best, (t1 - t0) / 3)
            log(f"[{cfg}] train STAGED (3 jits)          "
                f"{best * 1e3:9.2f} ms")
    os.environ.pop("BGS_PARAMS_DELIVERY", None)
    os.environ.pop("BGS_CARRY_SPLIT", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
