"""Benchmark harness — prints ONE JSON line for the driver.

North-star metric (BASELINE.json): rays/s (pixels/s) per chip, forward +
backward, at 1M gaussians, 512x512 f32, with gradients flowing to every
gaussian parameter.  Secondary diagnostics go to stderr.

Timing accounts for the remote-execution queue: iterations are enqueued
back-to-back (in-order device execution) and the clock stops only after a
readback of the final result.
"""

from __future__ import annotations

import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def prior_round_parsed() -> dict:
    """Parsed metrics from the newest BENCH_r{N}.json the driver recorded,
    so every round's JSON line self-reports vs the previous round —
    including PER-CONFIG ratios (2DGS, 4M) so a secondary config moving
    backwards is mechanically visible on the driver line."""
    import glob
    import os
    import re

    best_round, best = -1, {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
            val = float(parsed["value"])
        except Exception:
            continue
        if int(m.group(1)) > best_round and val > 0:
            best_round, best = int(m.group(1)), parsed
    return best


def prior_round_value() -> float | None:
    prior = prior_round_parsed()
    return float(prior["value"]) if prior.get("value") else None


def bench_forward(pipe, args_fn, iters: int, windows: int = 3) -> float:
    """Min over several timing windows — the remote-relay execution path has
    high run-to-run variance; min is the robust per-frame estimate."""
    import numpy as np

    out = pipe(*args_fn(0))
    _ = np.asarray(out[0, 0])  # compile + settle
    best = float("inf")
    k = 0
    for _w in range(windows):
        t0 = time.perf_counter()
        for _i in range(iters):
            k += 1
            out = pipe(*args_fn(k))
        _ = np.asarray(out[0, 0])
        t1 = time.perf_counter()
        best = min(best, (t1 - t0) / iters)
    return best


def main() -> int:
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

    import os

    n = int(os.environ.get("BENCH_N", 1_000_000))
    width = height = int(os.environ.get("BENCH_SIZE", 512))
    iters = int(os.environ.get("BENCH_ITERS", 4))
    settings = bgs.CloudSettings()

    log(f"devices: {jax.devices()}")
    log(f"scene: N={n} {width}x{height} f32 (go_trimmed-scale stand-in)")

    cloud = bgs.random_gaussians_3d_seeded(n, seed=0)
    # concentrate the cloud for realistic surface-like depth complexity
    import dataclasses

    cloud = dataclasses.replace(
        cloud,
        position_visibility=cloud.position_visibility * jnp.array([1.0, 1.0, 0.25, 1.0]),
        scale_opacity=cloud.scale_opacity * jnp.array([0.05, 0.05, 0.05, 1.0]),
    )
    camera = bgs.Camera.create(
        eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0), width=width, height=height
    )
    mt = jnp.eye(4, dtype=jnp.float32)
    bg = jnp.zeros((4,), jnp.float32)

    # ---- adaptive pair budget (what render/api.py does per scene) -----------
    total_pairs = int(
        jax.jit(lambda c: pair_count(c, camera, settings, width=width, height=height))(
            cloud
        )
    )
    # fine-quantum budget: the benchmark scene's pair count is measured for
    # the exact frames rendered (camera static; 3DGS geometry is
    # time-invariant), so size like a training system does — max-over-dataset
    # with 10% headroom — instead of the interactive coarse buckets
    budget = pairs_budget(n, total_pairs, headroom=1.10, quantum=4096)
    log(f"pair count {total_pairs} -> budget {budget} "
        f"(coarse bucket {pairs_budget(n, total_pairs)}, static cap {pairs_budget(n)})")

    # ---- forward-only (serving path, Pallas kernel) -------------------------
    fwd_pipe = make_tiled_pipeline(
        settings, width, height, differentiable=False, compositor="pallas",
        pairs_max=budget,
    )

    # on-device parity check: the Pallas kernel must match the XLA compositor
    # on real hardware (interpret-mode tests cannot catch DMA-ordering bugs)
    if os.environ.get("BENCH_VALIDATE", "1") == "1":
        n_val = 50_000
        val_cloud = jax.tree_util.tree_map(lambda a: a[:n_val], cloud)
        vp = make_tiled_pipeline(
            settings, width, height, differentiable=False, compositor="pallas"
        )
        vx = make_tiled_pipeline(
            settings, width, height, differentiable=False, compositor="xla"
        )
        a = np.asarray(vp(val_cloud, camera, mt, bg, jnp.float32(0.0)))
        b = np.asarray(vx(val_cloud, camera, mt, bg, jnp.float32(0.0)))
        err = float(np.abs(a - b).max())
        log(f"on-device pallas-vs-xla parity (50k): max|diff| = {err:.2e}")
        if err > 1e-4:
            log("WARNING: on-device kernel parity FAILED")
    t_fwd = bench_forward(
        fwd_pipe, lambda i: (cloud, camera, mt, bg, jnp.float32(i * 1e-7)), iters
    )
    fwd_rays = width * height / t_fwd
    log(f"forward: {t_fwd * 1e3:.2f} ms/frame = {fwd_rays / 1e6:.2f} Mrays/s")

    # ---- forward + backward (training path) ---------------------------------
    target = fwd_pipe(cloud, camera, mt, bg, jnp.float32(0.0))

    @jax.jit
    def fwd_bwd(c, t):
        def loss(c):
            img = render_tiled(
                c, camera, settings, mt, bg, t,
                width=width, height=height, differentiable=True,
                compositor="pallas", pairs_max=budget,
            )
            return jnp.mean((img - target) ** 2)

        l, g = jax.value_and_grad(loss)(c)
        return l, g

    try:
        l, g = fwd_bwd(cloud, jnp.float32(0.0))
        _ = float(l)
        t_fb = float("inf")
        k = 0
        for _w in range(3):
            t0 = time.perf_counter()
            for _i in range(iters):
                k += 1
                l, g = fwd_bwd(cloud, jnp.float32(k * 1e-7))
            _ = float(l)
            _ = np.asarray(g.position_visibility[0, 0])
            t1 = time.perf_counter()
            t_fb = min(t_fb, (t1 - t0) / iters)
        fb_rays = width * height / t_fb
        log(f"fwd+bwd: {t_fb * 1e3:.2f} ms/step = {fb_rays / 1e6:.2f} Mrays/s")
        grads_finite = bool(
            np.isfinite(np.asarray(g.position_visibility)).all()
        )
        log(f"grads finite: {grads_finite}")
    except Exception as e:  # OOM or compile failure: report fwd-only
        log(f"fwd+bwd failed ({type(e).__name__}: {e}); reporting forward-only")
        fb_rays = 0.0

    # ---- BASELINE.md secondary configs on the JSON line ----------------------
    # config 3 (2DGS surfel at the headline scene) and config 2 at 4M scale;
    # each wrapped so a relay compile failure cannot lose the main metric
    extra_configs: dict = {}
    t_start_secondary = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_SECONDARY_BUDGET_S", 3600))
    if os.environ.get("BENCH_SECONDARY", "1") == "1":
        from bevy_gaussian_splatting_tpu.models.settings import GaussianMode

        def measure_train(pipe_settings, c, pmax, label, iters_=5,
                          windows_=3):
            # >= 5 iters x 3 windows: the 2x2 sampling of earlier rounds
            # could not statistically resolve the 5%-class movements being
            # claimed (relay session variance is several ms at train size)
            fp = make_tiled_pipeline(
                pipe_settings, width, height, differentiable=False,
                compositor="pallas", pairs_max=pmax,
            )
            tf = bench_forward(
                fp, lambda i: (c, camera, mt, bg, jnp.float32(i * 1e-7)),
                iters_, windows=windows_,
            )
            tgt = fp(c, camera, mt, bg, jnp.float32(0.0))

            @jax.jit
            def fb(cc, t):
                def loss(cc):
                    img = render_tiled(
                        cc, camera, pipe_settings, mt, bg, t,
                        width=width, height=height, differentiable=True,
                        compositor="pallas", pairs_max=pmax,
                    )
                    return jnp.mean((img - tgt) ** 2)

                return jax.value_and_grad(loss)(cc)

            l, gg = fb(c, jnp.float32(0.0))
            _ = float(l)
            tb = float("inf")
            k = 0
            for _w in range(windows_):
                t0 = time.perf_counter()
                for _i in range(iters_):
                    k += 1
                    l, gg = fb(c, jnp.float32(k * 1e-7))
                _ = float(l)
                t1 = time.perf_counter()
                tb = min(tb, (t1 - t0) / iters_)
            log(f"{label}: fwd {tf * 1e3:.1f} ms, train {tb * 1e3:.1f} ms")
            return tf * 1e3, tb * 1e3

        try:  # interactive orbit replay at bench scale (the serving loop:
            # bins cached on the sort throttle, frames re-project in pair
            # order — reference viewer semantics, viewer.rs:763-794)
            from bevy_gaussian_splatting_tpu.render.api import (
                InteractiveRenderer,
            )

            r = InteractiveRenderer(period_floor_ms=1e9)
            img = r.render_orbit(cloud, 0.0, 0.2, 60.0, width=width,
                                 height=height)
            _ = np.asarray(jnp.ravel(img)[:1])
            img = r.render_orbit(cloud, 1e-5, 0.2, 60.0, width=width,
                                 height=height)
            _ = np.asarray(jnp.ravel(img)[:1])
            # 24-frame windows: the documented replay protocol
            # (tools/profile_replay.py, NOTES_r4) — longer windows average
            # out per-frame dispatch jitter that 16-frame windows read ~1.5
            # ms high on.
            frames = 24
            t_rp = float("inf")
            for w in range(3):
                t0 = time.perf_counter()
                for i in range(frames):
                    az = 2.0 * np.pi * (i + 1) / frames + w * 1e-3
                    img = r.render_orbit(cloud, az, 0.2, 60.0, width=width,
                                         height=height)
                _ = np.asarray(jnp.ravel(img)[:1])
                t_rp = min(t_rp, (time.perf_counter() - t0) / frames)
            log(f"orbit replay: {t_rp * 1e3:.2f} ms/frame "
                f"({1.0 / t_rp:.1f} FPS), stats={r.stats}")
            extra_configs["replay_ms"] = t_rp * 1e3
        except Exception as e:
            log(f"replay config failed: {type(e).__name__}: {e}")
        try:  # replay guard for the OTHER modes (VERDICT r4 #9): 2DGS
            # pair-order replay must stay on the replay path (bins == 1
            # across the orbit), and the 4DGS per-frame re-bin path — the
            # expensive serving case by design — gets a standing number.
            from bevy_gaussian_splatting_tpu.render.api import (
                InteractiveRenderer,
            )

            s2d_r = settings.replace(gaussian_mode=GaussianMode.GAUSSIAN_2D)
            r2 = InteractiveRenderer(settings=s2d_r, period_floor_ms=1e9)
            img = r2.render_orbit(cloud, 0.0, 0.2, 60.0, width=width,
                                  height=height)
            _ = np.asarray(jnp.ravel(img)[:1])
            img = r2.render_orbit(cloud, 1e-5, 0.2, 60.0, width=width,
                                  height=height)
            _ = np.asarray(jnp.ravel(img)[:1])
            frames = 24
            t_rp2 = float("inf")
            for w in range(2):
                t0 = time.perf_counter()
                for i in range(frames):
                    az = 2.0 * np.pi * (i + 1) / frames + w * 1e-3
                    img = r2.render_orbit(cloud, az, 0.2, 60.0, width=width,
                                          height=height)
                _ = np.asarray(jnp.ravel(img)[:1])
                t_rp2 = min(t_rp2, (time.perf_counter() - t0) / frames)
            if r2.stats["bins"] != 1:
                log(f"WARNING: 2DGS orbit left the replay path "
                    f"(stats={r2.stats}, expected bins=1)")
            log(f"2DGS orbit replay: {t_rp2 * 1e3:.2f} ms/frame, "
                f"stats={r2.stats}")
            extra_configs["gs2d_replay_ms"] = t_rp2 * 1e3
        except Exception as e:
            log(f"2DGS replay config failed: {type(e).__name__}: {e}")
        try:  # 2DGS surfel, same 1M scene (BASELINE.md config 3)
            s2d = settings.replace(gaussian_mode=GaussianMode.GAUSSIAN_2D)
            p2 = int(jax.jit(lambda c: pair_count(
                c, camera, s2d, width=width, height=height))(cloud))
            b2 = pairs_budget(n, p2, headroom=1.10, quantum=4096)
            f2, t2 = measure_train(s2d, cloud, b2, "2DGS 1M")
            extra_configs["gs2d_fwd_ms"] = f2
            extra_configs["gs2d_train_ms"] = t2
        except Exception as e:
            log(f"2DGS secondary config failed: {type(e).__name__}: {e}")
        try:  # standing training-quality metric (VERDICT r4 #3): fixed-seed
            # multiview convergence PSNR through the PRODUCTION Pallas
            # custom-VJP backward — three rounds of backward perf golf were
            # guarded only by pointwise allclose; this pins the dynamics
            from bevy_gaussian_splatting_tpu.train.quality import (
                convergence_psnr,
            )

            psnr_steps = int(os.environ.get("BENCH_PSNR_STEPS", 120))
            q = convergence_psnr(
                steps=psnr_steps, n=512, size=128, compositor="pallas",
            )
            log(f"convergence PSNR ({psnr_steps} steps, 512 gaussians, "
                f"128px, pallas bwd): {q['psnr_db']:.2f} dB")
            extra_configs["train_psnr_db"] = round(q["psnr_db"], 3)
        except Exception as e:
            log(f"PSNR config failed: {type(e).__name__}: {e}")
        if time.perf_counter() - t_start_secondary < budget_s:
            try:  # 4DGS temporal at the 1M scale with PER-FRAME time change
                # (BASELINE.md config 4: the per-frame re-conditioning +
                # depth re-sort path — time is traced, so each frame re-runs
                # the full temporal binning)
                c4d = bgs.random_gaussians_4d_seeded(n, seed=3)
                s4d = settings.replace(
                    gaussian_mode=GaussianMode.GAUSSIAN_4D
                )
                counter4d = jax.jit(lambda c, t: pair_count(
                    c, camera, s4d, width=width, height=height, time=t))
                # budget must cover the WORST frame of the swept window
                # (0.25..0.75), not one sample time
                p4d = max(
                    int(counter4d(c4d, jnp.float32(t)))
                    for t in (0.25, 0.5, 0.75)
                )
                b4d = pairs_budget(n, p4d, headroom=1.25, quantum=4096)
                pipe4d = make_tiled_pipeline(
                    s4d, width, height, differentiable=False,
                    compositor="pallas", pairs_max=b4d,
                )
                t4d = bench_forward(
                    pipe4d,
                    lambda i: (c4d, camera, mt, bg,
                               jnp.float32(0.25 + (i % 50) * 0.01)),
                    iters,
                )
                log(f"4DGS 1M fwd (per-frame time): {t4d * 1e3:.2f} ms")
                extra_configs["gs4d_fwd_ms"] = t4d * 1e3
                # serving-path temporal guard (VERDICT r4 #9): every frame
                # of a temporal scene re-sorts/re-bins; the
                # InteractiveRenderer routes such frames through the FUSED
                # one-shot pipeline (stats counts them as oneshots) — the
                # expensive serving case by design, standing number
                r4 = InteractiveRenderer(settings=s4d, period_floor_ms=1e9)
                for t_w in (0.25, 0.26):
                    img = r4.render_orbit(c4d, 0.0, 0.2, 60.0, width=width,
                                          height=height, time=t_w)
                    _ = np.asarray(jnp.ravel(img)[:1])
                frames4 = 12
                t_rb = float("inf")
                for w in range(2):
                    t0 = time.perf_counter()
                    for i in range(frames4):
                        img = r4.render_orbit(
                            c4d, 0.0, 0.2, 60.0, width=width, height=height,
                            time=0.25 + (w * frames4 + i + 2) * 0.01,
                        )
                    _ = np.asarray(jnp.ravel(img)[:1])
                    t_rb = min(t_rb, (time.perf_counter() - t0) / frames4)
                log(f"4DGS re-bin serving: {t_rb * 1e3:.2f} ms/frame, "
                    f"stats={r4.stats}")
                extra_configs["gs4d_rebin_ms"] = t_rb * 1e3
            except Exception as e:
                log(f"4DGS secondary config failed: {type(e).__name__}: {e}")
        if time.perf_counter() - t_start_secondary < budget_s:
            try:  # f16 gcloud-storage flavor at 1M (BASELINE.md config 2):
                # same scene stored f16; projection decodes to f32 in-graph
                c16 = cloud.astype(jnp.float16)
                pipe16 = make_tiled_pipeline(
                    settings, width, height, differentiable=False,
                    compositor="pallas", pairs_max=budget,
                )
                t16 = bench_forward(
                    pipe16,
                    lambda i: (c16, camera, mt, bg, jnp.float32(i * 1e-7)),
                    iters,
                )
                log(f"f16-storage 1M fwd: {t16 * 1e3:.2f} ms")
                extra_configs["f16_fwd_ms"] = t16 * 1e3
            except Exception as e:
                log(f"f16 secondary config failed: {type(e).__name__}: {e}")
        if time.perf_counter() - t_start_secondary < budget_s:
            try:  # reference-resolution config (VERDICT r4 #2): the
                # reference's EXACT headless default, 1920x1080
                # Rgba8UnormSrgb (reference examples/headless.rs:69) — the
                # tile grid pads to 68 rows internally and crops (non-16-
                # multiple height support).  8160 tiles vs 1024 — the pair
                # count, searchsorted_wide/tile_ranges tile-axis stages,
                # and the kernel grid all change regime vs 512x512.
                w_hd, h_hd = (
                    int(v) for v in
                    os.environ.get("BENCH_HD_SIZE", "1920x1080").split("x")
                )
                cam_hd = bgs.Camera.create(
                    eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0),
                    width=w_hd, height=h_hd,
                )
                p_hd = int(jax.jit(lambda c: pair_count(
                    c, cam_hd, settings, width=w_hd, height=h_hd))(cloud))
                b_hd = pairs_budget(n, p_hd, headroom=1.10, quantum=4096)
                log(f"1080p pair count {p_hd} -> budget {b_hd}")
                fp_hd = make_tiled_pipeline(
                    settings, w_hd, h_hd, differentiable=False,
                    compositor="pallas", pairs_max=b_hd,
                )
                t_hd = bench_forward(
                    fp_hd,
                    lambda i: (cloud, cam_hd, mt, bg, jnp.float32(i * 1e-7)),
                    iters,
                )
                log(f"1080p fwd: {t_hd * 1e3:.2f} ms/frame "
                    f"({w_hd * h_hd / t_hd / 1e6:.1f} Mrays/s)")
                extra_configs["fwd_1080p_ms"] = t_hd * 1e3
                tgt_hd = fp_hd(cloud, cam_hd, mt, bg, jnp.float32(0.0))

                @jax.jit
                def fb_hd(c, t):
                    def loss(c):
                        img = render_tiled(
                            c, cam_hd, settings, mt, bg, t,
                            width=w_hd, height=h_hd, differentiable=True,
                            compositor="pallas", pairs_max=b_hd,
                        )
                        return jnp.mean((img - tgt_hd) ** 2)

                    return jax.value_and_grad(loss)(c)

                l, gg = fb_hd(cloud, jnp.float32(0.0))
                _ = float(l)
                tb_hd = float("inf")
                k = 0
                for _w in range(3):
                    t0 = time.perf_counter()
                    for _i in range(4):
                        k += 1
                        l, gg = fb_hd(cloud, jnp.float32(k * 1e-7))
                    _ = float(l)
                    t1 = time.perf_counter()
                    tb_hd = min(tb_hd, (t1 - t0) / 4)
                log(f"1080p train: {tb_hd * 1e3:.2f} ms/step")
                extra_configs["train_1080p_ms"] = tb_hd * 1e3
            except Exception as e:
                log(f"1080p config failed: {type(e).__name__}: {e}")
        if time.perf_counter() - t_start_secondary < budget_s:
            try:  # 4M-scale scene (BASELINE.md config 2 at scale)
                n4 = 4 * n
                c4m = bgs.random_gaussians_3d_seeded(n4, seed=0)
                c4m = dataclasses.replace(
                    c4m,
                    position_visibility=c4m.position_visibility
                    * jnp.array([1.0, 1.0, 0.25, 1.0]),
                    scale_opacity=c4m.scale_opacity
                    * jnp.array([0.05, 0.05, 0.05, 1.0]),
                )
                p4 = int(jax.jit(lambda c: pair_count(
                    c, camera, settings, width=width, height=height))(c4m))
                b4 = pairs_budget(n4, p4, headroom=1.10, quantum=4096)
                log(f"4M pair count {p4} -> budget {b4}")
                f4, t4 = measure_train(settings, c4m, b4, "3DGS 4M")
                extra_configs["gs3d_4m_fwd_ms"] = f4
                extra_configs["gs3d_4m_train_ms"] = t4
            except Exception as e:
                log(f"4M secondary config failed: {type(e).__name__}: {e}")
        else:
            log("secondary time budget exhausted; skipping 4M config")

    # ---- optional secondary configs (BASELINE.md configs 3 & 4) -------------
    if os.environ.get("BENCH_FULL") == "1":
        from bevy_gaussian_splatting_tpu.models.settings import GaussianMode

        c2 = bgs.random_gaussians_3d_seeded(100_000, seed=2)
        s2 = settings.replace(gaussian_mode=GaussianMode.GAUSSIAN_2D)
        pipe2 = make_tiled_pipeline(
            s2, width, height, differentiable=False, compositor="pallas"
        )
        t2 = bench_forward(
            pipe2, lambda i: (c2, camera, mt, bg, jnp.float32(i * 1e-7)), iters
        )
        log(f"2DGS surfel fwd (100k): {t2 * 1e3:.2f} ms/frame")

        c4 = bgs.random_gaussians_4d_seeded(100_000, seed=3)
        s4 = settings.replace(gaussian_mode=GaussianMode.GAUSSIAN_4D)
        pipe4 = make_tiled_pipeline(
            s4, width, height, differentiable=False, compositor="pallas"
        )
        # varying time forces the per-frame 4D re-conditioning + re-sort
        t4 = bench_forward(
            pipe4, lambda i: (c4, camera, mt, bg, jnp.float32(i * 0.01)), iters
        )
        log(f"4DGS temporal fwd (100k, per-frame re-sort): {t4 * 1e3:.2f} ms/frame")

    metric_value = fb_rays if fb_rays > 0 else fwd_rays
    prior_parsed = prior_round_parsed()
    prior = float(prior_parsed["value"]) if prior_parsed.get("value") else None
    line = {
        "metric": "rays/s per chip fwd+bwd at 1M gaussians (512x512 f32)",
        "value": metric_value,
        "unit": "rays/s",
        "vs_baseline": (metric_value / prior) if prior else None,
        "fwd_ms": t_fwd * 1e3,
        "train_ms": (width * height / fb_rays * 1e3) if fb_rays > 0 else None,
    }
    # absolute anchor: round-1's final validated 1M train step (105.3 ms,
    # BASELINE.md).  vs_baseline chains round-over-round (3+ rounds of ±5%
    # relay variance compound invisibly); this ratio cannot drift.
    R1_ANCHOR_TRAIN_MS = 105.3
    if line.get("train_ms"):
        line["vs_r1_anchor"] = round(
            float(line["train_ms"]) / R1_ANCHOR_TRAIN_MS, 4
        )
    line.update(extra_configs)
    # per-config self-comparison: ratio vs the prior round for every ms
    # metric present in both rounds (<1.0 = faster).  A secondary config
    # regressing (like round-2's unexplained 4M fwd 253 -> 304 ms) now
    # shows up on the driver line instead of hiding behind the north star.
    ratios = {}
    for k in ("fwd_ms", "train_ms", "replay_ms", "gs2d_fwd_ms",
              "gs2d_train_ms", "gs4d_fwd_ms", "f16_fwd_ms",
              "gs3d_4m_fwd_ms", "gs3d_4m_train_ms", "gs2d_replay_ms",
              "gs4d_rebin_ms", "fwd_1080p_ms", "train_1080p_ms"):
        cur, prev = line.get(k), prior_parsed.get(k)
        if cur and prev:
            ratios[k] = round(float(cur) / float(prev), 4)
    if ratios:
        line["vs_prior_ms_ratio"] = ratios
        slow = {k: v for k, v in ratios.items() if v > 1.05}
        if slow:
            log(f"REGRESSION vs prior round (>5% slower): {slow}")
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
