"""8M-scale honesty probe (VERDICT r4 #8): one 8M fwd+bwd measurement, and
the image error of the BINDING 12.58M-pair memory cap measured at the real
8M scene (cap-doubling A/B) — the k_max-style truncation bound was only ever
tested at toy scale (tests/test_tiled.py).

    python tools/probe_8m.py              # fwd + cap A/B + train
    PROF_TRAIN=0 python tools/probe_8m.py # skip the train step (memory)

Timing protocol: NOTES_r3 (chained executions, 1-element readback).
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

    n = int(os.environ.get("PROF_N", 8_000_000))
    width = height = int(os.environ.get("PROF_SIZE", 512))
    iters = int(os.environ.get("PROF_ITERS", 3))
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

    total = int(jax.jit(lambda c: pair_count(
        c, camera, settings, width=width, height=height))(cloud))
    capped = pairs_budget(n, total, headroom=1.10, quantum=4096)
    cap = pairs_budget(n)
    log(f"N={n}: pair count {total}, capped budget {capped} "
        f"(static cap {cap}, binding={capped >= cap})")

    def timeit(name, fn, *args):
        out = fn(*args)
        _ = np.asarray(jnp.ravel(out[0] if isinstance(out, tuple) else out)[:1])
        best = float("inf")
        for _w in range(3):
            t0 = time.perf_counter()
            for _i in range(iters):
                out = fn(*args)
            _ = np.asarray(
                jnp.ravel(out[0] if isinstance(out, tuple) else out)[:1]
            )
            best = min(best, (time.perf_counter() - t0) / iters)
        log(f"{name}: {best * 1e3:.1f} ms")
        return best

    # ---- cap-doubling A/B: binding cap vs a non-binding budget ------------
    if os.environ.get("PROF_CAPAB", "1") == "1":
        uncapped = (int(total * 1.10) + 4096) // 4096 * 4096
        fwd_cap = make_tiled_pipeline(
            settings, width, height, differentiable=False,
            compositor="pallas", pairs_max=capped,
        )
        fwd_unc = make_tiled_pipeline(
            settings, width, height, differentiable=False,
            compositor="pallas", pairs_max=uncapped,
        )
        a = np.asarray(fwd_cap(cloud, camera, mt, bg, jnp.float32(0.0)))
        b = np.asarray(fwd_unc(cloud, camera, mt, bg, jnp.float32(0.0)))
        err = np.abs(a - b)
        dropped = max(total - capped, 0)
        log(f"cap truncation A/B: dropped {dropped} farthest pairs "
            f"({dropped / max(total, 1):.2%}); image max|diff|={err.max():.3e} "
            f"mean={err.mean():.3e} median={np.quantile(err, 0.5):.3e} "
            f"q99={np.quantile(err, 0.99):.3e}")
        del a, err, fwd_unc
        frac = float(os.environ.get("PROF_FORCE_TRUNC", "0"))
        if frac:
            # the cap may exceed the real pair count (it only eats headroom
            # then); force a BINDING budget to measure actual truncation
            # error at scale
            forced = int(total * frac) // 4096 * 4096
            fwd_f = make_tiled_pipeline(
                settings, width, height, differentiable=False,
                compositor="pallas", pairs_max=forced,
            )
            f = np.asarray(fwd_f(cloud, camera, mt, bg, jnp.float32(0.0)))
            err = np.abs(f - b)
            log(f"forced truncation A/B (budget {forced} = {frac:.0%} of "
                f"pairs): image max|diff|={err.max():.3e} "
                f"mean={err.mean():.3e} median={np.quantile(err, 0.5):.3e} "
                f"q99={np.quantile(err, 0.99):.3e}")
            del f, err, fwd_f
        del b

    # ---- timings ----------------------------------------------------------
    fwd_pipe = make_tiled_pipeline(
        settings, width, height, differentiable=False, compositor="pallas",
        pairs_max=capped,
    )
    timeit(f"{n // 10**6}M fwd (budget {capped})", fwd_pipe, cloud, camera,
           mt, bg, jnp.float32(0.0))

    if os.environ.get("PROF_TRAIN", "1") == "1":
        target = fwd_pipe(cloud, camera, mt, bg, jnp.float32(0.0))

        @jax.jit
        def fb(c, t):
            def loss(c):
                img = render_tiled(
                    c, camera, settings, mt, bg, t,
                    width=width, height=height, differentiable=True,
                    compositor="pallas", pairs_max=capped,
                )
                return jnp.mean((img - target) ** 2)

            return jax.value_and_grad(loss)(c)

        try:
            mem = fb.lower(cloud, jnp.float32(0.0)).compile()
            an = mem.memory_analysis()
            if an is not None:
                log(f"train peak temp "
                    f"{getattr(an, 'temp_size_in_bytes', 0) / 2**30:.2f} GB")
        except Exception as e:
            log(f"memory analysis unavailable: {type(e).__name__}")

        def run_train(c, t):
            l, g = fb(c, t)
            return g.position_visibility

        try:
            timeit(f"{n // 10**6}M train (budget {capped})", run_train,
                   cloud, jnp.float32(0.0))
        except Exception as e:
            log(f"train failed: {type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
