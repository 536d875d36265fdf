"""Standing training-quality (convergence) benchmark.

The differentiable renderer is this repo's reason to exist (BASELINE.json;
the reference delegates training to a sister project, reference
README.md:100), and three rounds of backward-path perf golf were guarded
only by allclose-at-a-point gradient tests.  This module pins the full
training *dynamics*: a fixed-seed multiview fit (the
examples/train_multiview.py protocol: L1 + D-SSIM, adam, one adaptive
density-control interval) whose final PSNR is reported on the bench line
(TPU, production Pallas custom-VJP backward) and floor-checked by a CPU
regression test — a dynamics-level break that pointwise allclose cannot
catch (e.g. a gradient term that is tiny at the test point but biased)
moves this number.
"""

from __future__ import annotations

from typing import Optional


def psnr_db(a, b) -> float:
    import numpy as np

    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))


def convergence_psnr(
    steps: int = 120,
    n_views: int = 4,
    n: int = 256,
    size: int = 64,
    densify_at: Optional[int] = None,
    compositor: str = "xla",
    settings=None,
    lr: float = 1e-2,
    seed: int = 0,
) -> dict:
    """Fit a fixed-seed random cloud to orbit renders of the deterministic
    test model; return the final mean PSNR over all training views.

    Protocol (examples/train_multiview.py, frozen here so the number is
    comparable across rounds): targets from ``test_model_3d(seed=11)``,
    init uniform inside the target AABB with half the slots dead, adam(lr),
    ``gaussian_splatting_loss``, one ``densify_and_prune`` at ``densify_at``
    (default ``steps // 2``) with an adam-moment reset.

    ``compositor="pallas"`` exercises the production custom-VJP training
    core (the path the bench golfs); ``"xla"`` is the AD-scan used by the
    CPU regression floor (tied to the Pallas path by the gradient-parity
    tests in tests/test_pallas.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import bevy_gaussian_splatting_tpu as bgs
    from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled
    from bevy_gaussian_splatting_tpu.train.densify import (
        accumulate_stats,
        densify_and_prune,
        init_densify_state,
    )
    from bevy_gaussian_splatting_tpu.train.losses import (
        gaussian_splatting_loss,
    )

    if settings is None:
        settings = bgs.CloudSettings(aabb=True)
    if densify_at is None:
        densify_at = steps // 2
    W = H = int(size)

    target_cloud = bgs.test_model_3d(seed=11)
    cams = []
    for i in range(n_views):
        a = 2.0 * np.pi * i / n_views
        eye = (5.0 * np.sin(a), 1.0, 5.0 * np.cos(a))
        cams.append(
            bgs.Camera.create(eye=eye, target=(0, 0, 0), width=W, height=H)
        )
    render_kw = dict(width=W, height=H, compositor=compositor)
    targets = [
        render_tiled(target_cloud, c, settings, differentiable=False,
                     **render_kw)
        for c in cams
    ]

    rng = np.random.default_rng(seed)
    live = n // 2
    lo, hi = (np.asarray(a) for a in target_cloud.compute_aabb())
    pv = np.zeros((n, 4), np.float32)
    pv[:live, :3] = rng.uniform(lo, hi, (live, 3))
    pv[:live, 3] = 1.0
    so = np.zeros((n, 4), np.float32)
    so[:live, :3] = 0.25
    so[:live, 3] = 0.5
    rot = np.zeros((n, 4), np.float32)
    rot[:, 0] = 1.0
    sh = np.zeros((n, target_cloud.spherical_harmonic.shape[1]), np.float32)
    sh[:live] = rng.normal(0.0, 0.2, (live, sh.shape[1])).astype(np.float32)
    cloud = bgs.Gaussian3dCloud(
        position_visibility=jnp.asarray(pv),
        spherical_harmonic=jnp.asarray(sh),
        rotation=jnp.asarray(rot),
        scale_opacity=jnp.asarray(so),
    )

    opt = optax.adam(lr)
    opt_state = opt.init(cloud)
    dstate = init_densify_state(n)

    @jax.jit
    def step(cloud, opt_state, dstate, camera, target):
        def loss_for(c):
            img = render_tiled(
                c, camera, settings, differentiable=True, **render_kw
            )
            return gaussian_splatting_loss(img, target)

        value, grads = jax.value_and_grad(loss_for)(cloud)
        dstate = accumulate_stats(dstate, grads)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(cloud, updates), opt_state, dstate, value

    value = None
    for i in range(steps):
        v = i % n_views
        cloud, opt_state, dstate, value = step(
            cloud, opt_state, dstate, cams[v], targets[v]
        )
        if i + 1 == densify_at:
            cloud, dstate, _stats = densify_and_prune(
                cloud, dstate, k_budget=n // 8,
                scene_extent=float(np.max(hi - lo)),
            )
            opt_state = opt.init(cloud)

    finals = [
        render_tiled(cloud, c, settings, differentiable=False, **render_kw)
        for c in cams
    ]
    per_view = [psnr_db(f, t) for f, t in zip(finals, targets)]
    return {
        "psnr_db": float(np.mean(per_view)),
        "psnr_per_view": per_view,
        "final_loss": float(value),
        "steps": steps,
        "n": n,
        "size": size,
        "compositor": compositor,
    }
