"""Multi-chip scaling-efficiency proxy.

Real multi-chip hardware is unavailable in this environment, so the ≥80%
rays/s scaling-efficiency target (BASELINE.md) is tracked through two
complementary proxies, both reported by ``__graft_entry__.dryrun_multichip``:

1. **Bytes x bandwidth time model** at public TPU v5p parameters: the sharded
   render's only cross-device traffic is the per-frame projected-splat
   exchange (parallel/render.py), whose received bytes per device are exactly
   accounted by ``exchange_bytes_per_device``.  Per-device compute divides by
   the band count (binning, pair sort, params gather and the compositor all
   scale with the band's pair share — band pair sets partition the global
   pair set), so

       T_n = T_1 / n  +  recv_bytes(n) / link_bw  +  t_launch
       eff(n) = T_1 / (n * T_n)

2. **Measured work-ratio on the virtual CPU mesh**: the same jitted step on a
   1-device vs an n-device mesh.  All n virtual devices share one host CPU,
   so the n-device wall time approximates the TOTAL work (compute is
   serialized); ``work_ratio = T_mesh_n / T_mesh_1`` measures the sharding
   overhead factor (duplicated prestages, exchange shuffling, padding) that
   the time model's T_1/n term assumes away.  A work_ratio near 1.0 means
   sharding adds little redundant work; the modeled efficiency then holds.

Reference: the reference is single-GPU (SURVEY.md §2.9); these targets come
from BASELINE.json's multi-host scaling requirement.
"""

from __future__ import annotations

import time
from typing import Optional

# Public TPU v5p parameters (approximate, from the public scaling-book /
# cloud docs): per-chip ICI egress ~ 6 links x ~90 GB/s per direction; DCN
# per host ~ 200 Gbps (25 GB/s) shared by 4 chips.  These are MODEL
# parameters, not measurements — recorded here so the proxy is reproducible.
V5P = {
    "ici_bytes_per_s": 4.5e11,   # usable per-chip ICI bandwidth (~450 GB/s)
    "dcn_bytes_per_s": 6.25e9,   # per-chip share of host DCN (~25/4 GB/s)
    "launch_s": 5e-6,            # per-collective launch/latency floor
}


def exchange_time_s(
    n_total: int,
    n_bands: int,
    cols: int,
    budget: Optional[int] = None,
    link: str = "ici",
    params: dict = V5P,
) -> float:
    """Modeled per-frame exchange time: received bytes / link bandwidth."""
    from bevy_gaussian_splatting_tpu.parallel.exchange import (
        exchange_bytes_per_device,
    )

    vols = exchange_bytes_per_device(n_total, n_bands, cols, budget)
    recv = vols["bounded"] if budget is not None else vols["allgather"]
    bw = params["ici_bytes_per_s" if link == "ici" else "dcn_bytes_per_s"]
    return recv / bw + params["launch_s"]


def modeled_efficiency(
    t_single_s: float,
    n_total: int,
    n_bands: int,
    cols: int = 14,
    budget: Optional[int] = None,
    link: str = "ici",
    work_ratio: float = 1.0,
    params: dict = V5P,
) -> float:
    """eff(n) = T_1 / (n * T_n) with T_n = work_ratio*T_1/n + T_exchange.

    ``work_ratio`` folds in the CPU-mesh-measured sharding overhead (total
    work inflation); 1.0 = perfectly partitioned work."""
    t_comm = exchange_time_s(n_total, n_bands, cols, budget, link, params)
    t_n = work_ratio * t_single_s / n_bands + t_comm
    return t_single_s / (n_bands * t_n)


def train_comm_bytes_per_chip(
    n_total: int,
    n_bands: int,
    cols_exchange: int,
    budget: Optional[int] = None,
    n_camera: int = 1,
    cloud_cols: int = 60,
) -> dict:
    """Per-chip received bytes per TRAINING step, split by link class.

    Topology: ``n_camera`` camera rows (data-parallel replicas, DCN when the
    rows live on different hosts) x ``n_bands`` tile bands (ICI).  Traffic:

    * ICI (within a camera row): the forward splat exchange
      (:func:`exchange_bytes_per_device`) PLUS the backward transpose —
      band-computed per-pair gradients return to the owning shard over the
      same links (all_to_all transpose for the bounded exchange,
      reduce-scatter for the all-gather), so backward volume == forward
      volume and ICI bytes are exactly 2x the forward exchange.
    * DCN (across camera rows): ring all-reduce of the local cloud-shard
      gradients.  Each chip owns ``n_total / n_bands`` gaussians of
      ``cloud_cols`` f32 parameters; a ring all-reduce over ``n_camera``
      replicas receives ``2 (r-1)/r`` of the shard bytes.

    Volumes only — no overlap assumptions (the efficiency model applies
    those explicitly)."""
    from bevy_gaussian_splatting_tpu.parallel.exchange import (
        exchange_bytes_per_device,
    )

    if n_bands <= 1:
        # a single tile band per camera row has no splat exchange at all
        fwd = 0.0
    else:
        vols = exchange_bytes_per_device(
            n_total, n_bands, cols_exchange, budget
        )
        fwd = vols["bounded"] if budget is not None else vols["allgather"]
    shard_bytes = (n_total // max(n_bands, 1)) * cloud_cols * 4
    r = max(n_camera, 1)
    dcn = 2.0 * (r - 1) / r * shard_bytes if r > 1 else 0.0
    return {"ici": 2.0 * fwd, "dcn": dcn, "fwd_exchange": fwd,
            "cloud_shard_bytes": shard_bytes}


def modeled_efficiency_train(
    t_train_s: float,
    n_total: int,
    n_hosts: int,
    chips_per_host: int,
    cols_exchange: int = 14,
    budget: Optional[int] = None,
    cloud_cols: int = 60,
    work_ratio: float = 1.0,
    overlap_dcn: bool = False,
    params: dict = V5P,
) -> float:
    """Training-step scaling efficiency for the hybrid (camera=DCN x
    tiles=ICI) topology — the number BASELINE's "1 chip -> 2+ hosts" bar
    actually asks for (the forward-only ICI figure answers an easier
    question).

        T_n = work_ratio * T_train / n  +  T_ici  +  T_dcn
        eff = T_train / (n * T_n)

    ``overlap_dcn=True`` instead models the DCN gradient all-reduce
    overlapped with compute (standard data-parallel overlap: the all-reduce
    of layer/shard grads proceeds while the rest of the backward runs):
    T_n = max(compute, T_dcn) + T_ici — an upper bound that is only honest
    if the training step's graph shape actually permits the overlap."""
    n = n_hosts * chips_per_host
    vols = train_comm_bytes_per_chip(
        n_total, chips_per_host, cols_exchange, budget,
        n_camera=n_hosts, cloud_cols=cloud_cols,
    )
    t_ici = (
        vols["ici"] / params["ici_bytes_per_s"] + 2 * params["launch_s"]
        if vols["ici"] else 0.0
    )
    t_dcn = (
        vols["dcn"] / params["dcn_bytes_per_s"] + params["launch_s"]
        if vols["dcn"] else 0.0
    )
    compute = work_ratio * t_train_s / n
    if overlap_dcn:
        t_n = max(compute, t_dcn) + t_ici
    else:
        t_n = compute + t_ici + t_dcn
    return t_train_s / (n * t_n)


def measured_work_ratio(
    cloud,
    camera,
    settings,
    width: int,
    height: int,
    n_devices: int,
    iters: int = 3,
    exchange: str = "allgather",
    band_budget: Optional[int] = None,
    pairs_hint: Optional[int] = None,
    single_pairs_hint: Optional[int] = None,
) -> dict:
    """Wall-time the sharded forward on a 1-device vs n-device virtual CPU
    mesh.  With all virtual devices on one host CPU, the n-device time is the
    TOTAL work, so t_n/t_1 is the sharding work-inflation factor.

    ``pairs_hint``/``single_pairs_hint``: planner-measured pair budgets for
    the banded and single-device runs (both sides must be budget-fair, or
    the ratio measures bucket mismatch instead of sharding overhead)."""
    import jax

    from bevy_gaussian_splatting_tpu.parallel.render import (
        make_mesh,
        make_sharded_render,
        shard_cloud,
    )

    out = {}
    for n in (1, n_devices):
        mesh = make_mesh(n)
        sharded = shard_cloud(cloud, mesh)
        fn = make_sharded_render(
            mesh, settings, width, height,
            exchange=exchange if n > 1 else "allgather",
            band_budget=band_budget if n > 1 else None,
            pairs_hint=pairs_hint if n > 1 else single_pairs_hint,
        )
        img = jax.block_until_ready(fn(sharded, camera))  # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                img = fn(sharded, camera)
            jax.block_until_ready(img)
            best = min(best, (time.perf_counter() - t0) / iters)
        out[n] = best
    out["work_ratio"] = out[n_devices] / out[1]
    return out


def serialized_work_ratio(
    n_devices: int,
    n_gaussians: int,
    width: int = 128,
    height: int = 128,
    timeout_s: float = 900.0,
) -> dict:
    """Measured sharding work-inflation with HONEST serialization: spawn the
    CPU-mesh measurement in a subprocess pinned to ONE core (``taskset -c``),
    so the n virtual device programs cannot overlap across host cores and
    wall time equals total work.  (The in-process wall-clock ratio on a
    multi-core host measures core overlap, not work — it came back 0.66 at
    1M/8 bands, i.e. "sharding shrinks total work", which is impossible.)

    The subprocess plans the exchange + pair budgets exactly like the
    production path (plan_exchange with_pairs) so both sides are
    budget-fair.  Returns the subprocess's JSON dict
    (t1_s, tn_s, work_ratio, exchange, band_pairs)."""
    import json
    import os
    import shutil
    import subprocess
    import sys

    code = (
        "import json, time\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import dataclasses\n"
        "import jax.numpy as jnp\n"
        "import bevy_gaussian_splatting_tpu as bgs\n"
        "from bevy_gaussian_splatting_tpu.parallel.render import (\n"
        "    make_mesh, plan_exchange)\n"
        "from bevy_gaussian_splatting_tpu.parallel.scaling import (\n"
        "    measured_work_ratio)\n"
        "from bevy_gaussian_splatting_tpu.ops.rasterize_tile import pair_count\n"
        f"n, w, h, nd = {n_gaussians}, {width}, {height}, {n_devices}\n"
        "cloud = bgs.random_gaussians_3d_seeded(n, seed=0)\n"
        "cloud = dataclasses.replace(cloud,\n"
        "    position_visibility=cloud.position_visibility\n"
        "        * jnp.array([1.0, 1.0, 0.25, 1.0]),\n"
        "    scale_opacity=cloud.scale_opacity\n"
        "        * jnp.array([0.05, 0.05, 0.05, 1.0]))\n"
        "cam = bgs.Camera.create(eye=(0.0, 0.0, 60.0),\n"
        "    target=(0.0, 0.0, 0.0), width=w, height=h)\n"
        "s = bgs.CloudSettings()\n"
        "mesh = make_mesh(nd)\n"
        "mode, budget, pairs = plan_exchange(\n"
        "    cloud, cam, s, w, h, mesh, with_pairs=True)\n"
        "sp = int(jax.jit(lambda c: pair_count(\n"
        "    c, cam, s, width=w, height=h))(cloud))\n"
        "out = measured_work_ratio(cloud, cam, s, w, h, nd, iters=2,\n"
        "    exchange=mode, band_budget=budget, pairs_hint=pairs,\n"
        "    single_pairs_hint=sp)\n"
        "print(json.dumps({'t1_s': out[1], 'tn_s': out[nd],\n"
        "    'work_ratio': out['work_ratio'], 'exchange': mode,\n"
        "    'band_pairs': pairs, 'single_pairs': sp}))\n"
    )
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", "0"] + cmd
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout_s, env=env
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"serialized work-ratio subprocess failed: {proc.stderr[-500:]}"
        )
    import json as _json

    return _json.loads(proc.stdout.strip().splitlines()[-1])


def serialized_work_ratio_median(
    n_devices: int,
    n_gaussians: int,
    width: int = 128,
    height: int = 128,
    runs: int = 4,
    timeout_s: float = 900.0,
) -> dict:
    """Median-of-``runs`` :func:`serialized_work_ratio` with dispersion.

    A single subprocess run read 0.93 / 0.82 / 1.14 across three round-4
    sessions — a ±16% spread on the one input the efficiency model consumes.
    The median of >=3 runs (first-run compile cost amortized by the
    persistent compilation cache is NOT relied on: each run re-measures with
    iters-averaged timing) plus a reported spread makes a bad single reading
    visible instead of silently steering the modeled efficiency.

    With ``runs >= 3`` the FIRST subprocess run is discarded as warmup:
    cold page/disk caches and CPU-frequency ramp on the pinned core bias it
    (measured 0.852 vs 1.051/1.072 for the next two at 1M/8 — a 21% cold
    outlier vs 2% steady-state spread)."""
    results = []
    for _ in range(max(runs, 1)):
        results.append(
            serialized_work_ratio(
                n_devices, n_gaussians, width, height, timeout_s=timeout_s
            )
        )
    if len(results) >= 3:
        results = results[1:]
    ratios = sorted(float(r["work_ratio"]) for r in results)
    # upper-middle element: the true median for odd counts; for even counts
    # the CONSERVATIVE (higher work-ratio) of the two middle runs — always
    # an actually-measured value, never an interpolation.  Default runs=4
    # -> 3 kept -> true median; runs<3 keeps all runs (no warmup discard),
    # documented for constrained hosts.
    med = ratios[len(ratios) // 2]
    out = next(dict(r) for r in results if float(r["work_ratio"]) == med)
    out["work_ratio_runs"] = ratios
    out["work_ratio_spread"] = (
        (ratios[-1] - ratios[0]) / med if med else float("inf")
    )
    return out
