"""Multi-host distributed backend: ``jax.distributed`` initialization and
process-aware (ICI x DCN) mesh construction.

The reference is single-process (SURVEY.md §2.9 "Distributed comm backend:
absent"); this layer is new work required by BASELINE.json's multi-host
scaling target.  Design:

  - each host process calls :func:`initialize` (coordinator address + process
    id, or env-driven on real TPU pods where the runtime provides them);
  - :func:`make_multihost_mesh` arranges the GLOBAL device list into a 2D
    ``(camera, tiles)`` mesh so the **tiles** axis (per-frame all-gather /
    band exchange of projected splats — the hot collective) stays WITHIN a
    process (ICI on TPU), and the **camera** axis (one gradient psum per step
    — small and latency-tolerant) spans processes (DCN);
  - the existing ``parallel.render`` shard_map pipelines run unchanged on the
    resulting mesh: shard_map + jit handle multi-process global arrays
    natively, psum/all_gather lower to ICI or DCN collectives per the mesh
    layout.

A multi-process CPU dry run lives in :func:`run_multihost_dryrun` /
``python -m bevy_gaussian_splatting_tpu.parallel.distributed`` (spawned by
``__graft_entry__.dryrun_multichip`` and tests): N local processes, each with
K virtual CPU devices, coordinate through a real jax.distributed service and
execute one camera-parallel x pixel-parallel training step on global arrays.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

CAMERA_AXIS = "camera"
TILES_AXIS = "tiles"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Idempotent ``jax.distributed.initialize``.

    On TPU pods all arguments come from the runtime environment (pass
    nothing).  For CPU/GPU clusters — and the local multi-process dry run —
    pass the coordinator's ``host:port``, the world size, and this process's
    rank."""
    import jax

    if is_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def is_initialized() -> bool:
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None
    except Exception:
        return False


def make_multihost_mesh(camera_parallel: Optional[int] = None):
    """2D ``(camera, tiles)`` mesh over the global device list, laid out so
    the tiles axis is process-local (ICI) whenever possible.

    ``camera_parallel`` defaults to the process count — the natural hybrid
    layout (camera/data parallel across DCN, tile bands across ICI).  Other
    values are supported when divisibility allows:

      - ``camera_parallel == P * k``: each process contributes ``k`` camera
        rows of ``L / k`` tile devices (still ICI-only tiles).
      - ``camera_parallel`` divides ``P``: each camera row spans ``P / cp``
        whole processes — the tiles all-gather then crosses DCN (legal but
        slow; a warning is printed).
    """
    import jax
    from jax.sharding import Mesh

    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    procs = sorted({d.process_index for d in devices})
    p = len(procs)
    per = len(devices) // p
    if per * p != len(devices):
        raise ValueError("uneven device count per process")
    grid = np.array(devices, dtype=object).reshape(p, per)

    cp = camera_parallel if camera_parallel is not None else p
    if cp == 0 or len(devices) % cp:
        raise ValueError(f"camera_parallel {cp} must divide {len(devices)} devices")
    tiles = len(devices) // cp

    if cp % p == 0:
        k = cp // p
        if per % k:
            raise ValueError(
                f"camera_parallel {cp} needs {k} camera rows per process; "
                f"{per} local devices are not divisible by {k}"
            )
        arr = grid.reshape(p * k, per // k)
    elif p % cp == 0:
        import sys

        print(
            "make_multihost_mesh: tiles axis spans processes (DCN) — "
            "the per-frame splat exchange will cross hosts",
            file=sys.stderr,
        )
        arr = grid.reshape(cp, (p // cp) * per)
    else:
        raise ValueError(
            f"camera_parallel {cp} incompatible with {p} processes x {per} devices"
        )
    return Mesh(arr, (CAMERA_AXIS, TILES_AXIS))


def global_cloud(cloud, mesh, spec=None):
    """Build a GLOBAL (multi-process) sharded cloud from a process-replicated
    numpy/jax cloud: gaussians shard across the tiles axis, replicated over
    camera.  Works whether or not every device is addressable from this
    process (device_put cannot; make_array_from_callback can)."""
    import math

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_shards = mesh.shape[TILES_AXIS]
    multiple = 256 * n_shards // math.gcd(256, n_shards)
    padded = cloud.pad(multiple=multiple)
    sharding = NamedSharding(mesh, spec if spec is not None else P(TILES_AXIS))

    def place(a):
        host = np.asarray(a)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: jnp.asarray(host[idx])
        )

    return jax.tree.map(place, padded)


def global_array(arr, mesh, spec):
    """Global sharded array from a process-replicated host array."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    host = np.asarray(arr)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: jnp.asarray(host[idx])
    )


# ---------------------------------------------------------------------------
# Multi-process CPU dry run (spawned worker)
# ---------------------------------------------------------------------------


def run_multihost_dryrun(
    coordinator: str, num_processes: int, process_id: int,
    devices_per_process: int = 2, exchange: str = "allgather",
) -> str:
    """Worker body: initialize the distributed service, build the hybrid
    mesh, run ONE camera-parallel x pixel-parallel training step on global
    arrays, and return a status line (rank 0 prints it)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", devices_per_process)
    initialize(coordinator, num_processes, process_id)

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    import bevy_gaussian_splatting_tpu as bgs
    from bevy_gaussian_splatting_tpu.parallel.render import (
        make_train_step_multicam,
    )
    from bevy_gaussian_splatting_tpu.render.multi_camera import stack_cameras

    mesh = make_multihost_mesh()  # (camera=P, tiles=local)
    n_cam = mesh.shape[CAMERA_AXIS]
    tiles = mesh.shape[TILES_AXIS]
    width = 64
    height = max(16 * tiles, 64)
    if height % (16 * tiles):
        height = 16 * tiles

    settings = bgs.CloudSettings()
    cloud = bgs.random_gaussians_3d_seeded(512, seed=0)
    sharded = global_cloud(cloud, mesh)

    cams = stack_cameras(
        [
            bgs.Camera.create(
                eye=(10.0 * c, 5.0, 50.0), target=(0.0, 0.0, 0.0),
                width=width, height=height,
            )
            for c in range(n_cam)
        ]
    )
    cams = jax.tree.map(lambda a: global_array(a, mesh, P(CAMERA_AXIS)), cams)
    targets = global_array(
        np.zeros((n_cam, height, width, 4), np.float32), mesh,
        P(CAMERA_AXIS, TILES_AXIS),
    )

    step, init = make_train_step_multicam(
        mesh, settings, width, height, exchange=exchange
    )
    opt_state = init(sharded)
    new_cloud, opt_state, loss = step(sharded, opt_state, cams, targets)
    jax.block_until_ready((new_cloud, loss))
    loss_val = float(loss)
    assert np.isfinite(loss_val) and loss_val >= 0.0
    return (
        f"multihost dryrun OK: {num_processes} processes x "
        f"{devices_per_process} devices, mesh={dict(mesh.shape)}, "
        f"exchange={exchange}, loss={loss_val:.6f}"
    )


def spawn_multihost_dryrun(
    num_processes: int = 2, devices_per_process: int = 2,
    timeout: float = 600.0, exchange: str = "allgather",
) -> str:
    """Launch the multi-process CPU dry run locally (one subprocess per
    simulated host) and return rank 0's status line."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    env.pop("XLA_FLAGS", None)  # device count is set in-process by the worker

    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "bevy_gaussian_splatting_tpu.parallel.distributed",
                "--coordinator", coordinator,
                "--num-processes", str(num_processes),
                "--process-id", str(rank),
                "--devices-per-process", str(devices_per_process),
                "--exchange", exchange,
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(num_processes)
    ]
    outs = []
    try:
        for proc in procs:
            out, _ = proc.communicate(timeout=timeout)
            outs.append(out)
            if proc.returncode != 0:
                raise RuntimeError(
                    f"multihost dryrun worker failed (rc={proc.returncode}):\n"
                    + out[-3000:]
                )
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
    for out in outs:
        for line in out.splitlines():
            if line.startswith("multihost dryrun OK"):
                return line
    raise RuntimeError("no status line from rank 0:\n" + "\n".join(outs)[-3000:])


def _main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--devices-per-process", type=int, default=2)
    ap.add_argument("--exchange", default="allgather")
    args = ap.parse_args()
    msg = run_multihost_dryrun(
        args.coordinator, args.num_processes, args.process_id,
        args.devices_per_process, exchange=args.exchange,
    )
    if args.process_id == 0:
        print(msg, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
