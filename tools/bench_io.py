"""IO throughput benchmark — the reference's ``benches/io.rs`` criterion group.

Measures encode/decode throughput (bytes/s) for the cloud codecs at the
reference's cloud sizes {1_000, 10_000, 84_348, 1_244_819}
(/root/reference/benches/io.rs:10-13) plus KHR glTF scene encode.

    JAX_PLATFORMS=cpu python tools/bench_io.py [--sizes 1000 10000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="*",
                   default=[1_000, 10_000, 84_348, 1_244_819])
    args = p.parse_args()

    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_platforms", "cpu")

    import bevy_gaussian_splatting_tpu as bgs
    from bevy_gaussian_splatting_tpu.io import bincode2
    from bevy_gaussian_splatting_tpu.io import gcloud as gc
    from bevy_gaussian_splatting_tpu.io import ply as ply_codec
    from bevy_gaussian_splatting_tpu.io.scene import (
        encode_khr_gaussian_scene_glb_bytes,
    )

    print(f"{'codec':<26} {'n':>9} {'MB':>8} {'enc MB/s':>9} {'dec MB/s':>9}")
    for n in args.sizes:
        cloud = bgs.random_gaussians_3d_seeded(n, seed=0)
        rows = [
            ("gcloud flexbuffers (C++)",
             lambda c=cloud: gc.encode_gcloud_3d(c),
             lambda d: gc.decode_gcloud_3d(d)),
            ("gcloud bincode2+gzip",
             lambda c=cloud: bincode2.encode_bincode_3d(c),
             lambda d: bincode2.decode_bincode_3d(d)),
            ("npz columnar",
             lambda c=cloud: gc.encode_npz(c),
             lambda d: gc.decode_npz(d)),
            ("ply (C++ decode)",
             lambda c=cloud: ply_codec.write_ply_3d(c),
             lambda d: ply_codec.parse_ply_3d(d)),
        ]
        for name, enc, dec in rows:
            data, te = timed(enc, reps=2 if n > 100_000 else 3)
            _, td = timed(dec, data, reps=2 if n > 100_000 else 3)
            mb = len(data) / 1e6
            print(f"{name:<26} {n:>9} {mb:>8.1f} {mb / te:>9.1f} {mb / td:>9.1f}")
        glb, te = timed(
            lambda: encode_khr_gaussian_scene_glb_bytes(
                [("cloud", cloud, None)]
            ),
            reps=2,
        )
        mb = len(glb) / 1e6
        print(f"{'KHR glTF scene encode':<26} {n:>9} {mb:>8.1f} {mb / te:>9.1f} {'-':>9}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
