#!/usr/bin/env python
"""PLY -> gcloud converter CLI (reference: tools/ply_to_gcloud.rs).

    python tools/ply_to_gcloud.py input.ply [output.gcloud] [--filter-sparse]
        [--radius R] [--neighbor-threshold K] [--npz]

Optionally removes sparse outliers (kd-tree radius count) before writing, and
prints the output byte size like the reference tool.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="input .ply (3D gaussian schema)")
    p.add_argument("output", nargs="?", default=None,
                   help="output path (default: input with .gcloud)")
    p.add_argument("--filter-sparse", action="store_true",
                   help="remove sparse outliers before writing (SparseSelect)")
    p.add_argument("--radius", type=float, default=0.05)
    p.add_argument("--neighbor-threshold", type=int, default=3)
    p.add_argument("--npz", action="store_true",
                   help="write the fast columnar .npz format instead")
    args = p.parse_args(argv)

    from bevy_gaussian_splatting_tpu.io.loader import load_cloud, save_cloud

    cloud = load_cloud(args.input)
    print(f"loaded {len(cloud)} gaussians from {args.input}")

    if args.filter_sparse:
        from bevy_gaussian_splatting_tpu.query.sparse import remove_outliers

        cloud = remove_outliers(cloud, args.radius, args.neighbor_threshold)
        print(f"after sparse filter: {len(cloud)} gaussians")

    output = args.output
    if output is None:
        base = os.path.splitext(args.input)[0]
        output = base + (".npz" if args.npz else ".gcloud")

    nbytes = save_cloud(cloud, output)
    print(f"wrote {output} ({nbytes} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
