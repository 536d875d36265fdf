#!/usr/bin/env python
"""Example-gallery thumbnail harness (reference: tests/headless_examples.rs +
tools/build_www.sh thumbnail generation).

Renders every entry of examples/examples.json through the headless CLI into
``examples/thumbnails/``.  Exits nonzero if any example fails or renders an
empty image — this is the gallery smoke test.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", default=os.path.join(ROOT, "examples/examples.json"))
    p.add_argument("--out-dir", default=os.path.join(ROOT, "examples/thumbnails"))
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--only", default=None, help="render just this example id")
    args = p.parse_args(argv)

    with open(args.manifest) as f:
        manifest = json.load(f)
    os.makedirs(args.out_dir, exist_ok=True)

    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["PALLAS_AXON_POOL_IPS"] = env.get("KEEP_TPU", "") and env.get(
        "PALLAS_AXON_POOL_IPS", ""
    )

    failures = []
    for ex in manifest["examples"]:
        if args.only and ex["id"] != args.only:
            continue
        out = os.path.join(args.out_dir, f"{ex['id']}.png")
        cmd = [
            sys.executable, "-m", "bevy_gaussian_splatting_tpu.viewer.headless",
            "--width", str(args.size), "--height", str(args.size),
            *ex["args"], "-o", out,
        ]
        r = subprocess.run(
            cmd, capture_output=True, text=True, cwd=ROOT, env=env, timeout=600
        )
        ok = r.returncode == 0 and os.path.exists(out)
        if ok:
            non_black = [
                line for line in r.stdout.splitlines() if "non-black" in line
            ]
            print(f"[ok] {ex['id']}: {non_black[-1] if non_black else ''}")
        else:
            failures.append(ex["id"])
            print(f"[FAIL] {ex['id']}:\n{r.stdout}\n{r.stderr}")

    if failures:
        print(f"{len(failures)} example(s) failed: {failures}")
        return 1
    print(f"all thumbnails in {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
