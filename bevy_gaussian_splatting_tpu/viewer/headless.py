"""Headless renderer CLI — the framework's ``examples/headless.rs`` equivalent.

Renders a cloud (file, random, or the deterministic test model) to a PNG.
CLI arguments mirror the reference's ``GaussianSplattingViewer`` clap args
(src/utils.rs:7-112) where they make sense without a window.

    python -m bevy_gaussian_splatting_tpu.viewer.headless \
        --gaussian-count 10000 --seed 0 --width 512 --height 512 -o out.png
    python -m bevy_gaussian_splatting_tpu.viewer.headless \
        --input-cloud scene.gcloud --rasterize-mode depth -o depth.png
"""

from __future__ import annotations

import argparse
import sys
import time as _time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-cloud", type=str, default=None,
                   help=".ply/.gcloud/.ply4d/.gc4d/.npz cloud file (utils.rs input_cloud)")
    p.add_argument("--input-stream", type=str, default=None,
                   help="streaming-scene directory (stream/scene.py manifest);"
                        " loads chunks within --stream-radius of the eye")
    p.add_argument("--stream-radius", type=float, default=1e9,
                   help="chunk residency radius for --input-stream")
    p.add_argument("--input-scene", type=str, default=None,
                   help=".gltf/.glb KHR_gaussian_splatting scene (utils.rs input_scene)")
    p.add_argument("--gaussian-count", type=int, default=10_000,
                   help="random cloud size when no input file (utils.rs gaussian_count)")
    p.add_argument("--seed", type=int, default=0, help="random cloud seed")
    p.add_argument("--test-model", action="store_true",
                   help="use the deterministic 9-gaussian test cloud")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--gaussian-mode", default="gaussian_3d",
                   choices=["gaussian_2d", "gaussian_3d", "gaussian_4d"])
    p.add_argument("--rasterize-mode", default="color",
                   choices=["color", "depth", "normal", "position", "optical_flow",
                            "classification", "velocity"])
    p.add_argument("--draw-mode", default="all",
                   choices=["all", "selected", "highlight_selected"])
    p.add_argument("--aabb", action="store_true", help="AABB bounding quads (default OBB)")
    p.add_argument("--radix-bits", type=int, default=32, choices=[16, 24, 32])
    p.add_argument("--sort-mode", default="radix", choices=["none", "radix", "rayon", "std"])
    p.add_argument("--time", type=float, default=0.0, help="4D playback time")
    p.add_argument("--global-scale", type=float, default=1.0)
    p.add_argument("--global-opacity", type=float, default=1.0)
    p.add_argument("--eye", type=float, nargs=3, default=[0.0, 1.5, 5.0])
    p.add_argument("--target", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    p.add_argument("--background", type=float, nargs=4, default=[0.0, 0.0, 0.0, 0.0])
    p.add_argument("--impl", default="auto", choices=["auto", "oracle", "tiled"])
    p.add_argument("-o", "--output", type=str, default="headless_output/0.png",
                   help="output PNG path (reference writes headless_output/0.png)")
    p.add_argument("--benchmark", type=int, default=0, metavar="FRAMES",
                   help="render FRAMES timed frames after warmup and report FPS")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    import bevy_gaussian_splatting_tpu as bgs
    from bevy_gaussian_splatting_tpu.io.loader import load_cloud
    from bevy_gaussian_splatting_tpu.models.settings import (
        DrawMode,
        GaussianMode,
        RadixSortDepthBits,
        RasterizeMode,
        SortMode,
    )
    from bevy_gaussian_splatting_tpu.render.api import render
    from bevy_gaussian_splatting_tpu.utils.image import non_black_pixel_count, save_png

    scene = None
    if args.input_stream:
        from bevy_gaussian_splatting_tpu.stream import StreamingCloudScene

        stream = StreamingCloudScene(
            args.input_stream, radius=args.stream_radius, background=False
        )
        stream.update(tuple(args.eye))
        stream.wait_idle()
        cloud = stream.resident_cloud()
        if cloud is None:
            print("no chunks within --stream-radius of the eye", flush=True)
            return 1
        print(
            f"streaming: {len(stream.resident_ids())}/{len(stream.entries)} "
            f"chunks resident ({len(cloud)} gaussians padded)",
            flush=True,
        )
    elif args.input_scene:
        from bevy_gaussian_splatting_tpu.io.loader import load_scene

        from bevy_gaussian_splatting_tpu.io.loader import resolve_input

        scene = load_scene(resolve_input(args.input_scene))
        cloud = None
    elif args.input_cloud:
        from bevy_gaussian_splatting_tpu.io.loader import resolve_input

        cloud = load_cloud(resolve_input(args.input_cloud))
        if isinstance(cloud, bgs.Gaussian4dCloud):
            args.gaussian_mode = "gaussian_4d"
    elif args.test_model:
        cloud = bgs.test_model_3d()
    elif args.gaussian_mode == "gaussian_4d":
        cloud = bgs.random_gaussians_4d_seeded(args.gaussian_count, args.seed)
    else:
        cloud = bgs.random_gaussians_3d_seeded(args.gaussian_count, args.seed)

    settings = bgs.CloudSettings(
        aabb=args.aabb,
        gaussian_mode=GaussianMode(args.gaussian_mode),
        rasterize_mode=RasterizeMode(args.rasterize_mode),
        draw_mode=DrawMode(args.draw_mode),
        sort_mode=SortMode(args.sort_mode),
        radix_sort_depth_bits=RadixSortDepthBits(args.radix_bits),
        time=args.time,
        global_scale=args.global_scale,
        global_opacity=args.global_opacity,
    )
    camera = None
    if scene is not None:
        from bevy_gaussian_splatting_tpu.render.scene import camera_from_scene

        camera = camera_from_scene(scene, args.width, args.height)
        if camera is not None:
            print("using scene camera", flush=True)
    if camera is None:
        camera = bgs.Camera.create(
            eye=tuple(args.eye), target=tuple(args.target),
            width=args.width, height=args.height,
        )
    background = jnp.asarray(args.background, jnp.float32)

    def draw():
        if scene is not None:
            from bevy_gaussian_splatting_tpu.render.scene import render_scene

            return render_scene(scene, camera, background=background, impl=args.impl)
        return render(cloud, camera, settings, background=background, impl=args.impl)

    t0 = _time.perf_counter()
    image = draw()
    image.block_until_ready()
    t1 = _time.perf_counter()
    print(f"first frame (incl. compile): {t1 - t0:.3f}s")

    if args.benchmark:
        for _ in range(3):  # warmup
            draw().block_until_ready()
        t2 = _time.perf_counter()
        for _ in range(args.benchmark):
            image = draw()
        image.block_until_ready()
        t3 = _time.perf_counter()
        per_frame = (t3 - t2) / args.benchmark
        rays = args.width * args.height / per_frame
        print(f"steady state: {per_frame * 1e3:.2f} ms/frame  "
              f"({1.0 / per_frame:.1f} fps, {rays / 1e6:.2f} Mrays/s)")

    import os

    out_dir = os.path.dirname(args.output)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    save_png(np.asarray(image), args.output)
    print(f"wrote {args.output} ({args.width}x{args.height}, "
          f"{non_black_pixel_count(image)} non-black pixels)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
