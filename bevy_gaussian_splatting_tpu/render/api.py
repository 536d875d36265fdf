"""The functional render API with a compiled-pipeline cache.

``render(cloud, camera, settings) -> image`` is the framework's equivalent of
the reference's whole render graph (extract -> sort -> draw,
src/render/mod.rs:87-219): static settings specialize a jitted pipeline the way
``CloudPipelineKey`` specializes a wgpu pipeline (src/render/mod.rs:898-909),
and the cache mirrors ``SpecializedRenderPipelines``.

Implementations:
  - "oracle": exact pure-jnp painter (ops/rasterize_ref.py) — O(N*H*W)
  - "tiled":  production tile-binned renderer (ops/rasterize_tile.py)
  - "auto":   tiled when available for the mode, else oracle
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from bevy_gaussian_splatting_tpu.models.camera import Camera
from bevy_gaussian_splatting_tpu.models.settings import CloudSettings
from bevy_gaussian_splatting_tpu.ops.rasterize_ref import render_oracle

_PIPELINE_CACHE: dict = {}
_COUNTER_CACHE: dict = {}
_BUDGET_STATE: dict = {}
_RECOUNT_PERIOD = 16  # frames between pair-count refreshes per pipeline key


def _oracle_pipeline(settings: CloudSettings, width: int, height: int):
    def fn(cloud, camera, model_transform, background, time):
        return render_oracle(
            cloud, camera, settings, model_transform, background, time,
            width=width, height=height,
        )

    return jax.jit(fn)


def _current_bucket(key, settings, width, height, cloud, camera, model_transform):
    """Adaptive pair-budget bucket: an exact N-sized pair count sizes the
    static expansion buffers to the scene (re-measured every
    ``_RECOUNT_PERIOD`` frames; growth is immediate since the count is exact
    for the frame about to render)."""
    from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
        pair_count,
        pairs_budget,
    )

    state = _BUDGET_STATE.get(key)
    if state is not None:
        bucket, frame = state
        if (frame + 1) % _RECOUNT_PERIOD:
            _BUDGET_STATE[key] = (bucket, frame + 1)
            return bucket
    counter = _COUNTER_CACHE.get(key)
    if counter is None:
        counter = jax.jit(
            functools.partial(
                pair_count, settings=settings, width=width, height=height
            )
        )
        _COUNTER_CACHE[key] = counter
    total = int(counter(cloud, camera, model_transform=model_transform))
    n = len(cloud)
    bucket = pairs_budget(n, total)
    if state is not None and bucket < state[0]:
        bucket = state[0]  # shrink lazily (avoid recompile churn on zoom-out)
    _BUDGET_STATE[key] = (bucket, (state[1] + 1) if state else 0)
    return bucket


def make_replay_pipeline(
    settings: CloudSettings,
    width: int,
    height: int,
    compositor: str,
    pairs_max: int,
    pair_order: Optional[bool] = None,
):
    """Split the tiled pipeline at the sort/bin boundary for frame-coherent
    serving (the reference re-sorts only on throttled camera movement,
    src/sort/mod.rs:76-86,153-194 — between re-sorts, frames render with the
    STALE order and fresh per-frame splat parameters).

    Returns ``(bin_fn, replay_fn)``:
      - ``bin_fn(cloud, camera, model_transform, time)`` -> the cacheable
        binning artifacts ``(g_s, valid_s, start, end, count[, cloud_pairs])``
        (integer, non-differentiable — plus the pair-ordered cloud rows in
        pair-order mode);
      - ``replay_fn(cloud, camera, model_transform, background, time, *bins)``
        -> image: fresh projection/pack + compositor only — the
        re-sort/expansion/pair-sort prestages (~65% of a full forward) are
        skipped.

    ``pair_order`` (default on; ``BGS_REPLAY=gather|pairs`` overrides):
    ``bin_fn`` additionally gathers the CLOUD INPUT rows into pair order
    (one amortized gather per re-bin), and each replay frame projects /
    SH-evaluates / packs directly on the 1.2-1.6x pair rows — eliminating
    the per-frame P-row params gather (~14 ms at the 1M bench, the largest
    replay slice) and the [P, C] -> [C, P] interleave (params are packed
    straight into kernel-native rows).  Bit-identical to the gather replay:
    every per-row op is elementwise, so duplicated rows compute exactly the
    per-gaussian values."""
    import os as _os

    import jax as _jax

    from bevy_gaussian_splatting_tpu.ops import rasterize_tile as rt
    from bevy_gaussian_splatting_tpu.ops import sort as sort_ops
    from bevy_gaussian_splatting_tpu.ops.pallas.core import gather_rows
    from bevy_gaussian_splatting_tpu.ops.project import project_gaussians
    from bevy_gaussian_splatting_tpu.ops.transforms import apply_transform
    from bevy_gaussian_splatting_tpu.models.settings import RasterizeMode

    if pair_order is None:
        pair_order = _os.environ.get("BGS_REPLAY", "pairs") != "gather"

    num_tiles = (width // rt.TILE) * (height // rt.TILE)
    interpret = _jax.default_backend() != "tpu"

    def _splats(cloud, camera, model_transform, time):
        # identical prefix to render_tiled (depth min/max quirk included)
        clip_from_world = camera.clip_from_view @ camera.view_from_world
        back_key = sort_ops.radix_depth_key(
            cloud.position, model_transform, clip_from_world,
            camera.world_position, settings.radix_sort_depth_bits.bits,
        )
        wp = apply_transform(model_transform, cloud.position)
        first_idx, last_idx = rt.back_sorted_entry_indices(back_key)
        max_d = jnp.linalg.norm(wp[first_idx] - camera.world_position)
        min_d = jnp.linalg.norm(wp[last_idx] - camera.world_position)
        splats = project_gaussians(
            cloud, camera, settings, model_transform,
            depth_minmax=(min_d, max_d), time=time,
        )
        splats["sort_key"] = back_key
        splats["mask"] = splats["mask"] & (back_key != sort_ops.SENTINEL_KEY)
        return splats

    def _gather_cloud_pairs(cloud, g_s):
        """Pair-ordered cloud rows: every [N, ...] leaf gathered by g_s
        through the gather-cliff cost model (invalid slots hold in-range
        garbage indices; their rows are never read — tile ranges exclude
        the sorted sentinel suffix)."""

        def g(leaf):
            n = leaf.shape[0]
            flat = leaf.reshape(n, -1)
            out = gather_rows(flat, g_s, flat.shape[1])
            return out.reshape((g_s.shape[0],) + leaf.shape[1:])

        return jax.tree_util.tree_map(g, cloud)

    def _bin_impl(cloud, camera, model_transform, time):
        splats = _splats(cloud, camera, model_transform, time)
        bins = rt.bin_gaussians(
            splats, settings, width, height, pairs_max,
            expand="pallas" if compositor == "pallas" else "xla",
            interpret=interpret,
        )
        g_s, tile_s, valid_s = bins[0], bins[1], bins[2]
        start, end = rt.tile_ranges(tile_s, num_tiles)
        count = jnp.minimum(end - start, rt.tile_budget(len(cloud)))
        out = (g_s, valid_s, start, end, count)
        if pair_order:
            out = out + (_gather_cloud_pairs(cloud, g_s),)
        return out

    def _replay_impl(cloud, camera, model_transform, background, time,
                     g_s, valid_s, start, end, count, cloud_pairs=None):
        if cloud_pairs is None:
            splats = _splats(cloud, camera, model_transform, time)
            params = rt.pack_raster_params(splats, settings, width, height)
            params_sorted = rt._serving_params_gather(params, g_s)
            transposed = False
        else:
            # pair-order replay: project/SH/pack directly on the pair rows —
            # no P-row params gather, no [P, C] -> [C, P] interleave.  The
            # depth min/max quirk must come from the ORIGINAL cloud (it
            # reads back-sorted entries 1 and n-1 of the N-row key array).
            dm = None
            if settings.rasterize_mode == RasterizeMode.DEPTH:
                bk = sort_ops.radix_depth_key(
                    cloud.position, model_transform,
                    camera.clip_from_view @ camera.view_from_world,
                    camera.world_position,
                    settings.radix_sort_depth_bits.bits,
                )
                wp = apply_transform(model_transform, cloud.position)
                fi, li = rt.back_sorted_entry_indices(bk)
                dm = (
                    jnp.linalg.norm(wp[li] - camera.world_position),
                    jnp.linalg.norm(wp[fi] - camera.world_position),
                )
            bk_p = sort_ops.radix_depth_key(
                cloud_pairs.position, model_transform,
                camera.clip_from_view @ camera.view_from_world,
                camera.world_position,
                settings.radix_sort_depth_bits.bits,
            )
            splats = project_gaussians(
                cloud_pairs, camera, settings, model_transform,
                depth_minmax=dm, time=time,
            )
            splats["mask"] = splats["mask"] & (
                bk_p != sort_ops.SENTINEL_KEY
            )
            cols = rt.pack_raster_param_cols(splats, settings, width, height)
            params_sorted = jnp.stack(cols, axis=0)  # [C, P] kernel rows
            transposed = True
        if compositor == "pallas":
            from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
                pallas_composite_tiles,
            )

            return pallas_composite_tiles(
                params_sorted, start, count, settings, width, height,
                background=background, interpret=interpret,
                transposed_params=transposed,
            )
        if transposed:
            params_sorted = params_sorted.T
        return rt.composite_tiles(
            params_sorted, valid_s, start, end, settings, width, height,
            k_max=rt.tile_budget(len(cloud)), background=background,
            differentiable=False,
        )

    bin_fn = jax.jit(_bin_impl)
    replay_fn = jax.jit(_replay_impl)

    # orbit variants: the camera is built ON DEVICE from one packed f32[6]
    # (az, el, radius, target) — a serving loop uploading a host-built
    # Camera pays one relay transfer per pytree leaf (~10 ms/frame through
    # the remote tunnel); this is a single 24-byte upload
    from bevy_gaussian_splatting_tpu.models.camera import orbit_camera_device

    @jax.jit
    def bin_orbit_fn(cloud, orbit, time):
        camera = orbit_camera_device(orbit, width, height)
        return _bin_impl(cloud, camera, jnp.eye(4, dtype=jnp.float32), time)

    @jax.jit
    def replay_orbit_fn(cloud, orbit, background, time, *bins):
        camera = orbit_camera_device(orbit, width, height)
        return _replay_impl(
            cloud, camera, jnp.eye(4, dtype=jnp.float32), background, time,
            *bins,
        )

    return bin_fn, replay_fn, bin_orbit_fn, replay_orbit_fn


class InteractiveRenderer:
    """Frame-coherent serving renderer with the reference's sort throttle.

    Reference semantics (src/sort/mod.rs:76-86, 153-194): re-sort only when
    the camera MOVED and at least ``period_ms`` elapsed since the last sort;
    after each sort, ``period_ms = max(floor, 4 x measured sort duration)``.
    Frames between re-sorts render with the stale order — here the full
    binning artifacts (pair membership + order + tile ranges) — and fresh
    per-frame projection, exactly the reference's staleness class.

    A TIME change always re-sorts/re-bins (4DGS temporal scenes need the
    per-frame depth re-sort, BASELINE.md config 4) — but through a FUSED
    one-shot pipeline rather than the bin+replay split (the split's
    blocking bin dispatch + pair-order cloud gather only pay off when
    frames REPLAY; a temporal sweep re-bins every frame, measured 4.8x
    slower split vs fused at the 1M 4DGS bench).  Such frames count in
    ``stats["oneshots"]``; a settled time re-bins once and replays after.
    A cloud identity change rebuilds bins on the bin+replay path.
    """

    def __init__(
        self,
        settings: Optional[CloudSettings] = None,
        impl: str = "auto",
        period_floor_ms: float = 1000.0,
        move_atol: float = 1e-6,
    ):
        self.settings = settings if settings is not None else CloudSettings()
        self.impl = impl
        self.period_floor_ms = float(period_floor_ms)
        self.move_atol = float(move_atol)
        self.period_ms = float(period_floor_ms)
        self._pipes: dict = {}
        self._bins = None
        self._bin_key = None  # (pipe_key, cloud object, time)
        self._last_pose = None
        self._last_bin_ms = -1e30
        self._compiled: set = set()
        self._oneshots: dict = {}
        self.stats = {"bins": 0, "replays": 0, "oneshots": 0}
        # per-frame constants built once (eager tiny-op dispatches are NOT
        # free through a remote-device relay)
        self._eye4 = jnp.eye(4, dtype=jnp.float32)
        self._bg0 = jnp.zeros((4,), jnp.float32)

    def _pose(self, camera: Camera, model_transform):
        """Device readback fallback — callers that know their orbit state
        should pass ``pose_key`` to :meth:`render` instead (each small
        ``np.asarray`` through a remote-device relay both costs a dispatch
        round trip AND drains the execution pipeline)."""
        import numpy as np

        return np.concatenate([
            np.asarray(camera.view_from_world).ravel(),
            np.asarray(model_transform).ravel(),
        ])

    def _rebin_reason(self, pipe_key, cloud, time, pose, now_ms: float):
        """None = replay; "bin" = rebuild bins (bin_fn + replay); "time" =
        time-driven change, rendered by the FUSED one-shot pipeline (a
        temporal sweep re-bins every frame anyway, so the two-dispatch
        bin+replay split — with its blocking sort-duration readback and the
        pair-order cloud gather that only pays off when replayed — costs
        ~5.5x the fused render: 476 vs 86 ms/frame at the 1M 4DGS bench)."""
        if self._bin_key is None:
            return "bin"
        key, bound_cloud, t_prev = self._bin_key
        # identity (`is`) on a HELD reference, not id(): CPython reuses ids
        # after GC, so a freshly built cloud could alias the freed previous
        # cloud's id and silently keep stale pair membership
        if key != pipe_key or bound_cloud is not cloud:
            return "bin"
        if t_prev != float(time):
            return "time"
        if self._bins is None:
            # time settled after one-shot frames: bin once, replay after
            return "bin"
        moved = not _allclose(pose, self._last_pose, self.move_atol)
        if moved and (now_ms - self._last_bin_ms) >= self.period_ms:
            return "bin"
        return None

    def _oneshot_fns(self, pipe_key, width: int, height: int,
                     compositor: str, bucket: int):
        """Fused single-program render (and its orbit variant) for
        time-driven frames — same settings/budget key as the replay
        pipeline, so images are bit-identical to a fresh bin+replay."""
        fns = self._oneshots.get(pipe_key)
        if fns is None:
            from bevy_gaussian_splatting_tpu.models.camera import (
                orbit_camera_device,
            )
            from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
                render_tiled,
            )

            settings = self.settings
            comp = compositor

            @jax.jit
            def oneshot(cloud, camera, model_transform, background, time):
                return render_tiled(
                    cloud, camera, settings, model_transform, background,
                    time, width=width, height=height, differentiable=False,
                    compositor=comp, pairs_max=bucket,
                )

            @jax.jit
            def oneshot_orbit(cloud, orbit, background, time):
                camera = orbit_camera_device(orbit, width, height)
                return render_tiled(
                    cloud, camera, settings,
                    jnp.eye(4, dtype=jnp.float32), background, time,
                    width=width, height=height, differentiable=False,
                    compositor=comp, pairs_max=bucket,
                )

            fns = (oneshot, oneshot_orbit)
            self._oneshots[pipe_key] = fns
        return fns

    def render(
        self,
        cloud,
        camera: Camera,
        model_transform: Optional[jnp.ndarray] = None,
        background: Optional[jnp.ndarray] = None,
        time: float = 0.0,
        pose_key=None,
    ) -> jnp.ndarray:
        """``pose_key``: any host-side value identifying the camera pose
        (e.g. the viewer's ``(az, el, radius)``) — avoids the per-frame
        device readback of the view matrix that the staleness check
        otherwise needs."""
        import numpy as np
        import time as _time

        if model_transform is None:
            model_transform = self._eye4
        if background is None:
            background = self._bg0
        if pose_key is not None:
            pose_key = np.asarray(pose_key, np.float64).ravel()
        settings = self.settings
        width = int(camera.viewport[2])
        height = int(camera.viewport[3])

        impl = self.impl
        compositor = "xla"
        if impl == "auto":
            from bevy_gaussian_splatting_tpu.ops.rasterize_tile import supports

            impl = "tiled" if supports(settings) else "oracle"
            if impl == "tiled" and jax.default_backend() == "tpu":
                compositor = "pallas"
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import TILE

        if impl != "tiled" or width % TILE or height % TILE:
            # non-tiled impls, and non-16-multiple viewports (e.g. the
            # reference's 1920x1080 — the replay pipelines need the exact
            # tile grid), render through the one-shot path; render_tiled
            # pads the tile grid + crops.  The time argument rides via
            # settings (module render() reads settings.time), and the
            # compositor choice survives as impl='tiled-pallas'.
            st = settings
            if time != getattr(settings, "time", 0.0):
                import dataclasses

                st = dataclasses.replace(settings, time=float(time))
            one_impl = impl
            if impl == "tiled":
                one_impl = (
                    "tiled-pallas" if compositor == "pallas" else "tiled"
                )
            return render(
                cloud, camera, st, model_transform, background,
                impl=one_impl,
            )

        base_key = (
            "interactive", compositor, settings.static_key(), width, height,
            len(cloud), type(cloud).__name__,
        )
        bucket = _current_bucket(
            base_key, settings, width, height, cloud, camera, model_transform
        )
        pipe_key = base_key + (bucket,)
        pipes = self._pipes.get(pipe_key)
        if pipes is None:
            pipes = make_replay_pipeline(
                settings, width, height, compositor, bucket
            )
            self._pipes[pipe_key] = pipes
        bin_fn, replay_fn = pipes[0], pipes[1]

        pose = (
            pose_key if pose_key is not None
            else self._pose(camera, model_transform)
        )
        now_ms = _time.perf_counter() * 1e3
        reason = self._rebin_reason(pipe_key, cloud, time, pose, now_ms)
        if reason == "time":
            # temporal frame: fused one-shot (no blocking bin dispatch, no
            # pair-order cloud gather); bins invalidated so a settled time
            # re-bins once and replays afterwards
            self.stats["oneshots"] += 1
            self._bins = None
            self._bin_key = (pipe_key, cloud, float(time))
            oneshot, _ = self._oneshot_fns(
                pipe_key, width, height, compositor, bucket
            )
            return oneshot(
                cloud, camera, model_transform, background, jnp.float32(time)
            )
        if reason is not None:
            t0 = _time.perf_counter()
            self._bins = jax.block_until_ready(
                bin_fn(cloud, camera, model_transform, jnp.float32(time))
            )
            dur_ms = (_time.perf_counter() - t0) * 1e3
            if pipe_key in self._compiled:
                # reference: period >= max(1000ms, 4x sort duration)
                self.period_ms = max(self.period_floor_ms, 4.0 * dur_ms)
            else:
                self._compiled.add(pipe_key)  # first call timed the compile
                self.period_ms = self.period_floor_ms
            self._bin_key = (pipe_key, cloud, float(time))
            self._last_pose = pose
            self._last_bin_ms = now_ms
            self.stats["bins"] += 1
        else:
            self.stats["replays"] += 1

        return replay_fn(
            cloud, camera, model_transform, background, jnp.float32(time),
            *self._bins,
        )

    def render_orbit(
        self,
        cloud,
        az: float,
        el: float,
        radius: float,
        target=(0.0, 0.0, 0.0),
        width: int = 512,
        height: int = 512,
        background: Optional[jnp.ndarray] = None,
        time: float = 0.0,
    ) -> jnp.ndarray:
        """Orbit-parameterized serving frame: the camera is built ON DEVICE
        from one packed f32[6] upload (az, el, radius, target) — the
        fastest per-frame path (no host camera build, no per-leaf
        transfers, host-side staleness check).  Same throttle semantics as
        :meth:`render`."""
        import numpy as np
        import time as _time

        if background is None:
            background = self._bg0
        settings = self.settings
        # honor self.impl exactly like render(): a non-tiled impl (e.g. the
        # oracle) builds the host camera from the orbit params and delegates
        # to the one-shot path instead of the tiled replay pipeline
        impl = self.impl
        if impl == "auto":
            from bevy_gaussian_splatting_tpu.ops.rasterize_tile import supports

            impl = "tiled" if supports(settings) else "oracle"
        compositor = (
            "pallas" if jax.default_backend() == "tpu" else "xla"
        )
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import TILE

        if impl != "tiled" or width % TILE or height % TILE:
            # non-tiled impls, and non-16-multiple viewports (padded-grid
            # one-shot — see render()): host camera from the orbit params,
            # time rides via settings, pallas survives as 'tiled-pallas'
            import math

            eye = (
                target[0] + radius * math.cos(el) * math.sin(az),
                target[1] + radius * math.sin(el),
                target[2] + radius * math.cos(el) * math.cos(az),
            )
            camera = Camera.create(
                eye=eye, target=tuple(target), width=width, height=height
            )
            st = settings
            if time != getattr(settings, "time", 0.0):
                import dataclasses

                st = dataclasses.replace(settings, time=float(time))
            one_impl = impl
            if impl == "tiled":
                one_impl = (
                    "tiled-pallas" if compositor == "pallas" else "tiled"
                )
            return render(
                cloud, camera, st, self._eye4, background, impl=one_impl
            )
        base_key = (
            "interactive", compositor, settings.static_key(), width, height,
            len(cloud), type(cloud).__name__,
        )
        orbit_np = np.asarray(
            [az, el, radius, *target], np.float32
        )
        orbit = jnp.asarray(orbit_np)
        # budget sizing reuses the camera-based counter via a host camera
        # only on recount frames (cheap: one build per _RECOUNT_PERIOD)
        state = _BUDGET_STATE.get(base_key)
        if state is not None and (state[1] + 1) % _RECOUNT_PERIOD:
            bucket = state[0]
            _BUDGET_STATE[base_key] = (bucket, state[1] + 1)
        else:
            camera = Camera.create(
                eye=tuple(orbit_np[3:6] + radius * np.array([
                    np.cos(el) * np.sin(az), np.sin(el),
                    np.cos(el) * np.cos(az),
                ], np.float32)),
                target=tuple(target), width=width, height=height,
            )
            bucket = _current_bucket(
                base_key, settings, width, height, cloud, camera, self._eye4
            )
        pipe_key = base_key + (bucket,)
        pipes = self._pipes.get(pipe_key)
        if pipes is None:
            pipes = make_replay_pipeline(
                settings, width, height, compositor, bucket
            )
            self._pipes[pipe_key] = pipes
        _, _, bin_orbit_fn, replay_orbit_fn = pipes

        pose = np.asarray([az, el, radius, *target, time], np.float64)
        now_ms = _time.perf_counter() * 1e3
        reason = self._rebin_reason(pipe_key, cloud, time, pose, now_ms)
        if reason == "time":
            self.stats["oneshots"] += 1
            self._bins = None
            self._bin_key = (pipe_key, cloud, float(time))
            _, oneshot_orbit = self._oneshot_fns(
                pipe_key, width, height, compositor, bucket
            )
            return oneshot_orbit(cloud, orbit, background, jnp.float32(time))
        if reason is not None:
            t0 = _time.perf_counter()
            self._bins = jax.block_until_ready(
                bin_orbit_fn(cloud, orbit, jnp.float32(time))
            )
            dur_ms = (_time.perf_counter() - t0) * 1e3
            if pipe_key in self._compiled:
                self.period_ms = max(self.period_floor_ms, 4.0 * dur_ms)
            else:
                self._compiled.add(pipe_key)
                self.period_ms = self.period_floor_ms
            self._bin_key = (pipe_key, cloud, float(time))
            self._last_pose = pose
            self._last_bin_ms = now_ms
            self.stats["bins"] += 1
        else:
            self.stats["replays"] += 1

        return replay_orbit_fn(
            cloud, orbit, background, jnp.float32(time), *self._bins
        )


def _allclose(a, b, atol):
    import numpy as np

    # pose keys from different entry points (render's view-matrix pose vs
    # render_orbit's packed orbit params) have different shapes: treat a
    # shape change as "moved" instead of crashing the staleness check
    if b is None or np.shape(a) != np.shape(b):
        return False
    return np.allclose(a, b, atol=atol)


def render(
    cloud,
    camera: Camera,
    settings: Optional[CloudSettings] = None,
    model_transform: Optional[jnp.ndarray] = None,
    background: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    adaptive_budget: bool = True,
) -> jnp.ndarray:
    """Render one cloud -> [H, W, 4] linear premultiplied RGBA.

    ``impl='auto'`` selects the tiled renderer with the Pallas compositor on
    TPU (XLA compositor elsewhere); ``adaptive_budget`` sizes the pair buffers
    to a measured per-scene pair count (recompiling only on bucket growth)."""
    if settings is None:
        settings = CloudSettings()
    if model_transform is None:
        model_transform = jnp.eye(4, dtype=jnp.float32)
    if background is None:
        background = jnp.zeros((4,), jnp.float32)

    width = int(camera.viewport[2])
    height = int(camera.viewport[3])

    compositor = "xla"
    if impl == "auto":
        try:
            from bevy_gaussian_splatting_tpu.ops.rasterize_tile import supports

            impl = "tiled" if supports(settings) else "oracle"
        except ImportError:
            impl = "oracle"
        if impl == "tiled" and jax.default_backend() == "tpu":
            compositor = "pallas"
    elif impl == "tiled-pallas":
        impl, compositor = "tiled", "pallas"

    base_key = (
        impl, compositor, settings.static_key(), width, height, len(cloud),
        type(cloud).__name__,
    )
    bucket = None
    if impl == "tiled" and adaptive_budget:
        bucket = _current_bucket(
            base_key, settings, width, height, cloud, camera, model_transform
        )
    key = base_key + (bucket,)
    pipe = _PIPELINE_CACHE.get(key)
    if pipe is None:
        if impl == "tiled":
            from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
                make_tiled_pipeline,
            )

            pipe = make_tiled_pipeline(
                settings, width, height, compositor=compositor, pairs_max=bucket
            )
        else:
            pipe = _oracle_pipeline(settings, width, height)
        _PIPELINE_CACHE[key] = pipe

    return pipe(cloud, camera, model_transform, background, jnp.float32(settings.time))
