"""Multi-host backend: bounded band exchange (parity, gradients, volume
accounting) and the multi-process jax.distributed dry run.

Reference has no distributed layer (SURVEY.md §2.9) — these targets come from
BASELINE.json's multi-host scaling requirement."""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.parallel.exchange import (
    band_pair_count,
    band_pairs_budget,
    exchange_bytes_per_device,
)
from bevy_gaussian_splatting_tpu.parallel.render import (
    make_mesh,
    make_sharded_render,
    make_train_step,
    shard_cloud,
)


def _np(x):
    return np.asarray(x)


def _scene(n=512, seed=0, spread=1.0):
    import dataclasses

    c = bgs.random_gaussians_3d_seeded(n, seed=seed)
    so = _np(c.scale_opacity).copy()
    so[:, :3] = np.abs(so[:, :3]) * 0.3 + 0.1
    so[:, 3] = np.clip(np.abs(so[:, 3]), 0.2, 0.9)
    pos = _np(c.position_visibility).copy()
    pos[:, :3] *= spread
    return dataclasses.replace(
        c,
        scale_opacity=jnp.asarray(so),
        position_visibility=jnp.asarray(pos),
    )


WIDTH, HEIGHT = 64, 128


class TestBoundedExchange:
    def _setup(self):
        mesh = make_mesh(8)
        cloud = _scene()
        sharded = shard_cloud(cloud, mesh)
        camera = bgs.Camera.create(
            eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0),
            width=WIDTH, height=HEIGHT,
        )
        return mesh, sharded, camera

    def test_forward_parity_vs_allgather(self):
        mesh, sharded, camera = self._setup()
        settings = bgs.CloudSettings()
        full = make_sharded_render(mesh, settings, WIDTH, HEIGHT)(sharded, camera)
        bounded = make_sharded_render(
            mesh, settings, WIDTH, HEIGHT, exchange="bounded"
        )(sharded, camera)
        np.testing.assert_array_equal(_np(bounded), _np(full))

    def test_forward_parity_obb_and_2d(self):
        # OBB lowers identically in both graphs (bit-exact); the 2DGS surfel
        # homography picks up 1-2 ulp fma/reassociation differences under the
        # exchange's different fusion context — pair sets and tile lists are
        # identical (verified by construction: the received rows are the
        # band-window's own membership in global-index order)
        mesh, sharded, camera = self._setup()
        for settings, exact in (
            (bgs.CloudSettings(aabb=False), True),
            (bgs.CloudSettings(gaussian_mode=bgs.GaussianMode.GAUSSIAN_2D), False),
        ):
            full = make_sharded_render(mesh, settings, WIDTH, HEIGHT)(
                sharded, camera
            )
            bounded = make_sharded_render(
                mesh, settings, WIDTH, HEIGHT, exchange="bounded"
            )(sharded, camera)
            if exact:
                np.testing.assert_array_equal(_np(bounded), _np(full))
            else:
                np.testing.assert_allclose(_np(bounded), _np(full), atol=2e-5)

    def test_gradient_parity_vs_allgather(self):
        mesh, sharded, camera = self._setup()
        settings = bgs.CloudSettings()
        target = make_sharded_render(mesh, settings, WIDTH, HEIGHT)(
            sharded, camera
        )
        results = {}
        for exchange in ("allgather", "bounded"):
            step, init = make_train_step(
                mesh, settings, WIDTH, HEIGHT, learning_rate=1e-2,
                exchange=exchange,
            )
            new_cloud, _, loss = step(sharded, init(sharded), camera, target)
            results[exchange] = (new_cloud, float(loss))
        np.testing.assert_allclose(
            results["allgather"][1], results["bounded"][1], rtol=1e-6
        )
        import dataclasses

        for f in dataclasses.fields(results["allgather"][0]):
            np.testing.assert_allclose(
                _np(getattr(results["allgather"][0], f.name)),
                _np(getattr(results["bounded"][0], f.name)),
                atol=1e-6, err_msg=f.name,
            )

    def test_truncating_budget_still_renders(self):
        mesh, sharded, camera = self._setup()
        settings = bgs.CloudSettings()
        img = make_sharded_render(
            mesh, settings, WIDTH, HEIGHT, exchange="bounded", band_budget=8
        )(sharded, camera)
        a = _np(img)
        assert np.isfinite(a).all()

    def test_volume_scales_with_coverage_not_n(self):
        """The bounded exchange's received bytes are set by the rows that
        actually intersect bands (coverage); the all-gather's by N.  Doubling
        N with the extra gaussians off-screen doubles all-gather volume but
        leaves the bounded budget unchanged."""
        import dataclasses

        from bevy_gaussian_splatting_tpu.ops.project import project_gaussians
        from bevy_gaussian_splatting_tpu.ops import sort as sort_ops
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import tile_row_range

        settings = bgs.CloudSettings()
        camera = bgs.Camera.create(
            eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0),
            width=WIDTH, height=HEIGHT,
        )

        def measured_budget(cloud):
            """Exact max per-(source, band) row count -> headroom budget."""
            splats = project_gaussians(cloud, camera, settings)
            key = sort_ops.radix_depth_key(
                cloud.position, jnp.eye(4),
                camera.clip_from_view @ camera.view_from_world,
                camera.world_position, 32,
            )
            splats["mask"] = splats["mask"] & (key != sort_ops.SENTINEL_KEY)
            ty0, ty1, active = tile_row_range(splats, settings, WIDTH, HEIGHT)
            rows_per_band = (HEIGHT // 16) // 8
            b0 = _np(ty0) // rows_per_band
            b1 = _np(ty1) // rows_per_band
            act = _np(active)
            n_local = len(act) // 8
            worst = 0
            for src in range(8):
                sl = slice(src * n_local, (src + 1) * n_local)
                for d in range(8):
                    cnt = int((act[sl] & (b0[sl] <= d) & (b1[sl] >= d)).sum())
                    worst = max(worst, cnt)
            return band_pairs_budget(n_local, hint=worst)

        n = 8192
        small = _scene(n)
        # same visible content + n far-off-screen gaussians, INTERLEAVED so
        # every source shard keeps the same visible row count (budget sizing
        # is per-source; concentrating visibles would be a genuine skew)
        big_pv = _np(small.position_visibility).copy()
        extra = big_pv.copy()
        extra[:, 0] += 1e6  # far outside the frustum

        def interleave(a, b):
            out = np.empty((2 * n,) + a.shape[1:], a.dtype)
            out[0::2] = a
            out[1::2] = b
            return jnp.asarray(out)

        double = dataclasses.replace(
            small,
            position_visibility=interleave(big_pv, extra),
            spherical_harmonic=interleave(
                _np(small.spherical_harmonic), _np(small.spherical_harmonic)
            ),
            rotation=interleave(_np(small.rotation), _np(small.rotation)),
            scale_opacity=interleave(
                _np(small.scale_opacity), _np(small.scale_opacity)
            ),
        )
        b_small = measured_budget(small)
        b_double = measured_budget(double)
        cols = 14
        v_small = exchange_bytes_per_device(n, 8, cols, b_small)
        v_double = exchange_bytes_per_device(2 * n, 8, cols, b_double)
        # all-gather volume doubles with N...
        assert v_double["allgather"] == 2 * v_small["allgather"]
        # ...the bounded exchange volume tracks coverage (same visible set)
        assert v_double["bounded"] <= v_small["bounded"] * 1.5
        # and is far below replication for band-local content
        assert v_small["bounded"] < v_small["allgather"]


class TestExchangeSemantics:
    """Unit-level oracle for band_exchange's documented delivery semantics,
    including segments near the END of the pair buffer (the old per-
    destination ``dynamic_slice`` assembly start-CLAMPED there, shipping
    earlier segments' rows marked valid — advisor round-2 high finding) and
    truncation at both the pair cap and the per-destination budget."""

    S = 8  # devices = bands

    def _oracle(self, payloads, b0s, b1s, acts, budget):
        """received[d] plus the delivery map {(s, i): [(d, flat_row)]}."""
        S = self.S
        n_local, cols = payloads[0].shape
        p_band = band_pairs_budget(n_local)
        received = [np.zeros((S * budget, cols), np.float32) for _ in range(S)]
        deliveries = {}
        for s in range(S):
            pairs = []  # born index-major, band inner
            for i in range(n_local):
                if acts[s][i]:
                    for d in range(int(b0s[s][i]), int(b1s[s][i]) + 1):
                        pairs.append((i, d))
            pairs = pairs[:p_band]  # pair-cap truncation (highest-index drop)
            per_dest = [[] for _ in range(S)]
            for i, d in pairs:  # stable by dest, index order kept within
                per_dest[d].append(i)
            for d in range(S):
                for j, i in enumerate(per_dest[d][:budget]):
                    received[d][s * budget + j] = payloads[s][i]
                    deliveries.setdefault((s, i), []).append(
                        (d, s * budget + j)
                    )
        return received, deliveries

    def _run(self, payloads, b0s, b1s, acts, budget):
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        from bevy_gaussian_splatting_tpu.parallel.exchange import band_exchange

        S = self.S
        mesh = Mesh(np.asarray(jax.devices())[:S], ("x",))

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P("x"), P("x"), P("x"), P("x")),
            out_specs=P("x"), check_vma=False,
        )
        def body(payload, b0, b1, active):
            return band_exchange(payload, b0, b1, active, S, budget, "x")

        return body(
            jnp.concatenate([jnp.asarray(p) for p in payloads]),
            jnp.concatenate([jnp.asarray(b) for b in b0s]),
            jnp.concatenate([jnp.asarray(b) for b in b1s]),
            jnp.concatenate([jnp.asarray(a) for a in acts]),
        )

    def _case_near_capacity(self):
        """Every splat spans all 8 bands: total pairs 8*n_local > p_band, so
        late destinations' segments end AT the buffer end — the clamp-bug
        regime — and the pair cap truncates globally."""
        rng = np.random.default_rng(7)
        S, n_local, cols = self.S, 40, 5
        payloads = [
            rng.standard_normal((n_local, cols)).astype(np.float32)
            for _ in range(S)
        ]
        b0s = [np.zeros(n_local, np.int32) for _ in range(S)]
        b1s = [np.full(n_local, S - 1, np.int32) for _ in range(S)]
        acts = [np.ones(n_local, bool) for _ in range(S)]
        acts[3][::5] = False  # some inactive rows on one source
        return payloads, b0s, b1s, acts, 24  # budget < 32 rows/dest: truncates

    def _case_random(self):
        rng = np.random.default_rng(11)
        S, n_local, cols = self.S, 64, 6
        payloads = [
            rng.standard_normal((n_local, cols)).astype(np.float32)
            for _ in range(S)
        ]
        b0s, b1s, acts = [], [], []
        for _ in range(S):
            b0 = rng.integers(0, S, n_local).astype(np.int32)
            span = rng.integers(0, 3, n_local).astype(np.int32)
            b0s.append(b0)
            b1s.append(np.minimum(b0 + span, S - 1).astype(np.int32))
            acts.append(rng.random(n_local) < 0.8)
        return payloads, b0s, b1s, acts, 64

    def test_forward_matches_oracle(self):
        for case in (self._case_near_capacity, self._case_random):
            payloads, b0s, b1s, acts, budget = case()
            want, _ = self._oracle(payloads, b0s, b1s, acts, budget)
            got = _np(self._run(payloads, b0s, b1s, acts, budget))
            got = got.reshape(self.S, self.S * budget, payloads[0].shape[1])
            for d in range(self.S):
                np.testing.assert_array_equal(
                    got[d], want[d], err_msg=f"dest {d} ({case.__name__})"
                )

    def test_nan_bit_patterns_survive(self):
        """Payload columns carrying bitcast sort keys must pass through
        bit-exactly even when the pattern is a NaN encoding (the old mask
        MULTIPLY canonicalized them)."""
        payloads, b0s, b1s, acts, budget = self._case_random()
        nan_bits = np.uint32(0x7FC00123)
        for p in payloads:
            p[:, 2] = np.frombuffer(
                np.full(p.shape[0], nan_bits, np.uint32).tobytes(), np.float32
            )
        want, _ = self._oracle(payloads, b0s, b1s, acts, budget)
        got = _np(self._run(payloads, b0s, b1s, acts, budget))
        got = got.reshape(self.S, self.S * budget, payloads[0].shape[1])
        for d in range(self.S):
            np.testing.assert_array_equal(
                got[d].view(np.uint32), want[d].view(np.uint32),
                err_msg=f"dest {d}",
            )

    def test_gradient_matches_delivery_map(self):
        """d(loss)/d(payload[s, i]) must sum W over exactly the delivered
        copies of row (s, i) — dropped (truncated) copies contribute zero."""
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        from bevy_gaussian_splatting_tpu.parallel.exchange import band_exchange

        payloads, b0s, b1s, acts, budget = self._case_near_capacity()
        S = self.S
        n_local, cols = payloads[0].shape
        rng = np.random.default_rng(3)
        W = rng.standard_normal((S, S * budget, cols)).astype(np.float32)
        mesh = Mesh(np.asarray(jax.devices())[:S], ("x",))

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P("x"), P("x"), P("x"), P("x"), P("x")),
            out_specs=P(), check_vma=False,
        )
        def loss_body(payload, b0, b1, active, w):
            received = band_exchange(payload, b0, b1, active, S, budget, "x")
            return jax.lax.psum(jnp.sum(received * w[0]), "x")

        def loss(payload_global):
            return loss_body(
                payload_global,
                jnp.concatenate([jnp.asarray(b) for b in b0s]),
                jnp.concatenate([jnp.asarray(b) for b in b1s]),
                jnp.concatenate([jnp.asarray(a) for a in acts]),
                jnp.asarray(W),
            )

        g = _np(jax.grad(loss)(
            jnp.concatenate([jnp.asarray(p) for p in payloads])
        ))
        _, deliveries = self._oracle(payloads, b0s, b1s, acts, budget)
        want = np.zeros((S * n_local, cols), np.float32)
        for (s, i), sites in deliveries.items():
            for d, row in sites:
                want[s * n_local + i] += W[d, row]
        np.testing.assert_allclose(g, want, atol=1e-5)


class TestAutoExchangePlan:
    def test_bounded_means_bounded(self):
        """plan_exchange must only pick "bounded" when each device receives
        fewer rows than the all-gather, and the chosen budget must not
        truncate (render parity with all-gather)."""
        from bevy_gaussian_splatting_tpu.parallel.render import plan_exchange

        mesh = make_mesh(8)
        cloud = _scene()
        camera = bgs.Camera.create(
            eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0),
            width=WIDTH, height=HEIGHT,
        )
        settings = bgs.CloudSettings()
        mode, budget = plan_exchange(
            cloud, camera, settings, WIDTH, HEIGHT, mesh
        )
        n_total = cloud.pad(multiple=256).position.shape[0]
        if mode == "bounded":
            assert 8 * budget < n_total, (budget, n_total)
        sharded = shard_cloud(cloud, mesh)
        full = make_sharded_render(mesh, settings, WIDTH, HEIGHT)(
            sharded, camera
        )
        auto = make_sharded_render(
            mesh, settings, WIDTH, HEIGHT, exchange=mode, band_budget=budget
        )(sharded, camera)
        np.testing.assert_array_equal(_np(auto), _np(full))


class TestMultiProcess:
    def test_spawned_multihost_dryrun(self):
        """2 local processes x 2 CPU devices coordinate via jax.distributed
        and run one camera-parallel x pixel-parallel training step on the
        hybrid (camera=DCN, tiles=ICI) mesh — with the bounded exchange."""
        from bevy_gaussian_splatting_tpu.parallel.distributed import (
            spawn_multihost_dryrun,
        )

        msg = spawn_multihost_dryrun(
            num_processes=2, devices_per_process=2, exchange="bounded"
        )
        assert "multihost dryrun OK" in msg
        assert "'camera': 2" in msg and "'tiles': 2" in msg


class TestHybridMeshLayout:
    def test_single_process_mesh(self):
        from bevy_gaussian_splatting_tpu.parallel.distributed import (
            make_multihost_mesh,
        )

        mesh = make_multihost_mesh(camera_parallel=2)  # 1 process, 8 devices
        assert mesh.shape["camera"] == 2 and mesh.shape["tiles"] == 4
        # tiles rows are contiguous device ids (process-local / ICI ordering)
        ids = np.vectorize(lambda d: d.id)(np.asarray(mesh.devices))
        for row in ids:
            assert list(row) == sorted(row)


class TestScalingProxy:
    def test_model_prefers_bounded_volume(self):
        from bevy_gaussian_splatting_tpu.parallel.scaling import (
            exchange_time_s,
            modeled_efficiency,
        )

        n, bands, cols = 1_000_000, 8, 14
        t_all = exchange_time_s(n, bands, cols)  # all-gather volume
        t_bounded = exchange_time_s(n, bands, cols, budget=20_000)
        assert t_bounded < t_all
        eff_all = modeled_efficiency(0.0426, n, bands, cols)
        eff_bounded = modeled_efficiency(0.0426, n, bands, cols, budget=20_000)
        assert 0.0 < eff_all < eff_bounded <= 1.0
        # work inflation must reduce efficiency
        assert modeled_efficiency(
            0.0426, n, bands, cols, budget=20_000, work_ratio=1.5
        ) < eff_bounded

    def test_train_comm_volume_accounting(self):
        """Exact byte accounting for the training-step model (VERDICT r4 #4):
        ICI = 2x the forward exchange (bwd transpose volume == fwd volume);
        DCN = ring all-reduce of the per-chip cloud shard across camera
        rows."""
        from bevy_gaussian_splatting_tpu.parallel.exchange import (
            exchange_bytes_per_device,
        )
        from bevy_gaussian_splatting_tpu.parallel.scaling import (
            train_comm_bytes_per_chip,
        )

        n, bands, cols = 1_000_000, 4, 14
        # one band per camera row: no splat exchange exists at all
        v1 = train_comm_bytes_per_chip(n, 1, cols, n_camera=2)
        assert v1["ici"] == 0.0 and v1["dcn"] > 0.0
        # single host: no DCN traffic; ICI doubles the fwd exchange exactly
        v = train_comm_bytes_per_chip(n, bands, cols)
        assert v["dcn"] == 0.0
        assert v["ici"] == 2 * exchange_bytes_per_device(n, bands, cols)[
            "allgather"
        ]
        # bounded exchange: same doubling on the bounded volume
        vb = train_comm_bytes_per_chip(n, bands, cols, budget=50_000)
        assert vb["ici"] == 2 * exchange_bytes_per_device(
            n, bands, cols, 50_000
        )["bounded"]
        # 2 camera rows: ring all-reduce receives 2*(r-1)/r of the shard
        v2 = train_comm_bytes_per_chip(n, bands, cols, n_camera=2,
                                       cloud_cols=60)
        shard = (n // bands) * 60 * 4
        assert v2["cloud_shard_bytes"] == shard
        assert v2["dcn"] == 2 * (2 - 1) / 2 * shard
        # 4 camera rows receive more than 2 (ring factor grows)
        v4 = train_comm_bytes_per_chip(n, bands, cols, n_camera=4,
                                       cloud_cols=60)
        assert v4["dcn"] > v2["dcn"]

    def test_modeled_efficiency_train(self):
        """The 2-host DCN number must be <= the single-host ICI number, the
        overlap bound must be >= the no-overlap value, and perfect inputs
        (no comm, ratio 1) must give eff ~ 1."""
        from bevy_gaussian_splatting_tpu.parallel.scaling import (
            modeled_efficiency_train,
        )

        t1, n = 0.0994, 1_000_000
        eff_ici = modeled_efficiency_train(t1, n, 1, 8, budget=250_000)
        eff_dcn = modeled_efficiency_train(t1, n, 2, 4, budget=250_000)
        eff_dcn_ov = modeled_efficiency_train(
            t1, n, 2, 4, budget=250_000, overlap_dcn=True
        )
        assert 0.0 < eff_dcn < eff_ici <= 1.0
        assert eff_dcn < eff_dcn_ov <= 1.0
        # work inflation reduces efficiency
        assert modeled_efficiency_train(
            t1, n, 1, 8, budget=250_000, work_ratio=1.5
        ) < eff_ici
        # zero-bandwidth-cost limit: eff -> 1 (free comm fabric)
        free = dict(ici_bytes_per_s=1e30, dcn_bytes_per_s=1e30, launch_s=0.0)
        assert abs(modeled_efficiency_train(
            t1, n, 2, 4, params=free
        ) - 1.0) < 1e-9

    def test_serialized_median_discards_cold_first_run(self):
        """Protocol (VERDICT r4 #5): median of the post-warmup runs with
        dispersion — the first pinned-core subprocess run is a cold outlier
        (measured 0.852 vs 1.051/1.072 steady-state at 1M/8)."""
        from unittest import mock

        from bevy_gaussian_splatting_tpu.parallel import scaling

        seq = iter([
            {"work_ratio": 0.852, "exchange": "bounded", "band_pairs": 1},
            {"work_ratio": 1.072, "exchange": "bounded", "band_pairs": 1},
            {"work_ratio": 1.051, "exchange": "bounded", "band_pairs": 1},
            {"work_ratio": 1.060, "exchange": "bounded", "band_pairs": 1},
        ])
        with mock.patch.object(
            scaling, "serialized_work_ratio", lambda *a, **k: next(seq)
        ):
            out = scaling.serialized_work_ratio_median(8, 1000, runs=4)
        # cold 0.852 discarded; median of [1.051, 1.060, 1.072] = 1.060
        assert out["work_ratio"] == 1.060
        assert out["work_ratio_runs"] == [1.051, 1.06, 1.072]
        assert out["work_ratio_spread"] < 0.03

    def test_measured_work_ratio_runs(self):
        import bevy_gaussian_splatting_tpu as bgs
        from bevy_gaussian_splatting_tpu.parallel.scaling import (
            measured_work_ratio,
        )

        cloud = _scene(256)
        camera = bgs.Camera.create(
            eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0),
            width=WIDTH, height=HEIGHT,
        )
        out = measured_work_ratio(
            cloud, camera, bgs.CloudSettings(), WIDTH, HEIGHT, 8, iters=1
        )
        assert out["work_ratio"] > 0.0 and np.isfinite(out["work_ratio"])

    def test_plan_exchange_with_pairs_bounds_band_budget(self):
        """with_pairs returns a worst-band pair count that (a) is positive
        for a visible scene, (b) bounds every band's true binned pair count
        so a pairs_hint-budgeted band render is exact (matches the full
        render bit-for-bit)."""
        import bevy_gaussian_splatting_tpu as bgs
        from bevy_gaussian_splatting_tpu.parallel.render import (
            make_mesh,
            make_sharded_render,
            plan_exchange,
            shard_cloud,
        )

        cloud = _scene(2048)
        camera = bgs.Camera.create(
            eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0),
            width=WIDTH, height=HEIGHT,
        )
        settings = bgs.CloudSettings()
        mesh = make_mesh(4)
        mode, budget, band_pairs = plan_exchange(
            cloud, camera, settings, WIDTH, HEIGHT, mesh, with_pairs=True
        )
        assert band_pairs > 0
        sharded = shard_cloud(cloud, mesh)
        full = make_sharded_render(mesh, settings, WIDTH, HEIGHT)(
            sharded, camera
        )
        hinted = make_sharded_render(
            mesh, settings, WIDTH, HEIGHT,
            exchange=mode, band_budget=budget if mode == "bounded" else None,
            pairs_hint=band_pairs,
        )(sharded, camera)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(hinted))
