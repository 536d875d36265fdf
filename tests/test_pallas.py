"""Pallas kernel tests (interpret mode on CPU; compiled parity runs on TPU).

Forward parity vs the XLA compositor and oracle, and the hand-derived
backward kernel vs XLA AD gradients.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.ops.rasterize_ref import render_oracle
from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled


def _np(x):
    return np.asarray(x)


CAM = bgs.Camera.create(eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0), width=128, height=128)
CLOUD = bgs.random_gaussians_3d_seeded(400, seed=1)


class TestPallasForward:
    def _parity(self, settings, atol=2e-5, **kw):
        a = _np(render_oracle(CLOUD, CAM, settings, **kw))
        b = _np(render_tiled(CLOUD, CAM, settings, compositor="pallas", **kw))
        np.testing.assert_allclose(b, a, atol=atol)

    def test_obb(self):
        self._parity(bgs.CloudSettings())

    def test_aabb(self):
        self._parity(bgs.CloudSettings(aabb=True))

    def test_background(self):
        self._parity(bgs.CloudSettings(), background=jnp.array([0.2, 0.1, 0.4, 1.0]))

    def test_4d(self):
        c4 = bgs.random_gaussians_4d_seeded(80, seed=2)
        cam = bgs.Camera.create(eye=(0, 0, 60.0), target=(0, 0, 0), width=64, height=64)
        s = bgs.CloudSettings(gaussian_mode=bgs.GaussianMode.GAUSSIAN_4D, time=0.5)
        a = _np(render_oracle(c4, cam, s))
        b = _np(render_tiled(c4, cam, s, compositor="pallas"))
        np.testing.assert_allclose(b, a, atol=2e-5)

    def test_2dgs_surfel(self):
        # 1e-4: shared folded surfel coefficients, fma-contraction ulps near
        # the pz ~ 0 singularity (see tests/test_tiled.py::test_2dgs)
        s = bgs.CloudSettings(gaussian_mode=bgs.GaussianMode.GAUSSIAN_2D)
        self._parity(s, atol=1e-4)

    def test_bbox_visualization(self):
        self._parity(bgs.CloudSettings(visualize_bounding_box=True))

    def test_bbox_visualization_aabb(self):
        self._parity(bgs.CloudSettings(aabb=True, visualize_bounding_box=True))

    def test_2dgs_bbox(self):
        s = bgs.CloudSettings(
            gaussian_mode=bgs.GaussianMode.GAUSSIAN_2D, visualize_bounding_box=True
        )
        self._parity(s)

    def test_heavy_occlusion_early_exit(self):
        # many opaque overlapping splats: exercises the transmittance early
        # exit; result must still match the oracle
        cloud = bgs.random_gaussians_3d_seeded(500, seed=4)
        cloud = dataclasses.replace(
            cloud,
            position_visibility=cloud.position_visibility * jnp.array([0.05, 0.05, 0.2, 1.0]),
            scale_opacity=cloud.scale_opacity * jnp.array([2.0, 2.0, 2.0, 1.0])
            + jnp.array([0.0, 0.0, 0.0, 0.6]),
        )
        s = bgs.CloudSettings()
        a = _np(render_oracle(cloud, CAM, s))
        b = _np(render_tiled(cloud, CAM, s, compositor="pallas"))
        np.testing.assert_allclose(b, a, atol=3e-5)


class TestPallasBackward:
    def _grad_parity(self, settings, rel_tol=3e-3):
        cloud = dataclasses.replace(
            CLOUD, scale_opacity=CLOUD.scale_opacity * jnp.array([1.0, 2.0, 0.5, 1.0])
        )
        cam = bgs.Camera.create(eye=(0, 0, 60.0), target=(0, 0, 0), width=64, height=64)
        target = render_tiled(cloud, cam, settings) * 0.9

        def loss_xla(c):
            img = render_tiled(c, cam, settings, differentiable=True)
            return jnp.mean((img - target) ** 2)

        def loss_pal(c):
            img = render_tiled(
                c, cam, settings, differentiable=True, compositor="pallas"
            )
            return jnp.mean((img - target) ** 2)

        np.testing.assert_allclose(
            float(loss_pal(cloud)), float(loss_xla(cloud)), rtol=1e-5
        )
        ga = jax.grad(loss_xla)(cloud)
        gb = jax.grad(loss_pal)(cloud)
        for f in ("position_visibility", "spherical_harmonic", "rotation", "scale_opacity"):
            a, b = _np(getattr(ga, f)), _np(getattr(gb, f))
            assert np.isfinite(b).all(), f
            scale = np.abs(a).max() + 1e-12
            np.testing.assert_allclose(b, a, atol=rel_tol * scale, err_msg=f)

    def test_grads_aabb(self):
        self._grad_parity(bgs.CloudSettings(aabb=True))

    def test_grads_obb(self):
        self._grad_parity(bgs.CloudSettings())

    def test_grads_2dgs(self):
        # surfel homography chain (cross-product transpose, min-branch select)
        self._grad_parity(
            bgs.CloudSettings(gaussian_mode=bgs.GaussianMode.GAUSSIAN_2D)
        )

    def test_grads_with_background(self):
        cloud = bgs.random_gaussians_3d_seeded(100, seed=6)
        cam = bgs.Camera.create(eye=(0, 0, 60.0), target=(0, 0, 0), width=64, height=64)
        settings = bgs.CloudSettings()
        bg = jnp.array([0.3, 0.2, 0.1, 1.0])
        target = render_tiled(cloud, cam, settings, background=bg) * 0.8

        def loss(c, compositor):
            img = render_tiled(
                c, cam, settings, background=bg, differentiable=True,
                compositor=compositor,
            )
            return jnp.mean((img - target) ** 2)

        ga = jax.grad(lambda c: loss(c, "xla"))(cloud)
        gb = jax.grad(lambda c: loss(c, "pallas"))(cloud)
        a, b = _np(ga.position_visibility), _np(gb.position_visibility)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=3e-3 * scale)


class TestPallasExpansion:
    """Direct parity of the Pallas pair-expansion kernel vs the XLA path."""

    def _compare(self, cloud, p_max, settings=None, width=128, height=128):
        from bevy_gaussian_splatting_tpu.ops import sort as sort_ops
        from bevy_gaussian_splatting_tpu.ops.project import project_gaussians
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import bin_gaussians

        settings = settings or bgs.CloudSettings()
        cam = CAM
        mt = jnp.eye(4, dtype=jnp.float32)
        clip_from_world = cam.clip_from_view @ cam.view_from_world
        splats = project_gaussians(cloud, cam, settings, mt)
        back_key = sort_ops.radix_depth_key(
            cloud.position, mt, clip_from_world, cam.world_position,
            settings.radix_sort_depth_bits.bits,
        )
        splats["sort_key"] = back_key
        splats["mask"] = splats["mask"] & (back_key != sort_ops.SENTINEL_KEY)

        ref = bin_gaussians(
            splats, settings, width, height, p_max, with_inverse=True,
            expand="xla",
        )
        got = bin_gaussians(
            splats, settings, width, height, p_max, with_inverse=True,
            expand="pallas", interpret=True,
        )
        # xla: (g_s, tile_s, valid_s, total, inv_pair, gidx, off, cnt)
        # pallas: (g_s, tile_s, valid_s, total, gidx_s, table, g0s, rank)
        assert int(ref[3]) == int(got[3])
        nv = int(np.minimum(int(ref[3]), p_max))
        for i, name in ((0, "g_s"), (1, "tile_s"), (2, "valid_s")):
            np.testing.assert_array_equal(
                _np(ref[i])[:nv], _np(got[i])[:nv], err_msg=name
            )
        # gidx_s contract (core.get_train_core_windowed): a STABLE sort keyed
        # on the carried depth-rank owner recovers expansion-slot order, so
        # the pair landing at slot k must be the xla path's inv_pair[k]
        # (= sorted position of slot k).  Invalid pairs key to the sentinel n
        # exactly like core_bwd's sort_key.
        n = _np(got[7]).shape[0]
        sort_key = np.where(
            _np(got[2]).astype(bool), _np(got[4]), np.int64(n)
        )
        slot_to_pos = np.argsort(sort_key, kind="stable")
        np.testing.assert_array_equal(
            slot_to_pos[:nv], _np(ref[4])[:nv], err_msg="gidx_s"
        )
        # pallas windowed-reduction artifacts vs the xla ground truth:
        # summing one-hot rows through (table, g0s, rank) must reproduce the
        # xla path's per-cloud pair counts
        from bevy_gaussian_splatting_tpu.ops.pallas.reduce import (
            pallas_segment_reduce,
        )

        # reduce slot-ordered indicator rows exactly like core_bwd reduces
        # slot-ordered gradient rows: carry them through the rank-keyed sort
        ones_slot = _np(got[2]).astype(np.float32)[slot_to_pos]
        dslot_t = jnp.asarray(
            np.broadcast_to(ones_slot, (8, len(ones_slot))).copy()
        )
        per_rank = pallas_segment_reduce(
            dslot_t, got[5], got[6], n, interpret=True
        )
        per_cloud = np.asarray(per_rank.T[got[7]][:, 0]).astype(np.int64)
        expected = np.bincount(
            _np(got[0])[:nv].astype(np.int64), minlength=n
        )
        np.testing.assert_array_equal(per_cloud, expected, err_msg="cnt")

    def test_parity_basic(self):
        self._compare(CLOUD, p_max=1 << 13)

    def test_gather_col_splits_exact(self):
        # the >64 MiB split path never triggers at CPU-test sizes; force it
        # by shrinking the cliff constant and assert piecewise == monolithic
        from bevy_gaussian_splatting_tpu.ops.pallas import core as pc

        rng = np.random.default_rng(5)
        table = jnp.asarray(rng.standard_normal((4096, 16)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 4096, 5000), jnp.int32)
        old = pc._GATHER_CLIFF_BYTES
        try:
            pc._GATHER_CLIFF_BYTES = 4096 * 32  # 8-col pieces exactly fit
            for c_live in (10, 16, 8, 9):
                splits = pc._gather_col_splits(4096, c_live)
                if c_live > 8:
                    assert len(splits) > 1, (c_live, splits)
                got = pc._gather_rows(table, idx, c_live)
                np.testing.assert_array_equal(
                    _np(got), _np(table[idx][:, :c_live]), err_msg=str(c_live)
                )
        finally:
            pc._GATHER_CLIFF_BYTES = old

    def test_searchsorted_wide_matches_jnp(self):
        # the two-level wide search behind tile_ranges / the expansion's g0s
        # must equal jnp.searchsorted exactly, both sides, including
        # duplicate-heavy and boundary-value query sets
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
            searchsorted_wide,
        )

        rng = np.random.default_rng(11)
        for n, qmax in ((100_000, 1024), (12_345, 64), (700, 5)):
            arr = jnp.asarray(np.sort(rng.integers(0, qmax, n)), jnp.int32)
            queries = jnp.asarray(
                np.concatenate(
                    [np.arange(qmax), rng.integers(0, qmax, 64), [0, qmax - 1]]
                ),
                jnp.int32,
            )
            for side in ("left", "right"):
                ref = jnp.searchsorted(arr, queries, side=side)
                got = searchsorted_wide(arr, queries, side=side)
                np.testing.assert_array_equal(
                    _np(got), _np(ref), err_msg=f"n={n} side={side}"
                )

    def test_parity_overflow_truncation(self):
        # budget far below the real pair count: farthest pairs truncated
        self._compare(CLOUD, p_max=512)

    def test_parity_unaligned_budget(self):
        self._compare(CLOUD, p_max=1000)

    def test_all_inactive(self):
        import dataclasses as dc

        cloud = dc.replace(
            CLOUD,
            position_visibility=CLOUD.position_visibility
            * jnp.array([1.0, 1.0, 1.0, 0.0]),
        )
        self._compare(cloud, p_max=1 << 12)

    def test_mixed_offscreen(self):
        import dataclasses as dc

        pv = np.asarray(CLOUD.position_visibility).copy()
        pv[::3, 0] += 1e4  # every third gaussian far off screen
        cloud = dc.replace(CLOUD, position_visibility=jnp.asarray(pv))
        self._compare(cloud, p_max=1 << 13)


class TestUnpermuteFormulations:
    def test_cost_model_switches_at_scale(self):
        from bevy_gaussian_splatting_tpu.ops.pallas.core import (
            preferred_unpermute,
        )

        # the perm carry-sort wins at every practical scale once the rank
        # path's transpose is priced in (measured 94.0 vs 99.9 ms at 1M);
        # above the 64 MiB cliff the margin widens further
        assert preferred_unpermute(1_000_000, 10, env_override=False) == "perm"
        assert preferred_unpermute(4_000_000, 10, env_override=False) == "perm"

    def test_perm_and_rank_paths_agree(self):
        """Both unpermute formulations are exact: gradients must MATCH
        (not just approximately — the same reduce output is mapped by the
        inverse permutation either way)."""
        import os

        cloud = CLOUD
        cam = CAM
        settings = bgs.CloudSettings()
        target = render_tiled(
            cloud, cam, settings, width=128, height=128, differentiable=False
        )

        def grads():
            def loss(c):
                img = render_tiled(
                    c, cam, settings, width=128, height=128,
                    differentiable=True, compositor="pallas",
                )
                return jnp.mean((img - target) ** 2)

            return jax.grad(loss)(cloud)

        old = os.environ.get("BGS_UNPERMUTE")
        try:
            os.environ["BGS_UNPERMUTE"] = "rank"
            g_rank = grads()
            os.environ["BGS_UNPERMUTE"] = "perm"
            g_perm = grads()
        finally:
            if old is None:
                os.environ.pop("BGS_UNPERMUTE", None)
            else:
                os.environ["BGS_UNPERMUTE"] = old
        for f in ("position_visibility", "spherical_harmonic", "rotation",
                  "scale_opacity"):
            np.testing.assert_array_equal(
                _np(getattr(g_rank, f)), _np(getattr(g_perm, f)), err_msg=f
            )


class TestParamsDelivery:
    def test_carry_split_bit_exact(self):
        """BGS_CARRY_SPLIT (two half-width stable sorts on the same key)
        must reproduce the single wide carry sort exactly — stability on an
        identical key yields the identical permutation."""
        import os

        cloud = CLOUD
        cam = CAM
        settings = bgs.CloudSettings()
        imgs = {}
        for knob in (None, "BGS_CARRY_SPLIT"):
            os.environ["BGS_PARAMS_DELIVERY"] = "carry"
            if knob:
                os.environ[knob] = "1"
            try:
                imgs[knob] = np.asarray(render_tiled(
                    cloud, cam, settings, width=128, height=128,
                    differentiable=False, compositor="pallas",
                ))
            finally:
                os.environ.pop("BGS_PARAMS_DELIVERY", None)
                os.environ.pop("BGS_CARRY_SPLIT", None)
        np.testing.assert_array_equal(imgs[None], imgs["BGS_CARRY_SPLIT"])

        # the barrier knob lives on the carry TRAIN path: gradients must be
        # identical with and without it (it only pins scheduling)
        def loss(c, ):
            img = render_tiled(
                c, cam, settings, width=128, height=128,
                differentiable=True, compositor="pallas",
            )
            return jnp.mean(img ** 2)

        grads = {}
        for knob in (None, "BGS_CARRY_BARRIER"):
            os.environ["BGS_PARAMS_DELIVERY"] = "carry"
            if knob:
                os.environ[knob] = "1"
            try:
                grads[knob] = np.asarray(
                    jax.grad(loss)(cloud).position_visibility
                )
            finally:
                os.environ.pop("BGS_PARAMS_DELIVERY", None)
                os.environ.pop("BGS_CARRY_BARRIER", None)
        np.testing.assert_array_equal(
            grads[None], grads["BGS_CARRY_BARRIER"]
        )

    def test_cost_model_switches_at_scale(self):
        from bevy_gaussian_splatting_tpu.ops.pallas.core import (
            preferred_params_delivery,
        )

        # sub-cliff tables: the P-row gather is cheap -> "gather" (measured
        # 43.5 vs 66.6 forced-carry at 1M — identical with c64-packed
        # carries, which XLA decomposes); multi-M tables pay 24 ns/row
        # (148 ms measured at 4M) -> "carry"
        assert preferred_params_delivery(
            1_000_000, 1_605_632, 10, env_override=False
        ) == "gather"
        assert preferred_params_delivery(
            4_000_000, 6_422_528, 10, env_override=False
        ) == "carry"
        assert preferred_params_delivery(
            4_000_000, 6_422_528, 10, env_override=False, training=True
        ) == "gather"

    def test_carry_matches_gather_forward_and_grads(self):
        """The carried params are bit-equal to params[g_s] (exact one-hot
        MXU gather + sort carries), so forward images AND gradients must be
        identical between the two delivery modes."""
        import os

        cloud = CLOUD
        settings = bgs.CloudSettings()

        def run(mode):
            old = os.environ.get("BGS_PARAMS_DELIVERY")
            os.environ["BGS_PARAMS_DELIVERY"] = mode
            try:
                img = render_tiled(
                    cloud, CAM, settings, width=128, height=128,
                    differentiable=False, compositor="pallas",
                )

                def loss(c):
                    out = render_tiled(
                        c, CAM, settings, width=128, height=128,
                        differentiable=True, compositor="pallas",
                    )
                    return jnp.mean((out - img * 0.9) ** 2)

                g = jax.grad(loss)(cloud)
                return img, g
            finally:
                if old is None:
                    os.environ.pop("BGS_PARAMS_DELIVERY", None)
                else:
                    os.environ["BGS_PARAMS_DELIVERY"] = old

        img_g, grad_g = run("gather")
        img_c, grad_c = run("carry")
        np.testing.assert_array_equal(_np(img_g), _np(img_c))
        for f in ("position_visibility", "spherical_harmonic", "rotation",
                  "scale_opacity"):
            np.testing.assert_array_equal(
                _np(getattr(grad_g, f)), _np(getattr(grad_c, f)), err_msg=f
            )

    def test_carry_2dgs_serving(self):
        import os

        settings = bgs.CloudSettings(
            gaussian_mode=bgs.GaussianMode.GAUSSIAN_2D
        )
        old = os.environ.get("BGS_PARAMS_DELIVERY")
        try:
            os.environ["BGS_PARAMS_DELIVERY"] = "gather"
            a = render_tiled(CLOUD, CAM, settings, width=128, height=128,
                             differentiable=False, compositor="pallas")
            os.environ["BGS_PARAMS_DELIVERY"] = "carry"
            b = render_tiled(CLOUD, CAM, settings, width=128, height=128,
                             differentiable=False, compositor="pallas")
        finally:
            if old is None:
                os.environ.pop("BGS_PARAMS_DELIVERY", None)
            else:
                os.environ["BGS_PARAMS_DELIVERY"] = old
        np.testing.assert_array_equal(_np(a), _np(b))


class TestChunkPolicy:
    def test_preferred_chunk_by_occupancy(self):
        """Mean-occupancy kernel chunk policy (round-5 1080p sweep): low
        pairs/tile picks 256, bench-style occupancy keeps 512."""
        from bevy_gaussian_splatting_tpu.ops.pallas.tile_fwd import (
            preferred_chunk,
        )

        # 1080p regime: 2.1M pairs / 8160 tiles ~ 257/tile
        assert preferred_chunk(2_101_248, 8160) == 256
        # 512^2 bench regime: 1.6M / 1024 ~ 1568/tile
        assert preferred_chunk(1_605_632, 1024) == 512
        # 4M bench: 6.42M / 1024
        assert preferred_chunk(6_422_528, 1024) == 512
