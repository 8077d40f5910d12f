"""GN solvers: convergence to ground truth on geometric fixtures.

This is the test the reference never had: its backend rays solver was a
zero-Hessian no-op that "passed" by never moving poses (SURVEY.md §2.10).
Here we require actual convergence of all three residual modes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.lie import core as lie
from mast3r_slam_tpu.ops import (
    GNParams,
    gauss_newton_graph,
    gauss_newton_pose_calib,
    gauss_newton_pose_rays,
)
from mast3r_slam_tpu.geometry import point_to_ray_dist, get_pixel_coords
from tests.fixtures import (
    make_graph_problem,
    perturb_poses,
    pose_distance,
    world_surface,
    camera_K,
)


def _free_mask(num_kf, pin=1):
    return jnp.asarray([k >= pin for k in range(num_kf)])


class TestGraphGN:
    @pytest.mark.parametrize("mode", ["rays", "points"])
    def test_converges_to_ground_truth(self, rng, mode):
        prob = make_graph_problem(rng, num_kf=4, h=8, w=12)
        Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.05)
        edge_mask = jnp.ones(prob["ii"].shape[0], bool)
        params = GNParams(max_iter=10, delta_thresh=1e-6)

        Twc_new, _ = gauss_newton_graph(
            Twc0,
            prob["Xs"],
            prob["Cs"],
            prob["ii"],
            prob["jj"],
            prob["idx"],
            prob["valid"],
            prob["Q"],
            edge_mask,
            _free_mask(4),
            mode=mode,
            params=params,
        )
        for k in range(4):
            err0 = pose_distance(Twc0[k], prob["Twc_gt"][k])
            err1 = pose_distance(Twc_new[k], prob["Twc_gt"][k])
            if k == 0:
                assert err1 == pytest.approx(0.0, abs=1e-6)  # pinned
            else:
                assert err1 < 1e-3, f"kf{k}: {err0} -> {err1}"

    def test_calib_converges(self, rng):
        prob = make_graph_problem(rng, num_kf=3, h=8, w=12, permute=False)
        Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.02)
        edge_mask = jnp.ones(prob["ii"].shape[0], bool)
        params = GNParams(max_iter=12, delta_thresh=1e-6)

        Twc_new, _ = gauss_newton_graph(
            Twc0,
            prob["Xs"],
            prob["Cs"],
            prob["ii"],
            prob["jj"],
            prob["idx"],
            prob["valid"],
            prob["Q"],
            edge_mask,
            _free_mask(3),
            mode="calib",
            K_intr=prob["K"],
            img_size=prob["img_size"],
            params=params,
        )
        # calib residual does not observe per-pose scale fully; compare
        # pose error ignoring nothing but requiring big improvement:
        for k in range(1, 3):
            err0 = pose_distance(Twc0[k], prob["Twc_gt"][k])
            err1 = pose_distance(Twc_new[k], prob["Twc_gt"][k])
            assert err1 < 0.3 * err0, f"kf{k}: {err0} -> {err1}"

    def test_masked_edges_do_not_move_poses(self, rng):
        prob = make_graph_problem(rng, num_kf=3, h=6, w=8)
        Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.05)
        edge_mask = jnp.zeros(prob["ii"].shape[0], bool)  # all masked
        Twc_new, _ = gauss_newton_graph(
            Twc0,
            prob["Xs"],
            prob["Cs"],
            prob["ii"],
            prob["jj"],
            prob["idx"],
            prob["valid"],
            prob["Q"],
            edge_mask,
            _free_mask(3),
            mode="rays",
            params=GNParams(max_iter=3),
        )
        np.testing.assert_allclose(Twc_new, Twc0, atol=1e-5)

    def test_huber_downweights_outliers(self, rng):
        """Corrupt 10% of one keyframe's points; solution must stay close."""
        prob = make_graph_problem(rng, num_kf=3, h=8, w=12, permute=False)
        Xs = np.asarray(prob["Xs"]).copy()
        n = Xs.shape[1]
        bad = rng.choice(n, n // 10, replace=False)
        Xs[2, bad] += rng.normal(size=(len(bad), 3)) * 2.0
        Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.03)
        edge_mask = jnp.ones(prob["ii"].shape[0], bool)
        Twc_new, _ = gauss_newton_graph(
            Twc0,
            jnp.asarray(Xs),
            prob["Cs"],
            prob["ii"],
            prob["jj"],
            prob["idx"],
            prob["valid"],
            prob["Q"],
            edge_mask,
            _free_mask(3),
            mode="rays",
            params=GNParams(max_iter=10, delta_thresh=1e-6),
        )
        for k in range(1, 3):
            assert pose_distance(Twc_new[k], prob["Twc_gt"][k]) < 0.05


class TestPoseGN:
    def test_rays_recovers_relative_pose(self, rng):
        h, w = 12, 16
        K = camera_K(h, w)
        Xk = jnp.asarray(world_surface(rng, h, w, K))  # keyframe camera frame
        xi_gt = jnp.asarray(rng.normal(size=7) * 0.05, jnp.float32)
        T_gt = lie.sim3_exp(xi_gt)  # T_CkCf
        Xf = lie.sim3_act(lie.sim3_inv(T_gt)[None], Xk)  # frame points

        rd_k = point_to_ray_dist(Xk)
        sqrt_info = jnp.concatenate(
            [jnp.full((h * w, 3), 1.0 / 0.003), jnp.full((h * w, 1), 1.0 / 10.0)],
            axis=-1,
        )
        T0 = lie.sim3_identity()
        T_est, cost = gauss_newton_pose_rays(
            T0, Xf, rd_k, sqrt_info, params=GNParams(max_iter=20, delta_thresh=1e-8)
        )
        assert pose_distance(T_est, T_gt) < 1e-4
        assert float(cost) < 1e-4

    def test_calib_recovers_relative_pose(self, rng):
        h, w = 12, 16
        K = camera_K(h, w)
        Xk = jnp.asarray(world_surface(rng, h, w, K))
        xi_gt = jnp.asarray(rng.normal(size=7) * 0.03, jnp.float32)
        T_gt = lie.sim3_exp(xi_gt)
        Xf = lie.sim3_act(lie.sim3_inv(T_gt)[None], Xk)

        uv = get_pixel_coords(1, (h, w)).reshape(-1, 2)
        meas_k = jnp.concatenate([uv, jnp.log(Xk[:, 2:3])], axis=-1)
        sqrt_info = jnp.concatenate(
            [jnp.full((h * w, 2), 1.0), jnp.full((h * w, 1), 1.0 / 10.0)], axis=-1
        )
        valid = jnp.ones((h * w, 1), bool)
        T_est, _ = gauss_newton_pose_calib(
            lie.sim3_identity(),
            Xf,
            meas_k,
            sqrt_info,
            valid,
            K,
            (h, w),
            params=GNParams(max_iter=20, delta_thresh=1e-8),
        )
        # scale is weakly observable from a single view; pose should improve a lot
        assert pose_distance(T_est, T_gt) < 0.1 * pose_distance(
            lie.sim3_identity(), T_gt
        )


class TestNumpyOracleTwin:
    """Parity-pair check: the device solver vs the independent float64
    numpy twin (benchmarks/gn_oracle.py) on identical inputs — the
    reference's differential-testing pattern (SURVEY §4)."""

    @pytest.mark.parametrize("mode", ["rays", "points", "calib"])
    def test_device_matches_oracle(self, rng, mode):
        from benchmarks.gn_oracle import gauss_newton_graph_reference

        num_kf, hw, num_edges = 4, (8, 12), 6
        prob = make_graph_problem(
            rng, num_kf=num_kf, h=hw[0], w=hw[1], num_edges=num_edges
        )
        Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.03)
        edge_mask = jnp.ones(prob["ii"].shape[0], bool)
        free = _free_mask(num_kf)
        params = GNParams(max_iter=3, delta_thresh=0.0)
        kwargs = (
            dict(K_intr=prob["K"], img_size=prob["img_size"])
            if mode == "calib"
            else {}
        )
        args = (
            Twc0, prob["Xs"], prob["Cs"], prob["ii"], prob["jj"],
            prob["idx"], prob["valid"], prob["Q"], edge_mask, free,
        )
        Twc_dev, _ = gauss_newton_graph(*args, mode=mode, params=params, **kwargs)
        Twc_ref = gauss_newton_graph_reference(
            *args, mode=mode, params=params, **kwargs
        )
        dev = np.asarray(Twc_dev, np.float64)
        corr = np.corrcoef(dev.ravel(), Twc_ref.ravel())[0, 1]
        assert corr > 0.99, f"corr {corr}"
        assert np.abs(dev - Twc_ref).max() < 5e-3


class TestEdgeChunkSelection:
    """Adaptive scan chunking: single pass whenever the transients fit."""

    def test_small_graphs_run_single_pass(self):
        from mast3r_slam_tpu.ops.gauss_newton import _resolve_edge_chunk

        # bench-scale graph: 30 edges x 1000 pts trivially fits -> no scan
        assert _resolve_edge_chunk(30, 1000, None) == 30
        # full SLAM scale: 32 edges x 196k pts still fits the 2 GB budget
        assert _resolve_edge_chunk(32, 196608, None) == 32

    def test_huge_graphs_chunk_to_budget(self):
        from mast3r_slam_tpu.ops.gauss_newton import _resolve_edge_chunk

        # 512 edges x 196k pts would need ~26 GB of transients -> chunked,
        # and the chunk divides E
        c = _resolve_edge_chunk(512, 196608, None)
        assert c < 512 and 512 % c == 0
        assert c * 196608 * 260 <= 2 * 1024**3

    def test_explicit_chunk_respected_and_divides(self):
        from mast3r_slam_tpu.ops.gauss_newton import _resolve_edge_chunk

        assert _resolve_edge_chunk(32, 10, 8) == 8
        # non-divisor shrinks to the nearest divisor below
        assert _resolve_edge_chunk(30, 10, 8) == 6


class TestSolveVariants:
    """A/B variants of the edge-system build (ops/gauss_newton.py
    `variant`): `noconcat` skips the [E,7,3N] concat (algebraically
    identical — S = sum_k A_k A_k^T); `bf16` stores edge transients in
    bfloat16 with f32 MXU accumulation. Both must converge to the same
    poses as `base` — exactly for noconcat, within a loose band for bf16.
    These exist for the full-scale backend-solve profile
    (scripts/profile_backend_solve.py, VERDICT r3 item 3)."""

    @pytest.mark.parametrize("mode", ["rays", "points"])
    def test_noconcat_matches_base(self, rng, mode):
        prob = make_graph_problem(rng, num_kf=4, h=8, w=12, num_edges=8)
        Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.03)
        edge_mask = jnp.ones(prob["ii"].shape[0], bool)
        params = GNParams(max_iter=5, delta_thresh=0.0)
        args = (
            Twc0, prob["Xs"], prob["Cs"], prob["ii"], prob["jj"],
            prob["idx"], prob["valid"], prob["Q"], edge_mask, _free_mask(4),
        )
        base, _ = gauss_newton_graph(*args, mode=mode, params=params)
        out, _ = gauss_newton_graph(
            *args, mode=mode, params=params, variant="noconcat"
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), rtol=1e-5, atol=1e-5
        )

    def test_bf16_transients_converge_close(self, rng):
        prob = make_graph_problem(rng, num_kf=4, h=8, w=12, num_edges=8)
        Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.03)
        edge_mask = jnp.ones(prob["ii"].shape[0], bool)
        params = GNParams(max_iter=8, delta_thresh=0.0)
        args = (
            Twc0, prob["Xs"], prob["Cs"], prob["ii"], prob["jj"],
            prob["idx"], prob["valid"], prob["Q"], edge_mask, _free_mask(4),
        )
        base, _ = gauss_newton_graph(*args, mode="rays", params=params)
        for variant in ("bf16", "bf16+noconcat"):
            out, _ = gauss_newton_graph(
                *args, mode="rays", params=params, variant=variant
            )
            assert bool(jnp.all(jnp.isfinite(out)))
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(base), rtol=5e-2, atol=5e-2
            )


class TestPointStride:
    """`point_stride` subsamples the j-side correspondence rows of the
    graph solve (deployment lever: the full-scale solve is ~linear in the
    point count — round-4 profile, docs/PLAN.md). Stride 1 must be
    bit-identical to the unstrided call; stride 2/4 must still converge
    to the ground-truth poses on a clean problem."""

    @pytest.mark.parametrize("img_size", [None, (8, 12)])
    def test_stride_two_matches_masked_full_solve(self, rng, img_size):
        """Pins the stride SEMANTICS: the strided solve must equal the
        full-resolution solve whose valid_match is zeroed outside the
        selected columns — i.e. stride really is a subsample of the same
        objective, for both the plain-1D and the 2D-aware lattice."""
        from mast3r_slam_tpu.ops.gauss_newton import _stride_indices

        prob = make_graph_problem(rng, num_kf=4, h=8, w=12, num_edges=8)
        Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.03)
        edge_mask = jnp.ones(prob["ii"].shape[0], bool)
        params = GNParams(max_iter=5, delta_thresh=0.0)
        N = prob["idx"].shape[1]
        sub = _stride_indices(N, 2, img_size)
        masked = np.zeros_like(np.asarray(prob["valid"]))
        masked[:, sub] = np.asarray(prob["valid"])[:, sub]
        out, _ = gauss_newton_graph(
            Twc0, prob["Xs"], prob["Cs"], prob["ii"], prob["jj"],
            prob["idx"], prob["valid"], prob["Q"], edge_mask, _free_mask(4),
            mode="rays", params=params, point_stride=2, img_size=img_size,
        )
        full_masked, _ = gauss_newton_graph(
            Twc0, prob["Xs"], prob["Cs"], prob["ii"], prob["jj"],
            prob["idx"], jnp.asarray(masked), prob["Q"], edge_mask,
            _free_mask(4), mode="rays", params=params,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(full_masked), rtol=1e-5, atol=1e-5
        )

    def test_stride_indices_2d_lattice_is_uniform(self):
        """With img_size, the kept pixels shift column phase per row
        (diagonal lattice) instead of keeping only even columns."""
        from mast3r_slam_tpu.ops.gauss_newton import _stride_indices

        h, w = 4, 8
        sub = _stride_indices(h * w, 2, (h, w))
        cols_by_row = {r: set() for r in range(h)}
        for k in sub:
            cols_by_row[k // w].add(k % w)
        # Even rows keep even columns, odd rows keep odd columns — every
        # column index appears somewhere (no dropped-column anisotropy).
        assert cols_by_row[0] == {0, 2, 4, 6}
        assert cols_by_row[1] == {1, 3, 5, 7}
        assert set().union(*cols_by_row.values()) == set(range(w))
        # Plain-1D fallback keeps only even columns at even w.
        plain = _stride_indices(h * w, 2, None)
        assert all(k % 2 == 0 for k in plain)

    def test_invalid_stride_rejected(self, rng):
        prob = make_graph_problem(rng, num_kf=4, h=8, w=12, num_edges=8)
        edge_mask = jnp.ones(prob["ii"].shape[0], bool)
        with pytest.raises(ValueError, match="point_stride"):
            gauss_newton_graph(
                prob["Twc_gt"], prob["Xs"], prob["Cs"], prob["ii"],
                prob["jj"], prob["idx"], prob["valid"], prob["Q"],
                edge_mask, _free_mask(4), mode="rays", point_stride=0,
            )

    @pytest.mark.parametrize("stride", [2, 4])
    @pytest.mark.parametrize("mode", ["rays", "points"])
    def test_strided_solve_converges_to_gt(self, rng, stride, mode):
        prob = make_graph_problem(rng, num_kf=4, h=8, w=12, num_edges=8)
        Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.03)
        edge_mask = jnp.ones(prob["ii"].shape[0], bool)
        params = GNParams(max_iter=10, delta_thresh=0.0)
        out, _ = gauss_newton_graph(
            Twc0, prob["Xs"], prob["Cs"], prob["ii"], prob["jj"],
            prob["idx"], prob["valid"], prob["Q"], edge_mask, _free_mask(4),
            mode=mode, params=params, point_stride=stride,
        )
        full, _ = gauss_newton_graph(
            Twc0, prob["Xs"], prob["Cs"], prob["ii"], prob["jj"],
            prob["idx"], prob["valid"], prob["Q"], edge_mask, _free_mask(4),
            mode=mode, params=params,
        )
        # Strided solution solves a uniform subsample of the same LSQ: it
        # must land near both the full solution and the ground truth.
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(full), rtol=0, atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(prob["Twc_gt"]), rtol=0, atol=2e-2
        )


class TestShardedGraphSolve:
    def test_edge_sharded_matches_unsharded(self, rng):
        """Edge axis shard_map'd over the 8-device 'dp' mesh + psum must
        produce the SAME poses as the single-device solve (multi-chip
        backend: per-chip Hessian blocks reduced over ICI)."""
        from mast3r_slam_tpu.parallel.mesh import make_mesh

        prob = make_graph_problem(rng, num_kf=4, h=8, w=12, num_edges=16)
        Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.05)
        E = prob["ii"].shape[0]
        assert E % 8 == 0
        edge_mask = jnp.ones(E, bool)
        params = GNParams(max_iter=6, delta_thresh=1e-6)
        args = (
            Twc0, prob["Xs"], prob["Cs"], prob["ii"], prob["jj"],
            prob["idx"], prob["valid"], prob["Q"], edge_mask, _free_mask(4),
        )

        Twc_ref, _ = gauss_newton_graph(*args, mode="rays", params=params)
        mesh = make_mesh(8, tp=1)
        Twc_sh, _ = gauss_newton_graph(
            *args, mode="rays", params=params, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(Twc_sh), np.asarray(Twc_ref), rtol=1e-5, atol=1e-5
        )

    def test_indivisible_edges_rejected(self, rng):
        from mast3r_slam_tpu.parallel.mesh import make_mesh

        prob = make_graph_problem(rng, num_kf=3, h=4, w=4, num_edges=6)
        Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.02)
        E = prob["ii"].shape[0]
        with pytest.raises(ValueError, match="divisible"):
            gauss_newton_graph(
                Twc0, prob["Xs"], prob["Cs"], prob["ii"], prob["jj"],
                prob["idx"], prob["valid"], prob["Q"],
                jnp.ones(E, bool), _free_mask(3),
                mode="rays", params=GNParams(max_iter=2),
                mesh=make_mesh(8, tp=1),
            )

    def test_factor_graph_mesh_plumbing(self, tiny_model, rng):
        """FactorGraph(mesh=...) runs its solve through the sharded path
        (E buckets are power-of-two >= dp) and keeps poses finite."""
        from mast3r_slam_tpu.config import Config, set_config
        from mast3r_slam_tpu.frame import Keyframes, create_frame
        from mast3r_slam_tpu.global_opt import FactorGraph
        from mast3r_slam_tpu.parallel.mesh import make_mesh

        set_config(
            Config.from_dict(
                {
                    "runtime": {"keyframe_capacity": 8},
                    "local_opt": {"max_edges": 16, "min_match_frac": 0.0},
                    "matching": {"use_simple": True, "dist_thresh": 1e6},
                }
            )
        )
        h, w = tiny_model._out_hw
        kfs = Keyframes(h, w)
        for fid in range(3):
            img = jnp.asarray(
                rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
            )
            fr = create_frame(fid, img)
            from mast3r_slam_tpu.inference import mast3r_inference_mono

            X, C, feat, pos = mast3r_inference_mono(tiny_model, fr)
            fr.X_canon, fr.C, fr.feat, fr.pos = X, C, feat, pos
            fr.N = fr.N_updates = 1
            kfs.append(fr)

        fg = FactorGraph(tiny_model, kfs, mesh=make_mesh(8, tp=1))
        assert fg.add_factors([0, 1], [1, 2], min_match_frac=0.0)
        fg.solve_GN_rays()
        assert np.isfinite(np.asarray(kfs.get_poses())).all()


class TestRobustKinds:
    def test_tukey_weight_formula(self):
        """Biweight: 1 at r=0, (1-(r/t)^2)^2 inside, exactly 0 outside
        (reference optimizer.py:65-78)."""
        from mast3r_slam_tpu.ops.gauss_newton import tukey_weight

        t = 4.6851
        r = jnp.asarray([0.0, t / 2, t - 1e-3, t, 2 * t])
        w = np.asarray(tukey_weight(r, t))
        assert w[0] == 1.0
        np.testing.assert_allclose(w[1], (1 - 0.25) ** 2, rtol=1e-6)
        assert w[2] > 0.0
        assert w[3] == 0.0 and w[4] == 0.0

    def test_tukey_rejects_gross_outliers_fully(self, rng):
        """Pose solve with 15% gross outliers: the redescending Tukey loss
        zero-weights them and recovers the pose at least as tightly as
        Huber (which only downweights)."""
        h, w = 12, 16
        K = camera_K(h, w)
        Xk = np.asarray(world_surface(rng, h, w, K))
        xi_gt = rng.normal(size=7) * 0.05
        T_gt = lie.sim3_exp(jnp.asarray(xi_gt, jnp.float32))
        Xf = np.asarray(
            lie.sim3_act(lie.sim3_inv(T_gt)[None], jnp.asarray(Xk))
        ).copy()
        n = h * w
        bad = rng.choice(n, n * 15 // 100, replace=False)
        Xf[bad] += rng.normal(size=(len(bad), 3)) * 1.5

        rd_k = point_to_ray_dist(jnp.asarray(Xk))
        sqrt_info = jnp.concatenate(
            [jnp.full((n, 3), 1.0 / 0.003), jnp.full((n, 1), 1.0 / 10.0)], -1
        )
        # Huber warm start, Tukey polish — the standard redescending-loss
        # recipe (tukey's influence is zero outside the tube, so it needs
        # an init inside the inlier basin; huber is globally convex).
        T_hub, _ = gauss_newton_pose_rays(
            lie.sim3_identity(), jnp.asarray(Xf), rd_k, sqrt_info,
            params=GNParams(robust="huber", max_iter=30, delta_thresh=1e-10),
        )
        T_tuk, _ = gauss_newton_pose_rays(
            T_hub, jnp.asarray(Xf), rd_k, sqrt_info,
            params=GNParams(robust="tukey", max_iter=30, delta_thresh=1e-10),
        )
        err_hub = pose_distance(T_hub, T_gt)
        err_tuk = pose_distance(T_tuk, T_gt)
        # huber's estimate is biased by the downweighted-but-live outliers
        # (bounded but nonzero influence); tukey zero-weights every point
        # outside the tube and must tighten the estimate
        assert err_tuk < err_hub, (err_tuk, err_hub)
        assert err_tuk < 0.1, (err_tuk, err_hub)

    def test_graph_solver_accepts_tukey(self, rng):
        prob = make_graph_problem(rng, num_kf=3, h=8, w=12, permute=False)
        Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.03)
        Twc_new, _ = gauss_newton_graph(
            Twc0, prob["Xs"], prob["Cs"], prob["ii"], prob["jj"],
            prob["idx"], prob["valid"], prob["Q"],
            jnp.ones(prob["ii"].shape[0], bool), _free_mask(3),
            mode="rays",
            params=GNParams(robust="tukey", max_iter=10, delta_thresh=1e-6),
        )
        for k in range(1, 3):
            assert pose_distance(Twc_new[k], prob["Twc_gt"][k]) < 0.05


class TestGenericSolver:
    def test_recovers_linear_model_with_outliers(self, rng):
        """The generic residual-callback solver (reference
        optimizer.py:229, never instantiated there) fits y = a x + b under
        20% gross outliers with the tukey loss."""
        from mast3r_slam_tpu.ops.gauss_newton import GaussNewtonSolver

        a_gt, b_gt = 2.0, -1.0
        x = rng.uniform(-2, 2, size=128).astype(np.float32)
        y = a_gt * x + b_gt + rng.normal(size=128).astype(np.float32) * 0.01
        bad = rng.choice(128, 25, replace=False)
        y[bad] += rng.normal(size=25) * 5.0
        xj, yj = jnp.asarray(x), jnp.asarray(y)

        def residual_fn(p):
            r = p[0] * xj + p[1] - yj
            J = jnp.stack([xj, jnp.ones_like(xj)], axis=-1)
            return r, J

        # huber warm start pulls into the inlier basin; tukey polish
        # zero-weights the outliers entirely (see TestRobustKinds)
        warm = GaussNewtonSolver(
            GNParams(robust="huber", huber_k=0.5, max_iter=30,
                     delta_thresh=1e-10)
        )
        p_warm, _, _ = warm.solve(
            residual_fn, jnp.asarray([1.0, 0.0]), jnp.ones(128)
        )
        solver = GaussNewtonSolver(
            GNParams(robust="tukey", tukey_t=0.5, max_iter=30,
                     delta_thresh=1e-10)
        )
        p_est, cost, iters = solver.solve(residual_fn, p_warm, jnp.ones(128))
        np.testing.assert_allclose(
            np.asarray(p_est), [a_gt, b_gt], atol=5e-3
        )
        assert int(iters) >= 2
