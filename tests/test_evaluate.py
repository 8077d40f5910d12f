"""Trajectory evaluation: association, ATE/RPE, config presets load."""

import numpy as np
import pytest

from mast3r_slam_tpu.utils.evaluate import (
    associate_trajectories,
    evaluate_tum,
    rpe_rmse,
)
from mast3r_slam_tpu.utils.export import save_trajectory_tum


class TestAssociation:
    def test_exact_match(self):
        ts = np.arange(10, dtype=float)
        ia, ib = associate_trajectories(ts, ts)
        assert (ia == ib).all() and ia.size == 10

    def test_offset_within_tolerance(self):
        a = np.arange(5, dtype=float)
        b = a + 0.01
        ia, ib = associate_trajectories(a, b, max_dt=0.02)
        assert ia.size == 5

    def test_out_of_tolerance_dropped(self):
        a = np.asarray([0.0, 1.0])
        b = np.asarray([0.5])
        ia, ib = associate_trajectories(a, b, max_dt=0.02)
        assert ia.size == 0


class TestMetrics:
    def test_evaluate_tum_perfect(self, tmp_path, rng):
        n = 20
        ts = np.arange(n, dtype=float)
        poses = np.concatenate(
            [
                rng.normal(size=(n, 3)),
                np.tile([0, 0, 0, 1, 1], (n, 1)),
            ],
            axis=-1,
        ).astype(np.float32)
        est, gt = tmp_path / "est.txt", tmp_path / "gt.txt"
        save_trajectory_tum(est, ts, poses)
        save_trajectory_tum(gt, ts, poses)
        out = evaluate_tum(est, gt)
        assert out["ate_rmse"] == pytest.approx(0.0, abs=1e-4)
        assert out["n_matched"] == n

    def test_rpe_scale_invariant(self, rng):
        n = 15
        t = np.cumsum(rng.normal(size=(n, 3)), axis=0)
        poses = np.concatenate([t, np.tile([0, 0, 0, 1, 1], (n, 1))], -1)
        poses_scaled = poses.copy()
        poses_scaled[:, :3] *= 3.0
        assert rpe_rmse(poses_scaled, poses) == pytest.approx(0.0, abs=1e-6)


class TestConfigPresets:
    @pytest.mark.parametrize(
        "name", ["base.yaml", "tum.yaml", "eurocalib.yaml", "fast.yaml"]
    )
    def test_presets_load(self, name):
        from pathlib import Path

        from mast3r_slam_tpu.config import load_config

        cfg = load_config(Path(__file__).parent.parent / "configs" / name)
        assert cfg.tracking.huber == 1.345
        if name == "tum.yaml":
            assert cfg.retrieval.method == "asmk"
            assert not cfg.matching.use_simple
        if name == "eurocalib.yaml":
            assert cfg.use_calib and len(cfg.dataset.calib) == 4
