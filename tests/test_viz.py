"""Visualization smoke tests (headless renders)."""

import numpy as np
import pytest

pytest.importorskip("matplotlib")

from mast3r_slam_tpu.utils.viz import plot_pointcloud, plot_trajectory


def test_trajectory_render(tmp_path, rng):
    poses = np.concatenate(
        [np.cumsum(rng.normal(size=(30, 3)), 0), np.tile([0, 0, 0, 1, 1], (30, 1))],
        axis=-1,
    )
    out = tmp_path / "traj.png"
    plot_trajectory(poses, out, gt_poses=poses)
    assert out.stat().st_size > 1000


def test_pointcloud_render(tmp_path, rng):
    pts = rng.normal(size=(5000, 3))
    cols = rng.integers(0, 255, (5000, 3)).astype(np.uint8)
    out = tmp_path / "cloud.png"
    plot_pointcloud(pts, cols, out, max_points=2000)
    assert out.stat().st_size > 1000
