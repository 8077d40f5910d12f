"""Utilities: export formats, SLAM snapshots, profiling."""

from mast3r_slam_tpu.utils.export import (
    ate_rmse,
    load_trajectory_tum,
    save_ply,
    save_trajectory_kitti,
    save_trajectory_tum,
)
from mast3r_slam_tpu.utils.profiling import StageTimer, trace

__all__ = [
    "ate_rmse",
    "load_trajectory_tum",
    "save_ply",
    "save_trajectory_kitti",
    "save_trajectory_tum",
    "StageTimer",
    "trace",
]
