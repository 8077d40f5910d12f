"""Device kernels: matching, refinement, GN solvers, linalg, attention.

Every op here is a fused jittable program with static shapes; Pallas
variants exist for the ops where hand-tiling beats XLA (attention; more to
come). Each op has a slow oracle twin and a seeded parity test
(SURVEY.md §4 pattern)."""

from mast3r_slam_tpu.ops.iter_proj import iter_proj, prep_for_iter_proj
from mast3r_slam_tpu.ops.refine import refine_matches
from mast3r_slam_tpu.ops.gauss_newton import (
    GNParams,
    gauss_newton_graph,
    gauss_newton_pose_calib,
    gauss_newton_pose_rays,
    huber_weight,
)
from mast3r_slam_tpu.ops.linalg import (
    cholesky_solve,
    solve_2x2,
    solve_3x3,
    sparse_schur_solve,
)

__all__ = [
    "iter_proj",
    "prep_for_iter_proj",
    "refine_matches",
    "GNParams",
    "gauss_newton_graph",
    "gauss_newton_pose_calib",
    "gauss_newton_pose_rays",
    "huber_weight",
    "cholesky_solve",
    "solve_2x2",
    "solve_3x3",
    "sparse_schur_solve",
]
