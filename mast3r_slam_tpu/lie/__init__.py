"""Batched Lie groups (SO3 / SE3 / Sim3) for JAX.

Layout conventions (shared with the whole framework, and matching the
reference's cross-cutting contract, SURVEY.md §2.3):

* quaternion: ``[qx, qy, qz, qw]`` Hamilton convention
* SE3 element: ``[t(3), q(4)]`` — embedded dim 7, tangent dim 6 ``[v, w]``
* Sim3 element: ``[t(3), q(4), s(1)]`` — embedded dim 8, tangent dim 7
  ``[v, w, sigma]``

One retraction convention is used EVERYWHERE: **left** retraction
``T_new = exp(xi) * T`` with matching left-perturbation Jacobians
(the reference mixed right-retraction in the tracker with left-retraction in
the backend kernels — see SURVEY.md §2.3 warning; we do not reproduce that).
"""

from mast3r_slam_tpu.lie import core
from mast3r_slam_tpu.lie.core import (
    quat_mul,
    quat_conj,
    quat_rotate,
    quat_to_matrix,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    sim3_identity,
    sim3_exp,
    sim3_log,
    sim3_inv,
    sim3_mul,
    sim3_act,
    sim3_matrix,
    sim3_adjoint,
    sim3_retract,
    sim3_relative,
    point_jacobian,
)
from mast3r_slam_tpu.lie.groups import SO3, SE3, Sim3

__all__ = [
    "core",
    "quat_mul",
    "quat_conj",
    "quat_rotate",
    "quat_to_matrix",
    "so3_exp",
    "so3_log",
    "se3_exp",
    "se3_log",
    "sim3_identity",
    "sim3_exp",
    "sim3_log",
    "sim3_inv",
    "sim3_mul",
    "sim3_act",
    "sim3_matrix",
    "sim3_adjoint",
    "sim3_retract",
    "sim3_relative",
    "point_jacobian",
    "SO3",
    "SE3",
    "Sim3",
]
