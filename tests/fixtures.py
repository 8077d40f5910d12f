"""Geometrically consistent synthetic fixtures.

Lesson adopted from the reference's benchmark notes (SURVEY.md §4.3):
i.i.d.-random geometry breaks calibrated kernels (points behind camera,
projections out of bounds) and random descriptors make argmax tie-breaking
diverge. These generators guarantee positive depth, in-bounds projections,
and smooth surfaces.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.lie import core as lie


def camera_K(h: int, w: int, f: float = 1.2) -> jnp.ndarray:
    return jnp.asarray(
        [[f * w, 0.0, w / 2], [0.0, f * w, h / 2], [0.0, 0.0, 1.0]], jnp.float32
    )


def smooth_depth(rng, h: int, w: int, z0=2.0, amp=0.4) -> np.ndarray:
    """Smooth positive depth map in [z0-amp, z0+amp]."""
    u = np.linspace(0, 2 * np.pi, w)
    v = np.linspace(0, 2 * np.pi, h)
    ph = rng.uniform(0, 2 * np.pi, size=4)
    z = (
        z0
        + 0.5 * amp * np.sin(u[None, :] + ph[0]) * np.cos(v[:, None] + ph[1])
        + 0.5 * amp * np.cos(2 * u[None, :] + ph[2]) * np.sin(2 * v[:, None] + ph[3])
    )
    return z.astype(np.float32)


def world_surface(rng, h: int, w: int, K) -> np.ndarray:
    """World points [h*w, 3]: a smooth surface in front of the origin camera."""
    z = smooth_depth(rng, h, w).reshape(-1, 1)
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    uv = np.stack([uu.ravel(), vv.ravel()], axis=-1).astype(np.float32)
    Knp = np.asarray(K)
    x = (uv[:, 0:1] - Knp[0, 2]) / Knp[0, 0] * z
    y = (uv[:, 1:2] - Knp[1, 2]) / Knp[1, 1] * z
    return np.concatenate([x, y, z], axis=-1).astype(np.float32)


def random_poses(rng, num_kf: int, trans=0.08, rot=0.05, logscale=0.03) -> np.ndarray:
    """Sim3 poses [num_kf, 8] near identity (a short smooth trajectory).
    Pose 0 is exactly identity (the pinned gauge)."""
    poses = [np.asarray(lie.sim3_identity())]
    for _ in range(num_kf - 1):
        xi = np.concatenate(
            [
                rng.normal(size=3) * trans,
                rng.normal(size=3) * rot,
                rng.normal(size=1) * logscale,
            ]
        ).astype(np.float32)
        poses.append(np.asarray(lie.sim3_exp(jnp.asarray(xi))))
    return np.stack(poses)


def make_graph_problem(rng, num_kf=4, h=8, w=12, num_edges=None, permute=True):
    """Synthetic factor-graph problem with known ground-truth poses.

    Every keyframe observes the SAME world surface; keyframe k's pointmap is
    the surface in camera-k coordinates, optionally with a per-keyframe
    pixel permutation (exercising the correspondence gather).

    Returns dict with ground truth and the arrays `gauss_newton_graph` takes.
    """
    n = h * w
    K = camera_K(h, w)
    P = world_surface(rng, h, w, K)  # [N, 3] world

    Twc_gt = random_poses(rng, num_kf)  # camera-to-world (T_WC)
    perms = []
    Xs = []
    for k in range(num_kf):
        X_cam = np.asarray(
            lie.sim3_act(jnp.asarray(lie.sim3_inv(jnp.asarray(Twc_gt[k]))), jnp.asarray(P))
        )
        perm = rng.permutation(n) if permute else np.arange(n)
        perms.append(perm)
        Xs.append(X_cam[perm])
    Xs = np.stack(Xs).astype(np.float32)  # [K, N, 3]

    if num_edges is None:
        edges = [(i, j) for i in range(num_kf) for j in range(num_kf) if i != j]
    else:
        edges = []
        while len(edges) < num_edges:
            i, j = rng.integers(0, num_kf, size=2)
            if i != j:
                edges.append((int(i), int(j)))
    ii = np.asarray([e[0] for e in edges], np.int32)
    jj = np.asarray([e[1] for e in edges], np.int32)

    # idx_ii2jj[e, n]: index into Xs[i] matching point n of Xs[j].
    # Xs[i][a] = X_cam_i[perm_i[a]]  =>  want perm_i[idx] == perm_j[n].
    idx = np.stack(
        [np.argsort(perms[i])[perms[j]] for i, j in edges]
    ).astype(np.int32)

    valid = np.ones((len(edges), n), bool)
    Q = np.full((len(edges), n), 4.0, np.float32)  # above the 1.5 gate
    Cs = np.full((num_kf, n), 10.0, np.float32)

    return dict(
        Twc_gt=jnp.asarray(Twc_gt),
        Xs=jnp.asarray(Xs),
        Cs=jnp.asarray(Cs),
        ii=jnp.asarray(ii),
        jj=jnp.asarray(jj),
        idx=jnp.asarray(idx),
        valid=jnp.asarray(valid),
        Q=jnp.asarray(Q),
        K=K,
        img_size=(h, w),
        n=n,
    )


def perturb_poses(rng, Twc, mag=0.03, pin=1):
    """Left-multiply noise onto all but the first `pin` poses."""
    out = [np.asarray(Twc[k]) for k in range(Twc.shape[0])]
    for k in range(pin, len(out)):
        xi = (rng.normal(size=7) * mag).astype(np.float32)
        out[k] = np.asarray(lie.sim3_retract(jnp.asarray(out[k]), jnp.asarray(xi)))
    return jnp.asarray(np.stack(out))


def pose_distance(Ta, Tb) -> float:
    """Norm of log(Ta * Tb^-1) — left-invariant pose error."""
    rel = lie.sim3_mul(jnp.asarray(Ta), lie.sim3_inv(jnp.asarray(Tb)))
    return float(np.linalg.norm(np.asarray(lie.sim3_log(rel))))
