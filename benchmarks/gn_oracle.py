"""Numpy float64 oracle twin of `ops.gauss_newton.gauss_newton_graph`.

Independent slow-path implementation (explicit per-edge loops, float64
accumulation, numpy linalg) of the factor-graph Gauss-Newton solver, for
the kernel benchmark's numeric-agreement rows — the parity-pair pattern of
the reference's test strategy (SURVEY §4: every device kernel ships with a
numpy twin; reference gauss_newton.py:23-280 was the analog for its Metal
kernel). Math conventions mirror mast3r_slam_tpu.lie.core exactly:
quaternions [x,y,z,w], Sim3 elements [t(3), q(4), s(1)], tangent
[v, w, sigma], LEFT retraction T_new = exp(xi) * T.
"""

from __future__ import annotations

import numpy as np


# -------------------------------------------------------------- quaternions


def quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ]
    )


def quat_conj(q):
    return np.array([-q[0], -q[1], -q[2], q[3]])


def quat_to_matrix(q):
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def so3_exp(omega):
    theta = np.linalg.norm(omega)
    if theta < 1e-12:
        half = 0.5 * omega
        return np.array([half[0], half[1], half[2], 1.0])
    axis = omega / theta
    s = np.sin(theta / 2)
    return np.array([axis[0] * s, axis[1] * s, axis[2] * s, np.cos(theta / 2)])


def skew(p):
    return np.array(
        [[0, -p[2], p[1]], [p[2], 0, -p[0]], [-p[1], p[0], 0]], dtype=np.float64
    )


# --------------------------------------------------------------------- Sim3


def sim3_mul(Ta, Tb):
    ta, qa, sa = Ta[:3], Ta[3:7], Ta[7]
    tb, qb, sb = Tb[:3], Tb[3:7], Tb[7]
    Ra = quat_to_matrix(qa)
    return np.concatenate(
        [sa * (Ra @ tb) + ta, quat_mul(qa, qb), [sa * sb]]
    )


def sim3_inv(T):
    t, q, s = T[:3], T[3:7], T[7]
    q_inv = quat_conj(q)
    R_inv = quat_to_matrix(q_inv)
    return np.concatenate([-(1.0 / s) * (R_inv @ t), q_inv, [1.0 / s]])


def sim3_act(T, P):
    """P [N, 3]."""
    t, q, s = T[:3], T[3:7], T[7]
    return s * (P @ quat_to_matrix(q).T) + t


def sim3_adjoint(T):
    t, q, s = T[:3], T[3:7], T[7]
    R = quat_to_matrix(q)
    Ad = np.zeros((7, 7))
    Ad[:3, :3] = s * R
    Ad[:3, 3:6] = skew(t) @ R
    Ad[:3, 6] = -t
    Ad[3:6, 3:6] = R
    Ad[6, 6] = 1.0
    return Ad


def _sim3_W(omega, sigma, doublings=6):
    """Same branch-free scaling-and-doubling scheme as lie.core._sim3_W."""
    K = skew(omega)
    eye = np.eye(3)
    scale = 0.5**doublings
    M = sigma * eye * scale + K * scale
    W = eye + M / 6.0
    for div in (5.0, 4.0, 3.0, 2.0):
        W = eye + (M @ W) / div
    for i in range(doublings):
        e = 0.5 ** (doublings - i)
        E = np.exp(sigma * e) * quat_to_matrix(so3_exp(omega * e))
        W = 0.5 * ((eye + E) @ W)
    return W


def sim3_exp(xi):
    v, omega, sigma = xi[:3], xi[3:6], xi[6]
    return np.concatenate(
        [_sim3_W(omega, sigma) @ v, so3_exp(omega), [np.exp(sigma)]]
    )


def sim3_retract(T, xi):
    return sim3_mul(sim3_exp(xi), T)


def point_jacobian(P):
    """[N, 3, 7] = [I | -[p]x | p] (left perturbation)."""
    n = P.shape[0]
    J = np.zeros((n, 3, 7))
    J[:, :, :3] = np.eye(3)
    for k in range(n):
        J[k, :, 3:6] = -skew(P[k])
    J[:, :, 6] = P
    return J


def huber_weight(r, k=1.345):
    r_abs = np.abs(r)
    return np.where(r_abs < k, 1.0, k / np.maximum(r_abs, 1e-12))


# --------------------------------------------------------------- the solver


def gauss_newton_graph_reference(
    Twc,  # [K, 8]
    Xs,  # [K, N, 3]
    Cs,  # [K, N]
    ii,  # [E]
    jj,  # [E]
    idx_ii2jj,  # [E, N]
    valid_match,  # [E, N]
    Q,  # [E, N]
    edge_mask,  # [E]
    free_mask,  # [K]
    mode="rays",
    K_intr=None,
    img_size=None,
    params=None,
):
    """Float64 per-edge-loop twin of gauss_newton_graph (fixed-iteration)."""
    from mast3r_slam_tpu.ops.gauss_newton import GNParams

    p = params or GNParams()
    Twc = np.asarray(Twc, np.float64).copy()
    Xs = np.asarray(Xs, np.float64)
    Cs = np.asarray(Cs, np.float64)
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    idx_ii2jj = np.asarray(idx_ii2jj)
    Q = np.asarray(Q, np.float64)
    Kn = Twc.shape[0]
    free = np.asarray(free_mask, bool)

    # Pose-independent weight gates (mirror of the device precompute).
    wm = np.asarray(valid_match, bool) & (Q > p.Q_thresh)
    for e in range(ii.shape[0]):
        Ci = Cs[ii[e]][idx_ii2jj[e]]
        Cj = Cs[jj[e]]
        wm[e] &= (Ci > p.C_thresh) & (Cj > p.C_thresh) & bool(edge_mask[e])
    wm = wm.astype(np.float64)

    for _ in range(p.max_iter):
        H = np.zeros((Kn, 7, Kn, 7))
        g = np.zeros((Kn, 7))
        for e in range(ii.shape[0]):
            i, j = int(ii[e]), int(jj[e])
            Ti, Tj = Twc[i], Twc[j]
            Tij = sim3_mul(sim3_inv(Ti), Tj)
            Xi = Xs[i][idx_ii2jj[e]]  # [N, 3]
            X_Ci = sim3_act(Tij, Xs[j])  # [N, 3]
            JpAd = point_jacobian(X_Ci) @ sim3_adjoint(sim3_inv(Ti))

            if mode in ("rays", "points"):
                sig = 1.0 / p.sigma_ray
                r = sig * (X_Ci - Xi)
                J = sig * JpAd
                gate = np.ones(r.shape[0])
                if mode == "points":
                    scale = 1.0 / (np.linalg.norm(Xi, axis=-1) + 1e-6)
                    r = r * scale[:, None]
                    J = J * scale[:, None, None]
            elif mode == "calib":
                h, w = img_size
                Km = np.asarray(K_intr, np.float64)
                fx, fy, cx, cy = Km[0, 0], Km[1, 1], Km[0, 2], Km[1, 2]
                spi, sdi = 1.0 / p.sigma_pixel, 1.0 / p.sigma_depth
                zi = np.maximum(Xi[:, 2], 1e-6)
                zj = np.maximum(X_Ci[:, 2], 1e-6)
                uj = fx * X_Ci[:, 0] / zj + cx
                vj = fy * X_Ci[:, 1] / zj + cy
                ui = fx * Xi[:, 0] / zi + cx
                vi = fy * Xi[:, 1] / zi + cy
                r = np.stack(
                    [spi * (uj - ui), spi * (vj - vi), sdi * (np.log(zj) - np.log(zi))],
                    axis=-1,
                )
                n = r.shape[0]
                dproj = np.zeros((n, 3, 3))
                dproj[:, 0, 0] = spi * fx / zj
                dproj[:, 0, 2] = -spi * fx * X_Ci[:, 0] / zj**2
                dproj[:, 1, 1] = spi * fy / zj
                dproj[:, 1, 2] = -spi * fy * X_Ci[:, 1] / zj**2
                dproj[:, 2, 2] = sdi / zj
                J = np.einsum("nra,nac->nrc", dproj, JpAd)
                b_ = p.pixel_border
                gate = (
                    (X_Ci[:, 2] > p.z_eps)
                    & (Xi[:, 2] > p.z_eps)
                    & (uj >= b_)
                    & (uj < w - b_)
                    & (vj >= b_)
                    & (vj < h - b_)
                ).astype(np.float64)
            else:
                raise ValueError(mode)

            sqrt_conf = np.sqrt(np.maximum(Q[e], 0.0))
            hub = huber_weight(sqrt_conf[:, None] * r, p.huber_k)
            wgt = hub * (Q[e] * wm[e] * gate)[:, None]  # [N, R]

            S = np.einsum("nr,nrc,nrd->cd", wgt, J, J)
            b = np.einsum("nr,nrc->c", wgt * r, J)
            H[i, :, i, :] += S
            H[j, :, j, :] += S
            H[i, :, j, :] -= S
            H[j, :, i, :] -= S
            g[j] += b
            g[i] -= b

        freeF = free.astype(np.float64)
        H *= freeF[:, None, None, None] * freeF[None, None, :, None]
        for k in range(Kn):
            if not free[k]:
                H[k, :, k, :] += np.eye(7)
        g *= freeF[:, None]

        H_flat = H.reshape(7 * Kn, 7 * Kn)
        reg = p.reg * max(np.abs(np.diagonal(H_flat)).max(), 1.0)
        dx = np.linalg.solve(
            H_flat + reg * np.eye(7 * Kn), -g.reshape(-1)
        ).reshape(Kn, 7)
        dx *= freeF[:, None]
        for k in range(Kn):
            if free[k]:
                Twc[k] = sim3_retract(Twc[k], dx[k])
        if np.linalg.norm(dx) < p.delta_thresh:
            break
    return Twc
