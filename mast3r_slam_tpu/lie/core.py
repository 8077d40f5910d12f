"""Functional batched Lie-group operations (pure jnp, jit/vmap friendly).

All functions broadcast over arbitrary leading batch dimensions and are safe
to differentiate with jax.grad / jacfwd (small-angle branches are implemented
with `jnp.where` over Taylor expansions, guarding both value and gradient).

Semantics match the reference implementation's math (the exact Sim3
exponential with the full W-matrix from sim3_ops.py:161-226 of the
reference, not the SE3 approximation its MLX Sim3.exp used), but the
code is an independent derivation. See tests/test_lie.py for the axioms
and the autodiff cross-checks that pin the behavior down.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-angle switch point. f32 has ~7 digits; Taylor terms below are accurate
# to well past that at theta^2 < 1e-6.
_EPS = 1e-8
_SMALL = 1e-6


# ---------------------------------------------------------------------------
# Quaternions ([qx, qy, qz, qw], Hamilton)
# ---------------------------------------------------------------------------


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 ⊗ q2, batched over leading dims."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4].

    Uses the 2-cross-product form: v + qw*(2 qv×v) + qv×(2 qv×v).
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, v)
    return v + qw * uv + jnp.cross(qv, uv)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] from unit quaternion."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    rows = [
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------


def so3_exp(phi: jax.Array) -> jax.Array:
    """so(3) -> unit quaternion, with Taylor small-angle branch."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq + _EPS)
    half = 0.5 * theta
    small = theta_sq < _SMALL
    # sin(theta/2)/theta ≈ 1/2 - theta^2/48 ;  cos(theta/2) ≈ 1 - theta^2/8
    imag = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    real = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([imag * phi, real], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Unit quaternion -> so(3) rotation vector."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    nv_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    nv = jnp.sqrt(nv_sq + _EPS)
    # Map to the qw >= 0 hemisphere for the principal log.
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qv, qw = sign * qv, sign * qw
    theta = 2.0 * jnp.arctan2(nv, qw)
    small = nv_sq < _SMALL
    # theta/|qv| ≈ 2/qw * (1 - nv^2/(3 qw^2)) for small |qv|
    scale = jnp.where(
        small,
        2.0 / jnp.maximum(qw, 0.5) * (1.0 - nv_sq / (3.0 * jnp.maximum(qw, 0.5) ** 2)),
        theta / nv,
    )
    return scale * qv


def skew(v: jax.Array) -> jax.Array:
    """[..., 3] -> skew-symmetric [..., 3, 3] with skew(v) @ x = v × x."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


# ---------------------------------------------------------------------------
# SE(3): element [t(3), q(4)], tangent [v(3), w(3)]
# ---------------------------------------------------------------------------


def _so3_V(omega: jax.Array) -> jax.Array:
    """Left SO3 Jacobian V(w) with exp_SE3 translation t = V @ v."""
    theta_sq = jnp.sum(omega * omega, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta_sq + _EPS)
    small = theta_sq < _SMALL
    K = skew(omega)
    A = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    B = jnp.where(
        small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (theta_sq * theta)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + A * K + B * (K @ K)


def se3_exp(xi: jax.Array) -> jax.Array:
    """se(3) [..., 6] -> SE3 element [..., 7]."""
    v, omega = xi[..., :3], xi[..., 3:6]
    q = so3_exp(omega)
    t = (_so3_V(omega) @ v[..., None])[..., 0]
    return jnp.concatenate([t, q], axis=-1)


def se3_log(T: jax.Array) -> jax.Array:
    """SE3 element [..., 7] -> se(3) [..., 6]."""
    t, q = T[..., :3], T[..., 3:7]
    omega = so3_log(q)
    V = _so3_V(omega)
    v = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([v, omega], axis=-1)


# ---------------------------------------------------------------------------
# Sim(3): element [t(3), q(4), s(1)], tangent [v(3), w(3), sigma(1)]
# ---------------------------------------------------------------------------


def sim3_identity(batch_shape: tuple[int, ...] = (), dtype=jnp.float32) -> jax.Array:
    e = jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)
    return jnp.broadcast_to(e, (*batch_shape, 8))


_W_DOUBLINGS = 6  # handles ||sigma*I + [w]x|| up to ~16 (theta <= pi always)


def _sim3_W(omega: jax.Array, sigma: jax.Array) -> jax.Array:
    """Sim3 W matrix: exp translation t = W @ v, with W = ∫_0^1 e^{uM} du
    and M = sigma*I + [w]x (sigma*I commutes with [w]x).

    Unlike the reference's closed-form C/A/B coefficients
    (sim3_ops.py:184-216), which cancel catastrophically in float32 near
    their small-angle/small-scale branch points, this uses a branch-free
    scaling-and-doubling scheme that is uniformly accurate in all regimes
    and has clean gradients (pure polynomials + closed-form exponentials):

      1. series  W(m) = sum_{n>=0} m^n/(n+1)!  at m = M / 2^k  (||m|| <~ 0.25)
      2. doubling W(2m) = 0.5 * (I + e^m) @ W(m), with e^m known in closed
         form: e^{sigma/2^i} * R(omega/2^i).

    TPU-wise this is a handful of tiny matmuls — negligible against the
    pointmap kernels, and far cheaper than a data-dependent branch cascade.
    """
    dtype = omega.dtype
    K = skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), K.shape)
    scale = jnp.asarray(0.5**_W_DOUBLINGS, dtype)

    M = sigma[..., None, None] * eye * scale + K * scale
    # Horner for sum_{n=0..5} M^n/(n+1)!
    W = eye + M / 6.0
    W = eye + (M @ W) / 5.0
    W = eye + (M @ W) / 4.0
    W = eye + (M @ W) / 3.0
    W = eye + (M @ W) / 2.0

    for i in range(_W_DOUBLINGS):
        exp_scale = jnp.asarray(0.5 ** (_W_DOUBLINGS - i), dtype)
        R = quat_to_matrix(so3_exp(omega * exp_scale))
        E = jnp.exp(sigma * exp_scale)[..., None, None] * R
        W = 0.5 * ((eye + E) @ W)
    return W


def sim3_exp(xi: jax.Array) -> jax.Array:
    """sim(3) [..., 7] -> Sim3 element [..., 8] (exact, all regimes)."""
    v, omega, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    q = so3_exp(omega)
    s = jnp.exp(sigma)
    W = _sim3_W(omega, sigma)
    t = (W @ v[..., None])[..., 0]
    return jnp.concatenate([t, q, s[..., None]], axis=-1)


def sim3_log(T: jax.Array) -> jax.Array:
    """Sim3 element [..., 8] -> sim(3) [..., 7] (exact inverse of sim3_exp)."""
    t, q, s = T[..., :3], T[..., 3:7], T[..., 7]
    omega = so3_log(q)
    sigma = jnp.log(s)
    W = _sim3_W(omega, sigma)
    v = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([v, omega, sigma[..., None]], axis=-1)


def sim3_inv(T: jax.Array) -> jax.Array:
    """Inverse: (t, R, s) -> (-s^-1 R^T t, R^T, s^-1)."""
    t, q, s = T[..., :3], T[..., 3:7], T[..., 7:8]
    q_inv = quat_conj(q)
    s_inv = 1.0 / s
    t_inv = -s_inv * quat_rotate(q_inv, t)
    return jnp.concatenate([t_inv, q_inv, s_inv], axis=-1)


def sim3_mul(Ta: jax.Array, Tb: jax.Array) -> jax.Array:
    """Compose: (Ta * Tb) acting as p -> Ta(Tb(p))."""
    ta, qa, sa = Ta[..., :3], Ta[..., 3:7], Ta[..., 7:8]
    tb, qb, sb = Tb[..., :3], Tb[..., 3:7], Tb[..., 7:8]
    q = quat_mul(qa, qb)
    s = sa * sb
    t = sa * quat_rotate(qa, tb) + ta
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_act(T: jax.Array, p: jax.Array) -> jax.Array:
    """Apply: s * R @ p + t. T broadcasts against points p [..., 3]."""
    t, q, s = T[..., :3], T[..., 3:7], T[..., 7:8]
    return s * quat_rotate(q, p) + t


def sim3_relative(Ti: jax.Array, Tj: jax.Array) -> jax.Array:
    """T_ij = T_i^-1 * T_j (maps j-frame points into i's frame)."""
    return sim3_mul(sim3_inv(Ti), Tj)


def sim3_matrix(T: jax.Array) -> jax.Array:
    """Homogeneous 4x4 [..., 4, 4] with s*R upper-left block."""
    t, q, s = T[..., :3], T[..., 3:7], T[..., 7:8]
    R = quat_to_matrix(q)
    sR = s[..., None] * R
    top = jnp.concatenate([sR, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), (*T.shape[:-1], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def sim3_adjoint(T: jax.Array) -> jax.Array:
    """Adjoint matrix Ad_T [..., 7, 7]: T exp(xi) T^-1 = exp(Ad_T xi).

    With tangent ordering (v, w, sigma):
        Ad_T = [[ s R,  [t]x R,  -t ],
                [  0,      R,     0 ],
                [  0,      0,     1 ]]
    """
    t, q, s = T[..., :3], T[..., 3:7], T[..., 7:8]
    R = quat_to_matrix(q)
    batch = T.shape[:-1]
    dtype = T.dtype

    top_left = s[..., None] * R
    top_mid = skew(t) @ R
    top_right = -t[..., None]
    top = jnp.concatenate([top_left, top_mid, top_right], axis=-1)  # [..., 3, 7]

    zeros33 = jnp.zeros((*batch, 3, 3), dtype)
    zeros31 = jnp.zeros((*batch, 3, 1), dtype)
    mid = jnp.concatenate([zeros33, R, zeros31], axis=-1)  # [..., 3, 7]

    bottom = jnp.broadcast_to(
        jnp.concatenate(
            [jnp.zeros((6,), dtype), jnp.ones((1,), dtype)], axis=0
        ),
        (*batch, 1, 7),
    )
    return jnp.concatenate([top, mid, bottom], axis=-2)


def sim3_retract(T: jax.Array, xi: jax.Array) -> jax.Array:
    """LEFT retraction: T_new = exp(xi) * T (the one convention, everywhere)."""
    return sim3_mul(sim3_exp(xi), T)


def point_jacobian(p: jax.Array) -> jax.Array:
    """d(exp(xi) . p)/dxi at xi=0, for left perturbation: [..., 3, 7].

    exp(xi).p ≈ p + v + w×p + sigma*p  =>  J = [ I | -[p]x | p ].
    This is the Jacobian that pairs with `sim3_retract` (left); the
    reference used the same matrix (geometry.py:114-135) but then
    right-retracted in its tracker — we keep the pairing consistent.
    """
    batch = p.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), (*batch, 3, 3))
    return jnp.concatenate([eye, -skew(p), p[..., None]], axis=-1)
