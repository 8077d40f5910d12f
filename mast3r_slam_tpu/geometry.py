"""Projective geometry with analytic Jacobians (pure jnp).

Provides the measurement functions used by the tracker and backend:
ray-distance representation, calibrated projection with log-depth, ray
constraints, pixel grids. All Jacobians are analytic (and cross-checked
against jax.jacfwd in tests/test_geometry.py).

Behavioral parity targets in the reference: geometry.py:34-302.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.lie import core as lie

_EPS = 1e-10


def skew_sym(v: jax.Array) -> jax.Array:
    return lie.skew(v)


def point_to_dist(X: jax.Array) -> jax.Array:
    """Euclidean norm with the reference's epsilon (geometry.py:34-43)."""
    return jnp.sqrt(jnp.sum(X * X, axis=-1, keepdims=True) + _EPS)


def normalize_rays(X: jax.Array) -> jax.Array:
    return X / point_to_dist(X)


def point_to_ray_dist(X: jax.Array, jacobian: bool = False):
    """[..., 3] point -> [..., 4] ray-distance [rx, ry, rz, d].

    Jacobian [..., 4, 3]:
      dr/dX = (1/d)(I - r r^T),   dd/dX = r^T
    (reference: geometry.py:46-92).
    """
    d = point_to_dist(X)
    d_inv = 1.0 / d
    r = d_inv * X
    rd = jnp.concatenate([r, d], axis=-1)
    if not jacobian:
        return rd

    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), (*X.shape[:-1], 3, 3))
    rrT = r[..., :, None] * r[..., None, :]
    dr_dX = d_inv[..., None] * (eye - rrT)
    dd_dX = r[..., None, :]
    return rd, jnp.concatenate([dr_dX, dd_dX], axis=-2)


def act_Sim3(T_data: jax.Array, p: jax.Array, jacobian: bool = False):
    """Transform points by Sim3 and optionally return the left-perturbation
    Jacobian d(exp(xi) T p)/dxi = [I | -[pW]x | pW] (pairs with left retract).

    Args:
        T_data: Sim3 element [..., 8] (broadcasts over points).
        p: points [..., 3].
    """
    pW = lie.sim3_act(T_data, p)
    if not jacobian:
        return pW
    return pW, lie.point_jacobian(pW)


def decompose_K(K: jax.Array):
    return K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]


def project_calib(
    P: jax.Array,
    K: jax.Array,
    img_size: tuple[int, int],
    jacobian: bool = False,
    border: int = 0,
    z_eps: float = 0.0,
):
    """Project [..., 3] points: returns [u, v, log z] plus validity mask.

    Validity: border < u < w-1-border, border < v < h-1-border, z > z_eps
    (reference: geometry.py:156-226). Jacobian [..., 3, 3] is the pinhole
    projection chain with d(log z)/dz = 1/z.
    """
    h, w = img_size
    fx, fy, cx, cy = decompose_K(K)
    x, y, z = jnp.moveaxis(P, -1, 0)
    z_inv = 1.0 / (z + _EPS)
    u = fx * x * z_inv + cx
    v = fy * y * z_inv + cy

    valid_u = (u > border) & (u < w - 1 - border)
    valid_v = (v > border) & (v < h - 1 - border)
    valid_z = z > z_eps
    valid = (valid_u & valid_v & valid_z)[..., None]

    logz = jnp.where(valid_z, jnp.log(jnp.maximum(z, _EPS) + _EPS), 0.0)
    pz = jnp.stack([u, v, logz], axis=-1)

    if not jacobian:
        return pz, valid

    zero = jnp.zeros_like(z)
    J = jnp.stack(
        [
            jnp.stack([fx * z_inv, zero, -fx * x * z_inv * z_inv], axis=-1),
            jnp.stack([zero, fy * z_inv, -fy * y * z_inv * z_inv], axis=-1),
            jnp.stack([zero, zero, z_inv], axis=-1),
        ],
        axis=-2,
    )
    return pz, J, valid


def backproject(p: jax.Array, z: jax.Array, K: jax.Array) -> jax.Array:
    """2D pixels [..., 2] + depth [..., 1] -> 3D points [..., 3]."""
    fx, fy, cx, cy = decompose_K(K)
    x = (p[..., 0:1] - cx) / fx * z
    y = (p[..., 1:2] - cy) / fy * z
    return jnp.concatenate([x, y, z], axis=-1)


def get_pixel_coords(
    batch_size: int, img_size: tuple[int, int], dtype=jnp.float32
) -> jax.Array:
    """[B, H, W, 2] grid of (u, v) pixel coordinates."""
    h, w = img_size
    u = jnp.arange(w, dtype=dtype)
    v = jnp.arange(h, dtype=dtype)
    vg, ug = jnp.meshgrid(v, u, indexing="ij")
    uv = jnp.stack([ug, vg], axis=-1)
    return jnp.broadcast_to(uv[None], (batch_size, h, w, 2))


def constrain_points_to_ray(
    img_size: tuple[int, int], Xs: jax.Array, K: jax.Array
) -> jax.Array:
    """Snap [B, H*W, 3] points onto their pixel rays, keeping depth
    (calibrated mode; reference geometry.py:273-302)."""
    b = Xs.shape[0]
    uv = get_pixel_coords(b, img_size, dtype=Xs.dtype).reshape(b, -1, 2)
    return backproject(uv, Xs[..., 2:3], K)


def cartesian_to_spherical(P: jax.Array) -> jax.Array:
    r = point_to_dist(P)
    x, y, z = P[..., 0:1], P[..., 1:2], P[..., 2:3]
    phi = jnp.arctan2(y, x)
    theta = jnp.arccos(jnp.clip(z / r, -1.0, 1.0))
    return jnp.concatenate([r, phi, theta], axis=-1)


def spherical_to_cartesian(S: jax.Array) -> jax.Array:
    r, phi, theta = S[..., 0:1], S[..., 1:2], S[..., 2:3]
    st = jnp.sin(theta)
    return jnp.concatenate(
        [r * st * jnp.cos(phi), r * st * jnp.sin(phi), r * jnp.cos(theta)], axis=-1
    )


def img_gradient(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Central-difference gradients of [B, H, W, C] images, zero at borders
    (reference: image.py:9-34, but channels-last — TPU-friendly layout)."""
    gx_core = (img[:, :, 2:, :] - img[:, :, :-2, :]) * 0.5
    gy_core = (img[:, 2:, :, :] - img[:, :-2, :, :]) * 0.5
    gx = jnp.pad(gx_core, ((0, 0), (0, 0), (1, 1), (0, 0)))
    gy = jnp.pad(gy_core, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return gx, gy
