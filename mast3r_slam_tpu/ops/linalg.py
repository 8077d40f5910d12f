"""Device-side linear algebra for the GN solvers.

The reference solved all normal equations on the host CPU (Accelerate LAPACK,
linalg.py:17-216 + `np.linalg.solve` in the GN runners), forcing a
GPU->CPU->GPU round trip per iteration. Here every solve is a jnp op inside
the jitted solver loop — the TPU never waits on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_solve(H: jax.Array, g: jax.Array, reg: float = 1e-6) -> jax.Array:
    """Solve (H + reg*I) x = g for symmetric PSD H (batched over leading dims).

    Parity target: reference linalg.py:17-50 (damped Cholesky).
    """
    n = H.shape[-1]
    H_reg = H + reg * jnp.eye(n, dtype=H.dtype)
    L = jnp.linalg.cholesky(H_reg)
    # Two triangular solves; jax.scipy solve_triangular is batched.
    y = jax.scipy.linalg.solve_triangular(L, g[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )
    return x[..., 0]


def solve_2x2(A: jax.Array, b: jax.Array, damping: float = 0.0) -> jax.Array:
    """Closed-form 2x2 solve (batched): used by iter_proj's LM step."""
    a11 = A[..., 0, 0] + damping
    a12 = A[..., 0, 1]
    a21 = A[..., 1, 0]
    a22 = A[..., 1, 1] + damping
    det = a11 * a22 - a12 * a21
    det = jnp.where(jnp.abs(det) < 1e-10, jnp.sign(det) * 1e-10 + 1e-10, det)
    inv_det = 1.0 / det
    x0 = (a22 * b[..., 0] - a12 * b[..., 1]) * inv_det
    x1 = (-a21 * b[..., 0] + a11 * b[..., 1]) * inv_det
    return jnp.stack([x0, x1], axis=-1)


def solve_3x3(A: jax.Array, b: jax.Array, damping: float = 0.0) -> jax.Array:
    """Closed-form 3x3 solve via adjugate (batched)."""
    A = A + damping * jnp.eye(3, dtype=A.dtype)
    # Cofactor expansion.
    c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
    c01 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
    c02 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
    det = A[..., 0, 0] * c00 + A[..., 0, 1] * c01 + A[..., 0, 2] * c02
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

    adj = jnp.stack(
        [
            jnp.stack(
                [
                    c00,
                    A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2],
                    A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    c01,
                    A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0],
                    A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    c02,
                    A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1],
                    A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    return (adj @ b[..., None])[..., 0] / det[..., None]


def sparse_schur_solve(
    Hpp: jax.Array,
    Hpl: jax.Array,
    Hll_diag: jax.Array,
    gp: jax.Array,
    gl: jax.Array,
    reg: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """Pose/landmark elimination with (block-)diagonal landmark Hessian.

    Solves  [Hpp  Hpl ] [xp]   [gp]
            [Hpl' Hll ] [xl] = [gl]
    with Hll diagonal, by forming the pose Schur complement on device.

    Args:
        Hpp: [P, P] pose block
        Hpl: [P, L] coupling block
        Hll_diag: [L] diagonal of the landmark block
        gp: [P], gl: [L]

    Returns:
        (xp [P], xl [L])

    Parity target: reference linalg.py:176-216 (an intended-BA structure the
    reference shipped but never wired in; usable here for landmark-augmented
    refinement).
    """
    Hll_inv = 1.0 / (Hll_diag + reg)
    # S = Hpp - Hpl Hll^-1 Hpl^T  (dense [P, P], MXU matmul)
    HplW = Hpl * Hll_inv[None, :]
    S = Hpp - HplW @ Hpl.T
    rhs = gp - HplW @ gl
    xp = cholesky_solve(S, rhs, reg=reg)
    xl = Hll_inv * (gl - Hpl.T @ xp)
    return xp, xl
