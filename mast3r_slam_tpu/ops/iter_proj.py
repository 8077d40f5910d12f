"""Iterative projective matching (pixel-to-ray dense correspondence).

The hot kernel of the frontend: for every point of view 2 (expressed as a
unit ray), find the pixel in view 1's ray image whose bilinearly-sampled ray
matches it, via a damped 2D Levenberg-Marquardt iteration per point.

TPU-native design
-----------------
Unlike the reference (Metal kernel `iter_proj_kernel`, one GPU thread per
point, with mlx->numpy->MTLBuffer host round trips at every call,
matching.py:370-390), this runs as ONE fused XLA program:

* the bilinear gather over the [B, H, W, 9] ray+gradient image is a batched
  `take` over a flattened [B, H*W, 9] buffer (XLA gather on HBM),
* the 2x2 damped normal equations are solved in closed form on the VPU,
* the LM loop is a fully unrolled `lax.scan` (no host sync for convergence
  checks — the reference's `.item()` early-exit, matching.py:320-321,
  becomes a per-point frozen mask so converged points simply stop moving;
  max_iter is a small static constant, and on this TPU toolchain XLA loop
  regions impose loop-carried buffer constraints that cost far more than
  the body itself — same finding as the window-unroll, docs/PLAN.md),
* everything stays on device; callers jit the enclosing tracking step.

Why there is NO hand-written Pallas variant of this kernel
----------------------------------------------------------
iter_proj is a per-point random-access gather chase — the access pattern the
reference's Metal kernel (one GPU thread per point, arbitrary VRAM loads) is
built for and the TPU vector unit is not: Mosaic's `tpu.dynamic_gather`
lowers `take_along_axis` only within a single (8, 128) register tile
(probed on this toolchain: every image-scale configuration fails to
compile), so a Pallas kernel cannot express an image-wide per-point gather
at all. The TPU-native answer is not a faster gather but a different
algorithm: `ops/dense_match.py` reformulates dense correspondence as
windowed cost volumes built from contiguous shifted reads + MXU matmuls
(no gather anywhere) and is the shipped default matcher (configs/tum.yaml,
`matching.method: dense`); its trajectory-accuracy equivalence to this
iterative matcher is covered end-to-end in tests/test_system_oracle.py.
This XLA implementation remains for reference parity (`method: iterative`)
and as the oracle twin.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.geometry import img_gradient, normalize_rays


def lin_to_pixel(idx: jax.Array, w: int) -> jax.Array:
    """Linear index -> (u, v)."""
    return jnp.stack([idx % w, idx // w], axis=-1)


def pixel_to_lin(p: jax.Array, w: int) -> jax.Array:
    """(u, v) -> linear index."""
    return p[..., 0] + w * p[..., 1]


def prep_for_iter_proj(
    X11: jax.Array, X21: jax.Array, idx_1_to_2_init: jax.Array | None
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Build the [B,H,W,9] ray+gradient image, target rays, and init pixels.

    Parity target: reference matching.py:134-175 (rays|dx|dy packing).
    """
    b, h, w, _ = X11.shape
    rays = normalize_rays(X11)  # [B, H, W, 3]
    gx, gy = img_gradient(rays)
    rays_with_grad = jnp.concatenate([rays, gx, gy], axis=-1)  # [B, H, W, 9]

    pts3d_norm = normalize_rays(X21.reshape(b, -1, 3))

    if idx_1_to_2_init is None:
        idx_1_to_2_init = jnp.broadcast_to(jnp.arange(h * w)[None, :], (b, h * w))
    p_init = lin_to_pixel(idx_1_to_2_init, w).astype(jnp.float32)
    return rays_with_grad, pts3d_norm, p_init


def bilinear_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Vectorized bilinear sampling: img [B,H,W,C], coords [B,N,2] -> [B,N,C].

    Coordinates are clamped to the valid interpolation domain, matching the
    reference semantics (matching.py:178-232) without its per-batch python
    loop.

    TPU gather shape: gathers here are ROW-rate-bound (per gathered row,
    not per byte — round-2/3 measurements in docs/PLAN.md), so instead of
    one row per corner (4N rows) this issues ONE `lax.gather` of contiguous
    [2, 2, C] blocks anchored at (y0, x0) — N rows, 4x fewer. The clamp to
    `w - 1.001` already guarantees `x0 <= w-2` (same for y), so the 2x2
    block is always in-bounds and the old `min(x0+1, w-1)` corner clamp is
    a no-op by construction.
    """
    b, h, w, c = img.shape
    if h < 2 or w < 2:
        raise ValueError(f"bilinear block gather needs h, w >= 2; got {h}x{w}")
    x = jnp.clip(coords[..., 0], 0.0, w - 1.001)
    y = jnp.clip(coords[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    # Belt-and-braces: the float clamp guarantees x0 <= w-2 only while
    # `w - 1.001` rounds below w-1 (true for w < ~16k in f32); the int clip
    # makes the 2x2 block in-bounds by arithmetic at ANY size, independent
    # of HLO gather's start-index clamping (ADVICE r3).
    x0 = jnp.clip(x0, 0, w - 2)
    y0 = jnp.clip(y0, 0, h - 2)
    fx = x - x0  # [B, N]
    fy = y - y0

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),  # the [2, 2, C] block dims in the output
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def gather_one(im, starts):
        # im [H, W, C], starts [N, 2] -> [N, 2, 2, C]
        return jax.lax.gather(
            im,
            starts,
            dimension_numbers=dnums,
            slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    starts = jnp.stack([y0, x0], axis=-1)  # [B, N, 2]
    v = jax.vmap(gather_one)(img, starts)  # [B, N, 2, 2, C]

    wy = jnp.stack([1.0 - fy, fy], axis=-1)[..., None]  # [B, N, 2, 1]
    wx = jnp.stack([1.0 - fx, fx], axis=-1)[..., None]
    # Reduce the 2x2 block: interpolate x within each row, then y.
    return jnp.sum(jnp.sum(v * wx[:, :, None], axis=3) * wy, axis=2)


@partial(jax.jit, static_argnames=("max_iter",))
def iter_proj(
    rays_with_grad: jax.Array,
    pts3d_norm: jax.Array,
    p_init: jax.Array,
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    convergence_thresh: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """Per-point 2D LM projection of target rays onto a ray image.

    Args:
        rays_with_grad: [B, H, W, 9] = [ray | d(ray)/dx | d(ray)/dy]
        pts3d_norm: [B, N, 3] unit target rays
        p_init: [B, N, 2] initial pixel positions
        max_iter, lambda_init, convergence_thresh: LM knobs
          (defaults = reference config, config.py:67-70)

    Returns:
        p: [B, N, 2] final pixel positions (clamped to image bounds)
        valid: [B, N] bool — in-bounds mask

    Math parity target: Metal `iter_proj_kernel` (iter_proj.metal:82-165) /
    MLX fallback (matching.py:235-336). The per-point early-exit becomes a
    frozen-mask update so the loop is fully data-independent.
    """
    b, h, w, _ = rays_with_grad.shape
    lam = jnp.asarray(lambda_init, rays_with_grad.dtype)
    thresh_sq = convergence_thresh * convergence_thresh

    def body(carry, _):
        p, frozen = carry
        sampled = bilinear_sample(rays_with_grad, p)  # [B, N, 9]
        r = sampled[..., 0:3] - pts3d_norm  # residual [B, N, 3]
        gx = sampled[..., 3:6]
        gy = sampled[..., 6:9]

        # Normal equations of the 3x2 Jacobian [gx | gy], damped.
        a11 = jnp.sum(gx * gx, axis=-1) + lam
        a12 = jnp.sum(gx * gy, axis=-1)
        a22 = jnp.sum(gy * gy, axis=-1) + lam
        b1 = jnp.sum(gx * r, axis=-1)
        b2 = jnp.sum(gy * r, axis=-1)

        det = jnp.maximum(a11 * a22 - a12 * a12, 1e-10)
        inv_det = 1.0 / det
        dx = -(a22 * b1 - a12 * b2) * inv_det
        dy = -(-a12 * b1 + a11 * b2) * inv_det
        delta = jnp.stack([dx, dy], axis=-1)

        step = jnp.where(frozen[..., None], 0.0, delta)
        p_new = p + step
        frozen_new = frozen | (jnp.sum(delta * delta, axis=-1) < thresh_sq)
        return (p_new, frozen_new), None

    frozen0 = jnp.zeros(p_init.shape[:-1], dtype=bool)
    # Unrolled: the body is traced ONCE (scan), then XLA's while-loop
    # simplifier inlines the unroll=max_iter trip — full fusion freedom,
    # no loop-carried aliasing constraints on the [B,N,*] buffers.
    (p, _), _ = jax.lax.scan(
        body,
        (p_init.astype(jnp.float32), frozen0),
        None,
        length=max_iter,
        unroll=max_iter,
    )

    valid = (p[..., 0] >= 0) & (p[..., 0] < w) & (p[..., 1] >= 0) & (p[..., 1] < h)
    p_final = jnp.stack(
        [jnp.clip(p[..., 0], 0, w - 1), jnp.clip(p[..., 1], 0, h - 1)], axis=-1
    )
    return p_final, valid


def iter_proj_reference(rays_with_grad, pts3d_norm, p_init, max_iter=10,
                        lambda_init=1e-8, convergence_thresh=1e-6):
    """Numpy oracle twin (slow, loop-free vectorized) for parity tests."""
    import numpy as np

    rays_with_grad = np.asarray(rays_with_grad, np.float32)
    pts3d_norm = np.asarray(pts3d_norm, np.float32)
    p = np.asarray(p_init, np.float32).copy()
    b, h, w, _ = rays_with_grad.shape
    frozen = np.zeros(p.shape[:-1], dtype=bool)

    def sample(img, coords):
        x = np.clip(coords[..., 0], 0, w - 1.001)
        y = np.clip(coords[..., 1], 0, h - 1.001)
        x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
        x1, y1 = np.minimum(x0 + 1, w - 1), np.minimum(y0 + 1, h - 1)
        fx, fy = (x - x0)[..., None], (y - y0)[..., None]
        flat = img.reshape(b, h * w, -1)
        bi = np.arange(b)[:, None]
        v00 = flat[bi, y0 * w + x0]
        v01 = flat[bi, y1 * w + x0]
        v10 = flat[bi, y0 * w + x1]
        v11 = flat[bi, y1 * w + x1]
        return ((1 - fx) * (1 - fy) * v00 + (1 - fx) * fy * v01
                + fx * (1 - fy) * v10 + fx * fy * v11)

    for _ in range(max_iter):
        s = sample(rays_with_grad, p)
        r = s[..., 0:3] - pts3d_norm
        gx, gy = s[..., 3:6], s[..., 6:9]
        a11 = np.sum(gx * gx, -1) + lambda_init
        a12 = np.sum(gx * gy, -1)
        a22 = np.sum(gy * gy, -1) + lambda_init
        b1 = np.sum(gx * r, -1)
        b2 = np.sum(gy * r, -1)
        det = np.maximum(a11 * a22 - a12 * a12, 1e-10)
        dx = -(a22 * b1 - a12 * b2) / det
        dy = -(-a12 * b1 + a11 * b2) / det
        delta = np.stack([dx, dy], -1)
        p = p + np.where(frozen[..., None], 0.0, delta)
        frozen |= np.sum(delta * delta, -1) < convergence_thresh ** 2

    valid = (p[..., 0] >= 0) & (p[..., 0] < w) & (p[..., 1] >= 0) & (p[..., 1] < h)
    p_final = np.stack(
        [np.clip(p[..., 0], 0, w - 1), np.clip(p[..., 1], 0, h - 1)], axis=-1
    )
    return p_final, valid
