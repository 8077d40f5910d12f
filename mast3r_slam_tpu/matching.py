"""Dense two-view correspondence (the L5 layer of SURVEY.md).

`match()` produces per-pixel correspondences from view 1's pointmap to
view 2's, either by warm-start + 3D-distance gating ("simple") or by full
iterative projective matching + descriptor refinement. Everything runs as
one jitted device program per (B, H, W) shape — the reference's
mlx->numpy->Metal round trips (matching.py:370-431) do not exist here.

Parity targets: reference matching.py:12-461.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.config import get_config
from mast3r_slam_tpu.ops.iter_proj import (
    iter_proj,
    lin_to_pixel,
    pixel_to_lin,
    prep_for_iter_proj,
)
from mast3r_slam_tpu.ops.refine import refine_matches


def match(
    X11: jax.Array,
    X21: jax.Array,
    D11: jax.Array,
    D21: jax.Array,
    idx_1_to_2_init: jax.Array | None = None,
    payload: jax.Array | None = None,
    want_hit: bool = False,
):
    """Match pointmaps of two views.

    Args:
        X11: view-1 points in view-1 frame [B, H, W, 3]
        X21: view-2 points in view-1 frame [B, H, W, 3]
        D11 / D21: descriptors [B, H, W, D]
        idx_1_to_2_init: warm-start correspondence indices [B, H*W]
        payload: optional [B, H, W, P] per-view-1-pixel values; when given,
            the result also carries `payload_g` = payload rows selected at
            the match (== `payload.reshape(B,N,P)[idx]`). The dense matcher
            folds the selection into its tap streams (bf16, no row gather);
            other methods fall back to one packed row gather here.
        want_hit: also return `hit` [B, H*W] bool = "view-1 pixel claimed by
            ≥1 valid match" (the uniqueness statistic). Dense matching
            computes it as shifted ORs; other methods scatter.

    Returns:
        (idx_1_to_2 [B, H*W] int32, valid [B, H*W, 1] bool), with
        payload_g [B, H*W, P] and/or hit [B, H*W] appended when requested.
    """
    cfg = get_config().matching
    method = cfg.method
    if method == "auto":
        method = "simple" if cfg.use_simple else "iterative"
    if method == "dense":
        # The VMEM-tiled Pallas twin of this matcher was measured and
        # retired (round 5): on this toolchain bf16 `dynamic_rotate` and
        # tile-unaligned dynamic ref offsets do not lower (re-probed each
        # round via scripts/probe_mosaic_rotate.py — still FAIL), forcing
        # an f32 round-trip that made it 6.5 vs 3.4 ms against the XLA
        # formulation. XLA's shifted-tap fusion is the shipped path.
        from mast3r_slam_tpu.ops.dense_match import match_dense_window

        return match_dense_window(
            X11,
            X21,
            D11,
            D21,
            radius=cfg.dense_radius,
            dilations=tuple(cfg.dense_dilations),
            desc_weight=cfg.dense_desc_weight,
            dist_thresh=cfg.dist_thresh,
            payload=payload,
            want_hit=want_hit,
        )
    if method == "simple":
        idx, valid = match_simple(X11, X21, idx_1_to_2_init, cfg.dist_thresh)
    else:
        idx, valid = match_iterative_proj(
            X11,
            X21,
            D11,
            D21,
            idx_1_to_2_init,
            max_iter=cfg.max_iter,
            lambda_init=cfg.lambda_init,
            convergence_thresh=cfg.convergence_thresh,
            dist_thresh=cfg.dist_thresh,
            use_refine=cfg.use_refine,
            refine_radius=cfg.refine_radius,
            refine_dilation=cfg.refine_dilation,
        )
    out = [idx, valid]
    if payload is not None:
        b = payload.shape[0]
        pay_flat = payload.reshape(b, -1, payload.shape[-1])
        out.append(jnp.take_along_axis(pay_flat, idx[..., None], axis=1))
    if want_hit:
        b, n = idx.shape
        hit = (
            jnp.zeros((b, n), jnp.float32)
            .at[jnp.arange(b)[:, None], idx]
            .max(valid[..., 0].astype(jnp.float32))
        )
        out.append(hit > 0.5)
    return tuple(out)


@partial(jax.jit, static_argnames=())
def _gather_points(X_flat: jax.Array, idx: jax.Array) -> jax.Array:
    """[B, N, 3] gathered at [B, N] indices."""
    return jnp.take_along_axis(X_flat, idx[..., None], axis=1)


def match_simple(
    X11: jax.Array,
    X21: jax.Array,
    idx_1_to_2_init: jax.Array | None = None,
    dist_thresh: float = 0.1,
) -> tuple[jax.Array, jax.Array]:
    """Warm-start (or identity) correspondences + 3D distance gate
    (parity: reference matching.py:41-90 — minus its per-batch host loop)."""
    b, h, w = X21.shape[:3]
    n = h * w
    if idx_1_to_2_init is None:
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    else:
        idx = idx_1_to_2_init.astype(jnp.int32)

    X11_flat = X11.reshape(b, n, 3)
    X21_flat = X21.reshape(b, n, 3)
    X11_sampled = _gather_points(X11_flat, idx)
    dist = jnp.linalg.norm(X11_sampled - X21_flat, axis=-1)
    valid = dist < dist_thresh
    return idx, valid[..., None]


@partial(
    jax.jit,
    static_argnames=(
        "max_iter",
        "use_refine",
        "refine_radius",
        "refine_dilation",
    ),
)
def match_iterative_proj(
    X11: jax.Array,
    X21: jax.Array,
    D11: jax.Array,
    D21: jax.Array,
    idx_1_to_2_init: jax.Array | None = None,
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    convergence_thresh: float = 1e-6,
    dist_thresh: float = 0.1,
    use_refine: bool = True,
    refine_radius: int = 3,
    refine_dilation: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Full pipeline: ray-image LM projection -> descriptor window refinement
    -> 3D occlusion gate. One fused device program.

    (parity: reference matching.py:339-461 + Metal kernels; the reference's
    dead `refine_*` config keys are live here — config.py fixes them.)
    """
    b, h, w = X21.shape[:3]
    n = h * w

    rays_with_grad, pts3d_norm, p_init = prep_for_iter_proj(
        X11, X21, idx_1_to_2_init
    )
    p1, valid_proj = iter_proj(
        rays_with_grad,
        pts3d_norm,
        p_init,
        max_iter=max_iter,
        lambda_init=lambda_init,
        convergence_thresh=convergence_thresh,
    )
    p1_int = p1.astype(jnp.int32)

    if use_refine and refine_radius > 0:
        D21_flat = D21.reshape(b, n, -1)
        p1_int = refine_matches(
            D11, D21_flat, p1_int, radius=refine_radius, dilation_max=refine_dilation
        )

    # Occlusion gate: 3D distance between matched points.
    u = jnp.clip(p1_int[..., 0], 0, w - 1)
    v = jnp.clip(p1_int[..., 1], 0, h - 1)
    lin = v * w + u
    X11_sampled = _gather_points(X11.reshape(b, n, 3), lin)
    dist = jnp.linalg.norm(X11_sampled - X21.reshape(b, n, 3), axis=-1)
    valid = valid_proj & (dist < dist_thresh)

    idx_1_to_2 = pixel_to_lin(jnp.stack([u, v], axis=-1), w)
    return idx_1_to_2, valid[..., None]


__all__ = [
    "match",
    "match_simple",
    "match_iterative_proj",
    "lin_to_pixel",
    "pixel_to_lin",
]
