"""Dense cost-volume matching: the gather-free TPU formulation.

`iter_proj` + `refine_matches` are gather-bound: per-point bilinear samples
and window reads at arbitrary positions are the one access pattern TPUs
execute poorly (SURVEY.md §7 "hard parts"). This module replaces both with
a **shifted cost volume**: for every view-2 pixel, candidate matches are
its own coordinates displaced by a fixed offset set; each offset is ONE
dense elementwise comparison between the view-2 ray/descriptor images and a
statically-shifted view-1 image — pure VPU streams, zero gathers.

The default is an exact dense ±6 px window (169 taps; each tap is a
cheap fused VPU pass, so even the dense window costs single-digit ms).
Dilated tap lattices (e.g. dilations=(4,1)) trade exactness inside the span
for wider reach — displacements off the lattice snap to the nearest tap.

Semantics: equivalent to iter_proj+refine when the true displacement lies
inside the search span (tracking: consecutive-frame motion; backend:
MASt3R pointmaps are co-registered, so identity-centered search matches the
reference's own default `match_simple` assumption — reference config.py:65).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.geometry import normalize_rays


def _shifted(img: jax.Array, du: int, dv: int, fill: float) -> jax.Array:
    """out[y, x] = img[y + dv, x + du] with constant fill out of bounds."""
    b, h, w, c = img.shape
    pad_top = max(-dv, 0)
    pad_bot = max(dv, 0)
    pad_left = max(-du, 0)
    pad_right = max(du, 0)
    padded = jnp.pad(
        img,
        ((0, 0), (pad_top, pad_bot), (pad_left, pad_right), (0, 0)),
        constant_values=fill,
    )
    return padded[
        :, pad_top + dv : pad_top + dv + h, pad_left + du : pad_left + du + w, :
    ]


def window_taps(radius: int, dilations: tuple[int, ...]) -> list[tuple[int, int]]:
    """Union of dilated windows, deduplicated, deterministic order."""
    taps: dict[tuple[int, int], None] = {}
    for dil in dilations:
        for oy in range(-radius, radius + 1):
            for ox in range(-radius, radius + 1):
                taps[(ox * dil, oy * dil)] = None
    return list(taps.keys())


@partial(
    jax.jit,
    static_argnames=("radius", "dilations", "desc_weight", "dist_thresh", "want_hit"),
)
def match_dense_window(
    X11: jax.Array,
    X21: jax.Array,
    D11: jax.Array,
    D21: jax.Array,
    radius: int = 6,
    dilations: tuple[int, ...] = (1,),
    desc_weight: float = 1.0,
    dist_thresh: float = 0.1,
    payload: jax.Array | None = None,
    want_hit: bool = False,
):
    """Gather-free dense matching over a multi-dilation offset window.

    Args:
        X11 / X21: pointmaps [B, H, W, 3] (view-1 frame)
        D11 / D21: unit descriptors [B, H, W, D]
        radius: window half-size per dilation level
        dilations: tap spacings (union of all levels searched at once)
        desc_weight: descriptor-similarity weight against ray distance
        dist_thresh: 3D occlusion gate (reference semantics)
        payload: optional [B, H, W, P] per-view-1-pixel values to select at
            the winning tap — the windowed equivalent of
            `payload.reshape(B,N,P)[idx]`, folded into the tap streams so
            the downstream consumer skips its [N, P] row gather (profiled
            1.95 ms/frame at 196k pts on v5e vs ~0.7 ms folded here).
            Streams in bf16, matching the matcher's other streams.
        want_hit: also return `hit` [B, H*W] bool — whether each view-1
            pixel is claimed by at least one valid match. Computed as an
            inverse-shift OR over the tap lattice (winning taps are always
            in-bounds, so this equals the scatter-max
            `zeros.at[idx].max(valid)` exactly) — replaces a 1.3 ms/frame
            [N]-row scatter with ~0.3 ms of dense shifted passes.

    Returns:
        (idx_1_to_2 [B, H*W] int32, valid [B, H*W, 1] bool) plus, when
        requested, payload_g [B, H*W, P] and/or hit [B, H*W] appended in
        that order.
    """
    b, h, w, _ = X11.shape
    # bf16 streams: the tap loop is HBM-bandwidth-bound and ray/descriptor
    # comparisons tolerate half precision (argmin selection only); the
    # out-of-bounds sentinel is a large finite value (bf16 has no problem
    # representing it, and inf arithmetic is avoided entirely).
    BIG = 1e30
    rays1 = normalize_rays(X11).astype(jnp.bfloat16)
    rays2 = normalize_rays(X21).astype(jnp.bfloat16)
    D11h = D11.astype(jnp.bfloat16)
    D21h = D21.astype(jnp.bfloat16)

    best_cost = jnp.full((b, h, w), BIG, jnp.float32)
    best_du = jnp.zeros((b, h, w), jnp.int32)
    best_dv = jnp.zeros((b, h, w), jnp.int32)
    pay_h = None if payload is None else payload.astype(jnp.bfloat16)
    best_pay = None if pay_h is None else jnp.zeros_like(pay_h)

    taps = window_taps(radius, dilations)
    for du, dv in taps:
        r1 = _shifted(rays1, du, dv, BIG)
        diff = (r1 - rays2).astype(jnp.float32)
        cost = jnp.sum(diff * diff, axis=-1)
        if desc_weight > 0:
            d1 = _shifted(D11h, du, dv, 0.0)
            sim = jnp.sum((d1 * D21h).astype(jnp.float32), axis=-1)
            cost = cost - desc_weight * sim
        cost = jnp.where(cost < BIG, cost, BIG)
        take = cost < best_cost
        best_cost = jnp.where(take, cost, best_cost)
        best_du = jnp.where(take, du, best_du)
        best_dv = jnp.where(take, dv, best_dv)
        if pay_h is not None:
            best_pay = jnp.where(
                take[..., None], _shifted(pay_h, du, dv, 0.0), best_pay
            )

    xx = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    yy = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    u = jnp.clip(xx + best_du, 0, w - 1)
    v = jnp.clip(yy + best_dv, 0, h - 1)
    idx = (v * w + u).reshape(b, h * w)

    # Occlusion gate at the winning displacement (one small row gather).
    X11_flat = X11.reshape(b, h * w, 3)
    Xm = jnp.take_along_axis(X11_flat, idx[..., None], axis=1)
    dist = jnp.linalg.norm(Xm - X21.reshape(b, h * w, 3), axis=-1)
    valid = (dist < dist_thresh) & (best_cost.reshape(b, h * w) < BIG)

    out = [idx, valid[..., None]]
    if best_pay is not None:
        out.append(best_pay.reshape(b, h * w, -1))
    if want_hit:
        # The winning tap is always in-bounds (out-of-bounds sentinels never
        # win — the (0,0) tap is always finite), so the clipped u/v above
        # are exact and the scatter `zeros.at[idx].max(valid)` factors as
        # an OR of inverse-shifted per-tap win masks.
        valid2d = valid.reshape(b, h, w)
        hit = jnp.zeros((b, h, w), jnp.bool_)
        for du, dv in taps:
            m = (best_du == du) & (best_dv == dv) & valid2d
            hit = hit | _shifted(m[..., None], -du, -dv, False)[..., 0]
        out.append(hit.reshape(b, h * w))
    return tuple(out)
