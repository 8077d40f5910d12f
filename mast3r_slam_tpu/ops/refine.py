"""Descriptor-based match refinement (window argmax of dot products).

For each matched point, search a (2r+1)^2 pixel window around its current
position in view 1 for the descriptor most similar to the query descriptor
from view 2; optionally coarse-to-fine over dilations (d, d-1, ..., 1).

TPU-native design
-----------------
The reference dispatches one Metal thread per point, each walking its window
serially (refine_matches.metal:9-215). Here the window walk becomes data
parallelism the MXU can chew on:

  1. one batched gather pulls the (2r+1)^2 window descriptors per point
     -> [B, N, W2, D],
  2. one batched matmul against the query descriptors -> scores [B, N, W2]
     (this is the einsum the MXU runs at full tilt for D >= 24),
  3. argmax over the window, offsets decoded from the flat window index.

The dilation sweep is a short static Python loop (dilation levels are config
constants), each level jitted into the same program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("radius", "dilation"))
def refine_matches_step(
    D11: jax.Array,
    D21: jax.Array,
    p1: jax.Array,
    radius: int = 3,
    dilation: int = 1,
) -> jax.Array:
    """One window-search refinement pass.

    Args:
        D11: view-1 descriptor image [B, H, W, D]
        D21: view-2 query descriptors [B, N, D]
        p1: current integer pixel positions [B, N, 2] (u, v)
        radius: half window size
        dilation: step between window taps

    Returns:
        refined positions [B, N, 2] int32

    Parity target: `refine_matches_kernel` (refine_matches.metal:9-71);
    out-of-bounds taps are clamped, which matches the Metal kernel's bounds
    check in effect because a clamped duplicate can never beat the in-bounds
    argmax under ties-go-to-first ordering... except on the image border.
    We instead mask out-of-bounds taps to -inf exactly like the shader.
    """
    b, h, w, d = D11.shape
    n = p1.shape[1]
    side = 2 * radius + 1
    w2 = side * side

    offs = (jnp.arange(side) - radius) * dilation
    du = jnp.tile(offs, side)  # [W2] u-offsets (fast axis)
    dv = jnp.repeat(offs, side)  # [W2] v-offsets

    u = p1[..., 0][..., None] + du[None, None, :]  # [B, N, W2]
    v = p1[..., 1][..., None] + dv[None, None, :]
    in_bounds = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    uc = jnp.clip(u, 0, w - 1)
    vc = jnp.clip(v, 0, h - 1)

    flat = D11.reshape(b, h * w, d)
    lin = (vc * w + uc).reshape(b, n * w2)  # [B, N*W2]
    window = jnp.take_along_axis(flat, lin[..., None], axis=1).reshape(b, n, w2, d)

    # scores[b, n, k] = <window[b, n, k], D21[b, n]>  — batched matvec (MXU).
    scores = jnp.einsum("bnkd,bnd->bnk", window, D21)
    scores = jnp.where(in_bounds, scores, -jnp.inf)

    best = jnp.argmax(scores, axis=-1)  # [B, N]
    best_u = p1[..., 0] + jnp.take(du, best)
    best_v = p1[..., 1] + jnp.take(dv, best)
    return jnp.stack([best_u, best_v], axis=-1).astype(jnp.int32)


def refine_matches(
    D11: jax.Array,
    D21: jax.Array,
    p1: jax.Array,
    radius: int = 3,
    dilation_max: int = 1,
) -> jax.Array:
    """Coarse-to-fine refinement: dilation_max, ..., 2, 1.

    Parity target: the host-side dilation loop of the reference runner
    (refine_metal_runner.py:136-164, `refine_matches_multiscale_kernel`).
    """
    p = p1.astype(jnp.int32)
    for dil in range(max(1, dilation_max), 0, -1):
        p = refine_matches_step(D11, D21, p, radius=radius, dilation=dil)
    return p


def refine_matches_reference(D11, D21, p1, radius=3, dilation_max=1):
    """Numpy oracle twin for parity tests (per-point window walk)."""
    import numpy as np

    D11 = np.asarray(D11, np.float32)
    D21 = np.asarray(D21, np.float32)
    p = np.asarray(p1).astype(np.int64).copy()
    b, h, w, d = D11.shape
    n = p.shape[1]

    for dil in range(max(1, dilation_max), 0, -1):
        for bi in range(b):
            for ni in range(n):
                cu, cv = p[bi, ni]
                q = D21[bi, ni]
                best_score, best = -np.inf, (cu, cv)
                for dv in range(-radius, radius + 1):
                    for du in range(-radius, radius + 1):
                        uu, vv = cu + du * dil, cv + dv * dil
                        if 0 <= uu < w and 0 <= vv < h:
                            s = float(D11[bi, vv, uu] @ q)
                            if s > best_score:
                                best_score, best = s, (uu, vv)
                p[bi, ni] = best
    return p.astype(np.int32)
