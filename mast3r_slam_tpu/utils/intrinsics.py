"""Intrinsics estimation from pointmaps (calibration-free mode support).

BASELINE.json config 5 targets calibration-free operation with joint focal
estimation. A MASt3R mono pointmap determines the focal length directly:
each pixel (u, v) with 3D point (x, y, z) satisfies u - cx = f * x / z,
v - cy = f * y / z, so f solves a 1-D weighted least squares over all
pixels (upstream DUSt3R's `estimate_focal_knowing_depth`, Weiszfeld-
iterated for robustness).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.geometry import get_pixel_coords


@partial(jax.jit, static_argnames=("img_size", "iters"))
def estimate_focal(
    X: jax.Array,
    img_size: tuple[int, int],
    conf: jax.Array | None = None,
    iters: int = 10,
) -> jax.Array:
    """Estimate the focal length (pixels) from a mono pointmap.

    Args:
        X: [H*W, 3] canonical pointmap (camera frame)
        img_size: (H, W); principal point assumed at the image center
        conf: optional [H*W, 1] confidence weights
        iters: Weiszfeld reweighting iterations (robust L1-ish solution)

    Returns:
        scalar focal estimate
    """
    h, w = img_size
    uv = get_pixel_coords(1, img_size, dtype=X.dtype).reshape(-1, 2)
    pp = jnp.asarray([w / 2.0, h / 2.0], X.dtype)
    duv = uv - pp  # [N, 2]

    z = jnp.maximum(X[:, 2:3], 1e-6)
    xy_over_z = X[:, :2] / z  # [N, 2]

    base_w = jnp.ones((X.shape[0], 1), X.dtype)
    if conf is not None:
        base_w = base_w * jnp.maximum(conf - 1.0, 0.0)  # conf >= 1 param.
    valid = (X[:, 2:3] > 1e-6).astype(X.dtype)
    base_w = base_w * valid

    dot = jnp.sum(duv * xy_over_z, axis=-1, keepdims=True)
    nrm = jnp.sum(xy_over_z * xy_over_z, axis=-1, keepdims=True)

    # Robust init: median of per-pixel focal estimates f_i = dot_i / nrm_i
    # (immune to gross pointmap outliers; upstream's median focal mode).
    ok = (nrm[:, 0] > 1e-8) & (base_w[:, 0] > 0)
    f_per_px = jnp.where(ok, dot[:, 0] / jnp.maximum(nrm[:, 0], 1e-8), jnp.nan)
    f = jnp.nanmedian(f_per_px)

    def body(_, f):
        # Weiszfeld refinement: weight by inverse residual magnitude.
        r = jnp.linalg.norm(duv - f * xy_over_z, axis=-1, keepdims=True)
        wgt = base_w / jnp.maximum(r, 1e-3)
        return jnp.sum(wgt * dot) / jnp.maximum(jnp.sum(wgt * nrm), 1e-8)

    return jax.lax.fori_loop(0, iters, body, f)


def estimate_intrinsics(
    X: jax.Array, img_size: tuple[int, int], conf: jax.Array | None = None
) -> jax.Array:
    """Full K [3, 3] with center principal point and the estimated focal."""
    h, w = img_size
    f = estimate_focal(X, img_size, conf)
    return jnp.asarray(
        [[f, 0.0, w / 2.0], [0.0, f, h / 2.0], [0.0, 0.0, 1.0]], jnp.float32
    )
