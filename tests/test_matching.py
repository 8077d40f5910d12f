"""Matching kernels: parity with numpy oracles + functional recovery tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.lie import core as lie
from mast3r_slam_tpu.matching import match, match_iterative_proj, match_simple
from mast3r_slam_tpu.ops.iter_proj import (
    iter_proj,
    iter_proj_reference,
    prep_for_iter_proj,
)
from mast3r_slam_tpu.ops.refine import (
    refine_matches,
    refine_matches_reference,
)
from tests.fixtures import camera_K, world_surface


def _two_view(rng, h=16, w=20, mag=0.02):
    """Same surface seen from two nearby viewpoints, in view-1 coordinates."""
    K = camera_K(h, w)
    X11 = np.asarray(world_surface(rng, h, w, K)).reshape(h, w, 3)
    xi = (rng.normal(size=7) * mag).astype(np.float32)
    T = lie.sim3_exp(jnp.asarray(xi))
    # view 2 sees the same points; X21 = points of view 2 mapped into view 1
    # frame — for a static scene those are the same 3D points, mildly
    # perturbed to emulate network noise.
    X21 = X11 + rng.normal(size=X11.shape).astype(np.float32) * 0.002
    return jnp.asarray(X11[None]), jnp.asarray(X21[None]), T


class TestIterProj:
    def test_parity_with_oracle(self, rng):
        X11, X21, _ = _two_view(rng)
        rays, pts, p0 = prep_for_iter_proj(X11, X21, None)
        # scramble inits to make the solver do real work
        b, n, _ = np.asarray(p0).shape
        jitter = rng.integers(-3, 4, size=(b, n, 2)).astype(np.float32)
        p0 = jnp.asarray(np.asarray(p0) + jitter)

        p_jax, valid_jax = iter_proj(rays, pts, p0)
        p_ref, valid_ref = iter_proj_reference(
            np.asarray(rays), np.asarray(pts), np.asarray(p0)
        )
        # statistical parity (the reference benchmarks its twins the same
        # way, SURVEY §4.1): tiny f32 differences can flip a floor() at
        # bilinear cell boundaries for isolated points.
        close = np.abs(np.asarray(p_jax) - p_ref) < 1e-2
        assert close.mean() > 0.99
        assert (np.asarray(valid_jax) == valid_ref).mean() > 0.99

    def test_identity_init_converges_to_self(self, rng):
        """With X21 == X11 and identity init, points must stay put."""
        h, w = 12, 16
        K = camera_K(h, w)
        X11 = jnp.asarray(world_surface(rng, h, w, K)).reshape(1, h, w, 3)
        rays, pts, p0 = prep_for_iter_proj(X11, X11, None)
        p, valid = iter_proj(rays, pts, p0)
        uv = np.stack(
            np.meshgrid(np.arange(w), np.arange(h)), axis=-1
        ).reshape(-1, 2)
        # interior points shouldn't drift more than a fraction of a pixel
        interior = (
            (uv[:, 0] > 1) & (uv[:, 0] < w - 2) & (uv[:, 1] > 1) & (uv[:, 1] < h - 2)
        )
        drift = np.abs(np.asarray(p)[0] - uv)[interior]
        assert drift.max() < 0.5
        assert np.asarray(valid).all()

    def test_recovers_shifted_init(self, rng):
        """Solver must pull a shifted initialization back onto the target."""
        h, w = 16, 20
        K = camera_K(h, w)
        X11 = jnp.asarray(world_surface(rng, h, w, K)).reshape(1, h, w, 3)
        rays, pts, p0 = prep_for_iter_proj(X11, X11, None)
        p0_shifted = jnp.asarray(np.asarray(p0) + np.asarray([2.0, -1.0]))
        p, _ = iter_proj(rays, pts, p0_shifted, max_iter=20)
        uv = np.stack(np.meshgrid(np.arange(w), np.arange(h)), -1).reshape(-1, 2)
        interior = (
            (uv[:, 0] > 3) & (uv[:, 0] < w - 4) & (uv[:, 1] > 3) & (uv[:, 1] < h - 4)
        )
        err = np.linalg.norm(np.asarray(p)[0] - uv, axis=-1)[interior]
        assert np.median(err) < 0.5


class TestRefine:
    def test_parity_with_oracle(self, rng):
        b, h, w, d, n = 1, 10, 12, 8, 30
        # smooth descriptors -> unambiguous argmax (SURVEY §4.3 lesson)
        base = rng.normal(size=(h, w, d)).astype(np.float32)
        from scipy.ndimage import gaussian_filter

        base = gaussian_filter(base, sigma=(1.5, 1.5, 0))
        base /= np.linalg.norm(base, axis=-1, keepdims=True) + 1e-8
        D11 = jnp.asarray(base[None])
        pts = np.stack(
            [rng.integers(0, w, n), rng.integers(0, h, n)], axis=-1
        ).astype(np.int32)
        D21 = jnp.asarray(base[pts[:, 1], pts[:, 0]][None])
        # start near the right answer
        p0 = pts + rng.integers(-2, 3, size=pts.shape)
        p0 = np.clip(p0, 0, [w - 1, h - 1]).astype(np.int32)[None]

        p_jax = refine_matches(D11, D21, jnp.asarray(p0), radius=3, dilation_max=2)
        p_ref = refine_matches_reference(D11, D21, p0, radius=3, dilation_max=2)
        assert (np.asarray(p_jax) == p_ref).mean() > 0.97

    def test_finds_exact_descriptor(self, rng):
        """Query descriptors copied from known pixels must be found."""
        b, h, w, d = 1, 12, 14, 16
        D11 = rng.normal(size=(1, h, w, d)).astype(np.float32)
        D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
        pts = np.stack(
            [rng.integers(2, w - 2, 25), rng.integers(2, h - 2, 25)], -1
        ).astype(np.int32)
        D21 = D11[0, pts[:, 1], pts[:, 0]][None]
        p0 = np.clip(
            pts + rng.integers(-2, 3, size=pts.shape), 0, [w - 1, h - 1]
        ).astype(np.int32)[None]
        p = refine_matches(
            jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p0), radius=3
        )
        assert (np.asarray(p)[0] == pts).all(axis=-1).mean() > 0.9


class TestMatchAPI:
    def test_match_simple_gates_by_distance(self, rng):
        X11, X21, _ = _two_view(rng)
        idx, valid = match_simple(X11, X21, None, dist_thresh=0.1)
        assert np.asarray(valid).mean() > 0.9  # near-identical surfaces
        idx2, valid2 = match_simple(X11, X21 + 10.0, None, dist_thresh=0.1)
        assert np.asarray(valid2).mean() == 0.0

    def test_match_dispatch_config(self, rng):
        X11, X21, _ = _two_view(rng, h=8, w=10)
        D = jnp.asarray(rng.normal(size=(1, 8, 10, 6)).astype(np.float32))
        set_config(Config.from_dict({"matching": {"use_simple": True}}))
        idx_s, _ = match(X11, X21, D, D)
        set_config(
            Config.from_dict({"matching": {"use_simple": False, "use_refine": False}})
        )
        idx_i, valid_i = match(X11, X21, D, D)
        assert idx_s.shape == idx_i.shape == (1, 80)

    def test_iterative_proj_end_to_end(self, rng):
        """Full pipeline on a consistent two-view problem recovers mostly
        identity correspondence with high validity."""
        h, w = 16, 20
        K = camera_K(h, w)
        X11 = jnp.asarray(world_surface(rng, h, w, K)).reshape(1, h, w, 3)
        D = rng.normal(size=(h, w, 12)).astype(np.float32)
        from scipy.ndimage import gaussian_filter

        D = gaussian_filter(D, sigma=(1.0, 1.0, 0))
        D = jnp.asarray(
            (D / (np.linalg.norm(D, axis=-1, keepdims=True) + 1e-8))[None]
        )
        idx, valid = match_iterative_proj(
            X11, X11, D, D, None, use_refine=True, refine_radius=2, refine_dilation=1
        )
        expect = np.arange(h * w)
        agree = (np.asarray(idx)[0] == expect).mean()
        assert agree > 0.8
        assert np.asarray(valid).mean() > 0.95
