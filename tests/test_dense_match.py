"""Dense cost-volume matcher: correctness on shifted scenes + dispatch."""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.matching import match
from mast3r_slam_tpu.ops.dense_match import match_dense_window, window_taps
from tests.fixtures import camera_K, world_surface


def _scene(rng, h=24, w=32):
    K = camera_K(h, w)
    X = np.asarray(world_surface(rng, h, w, K)).reshape(h, w, 3)
    D = rng.normal(size=(h, w, 8)).astype(np.float32)
    from scipy.ndimage import gaussian_filter

    D = gaussian_filter(D, sigma=(1.0, 1.0, 0))
    D /= np.linalg.norm(D, axis=-1, keepdims=True) + 1e-8
    return X, D


class TestTaps:
    def test_union_dedup(self):
        taps = window_taps(1, (2, 1))
        assert (0, 0) in taps
        assert len(taps) == len(set(taps))
        assert (2, 2) in taps and (1, 1) in taps


class TestDenseMatch:
    def test_identity_scene(self, rng):
        X, D = _scene(rng)
        idx, valid = match_dense_window(
            jnp.asarray(X[None]), jnp.asarray(X[None]),
            jnp.asarray(D[None]), jnp.asarray(D[None]),
        )
        n = X.shape[0] * X.shape[1]
        assert (np.asarray(idx)[0] == np.arange(n)).mean() > 0.95
        assert np.asarray(valid).mean() > 0.95

    def test_recovers_integer_shift(self, rng):
        """View 2 = view 1 content shifted by (+3, -2) pixels: the matcher
        must find the displaced correspondence."""
        h, w = 24, 32
        X, D = _scene(rng, h, w)
        du, dv = 3, -2
        # view-2 pixel (y, x) shows view-1 content at (y+dv, x+du)
        X2 = np.roll(np.roll(X, -dv, axis=0), -du, axis=1)
        D2 = np.roll(np.roll(D, -dv, axis=0), -du, axis=1)
        idx, valid = match_dense_window(
            jnp.asarray(X[None]), jnp.asarray(X2[None]),
            jnp.asarray(D[None]), jnp.asarray(D2[None]),
            radius=6, dilations=(1,), dist_thresh=0.5,
        )
        idx = np.asarray(idx)[0].reshape(h, w)
        # interior pixels (away from the roll wrap) must map to (y+dv, x+du)
        ys, xs = np.mgrid[6 : h - 6, 6 : w - 6]
        expect = (ys + dv) * w + (xs + du)
        agree = (idx[6 : h - 6, 6 : w - 6] == expect).mean()
        assert agree > 0.9, f"agree={agree}"

    def test_occlusion_gate(self, rng):
        X, D = _scene(rng)
        X2 = X + 10.0  # far away -> everything gated out
        idx, valid = match_dense_window(
            jnp.asarray(X[None]), jnp.asarray(X2[None]),
            jnp.asarray(D[None]), jnp.asarray(D[None]),
        )
        assert np.asarray(valid).mean() == 0.0

    def test_config_dispatch(self, rng):
        X, D = _scene(rng)
        set_config(Config.from_dict({"matching": {"method": "dense"}}))
        idx, valid = match(
            jnp.asarray(X[None]), jnp.asarray(X[None]),
            jnp.asarray(D[None]), jnp.asarray(D[None]),
        )
        n = X.shape[0] * X.shape[1]
        assert idx.shape == (1, n)


class TestWindowExtras:
    """payload selection / hit mask computed window-locally must equal the
    generic row-gather / scatter-max formulation exactly."""

    def test_payload_equals_row_gather(self, rng):
        X, D = _scene(rng)
        h, w = X.shape[:2]
        X2 = X + rng.normal(0, 0.01, X.shape).astype(np.float32)
        pay = rng.uniform(0.1, 2.0, (1, h, w, 5)).astype(np.float32)
        idx, valid, pay_g, hit = match_dense_window(
            jnp.asarray(X[None]), jnp.asarray(X2[None]),
            jnp.asarray(D[None]), jnp.asarray(D[None]),
            payload=jnp.asarray(pay), want_hit=True,
        )
        idx_np = np.asarray(idx)[0]
        # bf16 streams: compare against the bf16-rounded payload rows.
        ref = np.asarray(
            jnp.asarray(pay).astype(jnp.bfloat16).astype(np.float32)
        ).reshape(h * w, 5)[idx_np]
        np.testing.assert_allclose(
            np.asarray(pay_g, np.float32)[0], ref, rtol=0, atol=0
        )

    def test_hit_equals_scatter_max(self, rng):
        X, D = _scene(rng)
        h, w = X.shape[:2]
        X2 = X + rng.normal(0, 0.01, X.shape).astype(np.float32)
        idx, valid, hit = match_dense_window(
            jnp.asarray(X[None]), jnp.asarray(X2[None]),
            jnp.asarray(D[None]), jnp.asarray(D[None]),
            want_hit=True,
        )
        idx_np = np.asarray(idx)[0]
        v = np.asarray(valid)[0, :, 0]
        ref = np.zeros(h * w, bool)
        np.maximum.at(ref, idx_np, v)
        np.testing.assert_array_equal(np.asarray(hit)[0], ref)

    def test_match_dispatcher_fallback_extras(self, rng):
        """Non-dense methods compute the same extras via gather/scatter."""
        X, D = _scene(rng)
        h, w = X.shape[:2]
        pay = rng.uniform(0.1, 2.0, (1, h, w, 3)).astype(np.float32)
        set_config(Config.from_dict({"matching": {"method": "simple"}}))
        try:
            idx, valid, pay_g, hit = match(
                jnp.asarray(X[None]), jnp.asarray(X[None]),
                jnp.asarray(D[None]), jnp.asarray(D[None]),
                payload=jnp.asarray(pay), want_hit=True,
            )
        finally:
            set_config(Config())
        idx_np = np.asarray(idx)[0]
        ref = pay.reshape(h * w, 3)[idx_np]
        np.testing.assert_allclose(np.asarray(pay_g)[0], ref)
        v = np.asarray(valid)[0, :, 0]
        refh = np.zeros(h * w, bool)
        np.maximum.at(refh, idx_np, v)
        np.testing.assert_array_equal(np.asarray(hit)[0], refh)
