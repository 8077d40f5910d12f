"""Focal estimation from pointmaps."""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.utils.intrinsics import estimate_focal, estimate_intrinsics
from tests.fixtures import camera_K, world_surface


class TestFocal:
    def test_recovers_known_focal(self, rng):
        h, w = 24, 32
        K = camera_K(h, w, f=1.1)  # fx = 1.1 * w = 35.2
        X = jnp.asarray(world_surface(rng, h, w, K))
        f = float(estimate_focal(X, (h, w)))
        assert f == pytest.approx(float(K[0, 0]), rel=0.02)

    def test_robust_to_outliers(self, rng):
        h, w = 24, 32
        K = camera_K(h, w)
        X = np.asarray(world_surface(rng, h, w, K))
        bad = rng.choice(h * w, (h * w) // 10, replace=False)
        X[bad] = rng.normal(size=(len(bad), 3)) * 5 + np.asarray([0, 0, 3])
        f = float(estimate_focal(jnp.asarray(X), (h, w)))
        assert f == pytest.approx(float(K[0, 0]), rel=0.05)

    def test_confidence_weighting(self, rng):
        h, w = 16, 20
        K = camera_K(h, w)
        X = np.asarray(world_surface(rng, h, w, K))
        bad = rng.choice(h * w, (h * w) // 4, replace=False)
        X_corrupt = X.copy()
        X_corrupt[bad] += rng.normal(size=(len(bad), 3)) * 2
        conf = np.full((h * w, 1), 3.0, np.float32)
        conf[bad] = 1.0  # zero weight under the (conf-1) parameterization
        f = float(estimate_focal(jnp.asarray(X_corrupt), (h, w), jnp.asarray(conf)))
        assert f == pytest.approx(float(K[0, 0]), rel=0.02)

    def test_full_K(self, rng):
        h, w = 16, 20
        K = camera_K(h, w)
        X = jnp.asarray(world_surface(rng, h, w, K))
        K_est = np.asarray(estimate_intrinsics(X, (h, w)))
        assert K_est[0, 2] == w / 2 and K_est[1, 2] == h / 2
        assert K_est[0, 0] == pytest.approx(float(K[0, 0]), rel=0.02)
