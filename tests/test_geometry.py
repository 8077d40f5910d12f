"""Geometry measurement functions: analytic Jacobians vs jax.jacfwd,
plus behavioral invariants (reference parity targets: geometry.py:34-302)."""

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu import geometry as geo
from mast3r_slam_tpu.lie import core as lie


def _points(rng, n=32, positive_z=True):
    p = rng.normal(size=(n, 3)).astype(np.float32)
    if positive_z:
        p[:, 2] = np.abs(p[:, 2]) + 0.5
    return jnp.asarray(p)


class TestRayDist:
    def test_unit_rays(self, rng):
        X = _points(rng)
        rd = geo.point_to_ray_dist(X)
        np.testing.assert_allclose(
            np.linalg.norm(rd[..., :3], axis=-1), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(rd[..., 3], np.linalg.norm(X, axis=-1), rtol=1e-5)

    def test_jacobian_vs_autodiff(self, rng):
        X = _points(rng, n=8)
        _, J = geo.point_to_ray_dist(X, jacobian=True)
        J_auto = jax.vmap(jax.jacfwd(lambda x: geo.point_to_ray_dist(x)))(X)
        np.testing.assert_allclose(J, J_auto, atol=1e-4)


class TestProjectCalib:
    K = jnp.asarray(
        [[300.0, 0.0, 128.0], [0.0, 300.0, 96.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    img_size = (192, 256)

    def test_project_backproject_roundtrip(self, rng):
        X = _points(rng)
        pz, valid = geo.project_calib(X, self.K, self.img_size)
        z = jnp.exp(pz[..., 2:3])
        X_back = geo.backproject(pz[..., :2], z, self.K)
        mask = np.asarray(valid)[:, 0]
        np.testing.assert_allclose(
            np.asarray(X_back)[mask], np.asarray(X)[mask], rtol=1e-4, atol=1e-4
        )

    def test_jacobian_vs_autodiff(self, rng):
        X = _points(rng, n=8)

        def f(x):
            pz, _ = geo.project_calib(x, self.K, self.img_size)
            return pz

        _, J, _ = geo.project_calib(X, self.K, self.img_size, jacobian=True)
        J_auto = jax.vmap(jax.jacfwd(f))(X)
        np.testing.assert_allclose(J, J_auto, atol=1e-3, rtol=1e-3)

    def test_validity_borders(self):
        X = jnp.asarray(
            [
                [0.0, 0.0, 1.0],  # center: valid
                [0.0, 0.0, -1.0],  # behind camera
                [100.0, 0.0, 1.0],  # way off image
            ],
            jnp.float32,
        )
        _, valid = geo.project_calib(X, self.K, self.img_size)
        assert np.asarray(valid)[:, 0].tolist() == [True, False, False]


class TestActSim3:
    def test_jacobian_pairs_with_left_retraction(self, rng):
        from tests.test_lie import random_sim3

        T = random_sim3(rng)
        p = _points(rng, n=6)
        pW, J = geo.act_Sim3(T, p, jacobian=True)

        def f(xi, pt):
            return lie.sim3_act(lie.sim3_retract(T, xi), pt)

        for k in range(p.shape[0]):
            J_auto = jax.jacfwd(lambda xi: f(xi, p[k]))(jnp.zeros(7))
            np.testing.assert_allclose(J[k], J_auto, atol=1e-4)


class TestConstrainToRay:
    def test_depth_preserved_and_on_ray(self, rng):
        K = TestProjectCalib.K
        img_size = (4, 6)
        X = jnp.asarray(rng.normal(size=(1, 24, 3)).astype(np.float32))
        X = X.at[..., 2].set(jnp.abs(X[..., 2]) + 0.5)
        Xc = geo.constrain_points_to_ray(img_size, X, K)
        np.testing.assert_allclose(Xc[..., 2], X[..., 2], atol=1e-6)
        # each point must project exactly onto its own pixel center
        pz, _ = geo.project_calib(Xc[0], K, img_size)
        uv = geo.get_pixel_coords(1, img_size).reshape(-1, 2)
        np.testing.assert_allclose(pz[:, :2], uv, atol=1e-3)


class TestSpherical:
    def test_roundtrip(self, rng):
        P = _points(rng)
        S = geo.cartesian_to_spherical(P)
        P_back = geo.spherical_to_cartesian(S)
        np.testing.assert_allclose(P_back, P, atol=1e-4)


class TestImgGradient:
    def test_matches_central_difference(self, rng):
        img = jnp.asarray(rng.normal(size=(2, 8, 10, 3)).astype(np.float32))
        gx, gy = geo.img_gradient(img)
        ref_gx = (np.asarray(img)[:, :, 2:] - np.asarray(img)[:, :, :-2]) / 2
        np.testing.assert_allclose(gx[:, :, 1:-1], ref_gx, atol=1e-6)
        assert np.all(np.asarray(gx)[:, :, 0] == 0)
        assert np.all(np.asarray(gy)[:, 0, :] == 0)
