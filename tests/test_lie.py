"""Lie group axioms + autodiff cross-checks.

Strategy per SURVEY.md §4: the reference had no tests, only differential
parity between twins; we pin the math down with group axioms (exp/log
round-trip, composition, inverse, adjoint identity) and with jax.jacfwd as
ground truth for every analytic Jacobian.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.lie import (
    SE3,
    SO3,
    Sim3,
    core,
)

jax.config.update("jax_enable_x64", False)


def random_sim3(rng, batch=(), scale_range=(0.5, 2.0)):
    omega = rng.normal(size=(*batch, 3)) * 0.8
    q = np.asarray(core.so3_exp(jnp.asarray(omega, jnp.float32)))
    t = rng.normal(size=(*batch, 3)).astype(np.float32)
    s = rng.uniform(*scale_range, size=(*batch, 1)).astype(np.float32)
    return jnp.asarray(np.concatenate([t, q, s], axis=-1), jnp.float32)


def random_tangent(rng, batch=(), mag=0.5):
    xi = rng.normal(size=(*batch, 7)) * mag
    # keep the rotation part under pi so log(exp(xi)) == xi holds
    w = xi[..., 3:6]
    norm = np.linalg.norm(w, axis=-1, keepdims=True)
    xi[..., 3:6] = np.where(norm > 3.0, w * (3.0 / norm), w)
    return jnp.asarray(xi, jnp.float32)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        # log(exp(phi)) == phi only holds for |phi| < pi (principal value)
        direction = rng.normal(size=(64, 3))
        direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
        mag = rng.uniform(0, 3.0, size=(64, 1))
        phi = jnp.asarray(direction * mag, jnp.float32)
        phi_back = SO3.exp(phi).log()
        np.testing.assert_allclose(phi, phi_back, atol=2e-5)

    def test_small_angle(self, rng):
        phi = jnp.asarray(rng.normal(size=(16, 3)) * 1e-5, jnp.float32)
        q = core.so3_exp(phi)
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-6)
        np.testing.assert_allclose(core.so3_log(q), phi, atol=1e-7)

    def test_act_matches_matrix(self, rng):
        phi = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        R = SO3.exp(phi)
        p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        np.testing.assert_allclose(
            R.act(p), (R.matrix() @ p[..., None])[..., 0], atol=1e-5
        )

    def test_compose_inverse(self, rng):
        a = SO3.exp(jnp.asarray(rng.normal(size=(8, 3)), jnp.float32))
        b = SO3.exp(jnp.asarray(rng.normal(size=(8, 3)), jnp.float32))
        p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        np.testing.assert_allclose((a * b).act(p), a.act(b.act(p)), atol=1e-5)
        np.testing.assert_allclose((a * a.inv()).act(p), p, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)) * 0.8, jnp.float32)
        np.testing.assert_allclose(SE3.exp(xi).log(), xi, atol=3e-5)

    def test_identity(self):
        p = jnp.ones((5, 3))
        np.testing.assert_allclose(SE3.identity((5,)).act(p), p)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = random_tangent(rng, (64,), mag=0.8)
        np.testing.assert_allclose(Sim3.exp(xi).log(), xi, atol=5e-5)

    def test_exp_log_roundtrip_small(self, rng):
        xi = random_tangent(rng, (16,), mag=1e-5)
        np.testing.assert_allclose(Sim3.exp(xi).log(), xi, atol=1e-7)

    def test_exp_matches_matrix_exponential(self, rng):
        """Sim3 exp against the 4x4 matrix exponential of the twist."""
        from scipy.linalg import expm

        for _ in range(10):
            xi = np.asarray(random_tangent(rng, ()))
            v, omega, sigma = xi[:3], xi[3:6], xi[6]
            twist = np.zeros((4, 4))
            twist[:3, :3] = (
                np.asarray(core.skew(jnp.asarray(omega))) + sigma * np.eye(3)
            )
            twist[:3, 3] = v
            expected = expm(twist)
            got = np.asarray(Sim3.exp(jnp.asarray(xi, jnp.float32)).matrix())
            np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_compose_act(self, rng):
        Ta = Sim3(random_sim3(rng, (8,)))
        Tb = Sim3(random_sim3(rng, (8,)))
        p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        np.testing.assert_allclose((Ta * Tb).act(p), Ta.act(Tb.act(p)), atol=1e-4)

    def test_inverse(self, rng):
        T = Sim3(random_sim3(rng, (8,)))
        p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        np.testing.assert_allclose(T.inv().act(T.act(p)), p, atol=1e-4)

    def test_matrix_det_scale(self, rng):
        T = Sim3(random_sim3(rng, (8,)))
        det = jnp.linalg.det(T.matrix()[..., :3, :3])
        np.testing.assert_allclose(det, T.scale[..., 0] ** 3, rtol=1e-4)

    def test_adjoint_identity(self, rng):
        """T * exp(xi) * T^-1 == exp(Ad_T xi), checked through the action."""
        T = Sim3(random_sim3(rng))
        xi = random_tangent(rng, mag=1e-3)
        lhs = (T * Sim3.exp(xi) * T.inv()).data
        rhs = Sim3.exp((T.adjoint() @ xi[..., None])[..., 0]).data
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_left_retract_derivative(self, rng):
        """d/deps [exp(eps*xi) * T] matches point_jacobian through the action."""
        T = random_sim3(rng)
        p = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
        pW = core.sim3_act(T, p)

        def f(xi):
            return core.sim3_act(core.sim3_retract(T, xi), p)

        J_auto = jax.jacfwd(f)(jnp.zeros(7))
        J_analytic = core.point_jacobian(pW)
        np.testing.assert_allclose(J_auto, J_analytic, atol=1e-4)

    def test_relative(self, rng):
        Ti = Sim3(random_sim3(rng))
        Tj = Sim3(random_sim3(rng))
        Tij = core.sim3_relative(Ti.data, Tj.data)
        p = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        np.testing.assert_allclose(
            core.sim3_act(Tij, p), Ti.inv().act(Tj.act(p)), atol=1e-4
        )

    def test_jit_and_vmap(self, rng):
        xi = random_tangent(rng, (16,))
        jitted = jax.jit(core.sim3_exp)
        np.testing.assert_allclose(jitted(xi), core.sim3_exp(xi), atol=1e-6)
        vm = jax.vmap(core.sim3_exp)(xi)
        np.testing.assert_allclose(vm, core.sim3_exp(xi), atol=1e-6)
