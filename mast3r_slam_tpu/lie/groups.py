"""Pytree-registered Lie group wrapper classes.

Thin, immutable views over the functional core (`lie.core`). Registered as
JAX pytrees so they pass transparently through jit / vmap / scan and can be
stored in device-resident state. The class API mirrors the reference's
liegroups package surface (SO3/SE3/Sim3 with exp/log/inv/mul/act/matrix/retr,
reference liegroups/__init__.py:4-8) so user code ports directly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.lie import core


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SO3:
    """Unit-quaternion rotation, data [..., 4] = [qx, qy, qz, qw]."""

    data: jax.Array

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "SO3":
        q = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=dtype), (*batch_shape, 4)
        )
        return cls(q)

    @classmethod
    def exp(cls, phi: jax.Array) -> "SO3":
        return cls(core.so3_exp(phi))

    def log(self) -> jax.Array:
        return core.so3_log(self.data)

    def inv(self) -> "SO3":
        return SO3(core.quat_conj(self.data))

    def __mul__(self, other: "SO3") -> "SO3":
        return SO3(core.quat_mul(self.data, other.data))

    def act(self, p: jax.Array) -> jax.Array:
        return core.quat_rotate(self.data, p)

    def matrix(self) -> jax.Array:
        return core.quat_to_matrix(self.data)

    def retr(self, phi: jax.Array) -> "SO3":
        return SO3.exp(phi) * self

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SE3:
    """Rigid transform, data [..., 7] = [t(3), q(4)]."""

    data: jax.Array

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "SE3":
        e = jnp.broadcast_to(
            jnp.asarray([0, 0, 0, 0, 0, 0, 1], dtype=dtype), (*batch_shape, 7)
        )
        return cls(e)

    @classmethod
    def exp(cls, xi: jax.Array) -> "SE3":
        return cls(core.se3_exp(xi))

    def log(self) -> jax.Array:
        return core.se3_log(self.data)

    @property
    def translation(self) -> jax.Array:
        return self.data[..., :3]

    @property
    def rotation(self) -> SO3:
        return SO3(self.data[..., 3:7])

    def inv(self) -> "SE3":
        q_inv = core.quat_conj(self.data[..., 3:7])
        t_inv = -core.quat_rotate(q_inv, self.data[..., :3])
        return SE3(jnp.concatenate([t_inv, q_inv], axis=-1))

    def __mul__(self, other: "SE3") -> "SE3":
        ta, qa = self.data[..., :3], self.data[..., 3:7]
        tb, qb = other.data[..., :3], other.data[..., 3:7]
        q = core.quat_mul(qa, qb)
        t = core.quat_rotate(qa, tb) + ta
        return SE3(jnp.concatenate([t, q], axis=-1))

    def act(self, p: jax.Array) -> jax.Array:
        return core.quat_rotate(self.data[..., 3:7], p) + self.data[..., :3]

    def matrix(self) -> jax.Array:
        R = core.quat_to_matrix(self.data[..., 3:7])
        top = jnp.concatenate([R, self.data[..., :3, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=self.data.dtype),
            (*self.data.shape[:-1], 1, 4),
        )
        return jnp.concatenate([top, bottom], axis=-2)

    def retr(self, xi: jax.Array) -> "SE3":
        return SE3.exp(xi) * self

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Sim3:
    """Similarity transform, data [..., 8] = [t(3), q(4), s(1)]."""

    data: jax.Array

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "Sim3":
        return cls(core.sim3_identity(batch_shape, dtype))

    @classmethod
    def exp(cls, xi: jax.Array) -> "Sim3":
        return cls(core.sim3_exp(xi))

    def log(self) -> jax.Array:
        return core.sim3_log(self.data)

    @property
    def translation(self) -> jax.Array:
        return self.data[..., :3]

    @property
    def rotation(self) -> SO3:
        return SO3(self.data[..., 3:7])

    @property
    def scale(self) -> jax.Array:
        return self.data[..., 7:8]

    def inv(self) -> "Sim3":
        return Sim3(core.sim3_inv(self.data))

    def __mul__(self, other: "Sim3") -> "Sim3":
        return Sim3(core.sim3_mul(self.data, other.data))

    def act(self, p: jax.Array) -> jax.Array:
        return core.sim3_act(self.data, p)

    def matrix(self) -> jax.Array:
        return core.sim3_matrix(self.data)

    def adjoint(self) -> jax.Array:
        return core.sim3_adjoint(self.data)

    def retr(self, xi: jax.Array) -> "Sim3":
        """Left retraction exp(xi) * self — see lie/__init__ docstring."""
        return Sim3(core.sim3_retract(self.data, xi))

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])
