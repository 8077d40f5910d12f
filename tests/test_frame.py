"""Frame / keyframe arena / fusion modes."""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.frame import Frame, Keyframes, Mode, SLAMState, create_frame, fuse_pointmap
from mast3r_slam_tpu.lie import core as lie


def _mk_frame(rng, fid=0, h=4, w=6):
    img = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    f = create_frame(fid, img)
    n = h * w
    f.X_canon = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    f.C = jnp.asarray(rng.uniform(1, 2, (n, 1)).astype(np.float32))
    f.feat = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
    f.pos = jnp.zeros((6, 2), jnp.int32)
    f.N = f.N_updates = 1
    return f


class TestFusion:
    def test_weighted_pointmap(self, rng):
        X0 = jnp.ones((5, 3))
        C0 = jnp.full((5, 1), 1.0)
        X1 = jnp.full((5, 3), 3.0)
        C1 = jnp.full((5, 1), 2.0)
        X, C = fuse_pointmap(X0, C0, X1, C1, mode="weighted_pointmap")
        np.testing.assert_allclose(X, (1 * 1 + 2 * 3) / 3.0)
        np.testing.assert_allclose(C, 3.0)

    def test_indep_conf(self):
        X0, C0 = jnp.zeros((2, 3)), jnp.asarray([[1.0], [5.0]])
        X1, C1 = jnp.ones((2, 3)), jnp.asarray([[2.0], [1.0]])
        X, C = fuse_pointmap(X0, C0, X1, C1, mode="indep_conf")
        np.testing.assert_allclose(X[0], 1.0)  # replaced
        np.testing.assert_allclose(X[1], 0.0)  # kept

    def test_recent(self):
        X, C = fuse_pointmap(
            jnp.zeros((2, 3)), jnp.ones((2, 1)), jnp.ones((2, 3)), 2 * jnp.ones((2, 1)),
            mode="recent",
        )
        np.testing.assert_allclose(X, 1.0)

    def test_weighted_spherical_roundtrip(self, rng):
        X = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32)) + 2.0
        C = jnp.ones((6, 1))
        Xf, Cf = fuse_pointmap(X, C, X, C, mode="weighted_spherical")
        np.testing.assert_allclose(np.asarray(Xf), np.asarray(X), atol=1e-4)

    def test_frame_update_modes(self, rng):
        """'first' mode: one replacement at N_updates==1, then frozen
        (reference semantics, frame.py:94-98)."""
        set_config(Config.from_dict({"tracking": {"filtering_mode": "first"}}))
        f = _mk_frame(rng)
        X0 = np.asarray(f.X_canon)
        f.update_pointmap(f.X_canon + 1.0, f.C)
        np.testing.assert_allclose(np.asarray(f.X_canon), X0 + 1.0)
        f.update_pointmap(f.X_canon + 5.0, f.C)
        np.testing.assert_allclose(np.asarray(f.X_canon), X0 + 1.0)  # frozen


class TestKeyframes:
    def test_arena_roundtrip(self, rng):
        set_config(Config.from_dict({"runtime": {"keyframe_capacity": 8}}))
        kfs = Keyframes(4, 6)
        f0, f1 = _mk_frame(rng, 0), _mk_frame(rng, 1)
        assert kfs.append(f0) == 0
        assert kfs.append(f1) == 1
        assert len(kfs) == 2
        got = kfs[1]
        np.testing.assert_allclose(np.asarray(got.X_canon), np.asarray(f1.X_canon))
        assert got.frame_id == 1
        assert kfs.last_keyframe().frame_id == 1

    def test_pose_updates(self, rng):
        set_config(Config.from_dict({"runtime": {"keyframe_capacity": 8}}))
        kfs = Keyframes(4, 6)
        for i in range(3):
            kfs.append(_mk_frame(rng, i))
        new_poses = jnp.asarray(
            np.stack([np.asarray(lie.sim3_exp(jnp.asarray(rng.normal(size=7) * 0.1, jnp.float32))) for _ in range(2)])
        )
        kfs.update_T_WCs(new_poses, [1, 2])
        np.testing.assert_allclose(np.asarray(kfs.T_WC[1]), np.asarray(new_poses[0]))
        np.testing.assert_allclose(
            np.asarray(kfs.get_poses()[0]), np.asarray(lie.sim3_identity())
        )

    def test_average_conf(self, rng):
        set_config(Config.from_dict({"runtime": {"keyframe_capacity": 4}}))
        kfs = Keyframes(4, 6)
        f = _mk_frame(rng)
        f.N = 2
        kfs.append(f)
        np.testing.assert_allclose(
            np.asarray(kfs.get_confidences()[0]), np.asarray(f.C) / 2.0, atol=1e-6
        )

    def test_pop_last(self, rng):
        set_config(Config.from_dict({"runtime": {"keyframe_capacity": 4}}))
        kfs = Keyframes(4, 6)
        kfs.append(_mk_frame(rng, 0))
        kfs.append(_mk_frame(rng, 1))
        kfs.pop_last()
        assert len(kfs) == 1
        assert kfs.last_keyframe().frame_id == 0


class TestState:
    def test_queues(self):
        st = SLAMState()
        assert st.mode == Mode.INIT
        st.queue_global_optimization(3)
        st.queue_global_optimization(5)
        assert st.dequeue_global_optimization() == 3
        assert st.dequeue_global_optimization() == 5
        assert st.dequeue_global_optimization() is None
        st.queue_reloc()
        assert st.dequeue_reloc() is True
        assert st.dequeue_reloc() is False

    def test_create_frame_chw_uint8(self, rng):
        img = (rng.uniform(0, 255, (3, 4, 6))).astype(np.uint8)
        f = create_frame(0, jnp.asarray(img))
        assert f.img.shape == (4, 6, 3)
        assert float(f.img.max()) <= 1.0
