"""Live viewer: HTTP endpoints, snapshot protocol, SLAM publish hook."""

import json
import urllib.request

import numpy as np
import pytest

from mast3r_slam_tpu.viewer import LiveViewer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.read().decode()


class TestLiveViewer:
    def test_page_and_state(self):
        v = LiveViewer(port=0)
        try:
            page = _get(v.port, "/")
            assert "<canvas" in page and "state.json" in page

            s0 = json.loads(_get(v.port, "/state.json"))
            assert s0["points"] == [] and s0["traj"] == []

            v.publish_traj(np.arange(16, dtype=np.float32).reshape(2, 8))
            v.publish_keyframe(
                7,
                np.random.default_rng(0).normal(size=(64, 3)),
                np.full((64, 3), 128, np.uint8),
                stride=4,
            )
            s1 = json.loads(_get(v.port, "/state.json"))
            assert len(s1["traj"]) == 2 and s1["traj"][0] == [0.0, 1.0, 2.0]
            assert len(s1["points"]) == 16  # 64 / stride 4
            assert s1["colors"][0] == [128, 128, 128]
            assert s1["n_keyframes"] == 1 and s1["seq"] > s0["seq"]

            # unchanged short-circuit
            s2 = json.loads(_get(v.port, f"/state.json?since={s1['seq']}"))
            assert s2 == {"seq": s1["seq"], "unchanged": True}

            # keyframe replacement (not append) + removal
            v.publish_keyframe(7, np.zeros((32, 3)), None, stride=4)
            s3 = json.loads(_get(v.port, "/state.json"))
            assert len(s3["points"]) == 8 and s3["n_keyframes"] == 1
            v.remove_keyframe(7)
            s4 = json.loads(_get(v.port, "/state.json"))
            assert s4["points"] == [] and s4["n_keyframes"] == 0
        finally:
            v.close()

    def test_point_cap(self):
        v = LiveViewer(port=0, max_points=100)
        try:
            v.publish_keyframe(0, np.zeros((1000, 3)), None, stride=1)
            s = json.loads(_get(v.port, "/state.json"))
            assert len(s["points"]) <= 100
        finally:
            v.close()


class TestSLAMViewerHook:
    def test_oracle_run_publishes(self, rng):
        """A short oracle SLAM run with a viewer attached serves a
        non-empty colored cloud + trajectory over HTTP."""
        from mast3r_slam_tpu.config import Config, set_config
        from mast3r_slam_tpu.frame import Mode, create_frame
        from mast3r_slam_tpu.slam import SLAM
        from tests.oracle import make_oracle_world, render_frame_image
        import jax.numpy as jnp

        h, w = 16, 16
        n = 6
        model, _ = make_oracle_world(rng, n, h, w, step=0.03)
        set_config(
            Config.from_dict(
                {
                    "runtime": {"keyframe_capacity": 16, "viewer_refresh": 2},
                    "local_opt": {"max_edges": 32},
                    "matching": {"use_simple": True, "dist_thresh": 0.5},
                    "tracking": {"match_frac_thresh": 0.95},
                }
            )
        )
        slam = SLAM(model=model, resolution=16)
        slam.viewer = LiveViewer(port=0)
        try:
            for i in range(n):
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
                slam._bookkeep(frame, float(i))

            s = json.loads(_get(slam.viewer.port, "/state.json"))
            assert len(s["traj"]) == n
            assert len(s["points"]) > 0
            assert len(s["colors"]) == len(s["points"])
            assert s["n_keyframes"] == len(slam.keyframes)
            assert np.isfinite(np.asarray(s["points"], np.float64)).all()
        finally:
            slam.viewer.close()
