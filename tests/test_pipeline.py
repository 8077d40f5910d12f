"""Zero-sync chained tracking loop: equivalence with the synchronous path.

runtime.pipeline runs each frame as one fused device program whose
keyframe/skip decision executes ON DEVICE (lax.cond promotion with mono
decode), and the host drains stats every `runtime.sync_every` frames — so
the trajectory and keyframe set must match the synchronous loop: chaining
is a scheduling change, not an algorithm change. (Backend pose corrections
land at window granularity, hence the pose tolerance; keyframe decisions
are pose-independent and must match exactly.)
"""

import numpy as np
from PIL import Image

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.slam import SLAM


def _dataset(tmp_path, n=8):
    """Drifting scene: forces keyframe promotions mid-run so the chained
    promotion path is exercised, not just the happy path."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    d = tmp_path / "seq"
    d.mkdir()
    for i in range(n):
        img = np.roll(base, 3 * i, axis=1)
        Image.fromarray(img).save(d / f"{i:03d}.png")
    return d


def _run(tiny_model, path, pipeline: bool, sync_every: int = 1, n=8):
    set_config(
        Config.from_dict(
            {
                "runtime": {
                    "keyframe_capacity": 16,
                    "pipeline": pipeline,
                    "sync_every": sync_every,
                },
                "local_opt": {"max_edges": 16},
                "matching": {"use_simple": True},
            }
        )
    )
    slam = SLAM(model=tiny_model, resolution=64)
    return slam, slam.run(path, max_frames=n)


class TestPipelineEquivalence:
    def test_same_trajectory_and_keyframes(self, tmp_path, tiny_model):
        path = _dataset(tmp_path)
        slam_a, res_a = _run(tiny_model, path, pipeline=False)
        slam_b, res_b = _run(tiny_model, path, pipeline=True, sync_every=1)

        assert res_a["keyframe_indices"] == res_b["keyframe_indices"]
        assert res_a["poses"].shape == res_b["poses"].shape
        np.testing.assert_allclose(
            res_b["poses"], res_a["poses"], atol=1e-4,
            err_msg="pipelined trajectory deviates from synchronous",
        )
        assert np.all(np.isfinite(res_b["points"]))

    def test_windowed_sync_matches_per_frame_sync(self, tmp_path, tiny_model):
        """sync_every=3 (promotions crossing window boundaries on device)
        vs sync_every=1: identical keyframe decisions; poses equal up to
        the window-lagged backend corrections."""
        path = _dataset(tmp_path, n=9)
        _, res_a = _run(tiny_model, path, pipeline=True, sync_every=1, n=9)
        _, res_b = _run(tiny_model, path, pipeline=True, sync_every=3, n=9)

        assert res_a["keyframe_indices"] == res_b["keyframe_indices"]
        assert res_a["poses"].shape == res_b["poses"].shape
        assert np.all(np.isfinite(res_b["poses"]))
        assert np.all(np.isfinite(res_b["points"]))
        np.testing.assert_allclose(
            res_b["poses"], res_a["poses"], atol=5e-2,
            err_msg="windowed drain deviates beyond backend-lag tolerance",
        )

    def test_pipeline_used(self, tmp_path, tiny_model):
        path = _dataset(tmp_path)
        slam, _ = _run(tiny_model, path, pipeline=True)
        assert slam.tracker.can_pipeline
        # a fused chained program was built and used (scanned window path
        # and/or the per-frame tail path)
        assert (
            slam.tracker._fused_scan is not None
            or slam.tracker._fused_chain is not None
        )
