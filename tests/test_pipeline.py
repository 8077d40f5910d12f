"""Pipelined tracking loop: equivalence with the synchronous path.

runtime.pipeline dispatches frame i+1 before frame i's stats sync and
re-dispatches on speculation deviations (new KF / reloc / skip), so the
trajectory and keyframe set must match the synchronous loop — pipelining is
a scheduling change, not an algorithm change.
"""

import numpy as np
from PIL import Image

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.slam import SLAM


def _dataset(tmp_path, n=8):
    """Drifting scene: forces keyframe promotions mid-run so the pipeline's
    deviation/redispatch path is exercised, not just the happy path."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    d = tmp_path / "seq"
    d.mkdir()
    for i in range(n):
        img = np.roll(base, 3 * i, axis=1)
        Image.fromarray(img).save(d / f"{i:03d}.png")
    return d


def _run(tiny_model, path, pipeline: bool):
    set_config(
        Config.from_dict(
            {
                "runtime": {"keyframe_capacity": 16, "pipeline": pipeline},
                "local_opt": {"max_edges": 16},
                "matching": {"use_simple": True},
            }
        )
    )
    slam = SLAM(model=tiny_model, resolution=64)
    return slam, slam.run(path, max_frames=8)


class TestPipelineEquivalence:
    def test_same_trajectory_and_keyframes(self, tmp_path, tiny_model):
        path = _dataset(tmp_path)
        slam_a, res_a = _run(tiny_model, path, pipeline=False)
        slam_b, res_b = _run(tiny_model, path, pipeline=True)

        assert res_a["keyframe_indices"] == res_b["keyframe_indices"]
        assert res_a["poses"].shape == res_b["poses"].shape
        np.testing.assert_allclose(
            res_b["poses"], res_a["poses"], atol=1e-4,
            err_msg="pipelined trajectory deviates from synchronous",
        )
        assert np.all(np.isfinite(res_b["points"]))

    def test_pipeline_used(self, tmp_path, tiny_model):
        path = _dataset(tmp_path)
        slam, _ = _run(tiny_model, path, pipeline=True)
        assert slam.tracker.can_pipeline
        # the fused one-dispatch program was built and used
        assert slam.tracker._fused2 is not None
