"""Non-4:3 input handling (EuRoC-style): decode resolution must follow the
ACTUAL processed frame shape, not the canonical 4:3 creation shape.

Regression for the crash where `_out_hw` stayed pinned at the canonical
shape (e.g. 384x512) while preprocessing produced the input's own aspect
(EuRoC 752x480 -> 320x512), making token reshapes fail on the first frame.
"""

import numpy as np
import pytest
from PIL import Image

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.models import MASt3RConfig, MASt3RModel
from mast3r_slam_tpu.slam import SLAM


def _fresh_tiny():
    # NOT the session fixture: set_out_hw mutates the model.
    return MASt3RModel.create(resolution=64, _test_cfg=MASt3RConfig.tiny())


def _euroc_shaped_dataset(tmp_path, n=3):
    """EuRoC cam aspect (752x480 ~ 1.57): preprocess at 64 -> 32x64 (2:1),
    not the canonical 48x64 the model was created with."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (120, 188, 3), dtype=np.uint8)
    for i in range(n):
        Image.fromarray(img).save(tmp_path / f"{i:03d}.png")
    return tmp_path


class TestSetOutHw:
    def test_decode_follows_out_hw(self):
        m = _fresh_tiny()
        assert m._out_hw == (48, 64)
        m.set_out_hw(32, 64)
        img = np.zeros((1, 32, 64, 3), np.float32)
        out1, out2 = m.reconstruct(img, img)
        assert out1["pts3d"].shape == (1, 32, 64, 3)
        feat, pos = m.encode(img)
        o1, _ = m.decode(feat, pos, feat, pos)
        assert o1["pts3d"].shape == (1, 32, 64, 3)
        Xii, Cii = m.mono(feat[0], pos[0])
        assert Xii.shape == (32 * 64, 3)

    def test_non_patch_multiple_rejected(self):
        m = _fresh_tiny()
        with pytest.raises(AssertionError):
            m.set_out_hw(33, 64)


class TestEuRoCAspectE2E:
    def test_slam_runs_on_non_canonical_aspect(self, tmp_path):
        set_config(
            Config.from_dict(
                {
                    "runtime": {"keyframe_capacity": 8},
                    "local_opt": {"max_edges": 8},
                    "matching": {"use_simple": True},
                }
            )
        )
        slam = SLAM(model=_fresh_tiny(), resolution=64)
        results = slam.run(_euroc_shaped_dataset(tmp_path), max_frames=3)
        assert results["poses"].shape == (3, 4, 4)
        assert np.all(np.isfinite(results["poses"]))
        # keyframe pointmaps live at the processed (non-canonical) shape
        assert slam.keyframes.h == 32 and slam.keyframes.w == 64


class TestDeviceResize:
    """Device-side bilinear resize (reference image.py:103-158 analog —
    separable align-corners matmuls, gather-free)."""

    def test_matches_numpy_align_corners_oracle(self, rng):
        from mast3r_slam_tpu.models.preprocess import resize_image_device

        img = rng.uniform(size=(17, 23, 3)).astype(np.float32)
        th, tw = 9, 31

        def oracle_axis(a, n_out, axis):
            n_in = a.shape[axis]
            pos = np.arange(n_out) * ((n_in - 1) / max(n_out - 1, 1))
            lo = np.clip(np.floor(pos).astype(int), 0, n_in - 2)
            fr = (pos - lo).reshape([-1 if i == axis else 1 for i in range(a.ndim)])
            return (
                np.take(a, lo, axis) * (1 - fr) + np.take(a, lo + 1, axis) * fr
            )

        want = oracle_axis(oracle_axis(img, th, 0), tw, 1)
        got = np.asarray(resize_image_device(img, (th, tw)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_format_and_dtype_semantics(self, rng):
        from mast3r_slam_tpu.models.preprocess import resize_image_device

        u8 = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        out = resize_image_device(u8, 32)  # long edge, truncating scale
        assert out.shape == (24, 32, 3) and out.dtype == np.uint8
        chw = resize_image_device(np.zeros((3, 48, 64), np.float32), (12, 16))
        assert chw.shape == (3, 12, 16)
        sq = resize_image_device(u8, 20, keep_aspect=False)
        assert sq.shape == (20, 20, 3)

    def test_identity_when_same_size(self, rng):
        from mast3r_slam_tpu.models.preprocess import resize_image_device

        img = rng.uniform(size=(8, 10, 1)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(resize_image_device(img, (8, 10))), img, atol=1e-6
        )
