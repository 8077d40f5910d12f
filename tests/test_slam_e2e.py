"""End-to-end SLAM pipeline (tiny model, synthetic data).

The minimum end-to-end slice of SURVEY.md §7.6: full pipeline — mono
inference, asymmetric match, tracking, keyframing, backend, retrieval,
export — exercised at test scale. The tiny model has random weights, so
pointmaps are arbitrary-but-deterministic; a static scene (repeated image)
must therefore track near-identity, and random scenes must exercise the
reloc machinery without crashing.
"""

import numpy as np
import pytest
from PIL import Image

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.models import MASt3RConfig, MASt3RModel
from mast3r_slam_tpu.slam import SLAM
from mast3r_slam_tpu.utils.export import (
    ate_rmse,
    load_trajectory_tum,
    save_ply,
)


# tiny_model fixture: session-scoped in conftest.py


def _make_slam(tiny_model):
    set_config(
        Config.from_dict(
            {
                "runtime": {"keyframe_capacity": 16},
                "local_opt": {"max_edges": 16},
                "matching": {"use_simple": True},
            }
        )
    )
    return SLAM(model=tiny_model, resolution=64)


def _static_dataset(tmp_path, n=5):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    for i in range(n):
        Image.fromarray(img).save(tmp_path / f"{i:03d}.png")
    return tmp_path


class TestE2E:
    def test_static_scene_tracks_identity(self, tmp_path, tiny_model):
        ds_path = _static_dataset(tmp_path)
        slam = _make_slam(tiny_model)
        results = slam.run(ds_path, max_frames=4)

        assert results["poses"].shape == (4, 4, 4)
        assert len(results["keyframe_indices"]) >= 1
        # identical frames -> poses must remain near identity
        for T in results["poses"]:
            np.testing.assert_allclose(T, np.eye(4), atol=0.05)

    def test_exports(self, tmp_path, tiny_model):
        ds_path = _static_dataset(tmp_path / "ds" if (tmp_path / "ds").mkdir() or True else tmp_path)
        slam = _make_slam(tiny_model)
        slam.run(ds_path, max_frames=3)

        traj = tmp_path / "traj.txt"
        slam.save_trajectory(traj, format="tum")
        ts, poses = load_trajectory_tum(traj)
        assert len(ts) == 3 and poses.shape == (3, 8)

        kitti = tmp_path / "kitti.txt"
        slam.save_trajectory(kitti, format="kitti")
        rows = kitti.read_text().strip().splitlines()
        assert len(rows) == 3 and len(rows[0].split()) == 12

        ply = tmp_path / "map.ply"
        slam.save_pointcloud(ply)
        header = ply.read_text().splitlines()
        assert header[0] == "ply"
        n_vertex = int([l for l in header if "element vertex" in l][0].split()[-1])
        assert n_vertex > 0

    def test_img_downsample_fused_path(self, tmp_path, tiny_model):
        """dataset.img_downsample=2: the arena holds (h/2)x(w/2) pointmaps
        while the model decodes full-res — every fused program must
        stride-slice its decode outputs (regression: the sync per-frame
        program skipped the slicing and crashed at trace time)."""
        ds_path = _static_dataset(tmp_path)
        set_config(
            Config.from_dict(
                {
                    "runtime": {"keyframe_capacity": 16, "pipeline": False},
                    "local_opt": {"max_edges": 16},
                    "matching": {"use_simple": True},
                    "dataset": {"img_downsample": 2},
                }
            )
        )
        slam = SLAM(model=tiny_model, resolution=64)
        results = slam.run(ds_path, max_frames=3)
        assert results["poses"].shape == (3, 4, 4)
        for T in results["poses"]:
            np.testing.assert_allclose(T, np.eye(4), atol=0.05)

    def test_patch14_family_through_loader(self, tmp_path):
        """The full SLAM loop with a patch-14 (DUNE-family) model: the
        loader's crop must land on the /14 token grid (regression: the
        crop geometry hardcoded /16, so any dunemast3r run died in
        set_out_hw — the reference has the same latent hardcode at
        image.py:75)."""
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        for i in range(3):
            Image.fromarray(img).save(tmp_path / f"{i:03d}.png")
        cfg = MASt3RConfig(
            enc_embed_dim=56, enc_depth=2, enc_num_heads=2, patch_size=14,
            dec_embed_dim=40, dec_depth=2, dec_num_heads=2,
            head_type="linear", dtype=jnp.float32,
        )
        model = MASt3RModel.create(resolution=112, _test_cfg=cfg)
        set_config(
            Config.from_dict(
                {
                    "runtime": {"keyframe_capacity": 16},
                    "local_opt": {"max_edges": 16},
                    "matching": {"use_simple": True},
                }
            )
        )
        slam = SLAM(model=model, resolution=112)
        results = slam.run(tmp_path, max_frames=3)
        assert results["poses"].shape == (3, 4, 4)
        h, w = model._out_hw
        assert h % 14 == 0 and w % 14 == 0
        for T in results["poses"]:
            np.testing.assert_allclose(T, np.eye(4), atol=0.05)

    def test_changing_scene_survives(self, tmp_path, tiny_model):
        """Random images: tracking may fail -> reloc path; must not crash."""
        rng = np.random.default_rng(3)
        for i in range(4):
            img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            Image.fromarray(img).save(tmp_path / f"{i:03d}.png")
        slam = _make_slam(tiny_model)
        results = slam.run(tmp_path, max_frames=4)
        assert results["poses"].shape[0] == 4


class TestATE:
    def test_zero_for_identical(self, rng):
        poses = rng.normal(size=(10, 8)).astype(np.float32)
        assert ate_rmse(poses, poses) == pytest.approx(0.0, abs=1e-5)

    def test_invariant_to_sim3(self, rng):
        import jax.numpy as jnp

        from mast3r_slam_tpu.lie import core as lie

        t = rng.normal(size=(20, 3)).astype(np.float32)
        poses = np.concatenate(
            [t, np.tile([0, 0, 0, 1, 1], (20, 1)).astype(np.float32)], axis=-1
        )
        T = lie.sim3_exp(jnp.asarray(rng.normal(size=7) * 0.5, jnp.float32))
        t2 = np.asarray(lie.sim3_act(T[None], jnp.asarray(t)))
        poses2 = poses.copy()
        poses2[:, :3] = t2
        assert ate_rmse(poses2, poses) == pytest.approx(0.0, abs=1e-4)
