"""SLAM state checkpoint/resume + calibrated-mode e2e."""

import numpy as np
import pytest
from PIL import Image

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.models import MASt3RConfig, MASt3RModel
from mast3r_slam_tpu.slam import SLAM


# tiny_model fixture: session-scoped in conftest.py


def _static_dataset(tmp_path, n=4):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    d = tmp_path / "ds"
    d.mkdir(exist_ok=True)
    for i in range(n):
        Image.fromarray(img).save(d / f"{i:03d}.png")
    return d


def _cfg(extra=None):
    base = {
        "runtime": {"keyframe_capacity": 16},
        "local_opt": {"max_edges": 16},
        "matching": {"use_simple": True},
    }
    if extra:
        base.update(extra)
    return Config.from_dict(base)


class TestSnapshot:
    def test_save_load_roundtrip(self, tmp_path, tiny_model):
        set_config(_cfg())
        ds = _static_dataset(tmp_path)
        slam = SLAM(model=tiny_model, resolution=64)
        slam.run(ds, max_frames=3)
        snap = tmp_path / "state.npz"
        slam.save_state(snap)

        slam2 = SLAM(model=tiny_model, resolution=64)
        slam2.load_state(snap)
        assert len(slam2.keyframes) == len(slam.keyframes)
        assert slam2.factor_graph.n_edges == slam.factor_graph.n_edges
        np.testing.assert_allclose(
            np.asarray(slam2.keyframes.T_WC), np.asarray(slam.keyframes.T_WC)
        )
        np.testing.assert_allclose(np.stack(slam2.poses), np.stack(slam.poses))
        assert slam2.retrieval_db.kf_ids == slam.retrieval_db.kf_ids

    def test_asmk_state_roundtrip(self, tmp_path, tiny_model):
        """ASMK retrieval state (whitening, codebook, aggregated arena)
        survives save/resume."""
        set_config(
            _cfg(
                {
                    "retrieval": {
                        "method": "asmk",
                        "asmk_n_words": 8,
                        "asmk_proj_dim": 4,
                        "asmk_codebook_kf": 1,
                    }
                }
            )
        )
        ds = _static_dataset(tmp_path)
        slam = SLAM(model=tiny_model, resolution=64)
        slam.run(ds, max_frames=3)
        a = slam.retrieval_db.asmk
        assert a is not None and a.ready() and a.count >= 1
        snap = tmp_path / "state_asmk.npz"
        slam.save_state(snap)

        slam2 = SLAM(model=tiny_model, resolution=64)
        slam2.load_state(snap)
        b = slam2.retrieval_db.asmk
        assert b.count == a.count
        np.testing.assert_array_equal(np.asarray(b.B), np.asarray(a.B))
        np.testing.assert_allclose(
            np.asarray(b.projection), np.asarray(a.projection)
        )
        np.testing.assert_allclose(
            np.asarray(b.codebook), np.asarray(a.codebook)
        )

    def test_resume_continues_tracking(self, tmp_path, tiny_model):
        set_config(_cfg())
        ds = _static_dataset(tmp_path)
        slam = SLAM(model=tiny_model, resolution=64)
        slam.run(ds, max_frames=2)
        snap = tmp_path / "state.npz"
        slam.save_state(snap)

        slam2 = SLAM(model=tiny_model, resolution=64)
        slam2.load_state(snap)
        # continue manually on one more frame
        from mast3r_slam_tpu.dataloader import PrefetchLoader, load_dataset
        from mast3r_slam_tpu.frame import create_frame
        import jax.numpy as jnp

        loader = PrefetchLoader(load_dataset(ds), img_size=64)
        items = list(loader(max_frames=3))
        ts, processed = items[2]
        img01 = (processed["img"][0] + 1.0) * 0.5
        frame = create_frame(2, jnp.asarray(img01))
        slam2._process_tracking(frame)
        assert np.isfinite(np.asarray(frame.T_WC)).all()


class TestSnapshotV2:
    """Fields added in SNAPSHOT_VERSION 2: fitted whitening params, pending
    backend tasks, reloc counter, keyframe filtering-mode mirrors, and the
    img_downsample geometry guard."""

    def test_whitening_params_roundtrip(self, tmp_path, tiny_model, rng):
        import jax.numpy as jnp

        from mast3r_slam_tpu.models.retrieval import RetrievalModel

        set_config(_cfg())
        ds = _static_dataset(tmp_path)
        slam = SLAM(model=tiny_model, resolution=64)
        slam.run(ds, max_frames=3)

        # Equip the (simple-retrieval) tiny-model db with a retrieval head
        # and fit online whitening — the state the 1024-d path reaches after
        # `retrieval.whitening_kf` keyframes.
        rdb = slam.retrieval_db
        rdb.retrieval = RetrievalModel(rdb.backbone_dim, rdb.backbone_dim, seed=3)
        rdb.use_simple = False
        rdb._whitening_kf = 1
        feat = jnp.asarray(
            rng.normal(size=(12, rdb.backbone_dim)), jnp.float32
        )
        rdb._maybe_fit_whitening(feat)
        assert rdb._whitening_fitted
        snap = tmp_path / "v2.npz"
        slam.save_state(snap)

        slam2 = SLAM(model=tiny_model, resolution=64)
        slam2.load_state(snap)
        rdb2 = slam2.retrieval_db
        assert rdb2._whitening_fitted and rdb2.retrieval is not None
        np.testing.assert_allclose(
            np.asarray(rdb2.compute_signature(feat)),
            np.asarray(rdb.compute_signature(feat)),
            rtol=1e-6,
            atol=1e-6,
        )

    def test_pending_tasks_and_kf_mirrors_roundtrip(self, tmp_path, tiny_model):
        set_config(_cfg())
        ds = _static_dataset(tmp_path)
        slam = SLAM(model=tiny_model, resolution=64)
        slam.run(ds, max_frames=3)
        slam.state.global_optimizer_tasks = [0]
        slam.state.reloc_pending = 2
        slam.keyframes._score_host[0] = 0.75
        snap = tmp_path / "v2b.npz"
        slam.save_state(snap)

        slam2 = SLAM(model=tiny_model, resolution=64)
        slam2.load_state(snap)
        assert slam2.state.global_optimizer_tasks == [0]
        assert slam2.state.reloc_pending == 2
        assert slam2.keyframes._nups_host == slam.keyframes._nups_host
        kf0 = slam2.keyframes[0]
        assert kf0.N_updates == slam.keyframes[0].N_updates
        assert kf0._score == 0.75

    def test_img_downsample_mismatch_raises(self, tmp_path, tiny_model):
        set_config(_cfg())
        ds = _static_dataset(tmp_path)
        slam = SLAM(model=tiny_model, resolution=64)
        slam.run(ds, max_frames=2)
        snap = tmp_path / "v2c.npz"
        slam.save_state(snap)

        set_config(_cfg({"dataset": {"img_downsample": 2}}))
        slam2 = SLAM(model=tiny_model, resolution=64)
        with pytest.raises(ValueError, match="img_downsample"):
            slam2.load_state(snap)


class TestCalibMode:
    def test_e2e_calibrated(self, tmp_path, tiny_model):
        set_config(
            _cfg(
                {
                    "use_calib": True,
                    "dataset": {"calib": [80.0, 80.0, 32.0, 24.0]},
                }
            )
        )
        ds = _static_dataset(tmp_path)
        slam = SLAM(model=tiny_model, resolution=64)
        results = slam.run(ds, max_frames=3)
        assert results["poses"].shape == (3, 4, 4)
        assert np.isfinite(results["poses"]).all()
        assert slam.keyframes.K is not None


class TestAutoSnapshot:
    def test_periodic_snapshot_written(self, tmp_path, tiny_model):
        snap = tmp_path / "auto.npz"
        set_config(
            Config.from_dict(
                {
                    "runtime": {
                        "keyframe_capacity": 16,
                        "snapshot_every": 2,
                        "snapshot_path": str(snap),
                    },
                    "local_opt": {"max_edges": 16},
                    "matching": {"use_simple": True},
                }
            )
        )
        ds = _static_dataset(tmp_path)
        slam = SLAM(model=tiny_model, resolution=64)
        slam.run(ds, max_frames=4)
        assert snap.exists()
        slam2 = SLAM(model=tiny_model, resolution=64)
        slam2.load_state(snap)
        assert len(slam2.poses) in (2, 4)  # last periodic write
