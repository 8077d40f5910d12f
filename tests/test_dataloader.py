"""Dataset loaders: format autodetection, config subsample/reverse, prefetch."""

import numpy as np
import pytest
from PIL import Image

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.dataloader import (
    EuRoCDataset,
    FolderDataset,
    PrefetchLoader,
    TUMDataset,
    load_dataset,
)


def _write_img(path, seed):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(path)


@pytest.fixture
def folder_ds(tmp_path):
    d = tmp_path / "folder"
    d.mkdir()
    for i in range(6):
        _write_img(d / f"{i:04d}.png", i)
    return d


@pytest.fixture
def tum_ds(tmp_path):
    d = tmp_path / "tum"
    (d / "rgb").mkdir(parents=True)
    lines = []
    for i in range(4):
        name = f"rgb/{1000.5 + i:.6f}.png"
        _write_img(d / name, i)
        lines.append(f"{1000.5 + i:.6f} {name}")
    (d / "rgb.txt").write_text("# tum\n" + "\n".join(lines) + "\n")
    return d


class TestFolder:
    def test_basic(self, folder_ds):
        ds = FolderDataset(folder_ds)
        assert len(ds) == 6
        ts, img = ds[2]
        assert img.shape == (48, 64, 3) and img.dtype == np.uint8

    def test_subsample_reverse(self, folder_ds):
        set_config(Config.from_dict({"dataset": {"subsample": 2, "reverse": True}}))
        ds = FolderDataset(folder_ds)
        assert len(ds) == 3
        assert ds.files[0].name == "0004.png"  # reversed, stride 2


class TestTUM:
    def test_rgb_txt(self, tum_ds):
        ds = TUMDataset(tum_ds)
        assert len(ds) == 4
        ts, img = ds[0]
        assert ts == pytest.approx(1000.5)

    def test_autodetect(self, tum_ds, folder_ds):
        assert isinstance(load_dataset(tum_ds), TUMDataset)
        assert isinstance(load_dataset(folder_ds), FolderDataset)


class TestEuRoC:
    def test_layout(self, tmp_path):
        d = tmp_path / "mav0" / "cam0" / "data"
        d.mkdir(parents=True)
        for i in range(3):
            _write_img(d / f"{int(1.4e18) + i * 10**8}.png", i)
        ds = EuRoCDataset(tmp_path)
        assert len(ds) == 3
        ts, _ = ds[1]
        assert ts == pytest.approx(1.4e9 + 0.1, rel=1e-6)
        assert isinstance(load_dataset(tmp_path), EuRoCDataset)


class TestPrefetch:
    def test_streams_all_frames_processed(self, folder_ds):
        ds = FolderDataset(folder_ds)
        loader = PrefetchLoader(ds, img_size=64, depth=2)
        items = list(loader(max_frames=4))
        assert len(items) == 4
        ts, processed = items[0]
        assert processed["img"].shape[0] == 1
        h, w = processed["true_shape"][0]
        assert w == 64 and h % 16 == 0


class TestTUMGroundtruth:
    def test_groundtruth_loading(self, tum_ds):
        gt_lines = ["# gt"] + [
            f"{1000.5 + i:.4f} {i*0.1:.3f} 0 0 0 0 0 1" for i in range(4)
        ]
        (tum_ds / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
        ds = TUMDataset(tum_ds)
        ts, poses = ds.groundtruth()
        assert len(ts) == 4 and poses.shape == (4, 8)
        assert poses[1, 0] == pytest.approx(0.1)


class TestVideo:
    def test_video_dataset(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        path = tmp_path / "clip.mp4"
        wr = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48)
        )
        frames = []
        for i in range(6):
            f = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            frames.append(f)
            wr.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        wr.release()

        from mast3r_slam_tpu.dataloader import VideoDataset, load_dataset

        ds = load_dataset(path)
        assert isinstance(ds, VideoDataset)
        assert len(ds) == 6
        ts, img = ds[2]
        assert img.shape == (48, 64, 3)
        assert ts == pytest.approx(0.2)

    def test_video_subsample(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        from mast3r_slam_tpu.config import Config, set_config

        path = tmp_path / "clip.mp4"
        wr = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48)
        )
        for i in range(6):
            wr.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        wr.release()
        set_config(Config.from_dict({"dataset": {"subsample": 2}}))
        from mast3r_slam_tpu.dataloader import VideoDataset

        ds = VideoDataset(path)
        assert len(ds) == 3
