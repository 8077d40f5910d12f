"""Structured per-run metrics: file emission + summary (SURVEY §5.5)."""

import numpy as np
from PIL import Image

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.slam import SLAM
from mast3r_slam_tpu.utils.metrics import read_metrics, summarize


def test_metrics_file_emitted(tmp_path, tiny_model, rng):
    d = tmp_path / "seq"
    d.mkdir()
    base = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    for i in range(4):
        Image.fromarray(base).save(d / f"{i:03d}.png")

    mpath = tmp_path / "run.jsonl"
    set_config(
        Config.from_dict(
            {
                "runtime": {
                    "keyframe_capacity": 8,
                    "metrics_path": str(mpath),
                },
                "local_opt": {"max_edges": 16},
                "matching": {"use_simple": True},
            }
        )
    )
    slam = SLAM(model=tiny_model, resolution=64)
    slam.run(d, max_frames=4)

    records = read_metrics(mpath)
    frames = [r for r in records if r["event"] == "frame"]
    assert len(frames) == 4
    for r in frames:
        assert r["frame_ms"] > 0
        assert "n_keyframes" in r and "mode" in r and "n_edges" in r
    # tracked frames carry the match-stat bundle
    assert any("match_frac" in r for r in frames)

    s = summarize(mpath)
    assert s["n_frames"] == 4
    assert s["fps"] > 0
    assert s["n_keyframes"] >= 1
    assert s["n_kf_events"] >= 0


def test_summary_cli(tmp_path):
    from mast3r_slam_tpu.utils.metrics import MetricsLogger, main

    p = tmp_path / "m.jsonl"
    log = MetricsLogger(p)
    log.log({"event": "frame", "frame": 0, "frame_ms": 10.0, "n_keyframes": 1})
    log.log({"event": "frame", "frame": 1, "frame_ms": 20.0, "n_keyframes": 1,
             "new_kf": True, "match_frac": 0.5})
    log.log({"event": "eviction", "victim": 0})
    log.close()
    assert main([str(p)]) == 0
    s = summarize(p)
    assert s["n_frames"] == 2
    assert abs(s["fps"] - 2 / 0.03) < 1e-6
    assert s["n_kf_events"] == 1
    assert s["n_evictions"] == 1
    assert s["mean_match_frac"] == 0.5
