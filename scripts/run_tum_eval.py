#!/usr/bin/env python
"""One-command TUM evaluation: SLAM -> trajectory -> ATE/RPE -> renders.

Usage:
  python scripts/run_tum_eval.py /data/tum/rgbd_dataset_freiburg1_desk \
      [--config configs/tum.yaml] [--max-frames N] [--out out/]

Runs the full pipeline on the sequence, writes TUM trajectory + PLY map +
trajectory/pointcloud renders, and (if the sequence ships groundtruth.txt)
prints ATE-RMSE / RPE as one JSON line — the BASELINE.json headline
metrics, self-contained (no external evo needed).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--config", default=None)
    ap.add_argument("--model-type", default="mast3r_full")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument(
        "--checkpoint", default=None, metavar="PATH",
        help="local upstream safetensors/.pth/.npz weights "
        "(MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric layout); loads "
        "strict through models/io.py. Expected bf16-vs-upstream tolerance: "
        "pointmaps agree to ~1e-2 relative (bf16 mantissa), ATE-RMSE is the "
        "meaningful parity metric (SURVEY §7 'Precision').",
    )
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--out", default="out")
    args = ap.parse_args(argv)

    import numpy as np

    from mast3r_slam_tpu.dataloader import TUMDataset, load_dataset
    from mast3r_slam_tpu.slam import SLAM
    from mast3r_slam_tpu.utils.evaluate import associate_trajectories, rpe_rmse
    from mast3r_slam_tpu.utils.export import ate_rmse
    from mast3r_slam_tpu.utils.viz import render_run

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    if args.checkpoint:
        from mast3r_slam_tpu.config import get_config, load_config, set_config

        cfg = load_config(args.config) if args.config else get_config()
        cfg.model.checkpoint = args.checkpoint
        set_config(cfg)
        args.config = None  # already installed globally

    slam = SLAM(
        config_path=args.config,
        model_type=args.model_type,
        resolution=args.resolution,
        precision=args.precision,
    )
    ds = load_dataset(args.dataset)
    t0 = time.perf_counter()
    slam.run(ds, max_frames=args.max_frames)
    wall = time.perf_counter() - t0
    n = len(slam.poses)

    slam.save_trajectory(out / "trajectory_tum.txt", format="tum")
    slam.save_pointcloud(out / "map.ply")
    slam.save_state(out / "state.npz")
    render_run(slam, out)

    result = {
        "frames": n,
        "keyframes": len(slam.keyframes),
        "fps": round(n / wall, 3),
    }
    if isinstance(ds, TUMDataset):
        try:
            ts_gt, gt = ds.groundtruth()
            est = np.stack([np.asarray(p) for p in slam.poses])
            ia, ib = associate_trajectories(np.asarray(slam.timestamps), ts_gt)
            result["ate_rmse"] = round(ate_rmse(est[ia], gt[ib]), 5)
            result["rpe_rmse"] = round(rpe_rmse(est[ia], gt[ib]), 5)
            result["n_associated"] = int(ia.size)
        except FileNotFoundError:
            result["ate_rmse"] = None
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
