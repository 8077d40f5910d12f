"""ATE-vs-noise accuracy bands for every matcher at realistic image scale.

VERDICT r3 item 7: the deployment matcher defaults (dense coarse-to-fine
lattice, tanh gelu) were justified by oracle-trajectory equivalence at
16x16 only. This script re-runs the system-oracle e2e at 64x64 and 128x128
with injected pointmap noise sweeps (the oracle's `noise` knob redraws
Gaussian noise on every decoded pointmap) and records ATE for
simple / dense (exhaustive r6) / dense_c2f (deployment r3 lattice) /
iterative — evidence the matcher choice holds away from toy scale, and the
data to flip defaults if c2f degrades first.

Two motion regimes: tracking-like (step 0.03) and fast (step 0.10), the
latter because the c2f lattice samples 4-6 px offsets on the even grid only
(configs/base.yaml note) — fast motion is where coverage gaps would show.

Writes docs/oracle_noise_bands.json and prints a markdown table.

Usage:
    python scripts/run_oracle_noise_bands.py            # full sweep
    python scripts/run_oracle_noise_bands.py --quick    # 32px smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

# CPU: the oracle model is numpy; only the SLAM device programs jit (see
# tests/conftest.py for why env alone is not enough under this harness).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mast3r")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


MATCHERS = {
    # config dict per matcher family; dense_c2f uses the DEPLOYMENT lattice
    # (radius 3, dilations (2,1) = 89 taps, configs/base.yaml), dense the
    # exhaustive in-code default (radius 6, 169 taps).
    "simple": {"use_simple": True, "dist_thresh": 0.5},
    "dense": {"method": "dense", "dense_radius": 6,
              "dense_dilations": (1,), "dist_thresh": 0.5},
    "dense_c2f": {"method": "dense", "dense_radius": 3,
                  "dense_dilations": (2, 1), "dist_thresh": 0.5},
    "iterative": {"method": "iterative", "dist_thresh": 0.5},
}


def run_case(h: int, w: int, n: int, step: float, noise: float,
             matcher: str, seed: int, point_stride: int = 1) -> dict:
    import numpy as np

    from mast3r_slam_tpu.config import Config, set_config
    from mast3r_slam_tpu.frame import Mode, create_frame
    from mast3r_slam_tpu.slam import SLAM
    from mast3r_slam_tpu.utils.export import ate_rmse
    from tests.oracle import make_oracle_world, render_frame_image

    rng = np.random.default_rng(seed)
    model, poses_gt = make_oracle_world(rng, n, h, w, step=step)
    model.noise = noise

    set_config(
        Config.from_dict(
            {
                "runtime": {"keyframe_capacity": 32, "gelu_impl": "tanh"},
                "local_opt": {"max_edges": 64,
                              "point_stride": point_stride},
                "matching": dict(MATCHERS[matcher]),
                "tracking": {"match_frac_thresh": 0.95},
            }
        )
    )
    slam = SLAM(model=model, resolution=min(h, w))

    import jax.numpy as jnp

    t0 = time.time()
    for i in range(n):
        frame = create_frame(i, jnp.asarray(render_frame_image(i, h, w, rng)))
        if i == 0:
            slam._initialize_state(h, w)
        if slam.state.mode == Mode.INIT:
            slam._process_init(frame)
        elif slam.state.mode == Mode.TRACKING:
            slam._process_tracking(frame)
        else:
            slam._process_reloc(frame)
        slam.poses.append(np.asarray(frame.T_WC))
        slam.timestamps.append(float(i))
        slam._run_backend()
    wall = time.time() - t0

    est = np.stack(slam.poses)
    ate = ate_rmse(est, poses_gt)
    abs_err = np.linalg.norm(est[:, :3] - poses_gt[:, :3], axis=-1)
    return {
        "ate_rmse": float(ate),
        "max_abs_err": float(abs_err.max()),
        "n_keyframes": int(len(slam.keyframes)),
        "wall_s": round(wall, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--sizes", type=int, nargs="*", default=None)
    ap.add_argument("--noises", type=float, nargs="*",
                    default=[0.0, 0.002, 0.005, 0.01, 0.02])
    ap.add_argument("--matchers", nargs="*", default=list(MATCHERS))
    ap.add_argument("--out", default=str(REPO / "docs" / "oracle_noise_bands.json"))
    ap.add_argument("--point-stride", type=int, default=1,
                    help="local_opt.point_stride for the backend solves "
                    "(full-scale ATE evidence for the fast.yaml stride-2 "
                    "latency profile)")
    args = ap.parse_args()

    if args.point_stride != 1 and args.out == ap.get_default("out"):
        # never clobber the canonical stride-1 baseline evidence
        args.out = str(
            REPO / "docs" / f"oracle_noise_bands_stride{args.point_stride}.json"
        )
    sizes = args.sizes or ([32] if args.quick else [64, 128])
    noises = [0.0, 0.01] if args.quick else args.noises
    n_frames = 14
    # fast-motion leg only at the smaller size (compile cost; the coverage
    # question is lattice-relative, not resolution-relative)
    regimes = [(s, 0.03) for s in sizes] + [(sizes[0], 0.10)]

    results: dict = {
        "n_frames": n_frames,
        "point_stride": args.point_stride,
        "sizes": sizes,
        "noises": noises,
        "matchers": args.matchers,
        "cases": [],
    }
    for (size, step) in regimes:
        for matcher in args.matchers:
            for noise in noises:
                tag = f"{size}px step={step} {matcher} noise={noise}"
                try:
                    r = run_case(size, size, n_frames, step, noise, matcher,
                                 seed=11, point_stride=args.point_stride)
                except Exception as e:  # noqa: BLE001 — record, keep sweeping
                    r = {"error": f"{type(e).__name__}: {e}"}
                r.update(size=size, step=step, matcher=matcher, noise=noise)
                results["cases"].append(r)
                print(f"{tag}: {r}", flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")

    # markdown table: rows = (size, step, noise), cols = matchers
    keys = sorted({(c["size"], c["step"], c["noise"]) for c in results["cases"]})
    print("\n| size | step | noise | " + " | ".join(args.matchers) + " |")
    print("|---" * (3 + len(args.matchers)) + "|")
    for (size, step, noise) in keys:
        row = [f"| {size} | {step} | {noise} "]
        for m in args.matchers:
            cell = next(
                (c for c in results["cases"]
                 if (c["size"], c["step"], c["noise"], c["matcher"])
                 == (size, step, noise, m)),
                None,
            )
            row.append(
                "| — " if cell is None
                else f"| err " if "error" in cell
                else f"| {cell['ate_rmse']:.2e} "
            )
        print("".join(row) + "|")
    print(f"\nwritten: {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
