"""System-level metric correctness: full SLAM loop on an oracle world.

With a perfect two-view model, the estimated trajectory must recover the
ground truth (first pose pinned = gauge fixed), keyframes must be created
as the view drifts, and the backend must keep keyframe poses consistent.
This is the test the reference could never run (its backend was a no-op
and its symmetric matcher a stub).
"""

import numpy as np
import pytest
from PIL import Image

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.slam import SLAM
from mast3r_slam_tpu.utils.export import ate_rmse
from tests.oracle import make_oracle_world, render_frame_image


@pytest.fixture
def oracle_setup(tmp_path, rng):
    h, w = 16, 16  # divisible by patch 16 -> _canonical? (unused for oracle)
    n_frames = 12
    model, poses_gt = make_oracle_world(rng, n_frames, h, w, step=0.03)
    d = tmp_path / "seq"
    d.mkdir()
    for i in range(n_frames):
        Image.fromarray(render_frame_image(i, h, w, rng)).save(d / f"{i:03d}.png")
    return model, poses_gt, d, n_frames


def _slam_config():
    set_config(
        Config.from_dict(
            {
                "runtime": {"keyframe_capacity": 16},
                "local_opt": {"max_edges": 32},
                "matching": {"use_simple": True, "dist_thresh": 0.5},
                "tracking": {"match_frac_thresh": 0.95},
            }
        )
    )


class TestOracleSLAM:
    @pytest.mark.parametrize(
        "matcher,gelu",
        [
            ("simple", "erf"),
            ("dense", "erf"),
            ("iterative", "erf"),
            # deployment composition: dense matcher + tanh gelu (the
            # configs/base.yaml default) — e2e evidence that the 4.7e-4
            # gelu deviation does not move the recovered trajectory
            ("dense", "tanh"),
            # coarse-to-fine tap lattice (half the taps, same reach:
            # radius R/2 at dilations (2,1) — the perf candidate for the
            # deployment config): trajectory must stay in the same band
            ("dense_c2f", "tanh"),
        ],
    )
    def test_recovers_ground_truth_trajectory(self, oracle_setup, matcher, gelu):
        """All three matchers must recover the oracle trajectory to the SAME
        accuracy band — the e2e evidence that the shipped dense default is
        equivalent to the reference's iterative projective matching."""
        model, poses_gt, d, n = oracle_setup
        _slam_config()
        if matcher != "simple" or gelu != "erf":
            set_config(
                Config.from_dict(
                    {
                        "runtime": {"keyframe_capacity": 16,
                                    "gelu_impl": gelu},
                        "local_opt": {"max_edges": 32},
                        "matching": {
                            "method": "dense",
                            "dense_radius": 1,
                            "dense_dilations": (2, 1),
                            "dist_thresh": 0.5,
                        } if matcher == "dense_c2f" else {
                            "method": matcher,
                            "dense_radius": 2,
                            "dist_thresh": 0.5,
                        } if matcher != "simple" else {
                            "use_simple": True, "dist_thresh": 0.5,
                        },
                        "tracking": {"match_frac_thresh": 0.95},
                    }
                )
            )
        slam = SLAM(model=model, resolution=16)

        # Bypass image preprocessing (oracle frames carry their id in a
        # pixel; resize would destroy it) by feeding the dataset directly.
        from mast3r_slam_tpu.dataloader import load_dataset
        from mast3r_slam_tpu.frame import Mode, create_frame
        import jax.numpy as jnp

        ds = load_dataset(d)
        for i in range(n):
            ts, rgb = ds[i]
            frame = create_frame(i, jnp.asarray(rgb))
            if i == 0:
                slam._initialize_state(rgb.shape[0], rgb.shape[1])
            if slam.state.mode == Mode.INIT:
                slam._process_init(frame)
            elif slam.state.mode == Mode.TRACKING:
                slam._process_tracking(frame)
            else:
                slam._process_reloc(frame)
            slam.timestamps.append(ts)
            slam.poses.append(np.asarray(frame.T_WC))
            slam._run_backend()

        est = np.stack(slam.poses)
        ate = ate_rmse(est, poses_gt)
        # absolute per-pose error (gauge is pinned at identity)
        abs_err = np.linalg.norm(est[:, :3] - poses_gt[:, :3], axis=-1)
        assert ate < 5e-3, f"ATE {ate}"
        assert abs_err.max() < 2e-2, f"max abs err {abs_err.max()}"
        assert len(slam.keyframes) >= 1

    def test_bounded_backend_budget(self, tmp_path, rng):
        """local_opt.backend_tasks_per_frame=1 interleaves backend solves
        across frames; accuracy must match the drain-everything behavior
        and the queue must drain by sequence end."""
        h, w = 16, 16
        n = 10
        model, poses_gt = make_oracle_world(rng, n, h, w, step=0.12)
        set_config(
            Config.from_dict(
                {
                    "runtime": {"keyframe_capacity": 16},
                    "local_opt": {
                        "max_edges": 32,
                        "backend_tasks_per_frame": 1,
                    },
                    "matching": {"use_simple": True, "dist_thresh": 0.05},
                    "tracking": {"match_frac_thresh": 0.9, "min_match_frac": 0.01},
                }
            )
        )
        slam = SLAM(model=model, resolution=16)
        from mast3r_slam_tpu.frame import Mode, create_frame
        import jax.numpy as jnp

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
        slam._run_backend(budget=0)  # final drain (run() does this)

        assert not slam.state.global_optimizer_tasks
        assert len(slam.keyframes) >= 2
        est = np.stack(slam.poses)
        ate = ate_rmse(est, poses_gt)
        assert ate < 2e-2, f"ATE {ate} with bounded backend"

    def test_keyframes_created_on_drift(self, tmp_path, rng):
        """Larger motion steps must trigger new keyframes (match fraction /
        uniqueness decay) and the backend must keep them consistent."""
        h, w = 16, 16
        n = 10
        model, poses_gt = make_oracle_world(rng, n, h, w, step=0.12)
        _slam_config()
        # tighten the distance gate so drifted points invalidate
        set_config(
            Config.from_dict(
                {
                    "runtime": {"keyframe_capacity": 16},
                    "local_opt": {"max_edges": 32},
                    "matching": {"use_simple": True, "dist_thresh": 0.05},
                    "tracking": {"match_frac_thresh": 0.9, "min_match_frac": 0.01},
                }
            )
        )
        slam = SLAM(model=model, resolution=16)
        from mast3r_slam_tpu.frame import Mode, create_frame
        import jax.numpy as jnp

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

        assert len(slam.keyframes) >= 2, "drift should force new keyframes"
        est = np.stack(slam.poses)
        ate = ate_rmse(est, poses_gt)
        assert ate < 2e-2, f"ATE {ate} with keyframe chain"


class TestCalibFreeOracle:
    def test_focal_estimated_and_tracked(self, rng):
        """BASELINE config 5 (EuRoC-style calibration-free): use_calib with
        NO provided intrinsics -> focal estimated from the first mono
        pointmap, then the calibrated pixel+log-depth objective tracks the
        oracle trajectory to the same accuracy band as the rays runs."""
        h, w = 32, 32
        n = 10
        model, poses_gt = make_oracle_world(rng, n, h, w, step=0.03)
        set_config(
            Config.from_dict(
                {
                    "use_calib": True,
                    "runtime": {"keyframe_capacity": 16},
                    "local_opt": {"max_edges": 32},
                    "matching": {"use_simple": True, "dist_thresh": 0.5},
                    "tracking": {"match_frac_thresh": 0.95},
                }
            )
        )
        slam = SLAM(model=model, resolution=32)
        from mast3r_slam_tpu.frame import Mode, create_frame
        import jax.numpy as jnp

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

        # focal estimated (ground truth fixture focal = 1.2 * w)
        K = slam.keyframes.get_intrinsics()
        assert K is not None
        f_est, f_gt = float(K[0, 0]), 1.2 * w
        assert abs(f_est - f_gt) / f_gt < 0.15, f"focal {f_est} vs {f_gt}"

        est = np.stack(slam.poses)
        ate = ate_rmse(est, poses_gt)
        # Bound is looser than the rays runs: calib mode constrains points
        # to the camera's pixel rays (correct for real MASt3R pointmaps,
        # where pointmap pixel n IS the point on ray n), but the oracle's
        # pointmaps index FIXED scene points by frame-0's grid, so the
        # snap distorts its geometry by ~the inter-frame pixel drift.
        # Solver exactness on properly-constructed calib fixtures is
        # covered by tests/test_gauss_newton.py.
        assert ate < 5e-2, f"calib-free ATE {ate}"
