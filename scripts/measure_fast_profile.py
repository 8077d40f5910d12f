"""On-chip speed profile of the latency-first deployment point (configs/fast.yaml).

Roadmap item (docs/PLAN.md round-4 #3): the conv/matmul share of the full
ViT-L window program is ~62% of the frame — the model itself is the
frontier, and the honest lever is the compact patch-14 `dunemast3r`
family (430M params, 336 px, simple matching — the reference's DuneMast3r
operating point, BASELINE.md: 11-32 ms two-view on Apple Silicon).

Measures, with bench.py's protocols (gates opened so random weights stay
in TRACKING; distinct inputs per window so the relay's result cache
cannot serve repeats):
  1. orchestrated SLAM steady-state FPS (zero-sync chained loop)
  2. full-program device window chain ms/frame (encode + decode + match +
     GN + fusion + on-device keyframe decision, 1 dispatch / sync_every)

Usage: python scripts/measure_fast_profile.py   (real chip, ~10 min)
"""

from __future__ import annotations

import contextlib
import io
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, "/root/repo")
    from bench import _device_watchdog

    _device_watchdog()

    from mast3r_slam_tpu.config import Config, set_config
    from mast3r_slam_tpu.dataloader import Dataset
    from mast3r_slam_tpu.models import MASt3RModel
    from mast3r_slam_tpu.slam import SLAM

    # fast.yaml operating point, with bench.py's open-gate overrides so the
    # random-weight pipeline stays in TRACKING (we measure the tracking
    # path, not reloc churn).
    set_config(
        Config.from_dict(
            {
                "runtime": {"keyframe_capacity": 32, "gelu_impl": "tanh"},
                "local_opt": {"max_edges": 32},
                "matching": {"use_simple": True, "dist_thresh": 1e6},
                "tracking": {
                    "min_match_frac": 0.0,
                    "match_frac_thresh": 0.0,
                    "Q_conf": 0.0,
                },
            }
        )
    )

    t0 = time.time()
    resolution = 336
    model = MASt3RModel.create(
        model_type="dunemast3r", variant="base", resolution=resolution,
        precision="bf16",
    )
    h, w = model._out_hw
    print(
        f"[fast] dunemast3r-base {model.num_params()/1e6:.1f}M {h}x{w} "
        f"setup={time.time()-t0:.1f}s",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    frames_u8 = [
        (
            np.clip(base + rng.normal(0, 0.005, base.shape), 0, 1) * 255
        ).astype(np.uint8)
        for _ in range(8)
    ]

    class Synthetic(Dataset):
        def __len__(self):
            return 96

        def __getitem__(self, idx):
            return float(idx), frames_u8[idx % len(frames_u8)]

    slam = SLAM(model=model, resolution=resolution)
    stamps = []

    def cb(fr, kfs):
        stamps.append(time.perf_counter())

    sync_every = slam.config.runtime.sync_every
    n_run = 6 * sync_every
    t0 = time.time()
    quiet = io.StringIO()
    with contextlib.redirect_stdout(quiet):
        slam.run(Synthetic(), max_frames=n_run, callback=cb)
    steady = 3 * sync_every
    orchestrated = steady / (stamps[-1] - stamps[-1 - steady])
    print(
        f"[fast] orchestrated SLAM steady-state (zero-sync chained loop, "
        f"1 drain per {sync_every} frames, fetch-ahead): "
        f"{orchestrated:.2f} FPS  (run total {time.time()-t0:.0f}s incl. "
        f"compile)",
        file=sys.stderr,
    )

    # Full-program device window chain, reusing the run's compiled scan.
    scan_fn = slam.tracker._fused_scan
    chain_st = slam.tracker._chain
    if scan_fn is None or chain_st is None:
        print("[fast] window-chain leg unavailable (no compiled scan)",
              file=sys.stderr)
        return 1
    K = sync_every
    wins = []
    for wseed in range(12):
        arr = np.stack(
            [frames_u8[(wseed * K + j) % len(frames_u8)] for j in range(K)]
        ).copy()
        arr[:, 0, 0, 0] = np.uint8(wseed)
        wins.append(jnp.asarray(arr))
    jax.block_until_ready(wins)
    n = chain_st["X"].shape[0]
    idx0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (1, n))

    def wcall(imgs, st):
        return scan_fn(
            model.params, imgs, st["feat"], st["pos"], idx0,
            st["X"], st["C"], st["N"], st["T"], st["T"], None,
        )

    def fin(out):
        f = out["final"]
        return dict(
            feat=f["kf_feat"], pos=f["kf_pos"], X=f["kf_X"],
            C=f["kf_C"], N=f["kN"], T=f["kf_T"],
        )

    st = chain_st
    for wnd in range(4):
        out = wcall(wins[wnd], st)
        st = fin(out)
    float(out["stats"][-1, 0])
    t0 = time.perf_counter()
    for wnd in range(4, 12):
        out = wcall(wins[wnd], st)
        st = fin(out)
    float(out["stats"][-1, 0])
    per = (time.perf_counter() - t0) / (8 * K)
    print(
        f"[fast] full-program device window chain: {per*1e3:.2f} ms/frame "
        f"({1/per:.1f} FPS)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
