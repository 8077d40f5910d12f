"""End-of-round benchmark: tracking FPS on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

Metric: steady-state frontend tracking FPS — full per-frame pipeline
(ViT-L/16 two-view decode from cached features + iterative projective
matching + descriptor refine + on-device Sim3 GN + pointmap fusion +
keyframe statistics) at the 512x384 flagship resolution, bf16.

Baseline derivation (BASELINE.md): the reference publishes no end-to-end
FPS, so the baseline is its implied per-frame tracking budget on Apple
M4 Pro: 183 ms ViT-L two-view inference (mast3r_utils.py:58) + 8.7 ms
iter_proj (50k pts) + 15 ms refine + ~10 ms CPU GN ≈ 217 ms -> 4.6 FPS.
vs_baseline = our_fps / 4.6.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_FPS = 4.6


def _device_watchdog(timeout_s: float = 180.0) -> None:
    """Fail fast (instead of hanging the driver) if the device tunnel is
    wedged: probe a trivial op from a side thread and hard-exit on timeout."""
    import threading
    import os

    done = threading.Event()

    def probe():
        import jax.numpy as jnp

        float(jnp.sum(jnp.ones((8, 8))))
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(
            f"[bench] device probe timed out after {timeout_s}s — TPU tunnel "
            "unresponsive; aborting",
            file=sys.stderr,
        )
        os._exit(2)


def main() -> int:
    import numpy as np

    t_setup = time.time()
    import jax
    import jax.numpy as jnp

    _device_watchdog()

    # Persistent compilation cache: the ViT-L programs take ~2 min each to
    # compile through the remote-compile tunnel on first run; cached runs
    # start in seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mast3r_slam_tpu.config import Config, set_config
    from mast3r_slam_tpu.models import MASt3RModel
    from mast3r_slam_tpu.slam import SLAM

    backend = jax.default_backend()
    set_config(
        Config.from_dict(
            {
                "runtime": {"keyframe_capacity": 32},
                "local_opt": {"max_edges": 32},
                "matching": {
                    "use_simple": False,  # full iterative projective matching
                    "use_refine": True,
                    "refine_radius": 3,
                    "refine_dilation": 2,
                },
            }
        )
    )

    resolution = 512
    model = MASt3RModel.create(
        model_type="mast3r_full", resolution=resolution, precision="bf16"
    )
    print(
        f"[bench] backend={backend} params={model.num_params()/1e6:.1f}M "
        f"setup={time.time()-t_setup:.1f}s",
        file=sys.stderr,
    )

    slam = SLAM(model=model, resolution=resolution)
    h, w = model._out_hw

    # Synthetic static scene: keeps the pipeline in TRACKING mode so the
    # measurement is the per-frame tracking path (the north-star metric).
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)

    from mast3r_slam_tpu.dataloader import Dataset

    class Synthetic(Dataset):
        def __len__(self):
            return 40

        def __getitem__(self, idx):
            img = np.clip(
                base + rng.normal(0, 0.01, base.shape).astype(np.float32), 0, 1
            )
            return float(idx), (img * 255).astype(np.uint8)

    ds = Synthetic()

    # Warmup (compiles all per-frame programs).
    t0 = time.time()
    slam.run(
        ds,
        max_frames=4,
        callback=lambda fr, kfs: print(
            f"[bench] warmup frame {fr.frame_id} t={time.time()-t0:.1f}s",
            file=sys.stderr,
            flush=True,
        ),
    )
    print(f"[bench] warmup+compile {time.time()-t0:.1f}s", file=sys.stderr)

    # Timed steady-state run.
    slam2 = SLAM(model=model, resolution=resolution)
    warm, timed = 3, 20
    times = []
    results = None

    # Manual loop for per-frame timing.
    from mast3r_slam_tpu.dataloader import PrefetchLoader

    loader = PrefetchLoader(ds, img_size=resolution)
    from mast3r_slam_tpu.frame import Mode, create_frame

    for i, (ts, processed) in enumerate(loader(max_frames=warm + timed)):
        img01 = (processed["img"][0] + 1.0) * 0.5
        if i == 0:
            slam2._initialize_state(img01.shape[0], img01.shape[1])
        frame = create_frame(i, jnp.asarray(img01))
        t_f = time.perf_counter()
        if slam2.state.mode == Mode.INIT:
            slam2._process_init(frame)
        elif slam2.state.mode == Mode.TRACKING:
            slam2._process_tracking(frame)
        else:
            slam2._process_reloc(frame)
        slam2._run_backend()
        dt = time.perf_counter() - t_f
        if i >= warm:
            times.append(dt)

    med = float(np.median(times))
    fps = 1.0 / med
    print(
        f"[bench] median frame {med*1000:.1f} ms over {len(times)} frames "
        f"(min {min(times)*1000:.1f}, max {max(times)*1000:.1f})",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "tracking_fps_512x384_vitl_bf16",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
