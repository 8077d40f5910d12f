"""On-chip A/B of the serving microbatch-scan unroll (runtime.serving_scan_unroll).

Round-3 finding (docs/PLAN.md round-4 roadmap #2): at B=16/mb=4 the nc=4
chunk scan measured ~8x slower per batch than B=8's nc=2 — the per-step
stacked-output writes defeat in-place aliasing. This script measures the
candidate fix: partial unroll of the chunk loop (transients = `unroll`
chunks), plus the mb=8 middle ground, using bench.py's zero-sync chain
protocol (k dispatches queued, ONE stats fetch — the relay RTT rides once).

Usage: python scripts/measure_serving_unroll.py   (real chip, ~15 min)
"""

from __future__ import annotations

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
    from mast3r_slam_tpu.frame import create_frame
    from mast3r_slam_tpu.inference import mast3r_inference_mono
    from mast3r_slam_tpu.models import MASt3RModel

    base_cfg = {
        "runtime": {"gelu_impl": "tanh"},
        "matching": {
            "method": "dense",
            "dense_radius": 3,
            "dense_dilations": (2, 1),
            "dist_thresh": 1e6,
        },
        "tracking": {
            "min_match_frac": 0.0,
            "match_frac_thresh": 0.0,
            "Q_conf": 0.0,
        },
    }
    set_config(Config.from_dict(base_cfg))

    t0 = time.time()
    model = MASt3RModel.create(
        model_type="mast3r_full", resolution=512, precision="bf16"
    )
    h, w = model._out_hw
    print(
        f"[unroll] model {model.num_params()/1e6:.1f}M {h}x{w} "
        f"setup={time.time()-t0:.1f}s",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    kf = create_frame(0, jnp.asarray(base))
    X, C, feat, pos = mast3r_inference_mono(model, kf)
    frame = create_frame(
        1,
        jnp.asarray(
            np.clip(
                base + rng.normal(0, 0.005, base.shape).astype(np.float32),
                0,
                1,
            )
        ),
    )
    from mast3r_slam_tpu.inference import _ensure_encoded

    _ensure_encoded(model, frame)

    from mast3r_slam_tpu.serving import BatchTracker

    results = {}
    # (B, microbatch, unroll); mb=4/unroll=1 rows reproduce the round-3
    # bench numbers as the control.
    import ast

    combos = [
        (8, 4, 1),
        (16, 4, 1),
        (16, 4, 2),
        (16, 4, 4),
        (16, 8, 1),
    ]
    if len(sys.argv) > 1:  # e.g. "[(8,4,2),(32,4,4)]"
        combos = ast.literal_eval(sys.argv[1])
    for B, mb, unroll in combos:
        tag = f"B={B} mb={mb} unroll={unroll}"
        try:
            set_config(
                Config.from_dict(
                    {
                        **base_cfg,
                        "runtime": {
                            **base_cfg["runtime"],
                            "serving_microbatch": mb,
                            "serving_scan_unroll": unroll,
                        },
                    }
                )
            )
            tileB = lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim)
            bt = BatchTracker(model)
            assert bt.microbatch == mb and bt.scan_unroll == unroll
            bt.init_from_keyframes(
                tileB(feat), tileB(pos), tileB(X), tileB(C)
            )
            posB = tileB(frame.pos)
            featsB = [tileB(frame.feat) + i * 1e-4 for i in range(10)]
            jax.block_until_ready(featsB)
            t0 = time.time()
            bt.step(featsB[0], posB)
            print(f"[unroll] {tag}: compile {time.time()-t0:.1f}s",
                  file=sys.stderr)
            bt.step(featsB[1], posB)
            k = 8
            t0 = time.perf_counter()
            handles = [bt.step_async(featsB[2 + i], posB) for i in range(k)]
            stats = np.asarray(jnp.stack(handles))  # ONE fetch
            dt = (time.perf_counter() - t0) / k
            assert stats.shape[0] == k
            results[tag] = (B / dt, dt * 1e3)
            print(
                f"[unroll] {tag}: {B/dt:.1f} tracked frames/s "
                f"({dt*1e3:.1f} ms/batch)",
                file=sys.stderr,
            )
        except Exception as e:
            results[tag] = None
            print(f"[unroll] {tag}: FAILED — {type(e).__name__}: {e}",
                  file=sys.stderr)

    print("\n[unroll] summary:", file=sys.stderr)
    for tag, r in results.items():
        line = (
            f"  {tag}: {r[0]:.1f} frames/s ({r[1]:.1f} ms/batch)"
            if r
            else f"  {tag}: FAILED"
        )
        print(line, file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
