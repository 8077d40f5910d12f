"""Measure what a keyframe-burst backend solve costs the tracking pipeline
end-to-end, and what `local_opt.point_stride` buys there (VERDICT r4
item 4).

The claim under test: "the backend solve only gates keyframe-burst
latency — tracking throughput is unaffected (JAX async dispatch overlaps
it)". The device has ONE execution stream, so a solve dispatched between
two window programs serializes on-device; what async dispatch hides is
host latency, not device time. This script measures the real schedule:

  A. window alone               (baseline cadence)
  B. window + solve(stride 1) + window   (burst, reference-parity solve)
  C. window + solve(stride 2) + window   (burst, strided solve)

each as a dependent dispatch chain closed by one scalar fetch (the only
trustworthy protocol on this backend — docs/PLAN.md round-2). Reported:
added wall time of the burst vs 2x baseline = the real burst stall, and
the stride-2 saving = what the accuracy trade actually buys end-to-end.

Run ON THE TPU, one process at a time, idle host:
    python scripts/measure_burst_latency.py [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mast3r")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--kf", type=int, default=8)
    ap.add_argument("--edges", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="docs/burst_latency.json")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model on host CPU: validates the script's "
                    "own plumbing; numbers meaningless")
    args = ap.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mast3r_slam_tpu.config import Config, set_config
    from mast3r_slam_tpu.frame import Keyframes, create_frame
    from mast3r_slam_tpu.inference import mast3r_inference_mono
    from mast3r_slam_tpu.models.mast3r import MASt3RModel
    from mast3r_slam_tpu.ops import GNParams, gauss_newton_graph
    from mast3r_slam_tpu.tracker import FrameTracker, _make_fused_track_chain_scan
    from scripts.profile_backend_solve import build_problem

    print(f"devices: {jax.devices()}", flush=True)
    set_config(
        Config.from_dict(
            {
                "runtime": {"keyframe_capacity": 32, "gelu_impl": "tanh"},
                "local_opt": {"max_edges": args.edges},
                "matching": {"method": "dense", "dist_thresh": 1e6,
                             "dense_radius": 3, "dense_dilations": (2, 1)},
                "tracking": {"min_match_frac": 0.0,
                             "match_frac_thresh": 0.0, "Q_conf": 0.0},
            }
        )
    )

    t0 = time.time()
    if args.smoke:
        from mast3r_slam_tpu.models.mast3r import MASt3RConfig

        model = MASt3RModel.create(
            resolution=64, _test_cfg=MASt3RConfig.tiny()
        )
    else:
        model = MASt3RModel.create(resolution=512)
    h, w = model._out_hw
    print(f"model ready {h}x{w} ({time.time()-t0:.1f}s)", flush=True)

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    kfs = Keyframes(h, w)
    kf = create_frame(0, jnp.asarray(base))
    X, C, feat, pos = mast3r_inference_mono(model, kf)
    kf.X_canon, kf.C, kf.feat, kf.pos = X, C, feat, pos
    kf.N = kf.N_updates = 1
    kfs.append(kf)
    tracker = FrameTracker(model, kfs)

    K = args.window
    scan_fn = _make_fused_track_chain_scan(
        model, tracker.cfg, tracker.cfg.filtering_mode
    )
    n0 = h * w
    idx0 = jnp.broadcast_to(jnp.arange(n0, dtype=jnp.int32)[None], (1, n0))
    wins = []
    for wseed in range(24):
        arr = (np.clip(base + rng.normal(0, 0.005, base.shape), 0, 1) * 255
               ).astype(np.uint8)[None].repeat(K, 0).copy()
        arr[:, 0, 0, 0] = np.uint8(wseed)
        wins.append(jnp.asarray(arr))
    jax.block_until_ready(wins)

    def win(img_b, st):
        out = scan_fn(
            model.params, img_b, st["feat"], st["pos"], idx0,
            st["X"], st["C"], st["N"], st["T"], st["T"], None,
        )
        f = out["final"]
        return dict(
            feat=f["kf_feat"], pos=f["kf_pos"], X=f["kf_X"],
            C=f["kf_C"], N=f["kN"], T=f["kf_T"],
        ), out["stats"]

    st0 = dict(feat=kf.feat, pos=kf.pos, X=kf.X_canon, C=kf.C,
               N=jnp.asarray(1.0), T=kf.T_WC)
    t0 = time.time()
    st, stats = win(wins[0], st0)
    st, stats = win(wins[1], st)
    float(stats[-1, 0])
    print(f"window program warm ({time.time()-t0:.1f}s)", flush=True)

    # Full-scale backend solve, the exact shapes global_opt dispatches.
    gn_args = build_problem(np.random.default_rng(1), args.kf, h, w, args.edges)
    solve_fns = {}
    for stride in (1, 2):
        params = GNParams(max_iter=args.iters, delta_thresh=0.0)
        fn = jax.jit(
            lambda *a, _s=stride: gauss_newton_graph(
                *a, mode="rays", params=params, variant="noconcat",
                img_size=(h, w), point_stride=_s,
            )[0]
        )
        out = fn(*gn_args)
        out.block_until_ready()
        float(np.asarray(out)[0, 0])
        solve_fns[stride] = fn
    print("solves warm", flush=True)

    solve_rep = [0]

    def run_burst(stride, widx):
        """windows widx, widx+1 with a solve dispatched between; one
        dependent drain at the end. Returns wall seconds. The solve's
        initial poses are perturbed per call — the relay serves repeated
        IDENTICAL executions from a result cache (docs/PLAN.md round-2),
        which would fake a zero-stall burst."""
        nonlocal st
        solve_rep[0] += 1
        Twc0 = jnp.asarray(gn_args[0]).at[0, 0].add(1e-6 * solve_rep[0])
        jax.block_until_ready(Twc0)  # perturbation outside the timed span
        t0 = time.perf_counter()
        st, stats1 = win(wins[widx], st)
        if stride:
            Twc = solve_fns[stride](Twc0, *gn_args[1:])
        st, stats2 = win(wins[widx + 1], st)
        float(stats2[-1, 0])
        if stride:
            float(np.asarray(Twc)[0, 0])
        return time.perf_counter() - t0

    # Interleave scenarios across reps so relay drift hits all equally.
    results = {"baseline_2win": [], "burst_stride1": [], "burst_stride2": []}
    widx = 2
    for rep in range(args.reps):
        for name, stride in (("baseline_2win", 0), ("burst_stride1", 1),
                             ("burst_stride2", 2)):
            results[name].append(run_burst(stride, widx))
            widx += 2
            if widx + 1 >= len(wins):
                widx = 2

    report = {"config": {"window": K, "kf": args.kf, "edges": args.edges,
                         "iters": args.iters, "hw": [h, w],
                         "reps": args.reps},
              "wall_s": {k: [round(v, 4) for v in vs]
                         for k, vs in results.items()}}
    med = {k: sorted(vs)[len(vs) // 2] for k, vs in results.items()}
    base2 = med["baseline_2win"]
    report["median_ms"] = {k: round(v * 1e3, 1) for k, v in med.items()}
    report["burst_stall_ms"] = {
        "stride1": round((med["burst_stride1"] - base2) * 1e3, 1),
        "stride2": round((med["burst_stride2"] - base2) * 1e3, 1),
    }
    report["stride2_saving_ms"] = round(
        (med["burst_stride1"] - med["burst_stride2"]) * 1e3, 1
    )
    report["per_frame_baseline_ms"] = round(base2 / (2 * K) * 1e3, 2)
    print(json.dumps(report, indent=2))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
