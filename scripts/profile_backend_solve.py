"""Profile the full-scale backend graph solve on the real TPU.

VERDICT r3 item 3 / PLAN round-4 item 5: the 8KF x 196k-pt x 32-edge
10-iteration solve measures ~90 ms after adaptive edge chunking — the
round-3 bisect left the [K,K,7,7] Hessian scatter-add and per-chunk
overhead unprofiled, and the builder's own roofline estimate says ~20x
headroom. This script takes a jax.profiler trace of the exact solve the
SLAM backend dispatches (global_opt.py:300 shapes) and prints the
per-HLO-op device-time composition, plus chained-protocol wall timings
for the A/B variants wired in ops/gauss_newton.py.

Run ON THE TPU (axon), one process at a time, idle host:
    python scripts/profile_backend_solve.py [--iters 10] [--edges 32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mast3r")


def build_problem(rng, num_kf: int, h: int, w: int, num_edges: int):
    import jax.numpy as jnp

    from tests.fixtures import make_graph_problem, perturb_poses

    prob = make_graph_problem(rng, num_kf=num_kf, h=h, w=w, num_edges=num_edges)
    Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.03)
    edge_mask = jnp.ones(prob["ii"].shape[0], bool)
    free = jnp.asarray([k >= 1 for k in range(num_kf)])
    return (
        Twc0, prob["Xs"], prob["Cs"], prob["ii"], prob["jj"], prob["idx"],
        prob["valid"], prob["Q"], edge_mask, free,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kf", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(384, 512))
    ap.add_argument("--edges", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mode", default="rays")
    ap.add_argument("--out", default="/tmp/prof_backend")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace-steps", type=int, default=3)
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument(
        "--variants", nargs="*",
        default=["base"],
        help="gauss_newton_graph A/B variants to time (see ops/gauss_newton)",
    )
    args = ap.parse_args()

    import numpy as np

    import jax

    from benchmarks.timing import time_device_chained
    from mast3r_slam_tpu.ops import GNParams, gauss_newton_graph
    from scripts.profile_fused_step import parse_hlo_stats

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    h, w = args.hw
    gn_args = build_problem(rng, args.kf, h, w, args.edges)
    n_pts = h * w
    print(
        f"problem: {args.kf} KF x {n_pts} pts x {args.edges} edges, "
        f"{args.iters} iters, mode={args.mode}",
        flush=True,
    )

    results = {}
    for variant in args.variants:
        params = GNParams(max_iter=args.iters, delta_thresh=0.0)
        kwargs = {}
        if variant != "base":
            kwargs["variant"] = variant
        fn = lambda *a: gauss_newton_graph(  # noqa: E731
            *a, mode=args.mode, params=params, **kwargs
        )[0]
        t, _ = time_device_chained(fn, *gn_args)
        results[variant] = t
        print(
            f"[{variant}] {t*1e3:.2f} ms / {args.iters}-iter solve "
            f"({t*1e3/args.iters:.2f} ms/iter)",
            flush=True,
        )

    if not args.no_trace:
        variant = args.variants[0]
        params = GNParams(max_iter=args.iters, delta_thresh=0.0)
        kwargs = {} if variant == "base" else {"variant": variant}
        fn = jax.jit(
            lambda *a: gauss_newton_graph(
                *a, mode=args.mode, params=params, **kwargs
            )[0]
        )
        out = fn(*gn_args)  # warm
        out.block_until_ready()
        with jax.profiler.trace(args.out):
            Twc = gn_args[0]
            for _ in range(args.trace_steps):
                Twc = fn(Twc, *gn_args[1:])
            float(np.asarray(Twc)[0, 0])

        rows, total = parse_hlo_stats(args.out)
        per_solve = total / args.trace_steps / 1e3
        print(
            f"\ntrace [{variant}]: {per_solve:.2f} ms device-self per solve "
            f"({per_solve/args.iters:.2f} ms/iter) over {args.trace_steps} solves"
        )
        print(f"{'self ms/solve':>14} {'%':>5} {'n':>5}  "
              f"{'category':<18} {'bound':<10} op")
        for name, cat, us, occ, bound in rows[: args.top]:
            ms = us / args.trace_steps / 1e3
            pct = 100.0 * us / total
            if pct < 0.3:
                break
            print(f"{ms:>14.3f} {pct:>5.1f} {occ:>5}  {cat:<18} "
                  f"{str(bound):<10} {name[:80]}")

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
