"""On-chip A/B: XLA shifted-tap matcher vs Pallas VMEM-tiled matcher.

Strict relay-safe protocol (docs/PLAN.md, bench.py): every timed loop is a
DATA-DEPENDENT chain (call k+1 consumes call k's output, so the device
cannot overlap or reorder) closed by a scalar fetch (block_until_ready
returns early through the relay). A no-op dispatch+fetch baseline is
subtracted once.

Usage:  python scripts/measure_matcher.py [--iters 20] [--quick]
Writes: prints a small table; exits nonzero if the pallas path fails to
compile so a wrapper can fall back gracefully.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--quick", action="store_true", help="CPU-size smoke")
    ap.add_argument("--band", type=int, default=64, help="pallas row-band height")
    ap.add_argument(
        "--fast-sum", action="store_true",
        help="pairwise bf16 pre-reduction of descriptor products",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.quick:
        jax.config.update("jax_platforms", "cpu")

    from mast3r_slam_tpu.ops.dense_match import match_dense_window
    from mast3r_slam_tpu.ops.dense_match_pallas import match_dense_window_pallas

    h, w, d, p = (48, 64, 8, 5) if args.quick else (384, 512, 24, 5)
    radius = 2 if args.quick else 6
    print(f"backend={jax.default_backend()} {h}x{w} d={d} radius={radius}")

    rng = np.random.default_rng(7)
    X1 = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32)) + jnp.array(
        [0.0, 0.0, 3.0]
    )
    X2 = X1 + 0.01 * jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))
    D1 = jnp.asarray(rng.normal(size=(1, h, w, d)).astype(np.float32))
    D2 = jnp.asarray(rng.normal(size=(1, h, w, d)).astype(np.float32))
    pay = jnp.asarray(rng.normal(size=(1, h, w, p)).astype(np.float32))
    kw = dict(radius=radius, dilations=(1,), payload=pay, want_hit=True)

    from benchmarks.timing import noop_baseline, time_device_chained

    print(f"noop dispatch+fetch baseline: {noop_baseline() * 1e3:.2f} ms")

    def timed_chain(fn, label):
        # Shared relay-safe protocol (benchmarks/timing.py): each call's
        # output perturbs the next call's first argument inside one jitted
        # step, and the loop closes with a scalar fetch.
        try:
            dt, _ = time_device_chained(fn, X1, X2, D1, D2, iters=args.iters)
        except Exception as e:  # pallas compile failure -> report, skip
            print(f"{label}: FAILED ({type(e).__name__}: {e})")
            return None
        print(f"{label}: {dt * 1e3:.3f} ms/call")
        return dt

    t_xla = timed_chain(
        lambda *a: match_dense_window(*a, **kw), "xla shifted-tap (payload+hit)"
    )
    t_pal = timed_chain(
        lambda *a: match_dense_window_pallas(
            *a, band=args.band, fast_sum=args.fast_sum, **kw
        ),
        f"pallas vmem-tiled band={args.band}"
        f" fast_sum={args.fast_sum} (payload+hit)",
    )
    if t_pal is None:
        return 1
    if t_xla:
        print(f"speedup: {t_xla / t_pal:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
