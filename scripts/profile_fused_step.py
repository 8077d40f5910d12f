"""Profile the fused tracking step on the real TPU and print the op-level
device-time composition (PLAN round-3 roadmap item 2: decode is ~75% of the
step — find where inside the decoder/DPT it goes before touching anything).

Parses the xplane proto emitted by jax.profiler directly (no TensorBoard UI
on this host); aggregates XLA op device time by event name. Set-up mirrors
bench.py's device-chained leg exactly (same `_make_fused_track` program,
same threading), so ms/step here decomposes the bench headline.

Usage: python scripts/profile_fused_step.py [--steps 5] [--out /tmp/prof]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_hlo_stats(logdir: str):
    """Aggregate the trace's per-HLO-op stats via xprof's hlo_stats tool.

    Returns (rows, total_us) where rows = [(fw_op_name, category, self_us,
    occurrences, bound_by)] sorted by self time."""
    import json

    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    d = json.loads(data.decode() if isinstance(data, bytes) else data)
    i = {c.get("label"): j for j, c in enumerate(d["cols"])}

    agg: dict[tuple, list] = collections.defaultdict(lambda: [0.0, 0])
    total = 0.0
    for r in d["rows"]:
        c = r["c"]
        v = lambda k: c[i[k]]["v"]
        t = float(v("Total self time (us)") or 0)
        total += t
        key = (
            v("Framework op name") or "?",
            v("HLO op category"),
            v("Bound by"),
        )
        agg[key][0] += t
        agg[key][1] += int(v("#Occurrences") or 0)
    rows = sorted(
        ((k[0], k[1], s[0], s[1], k[2]) for k, s in agg.items()),
        key=lambda t: -t[2],
    )
    return rows, total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/prof_fused")
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument(
        "--window", type=int, default=0, metavar="K",
        help="profile the K-frame window chain program (batched encode + "
        "unrolled decode chain) instead of the per-frame cached-features "
        "step; ms/step is then ms/frame",
    )
    ap.add_argument(
        "--bench-config", action="store_true",
        help="use bench.py's tracking-throughput config (dense matcher, "
        "gates open, no promotions) instead of library defaults",
    )
    ap.add_argument(
        "--spec-decode", action="store_true",
        help="enable runtime.window_spec_decode (speculative batched "
        "window decode) for the A/B",
    )
    ap.add_argument(
        "--attention", default=None, choices=["auto", "xla", "flash"],
        help="override runtime.attention_impl for the A/B",
    )
    ap.add_argument(
        "--dense-lattice", default=None, metavar="R:D1,D2",
        help="override the dense matcher tap lattice, e.g. '3:2,1' = "
        "radius 3 at dilations (2,1) — the coarse-to-fine lattice with "
        "the same +-6 px reach as the default 169-tap dense window at "
        "about half the taps",
    )
    ap.add_argument(
        "--gelu", default=None, choices=["erf", "tanh"],
        help="override runtime.gelu_impl for the A/B",
    )
    ap.add_argument(
        "--gelu-barrier", action="store_true",
        help="materialize gelu outputs (break erf-into-fc2 fusion) for "
        "the A/B",
    )
    ap.add_argument(
        "--weight-quant", default=None, choices=["none", "int8"],
        help="int8 = store large kernels int8 + per-channel scales and "
        "dequantize inside each program (models/quant.py) — the weight-"
        "streaming A/B of PLAN round-4 item 3 / VERDICT r4 item 1",
    )
    ap.add_argument(
        "--no-batched-encode", action="store_true",
        help="disable the hoisted B=K window encode (per-frame inline "
        "encodes inside the chain) for the A/B",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mast3r_slam_tpu.frame import Keyframes, create_frame
    from mast3r_slam_tpu.models.mast3r import MASt3RModel
    from mast3r_slam_tpu.tracker import FrameTracker, _make_fused_track
    from mast3r_slam_tpu.inference import (
        _ensure_encoded,
        mast3r_inference_mono,
    )

    from mast3r_slam_tpu.config import Config, get_config, set_config

    if args.bench_config:
        set_config(
            Config.from_dict(
                {
                    "runtime": {"keyframe_capacity": 32,
                                "gelu_impl": "tanh"},
                    "local_opt": {"max_edges": 32},
                    "matching": {"method": "dense", "dist_thresh": 1e6,
                                 "dense_radius": 3,
                                 "dense_dilations": (2, 1)},
                    "tracking": {
                        "min_match_frac": 0.0,
                        "match_frac_thresh": 0.0,
                        "Q_conf": 0.0,
                    },
                }
            )
        )
    live_cfg = get_config()
    if args.spec_decode:
        live_cfg.runtime.window_spec_decode = True
    if args.dense_lattice:
        r_s, dil_s = args.dense_lattice.split(":")
        live_cfg.matching.dense_radius = int(r_s)
        live_cfg.matching.dense_dilations = tuple(
            int(d) for d in dil_s.split(",")
        )
    if args.no_batched_encode:
        live_cfg.runtime.window_batched_encode = False
    if args.attention:
        live_cfg.runtime.attention_impl = args.attention
    if args.gelu_barrier:
        live_cfg.runtime.gelu_barrier = True
    if args.gelu:
        live_cfg.runtime.gelu_impl = args.gelu

    t0 = time.time()
    model = MASt3RModel.create(resolution=512)
    if args.weight_quant:
        model.quantize_weights(args.weight_quant)
    h, w = model._out_hw
    print(f"model ready {h}x{w} ({time.time()-t0:.1f}s)", file=sys.stderr)

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    kfs = Keyframes(h, w)
    kf = create_frame(0, jnp.asarray(base))
    X, C, feat, pos = mast3r_inference_mono(model, kf)
    kf.X_canon, kf.C, kf.feat, kf.pos = X, C, feat, pos
    kf.N = kf.N_updates = 1
    kfs.append(kf)
    frame = create_frame(
        1,
        jnp.asarray(
            np.clip(base + rng.normal(0, 0.005, base.shape).astype(np.float32), 0, 1)
        ),
    )
    tracker = FrameTracker(model, kfs)
    _ensure_encoded(model, frame)

    if args.window:
        # Window chain program (what slam.py dispatches per sync_every
        # frames): batched B=K ViT-L encode + K chained decode/match/GN
        # steps + on-device promotion. One "step" below = one window.
        from mast3r_slam_tpu.tracker import _make_fused_track_chain_scan

        K = args.window
        scan_fn = _make_fused_track_chain_scan(
            model, tracker.cfg, tracker.cfg.filtering_mode
        )
        n0 = h * w
        idx0 = jnp.broadcast_to(jnp.arange(n0, dtype=jnp.int32)[None], (1, n0))
        rng2 = np.random.default_rng(1)
        imgs = [
            jnp.asarray(
                (np.clip(base + rng2.normal(0, 0.005, base.shape), 0, 1) * 255
                 ).astype(np.uint8)[None].repeat(K, 0)
            )
            for _ in range(4)
        ]
        jax.block_until_ready(imgs)

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

        st = dict(
            feat=kf.feat, pos=kf.pos, X=kf.X_canon, C=kf.C,
            N=jnp.asarray(1.0), T=kf.T_WC,
        )
        t0 = time.time()
        st, stats = win(imgs[0], st)
        st, stats = win(imgs[1], st)
        float(stats[-1, 0])
        print(f"window program warm ({time.time()-t0:.1f}s)", file=sys.stderr)

        jax.profiler.start_trace(args.out)
        for i in range(2, 4):
            st, stats = win(imgs[i], st)
        float(stats[-1, 0])
        jax.profiler.stop_trace()
        args.steps = 2 * K  # report per frame

        rows, total_us = parse_hlo_stats(args.out)
        print(
            f"total device self time: {total_us/1e3:.2f} ms over "
            f"{args.steps} frames ({total_us/1e3/args.steps:.2f} ms/frame)"
        )
        cat = collections.defaultdict(float)
        for _, category, us, _, _ in rows:
            cat[category] += us
        print("-- by HLO category (ms/frame) --")
        for k, us in sorted(cat.items(), key=lambda x: -x[1])[:10]:
            print(f"{us/1e3/args.steps:9.3f}  {us/total_us*100:5.1f}%  {k}")
        print(f"\n{'ms/frame':>9}  {'%':>5}  {'n':>4}  bound-by      op")
        for name, _, us, cnt, bound in rows[: args.top]:
            ms = us / 1e3 / args.steps
            print(
                f"{ms:9.3f}  {us/total_us*100:5.1f}  {cnt:4d}  "
                f"{bound or '?':<12}  {name[:100]}"
            )
        return 0

    fused = _make_fused_track(model, tracker.cfg, tracker.cfg.filtering_mode)

    @jax.jit
    def step_once(params, featf, posf, featk, posk, kX, kC, Tk, fX, fC, fN, T):
        out = fused(
            params, featf, posf, featk, posk, None,
            fX, fC, fN, kX, kC, jnp.asarray(1.0), T, Tk,
        )
        return out["frame_X"], out["frame_C"], out["stats"][3], out["T_WCf"]

    consts = (
        model.params, frame.feat, frame.pos, kf.feat, kf.pos,
        kf.X_canon, kf.C, kf.T_WC,
    )
    n0 = h * w
    st = (
        jnp.zeros((n0, 3)), jnp.zeros((n0, 1)),
        jnp.zeros((), jnp.float32), kf.T_WC,
    )
    st = step_once(*consts, *st)
    st = step_once(*consts, *st)  # absorb weak-type retrace
    float(st[2])
    print("warmed up", file=sys.stderr)

    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        st = step_once(*consts, *st)
    float(st[2])  # force chain completion (relay block_until_ready lies)
    jax.profiler.stop_trace()

    rows, total_us = parse_hlo_stats(args.out)
    print(
        f"total device self time: {total_us/1e3:.2f} ms over {args.steps} "
        f"steps ({total_us/1e3/args.steps:.2f} ms/step)"
    )
    cat = collections.defaultdict(float)
    for _, category, us, _, _ in rows:
        cat[category] += us
    print("-- by HLO category (ms/step) --")
    for k, us in sorted(cat.items(), key=lambda x: -x[1])[:10]:
        print(f"{us/1e3/args.steps:9.3f}  {us/total_us*100:5.1f}%  {k}")
    print(f"\n{'ms/step':>9}  {'%':>5}  {'n':>4}  bound-by      op")
    for name, _, us, cnt, bound in rows[: args.top]:
        ms = us / 1e3 / args.steps
        print(
            f"{ms:9.3f}  {us/total_us*100:5.1f}  {cnt:4d}  {bound or '?':<12}"
            f"  {name[:100]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
