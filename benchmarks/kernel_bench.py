"""Kernel micro-benchmarks: fused TPU kernels vs numpy oracles.

The TPU analog of the reference's `benchmark_all_kernels.py` (L8 layer,
SURVEY.md §3.5): every hot kernel timed on seeded synthetic data at the
reference's published sizes (BASELINE.md), with statistical agreement
(max/mean abs diff, Pearson correlation — same acceptance bands:
corr > 0.99 excellent, > 0.95 good) against its slow oracle twin.

Emits docs/kernel_benchmark.md + docs/kernel_benchmark.json.

Usage:  python benchmarks/kernel_bench.py [--quick] [--out docs/]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

# Runnable as `python benchmarks/kernel_bench.py`: the repo root (for
# benchmarks.timing / tests.fixtures imports) is the script dir's parent.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _pearson(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    if a.std() < 1e-12 or b.std() < 1e-12:
        return 1.0 if np.allclose(a, b) else 0.0
    return float(np.corrcoef(a, b)[0, 1])


def _time_device(fn, *args, iters=5):
    """Relay-safe per-call timing: dependent chain + scalar fetch (see
    benchmarks/timing.py — independent dispatches closed by
    block_until_ready under-measure through the relay)."""
    from benchmarks.timing import time_device_chained

    return time_device_chained(fn, *args, iters=iters)


def _time_host(fn, *args, iters=1):
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    return (time.perf_counter() - t0) / iters, out


def bench_iter_proj(rng, quick=False):
    """Reference size: b=2, 384x512 image, 50k points (BASELINE.md row 1)."""
    import jax.numpy as jnp

    from mast3r_slam_tpu.ops.iter_proj import (
        iter_proj,
        iter_proj_reference,
        prep_for_iter_proj,
    )
    from tests.fixtures import camera_K, world_surface

    h, w = (96, 128) if quick else (384, 512)
    n = 5_000 if quick else 50_000
    b = 2
    K = camera_K(h, w)
    X = np.stack(
        [np.asarray(world_surface(rng, h, w, K)).reshape(h, w, 3) for _ in range(b)]
    )
    X11 = jnp.asarray(X)
    rays, pts, p0 = prep_for_iter_proj(X11, X11, None)
    sel = rng.integers(0, h * w, size=(b, n))
    pts_n = jnp.take_along_axis(pts, jnp.asarray(sel)[..., None], axis=1)
    p0_n = jnp.take_along_axis(p0, jnp.asarray(sel)[..., None], axis=1)
    p0_n = p0_n + jnp.asarray(rng.integers(-2, 3, (b, n, 2)).astype(np.float32))

    t_dev, (p_dev, v_dev) = _time_device(lambda *a: iter_proj(*a), rays, pts_n, p0_n)
    t_ref, (p_ref, v_ref) = _time_host(
        iter_proj_reference, np.asarray(rays), np.asarray(pts_n), np.asarray(p0_n)
    )
    return {
        "kernel": "iter_proj",
        "config": f"b={b}, {h}x{w}, {n} pts, 10 iters",
        "device_ms": t_dev * 1e3,
        "oracle_ms": t_ref * 1e3,
        "speedup": t_ref / t_dev,
        "max_diff": float(np.abs(np.asarray(p_dev) - p_ref).max()),
        "corr": _pearson(p_dev, p_ref),
    }


def bench_refine(rng, quick=False):
    """Reference size: 10k pts, 64-dim desc (BASELINE.md row 8)."""
    import jax.numpy as jnp

    from mast3r_slam_tpu.ops.refine import refine_matches, refine_matches_reference

    h, w, d = (64, 96, 24) if quick else (384, 512, 64)
    n = 1_000 if quick else 10_000
    from scipy.ndimage import gaussian_filter

    D11 = gaussian_filter(
        rng.normal(size=(h, w, d)).astype(np.float32), sigma=(1.5, 1.5, 0)
    )
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True) + 1e-8
    pts = np.stack([rng.integers(0, w, n), rng.integers(0, h, n)], -1).astype(np.int32)
    D21 = D11[pts[:, 1], pts[:, 0]]
    p0 = np.clip(pts + rng.integers(-2, 3, pts.shape), 0, [w - 1, h - 1]).astype(
        np.int32
    )

    args = (jnp.asarray(D11[None]), jnp.asarray(D21[None]), jnp.asarray(p0[None]))
    t_dev, p_dev = _time_device(
        lambda *a: refine_matches(*a, radius=3, dilation_max=2), *args
    )
    iters_ref = 1
    t_ref, p_ref = _time_host(
        lambda: refine_matches_reference(
            D11[None], D21[None], p0[None], radius=3, dilation_max=2
        ),
        iters=iters_ref,
    )
    agree = float((np.asarray(p_dev) == p_ref).mean())
    return {
        "kernel": "refine_matches",
        "config": f"{n} pts, {d}-dim desc, r=3, dil=2",
        "device_ms": t_dev * 1e3,
        "oracle_ms": t_ref * 1e3,
        "speedup": t_ref / t_dev,
        "exact_match_frac": agree,
    }


def _dense_oracle_np(X1, X2, D1, D2, radius):
    """Float64 numpy twin of match_dense_window (exact window, dil 1):
    same shifted-tap scan order, same strict-< argmin tie-breaking."""
    h, w, _ = X1.shape
    BIG = 1e30

    def rays(X):
        return X / np.sqrt((X * X).sum(-1, keepdims=True) + 1e-10)

    r1, r2 = rays(X1.astype(np.float64)), rays(X2.astype(np.float64))
    D1f, D2f = D1.astype(np.float64), D2.astype(np.float64)

    def shifted(img, du, dv, fill):
        out = np.full_like(img, fill)
        ys = slice(max(0, -dv), min(h, h - dv))
        xs = slice(max(0, -du), min(w, w - du))
        out[ys, xs] = img[max(0, dv) : max(0, dv) + (ys.stop - ys.start),
                          max(0, du) : max(0, du) + (xs.stop - xs.start)]
        return out

    best = np.full((h, w), BIG)
    bdu = np.zeros((h, w), np.int64)
    bdv = np.zeros((h, w), np.int64)
    from mast3r_slam_tpu.ops.dense_match import window_taps

    for du, dv in window_taps(radius, (1,)):
        s1 = shifted(r1, du, dv, BIG)
        cost = ((s1 - r2) ** 2).sum(-1)
        cost -= (shifted(D1f, du, dv, 0.0) * D2f).sum(-1)
        cost = np.where(cost < BIG, cost, BIG)
        take = cost < best
        best = np.where(take, cost, best)
        bdu = np.where(take, du, bdu)
        bdv = np.where(take, dv, bdv)
    u = np.clip(np.arange(w)[None, :] + bdu, 0, w - 1)
    v = np.clip(np.arange(h)[:, None] + bdv, 0, h - 1)
    return (v * w + u).reshape(-1)


def bench_dense_match(rng, quick=False):
    """Gather-free dense matcher at full tracking resolution.

    Numeric oracle: float64 numpy twin of the tap scan at a reduced size
    (the bf16 device streams can flip near-ties, so agreement is the
    fraction of identical argmin picks, not bitwise cost equality)."""
    import jax.numpy as jnp

    from mast3r_slam_tpu.ops.dense_match import match_dense_window
    from tests.fixtures import camera_K, world_surface

    h, w, d = (96, 128, 24) if quick else (384, 512, 24)
    K = camera_K(h, w)
    X = jnp.asarray(np.asarray(world_surface(rng, h, w, K)).reshape(1, h, w, 3))
    D = jnp.asarray(rng.normal(size=(1, h, w, d)).astype(np.float32))
    t_dev, (idx, valid) = _time_device(
        lambda *a: match_dense_window(*a, radius=6, dilations=(1,)), X, X, D, D
    )
    ident = float((np.asarray(idx)[0] == np.arange(h * w)).mean())

    # oracle at reduced size (full window, same radius)
    ho, wo = 48, 64
    Ko = camera_K(ho, wo)
    Xo = np.asarray(world_surface(rng, ho, wo, Ko)).reshape(ho, wo, 3)
    X2o = Xo + rng.normal(0, 0.002, Xo.shape)
    Do = rng.normal(size=(ho, wo, d)).astype(np.float32)
    Do /= np.linalg.norm(Do, axis=-1, keepdims=True)
    D2o = rng.normal(size=(ho, wo, d)).astype(np.float32)
    D2o /= np.linalg.norm(D2o, axis=-1, keepdims=True)
    t0 = time.perf_counter()
    idx_ref = _dense_oracle_np(Xo, X2o.astype(np.float32), Do, D2o, radius=6)
    t_ref = time.perf_counter() - t0
    idx_dev, _v = match_dense_window(
        jnp.asarray(Xo)[None], jnp.asarray(X2o.astype(np.float32))[None],
        jnp.asarray(Do)[None], jnp.asarray(D2o)[None],
        radius=6, dilations=(1,),
    )
    agree = float((np.asarray(idx_dev)[0] == idx_ref).mean())

    return {
        "kernel": "dense_match",
        "config": f"{h}x{w} ({h*w} pts), +-6 px window, {d}-d desc",
        "device_ms": t_dev * 1e3,
        "identity_recovery": ident,
        "oracle_ms": t_ref * 1e3,
        "oracle_config": f"{ho}x{wo} f64 twin",
        "oracle_agree": agree,
    }


def bench_dense_match_c2f(rng, quick=False):
    """Coarse-to-fine tap lattice (radius 3 at dilations (2,1) — same +-6 px
    reach as the dense 169-tap window at 89 taps (49 + 49 - 9 overlap),
    exact within +-3 px; odd displacements beyond +-3 px land 1 px off) vs
    the exhaustive window on the same inputs. Agreement = identical argmin
    picks under tracking-like small displacements (e2e trajectory
    equivalence: tests/test_system_oracle.py dense_c2f case)."""
    import jax.numpy as jnp

    from mast3r_slam_tpu.ops.dense_match import match_dense_window, window_taps
    from tests.fixtures import camera_K, world_surface

    h, w, d = (96, 128, 24) if quick else (384, 512, 24)
    K = camera_K(h, w)
    X1 = jnp.asarray(np.asarray(world_surface(rng, h, w, K)).reshape(1, h, w, 3))
    X2 = X1 + jnp.asarray(rng.normal(0, 0.002, X1.shape).astype(np.float32))
    D1 = jnp.asarray(rng.normal(size=(1, h, w, d)).astype(np.float32))
    D1 = D1 / jnp.linalg.norm(D1, axis=-1, keepdims=True)
    D2 = D1 + 0.05 * jnp.asarray(rng.normal(size=(1, h, w, d)).astype(np.float32))
    D2 = D2 / jnp.linalg.norm(D2, axis=-1, keepdims=True)

    radius, dil = (1, (2, 1)) if quick else (3, (2, 1))
    t_c2f, (idx_c2f, _v) = _time_device(
        lambda *a: match_dense_window(*a, radius=radius, dilations=dil),
        X1, X2, D1, D2,
    )
    t_full, (idx_full, _vf) = _time_device(
        lambda *a: match_dense_window(*a, radius=6 if not quick else 2,
                                      dilations=(1,)),
        X1, X2, D1, D2,
    )
    agree = float((np.asarray(idx_c2f) == np.asarray(idx_full)).mean())
    n_taps = len(window_taps(radius, dil))
    return {
        "kernel": "dense_match_c2f",
        "config": f"{h}x{w}, r={radius} dil={dil} ({n_taps} taps)",
        "device_ms": t_c2f * 1e3,
        "xla_ref_ms": t_full * 1e3,
        "speedup": t_full / t_c2f,
        "oracle_agree": agree,
        "oracle_config": "exhaustive 169-tap window (same chip)",
    }


def bench_gn(rng, mode, quick=False):
    """Reference size: 20 KF, 1000 pts, 30 edges (BASELINE.md rows 5-7).

    Numeric oracle: the float64 per-edge-loop numpy twin
    (benchmarks/gn_oracle.py) runs on the SAME inputs; agreement is
    reported as max pose diff + Pearson corr of the updated poses
    (reference acceptance bands: corr>0.99,
    metal_kernels_benchmark.md:153-156)."""
    import jax.numpy as jnp

    from benchmarks.gn_oracle import gauss_newton_graph_reference
    from mast3r_slam_tpu.ops import GNParams, gauss_newton_graph
    from tests.fixtures import make_graph_problem, perturb_poses

    num_kf = 4 if quick else 20
    hw = (8, 12) if quick else (25, 40)  # 96 / 1000 points
    num_edges = 6 if quick else 30
    prob = make_graph_problem(
        rng, num_kf=num_kf, h=hw[0], w=hw[1], num_edges=num_edges
    )
    Twc0 = perturb_poses(rng, prob["Twc_gt"], mag=0.03)
    edge_mask = jnp.ones(prob["ii"].shape[0], bool)
    free = jnp.asarray([k >= 1 for k in range(num_kf)])
    params = GNParams(max_iter=3, delta_thresh=0.0)  # 3 iters = reference bench
    kwargs = (
        dict(K_intr=prob["K"], img_size=prob["img_size"]) if mode == "calib" else {}
    )

    args = (
        Twc0,
        prob["Xs"],
        prob["Cs"],
        prob["ii"],
        prob["jj"],
        prob["idx"],
        prob["valid"],
        prob["Q"],
        edge_mask,
        free,
    )
    t_dev, (Twc_new, _) = _time_device(
        lambda *a: gauss_newton_graph(*a, mode=mode, params=params, **kwargs),
        *args,
    )
    t_ref, Twc_ref = _time_host(
        lambda: gauss_newton_graph_reference(
            *args, mode=mode, params=params, **kwargs
        )
    )
    from tests.fixtures import pose_distance

    err0 = np.mean(
        [pose_distance(Twc0[k], prob["Twc_gt"][k]) for k in range(1, num_kf)]
    )
    err1 = np.mean(
        [pose_distance(Twc_new[k], prob["Twc_gt"][k]) for k in range(1, num_kf)]
    )
    dev_np = np.asarray(Twc_new, np.float64)
    return {
        "kernel": f"gauss_newton_{mode}",
        "config": f"{num_kf} KF, {hw[0]*hw[1]} pts, {num_edges} edges, 3 iters",
        "device_ms": t_dev * 1e3,
        "oracle_ms": t_ref * 1e3,
        "speedup": t_ref / t_dev,
        "max_diff": float(np.abs(dev_np - Twc_ref).max()),
        "corr": _pearson(dev_np, Twc_ref),
        "pose_err_before": float(err0),
        "pose_err_after": float(err1),
        "err_ratio": float(err1 / max(err0, 1e-12)),
    }


def bench_attention(rng, quick=False):
    """Flash attention vs jnp reference (ViT-L shapes: 768 tokens, 16h x 64d)."""
    import jax
    import jax.numpy as jnp

    from mast3r_slam_tpu.ops.attention import attention_reference, flash_attention

    b, heads, s, d = (1, 4, 256, 64) if quick else (2, 16, 768, 64)
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, heads, s, d)).astype(np.float32))
        for _ in range(3)
    )
    on_tpu = jax.default_backend() == "tpu"
    flash = lambda *a: flash_attention(*a, interpret=not on_tpu)
    ref_jit = jax.jit(attention_reference)
    if on_tpu:
        t_dev, out = _time_device(flash, q, k, v)
    else:  # interpreter mode is not a perf number; just verify
        out = flash(q, k, v)
        t_dev = float("nan")
    t_ref, out_ref = _time_device(ref_jit, q, k, v)
    return {
        "kernel": "flash_attention",
        "config": f"B={b}, H={heads}, S={s}, D={d}",
        "device_ms": t_dev * 1e3,
        "xla_ref_ms": t_ref * 1e3,
        "max_diff": float(jnp.abs(out - out_ref).max()),
    }


def bench_model_inference(rng, model_type, resolution, baseline_ms, quick=False):
    """Two-view inference latency (encode both views + twin decode + heads).

    Baseline rows (BASELINE.md, reference mast3r_utils.py:57-58 docstrings
    on Apple Silicon/Metal): Mast3rFull 183 ms @512, DuneMast3r 11-32 ms
    @336. Timing uses the dependent-chain + scalar-fetch protocol: each
    call perturbs its input by the previous call's output scalar, so the
    relay can neither overlap independent dispatches nor serve a result
    cache, and the final scalar fetch forces completion (docs/PLAN.md)."""
    import jax
    import jax.numpy as jnp

    from mast3r_slam_tpu.models import MASt3RModel
    from mast3r_slam_tpu.models.mast3r import MASt3RNet

    variant = "base"
    if quick:  # exercise the path, not a perf number (1-core CPU host)
        resolution, variant = 112, "small"
    model = MASt3RModel.create(
        model_type=model_type, variant=variant, resolution=resolution,
        precision="bf16",
    )
    h, w = model._out_hw
    out_hw = model._out_hw
    img1 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))

    @jax.jit
    def step(params, a, b, s):
        a = a + s * 1e-9
        f1, p1 = model.net.apply(params, a * 2.0 - 1.0, method=MASt3RNet.encode)
        f2, p2 = model.net.apply(params, b * 2.0 - 1.0, method=MASt3RNet.encode)
        o1, _o2 = model.net.apply(
            params, f1, p1, f2, p2, out_hw, method=MASt3RNet.decode
        )
        return jnp.mean(o1["conf"])

    s = step(model.params, img1, img2, jnp.zeros(()))
    s = step(model.params, img1, img2, s)  # absorb weak-type retrace
    float(s)
    iters = 2 if quick else 5
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(model.params, img1, img2, s)
    float(s)
    t = (time.perf_counter() - t0) / iters
    return {
        "kernel": f"two_view_inference[{model_type}]",
        "config": f"{h}x{w} bf16, {model.num_params()/1e6:.0f}M params",
        "device_ms": t * 1e3,
        "oracle_ms": baseline_ms,
        "speedup": baseline_ms / (t * 1e3),
        "note": "ref = M4 Metal docstring latency",
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small sizes (CI)")
    ap.add_argument("--out", default="docs")
    ap.add_argument(
        "--format-only", action="store_true",
        help="regenerate kernel_benchmark.md from the existing json "
        "(no device runs — e.g. after a formatting fix)",
    )
    args = ap.parse_args(argv)

    import jax

    if args.format_only:
        d = json.loads((Path(args.out) / "kernel_benchmark.json").read_text())
        meta, results = d["meta"], d["results"]
        return _write_outputs(Path(args.out), meta, results)

    if args.quick:
        # CI sizes are meant for the host CPU; the axon site package
        # overrides JAX_PLATFORMS=cpu from the environment, so force it
        # here BEFORE backend init (same trick as tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(42)
    results = [
        bench_iter_proj(rng, args.quick),
        bench_dense_match(rng, args.quick),
        bench_dense_match_c2f(rng, args.quick),
        bench_refine(rng, args.quick),
        bench_gn(rng, "rays", args.quick),
        bench_gn(rng, "points", args.quick),
        bench_gn(rng, "calib", args.quick),
        bench_attention(rng, args.quick),
        bench_model_inference(rng, "dunemast3r", 336, 32.0, args.quick),
    ]
    if not args.quick:  # ViT-L init is minutes on the 1-core CPU host
        results.append(
            bench_model_inference(rng, "mast3r_full", 512, 183.0, False)
        )

    out_dir = Path(args.out)
    out_dir.mkdir(exist_ok=True)
    meta = {
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "quick": args.quick,
    }
    (out_dir / "kernel_benchmark.json").write_text(
        json.dumps({"meta": meta, "results": results}, indent=2)
    )
    return _write_outputs(out_dir, meta, results)


def _write_outputs(out_dir: Path, meta: dict, results: list) -> int:
    lines = [
        "# Kernel benchmarks",
        "",
        f"Backend: **{meta['backend']}** ({meta['devices'][0]})",
        "",
        "Timing protocol: dependent chain of unique-input calls closed by a",
        "scalar fetch (`jax.block_until_ready` returns early on the axon",
        "relay — docs/PLAN.md round-2 finding), median over the steady half.",
        "Numbers are device program time, not per-op self time.",
        "",
        "| kernel | config | device ms | oracle ms | speedup | agreement |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        if "corr" in r:
            agree = f"corr {r['corr']:.3f}"
        elif "exact_match_frac" in r:
            agree = f"exact {r['exact_match_frac']:.3f}"
        elif "oracle_agree" in r:
            agree = f"agree {r['oracle_agree']:.3f} ({r['oracle_config']})"
            if "identity_recovery" in r:
                agree += f", ident {r['identity_recovery']:.3f}"
        elif "identity_recovery" in r:
            agree = f"ident {r['identity_recovery']:.3f}"
        elif "note" in r:
            agree = r["note"]
        elif "max_diff" in r:
            agree = f"maxdiff {r['max_diff']:.2e}"
        else:
            agree = f"err x{r.get('err_ratio', float('nan')):.2f} in 3 iters"
        # iter_proj carries the closed-scorecard-row dagger (docs/PARITY.md
        # "iter_proj scorecard row"); keep it across regenerations.
        name = r["kernel"] + (" †" if r["kernel"] == "iter_proj" else "")
        lines.append(
            f"| {name} | {r['config']} | {r['device_ms']:.2f} | "
            f"{r.get('oracle_ms', r.get('xla_ref_ms', float('nan'))):.2f} | "
            f"{r.get('speedup', float('nan')):.1f}x | {agree} |"
        )
    lines += [
        "",
        "† reference-parity path only; scorecard row vs the 8.7 ms Metal",
        "number closed as superseded-with-evidence — TPU gathers are",
        "spanned-row-rate bound (~25-30 ns/row) and every remaining design",
        "loses by that arithmetic (docs/PARITY.md, 'iter_proj scorecard",
        "row'). The shipped matcher is the gather-free dense path.",
    ]
    (out_dir / "kernel_benchmark.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))
    sys.exit(main())
