"""Full-scale ViT-L golden-output parity: flax stack vs the torch twin.

VERDICT r3 item 1: the torch-twin numeric parity tests pin the model at toy
scale (enc 64/depth 2); this script runs the REAL deployment configuration —
ViT-L/16 encoder (1024-dim, depth 24, 16 heads), 768/12 dual decoders, DPT +
local-features heads, 512x384 input, fp32 on CPU — through BOTH stacks from
one shared set of weights (torch state_dict -> strict import) and records
max-abs / scaled deviations for every output the SLAM pipeline consumes
(pts3d, conf, desc, desc_conf; reference output contract:
mast3r_utils.py:277-294), plus isolated encoder-feature drift.

Depth-24 error accumulation, RoPE tables at the real 24x32 patch grid, and
DPT at 512-px feature maps are exactly where toy-scale parity could hide
real drift — this is the one fidelity check closable without a released
checkpoint on disk.

Writes docs/fullscale_parity.json and prints a summary table.

Usage:
    JAX_PLATFORMS=cpu python scripts/run_fullscale_parity.py [--quick]

--quick runs the toy configuration (smoke test for the harness itself).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from pathlib import Path

# The harness pre-imports jax via sitecustomize and forces the axon (TPU
# tunnel) platform — the env var alone is too late; config.update works
# post-import but pre-backend-init (same dance as tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mast3r")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_pair(h: int, w: int, seed: int = 3):
    """Structured synthetic image pair in [-1, 1]: smooth low-frequency
    fields + texture noise, second view a shifted variant — natural-image-
    like statistics so DPT convs and the conf/exp heads see realistic
    activation ranges (pure uniform noise under-exercises the smoothing
    paths)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")

    def one(phase):
        base = np.stack(
            [
                np.sin(2 * np.pi * (2 * xx + phase)) * np.cos(2 * np.pi * yy),
                np.cos(2 * np.pi * (xx - 3 * yy + phase)),
                np.sin(2 * np.pi * (xx * yy * 4 + phase)),
            ],
            axis=-1,
        )
        tex = 0.25 * rng.standard_normal((h, w, 3))
        return np.clip(0.6 * base + tex, -1.0, 1.0).astype(np.float32)[None]

    return one(0.0), one(0.13)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="toy dims (smoke)")
    ap.add_argument(
        "--family", choices=("vitl", "dune"), default="vitl",
        help="deployment family: vitl = mast3r_full ViT-L/16 @512; "
        "dune = dunemast3r-base patch-14 DUNE encoder @336 (the fast.yaml "
        "profile; reference mast3r_utils.py:56-60,104-111)",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        suffix = "_dune" if args.family == "dune" else ""
        args.out = str(REPO / "docs" / f"fullscale_parity{suffix}.json")

    import numpy as np
    import torch

    import jax.numpy as jnp

    assert jax.default_backend() == "cpu", "parity must run fp32 on CPU"

    from mast3r_slam_tpu.models.io import import_torch_state_dict
    from mast3r_slam_tpu.models.mast3r import MASt3RConfig, MASt3RModel
    from tests.test_torch_twin import TorchMASt3R, _np_state_dict

    if args.quick:
        tdims = dict(enc_dim=64, enc_depth=2, enc_heads=2,
                     dec_dim=48, dec_depth=2, dec_heads=2, patch_size=16)
        fcfg = MASt3RConfig(
            enc_embed_dim=64, enc_depth=2, enc_num_heads=2, patch_size=16,
            dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            head_type="dpt", dtype=jnp.float32)
        res, h, w = 64, 48, 64
    elif args.family == "dune":
        # dunemast3r-base: DUNE ViT-B encoder (768/12, patch 14) + the same
        # 768/12 dual decoder + DPT heads, 252x336 input (the 336-px
        # operating point of configs/fast.yaml).
        tdims = dict(enc_dim=768, enc_depth=12, enc_heads=12,
                     dec_dim=768, dec_depth=12, dec_heads=12, patch_size=14)
        fcfg = dataclasses.replace(
            MASt3RConfig.dunemast3r("base", "fp32"), dtype=jnp.float32)
        res, h, w = 336, 252, 336
    else:
        tdims = dict(enc_dim=1024, enc_depth=24, enc_heads=16,
                     dec_dim=768, dec_depth=12, dec_heads=12, patch_size=16)
        fcfg = MASt3RConfig(dtype=jnp.float32)  # ViT-L defaults, fp32
        res, h, w = 512, 384, 512

    print(f"[1/5] torch twin at {tdims} ...", flush=True)
    t0 = time.time()
    torch.manual_seed(7)
    tm = TorchMASt3R(head_type="dpt", **tdims)
    # Same weight conditioning as the toy parity tests (test_torch_twin
    # _torch_model): perturb every parameter away from symmetric inits so
    # layout mistakes cannot cancel, then scale the exp-consuming output
    # layers so conf logits / pts3d expm1 distances stay in range. At depth
    # 24 the head-input activations reach ~1e3 (vs ~1e1 at toy scale):
    # 0.05 conditioning still overflowed exp() in the GOLDEN outputs (first
    # full-scale run), so the final DPT conv gets 1e-3.
    head_scale = 0.05 if args.quick else 1e-3
    with torch.no_grad():
        for name, p in tm.named_parameters():
            p.add_(0.05 * torch.randn_like(p))
            if "dpt.head.4" in name:
                p.mul_(head_scale)
            elif "head_local_features.fc2" in name:
                p.mul_(0.05)
    tm = tm.eval()
    state = _np_state_dict(tm)
    n_params = sum(v.size for v in state.values())
    print(f"      {n_params/1e6:.1f}M params, {time.time()-t0:.1f}s", flush=True)

    print("[2/5] flax model + strict import ...", flush=True)
    t0 = time.time()
    fm = MASt3RModel.create(resolution=res, _test_cfg=fcfg)
    fm.set_out_hw(h, w)
    fm.params = import_torch_state_dict(fm.params, state, strict=True)
    print(f"      {time.time()-t0:.1f}s", flush=True)

    img1, img2 = build_pair(h, w)

    print("[3/5] torch forward ...", flush=True)
    t0 = time.time()
    with torch.no_grad():
        tf1, tpos1 = tm._encode_image(torch.from_numpy(img1.transpose(0, 3, 1, 2)))
        t1, t2 = tm(
            torch.from_numpy(img1.transpose(0, 3, 1, 2)),
            torch.from_numpy(img2.transpose(0, 3, 1, 2)),
        )
    t_torch = time.time() - t0
    print(f"      {t_torch:.1f}s", flush=True)

    print("[4/5] flax forward (jit compile + run) ...", flush=True)
    t0 = time.time()
    ff1, _ = fm.encode(jnp.asarray(img1))
    f1, f2 = fm.reconstruct(jnp.asarray(img1), jnp.asarray(img2))
    f1 = jax.tree.map(np.asarray, f1)
    f2 = jax.tree.map(np.asarray, f2)
    enc_ours = np.asarray(ff1)
    t_flax = time.time() - t0
    print(f"      {t_flax:.1f}s", flush=True)

    print("[5/5] compare ...", flush=True)

    # Non-finite GOLDEN outputs mean the weight conditioning is wrong for
    # this scale (exp overflow), which silently voids every comparison —
    # hard-fail instead.
    for tout, tag in ((t1, "view1"), (t2, "view2")):
        for k in ("pts3d", "conf", "desc", "desc_conf"):
            v = tout[k].numpy()
            if not np.isfinite(v).all():
                print(f"GOLDEN {tag}/{k} is non-finite "
                      f"(absmax={np.abs(v[np.isfinite(v)]).max():.3g}) — "
                      "retune head_scale")
                return 2

    def stats(a: np.ndarray, b: np.ndarray) -> dict:
        """a = ours, b = torch golden."""
        err = np.abs(a.astype(np.float64) - b.astype(np.float64))
        scale = np.abs(b).astype(np.float64)
        rel = err / np.maximum(scale, 1e-6)
        return {
            "max_abs": float(err.max()),
            "mean_abs": float(err.mean()),
            "max_rel": float(rel.max()),
            "p999_abs": float(np.quantile(err, 0.999)),
            "golden_absmax": float(scale.max()),
        }

    def pts_stats(a: np.ndarray, b: np.ndarray) -> dict:
        """pts3d = unit * expm1(d): fp32 drift amplifies with point
        magnitude, so the right scale is the point norm (same rationale as
        test_torch_twin.assert_pts_close)."""
        err = np.abs(a.astype(np.float64) - b.astype(np.float64))
        nrm = np.linalg.norm(b.astype(np.float64), axis=-1, keepdims=True)
        bound = 2e-4 + 1e-3 * nrm
        return {
            **stats(a, b),
            "worst_bound_ratio": float((err / bound).max()),
            "violations_at_toy_bound": int((err > bound).sum()),
            "golden_norm_max": float(nrm.max()),
        }

    report: dict = {
        "config": {
            **tdims,
            "family": "quick" if args.quick else args.family,
            "head_type": "dpt",
            "input_hw": [h, w],
            "dtype": "float32",
            "n_params_m": round(n_params / 1e6, 1),
        },
        "runtime_s": {"torch_forward": round(t_torch, 1),
                      "flax_forward_incl_compile": round(t_flax, 1)},
        "encoder_features": stats(enc_ours, tf1.numpy()),
    }
    for tout, fout, tag in ((t1, f1, "view1"), (t2, f2, "view2")):
        report[tag] = {
            "pts3d": pts_stats(np.asarray(fout["pts3d"]), tout["pts3d"].numpy()),
            "conf": stats(np.asarray(fout["conf"]), tout["conf"].numpy()),
            "desc": stats(np.asarray(fout["desc"]), tout["desc"].numpy()),
            "desc_conf": stats(
                np.asarray(fout["desc_conf"]), tout["desc_conf"].numpy()),
        }

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(report, indent=2) + "\n")

    print(json.dumps(report, indent=2))
    print(f"\nwritten: {out_path}")

    # Gate: the run FAILS (exit 1) if drift exceeds full-scale bands —
    # encoder/desc outputs within 1e-3 abs, pts3d within the magnitude-
    # scaled band with zero violations, conf within 0.2% relative.
    ok = True
    for tag in ("view1", "view2"):
        r = report[tag]
        ok &= r["pts3d"]["violations_at_toy_bound"] == 0
        ok &= r["desc"]["max_abs"] <= 1e-3
        ok &= r["desc_conf"]["max_abs"] <= 1e-3
        ok &= r["conf"]["max_rel"] <= 2e-3
    ok &= report["encoder_features"]["max_abs"] <= 1e-3
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
