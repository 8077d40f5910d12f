"""Full-scale accuracy band for int8 weight streaming (models/quant.py).

Runs the ViT-L deployment forward (512x384, bf16 — the numerics the SLAM
pipeline actually uses) with exact bf16 weights vs int8-quantized weights
from the SAME parameter set, and reports per-output max deviations. This
is the accuracy half of the weight-streaming A/B (VERDICT r4 item 1); the
timing half is `profile_fused_step.py --window 8 --bench-config
--weight-quant int8` on chip.

CPU-runnable (no chip needed): quantization error is dtype-determined,
not device-determined.

Usage: python scripts/measure_weight_quant.py [--quick] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="toy dims (smoke)")
    ap.add_argument("--out", default=str(REPO / "docs" / "weight_quant_band.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from mast3r_slam_tpu.models.mast3r import MASt3RConfig, MASt3RModel
    from mast3r_slam_tpu.models.quant import quantized_fraction

    if args.quick:
        base = MASt3RModel.create(resolution=64, _test_cfg=MASt3RConfig.tiny())
        quant = MASt3RModel.create(resolution=64, _test_cfg=MASt3RConfig.tiny())
        quant.quantize_weights("int8", min_elems=1024)
    else:
        base = MASt3RModel.create(model_type="mast3r_full", resolution=512,
                                  precision="bf16")
        quant = MASt3RModel.create(model_type="mast3r_full", resolution=512,
                                   precision="bf16")
        quant.quantize_weights("int8")
    h, w = base._out_hw
    frac = quantized_fraction(quant.params)
    print(f"[quant] {h}x{w}, quantized fraction of scalars: {frac:.3f}",
          file=sys.stderr)

    rng = np.random.default_rng(3)
    i1 = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
    i2 = jnp.asarray(
        np.clip(np.asarray(i1) + rng.normal(0, 0.02, i1.shape), -1, 1
                ).astype(np.float32))

    t0 = time.time()
    o1, o2 = jax.tree.map(np.asarray, base.reconstruct(i1, i2))
    q1, q2 = jax.tree.map(np.asarray, quant.reconstruct(i1, i2))
    print(f"[quant] both forwards done ({time.time()-t0:.1f}s)",
          file=sys.stderr)

    report = {"quantized_fraction": round(frac, 4), "input_hw": [h, w],
              "dtype": "bfloat16" if not args.quick else "float32",
              "outputs": {}}
    for view, (o, q) in (("view1", (o1, q1)), ("view2", (o2, q2))):
        for k in ("pts3d", "conf", "desc", "desc_conf"):
            a, b = np.float32(o[k]), np.float32(q[k])
            scale = float(np.max(np.abs(a))) + 1e-9
            report["outputs"][f"{view}.{k}"] = {
                "max_abs": float(np.max(np.abs(a - b))),
                "max_rel_to_absmax": float(np.max(np.abs(a - b)) / scale),
                "mean_abs": float(np.mean(np.abs(a - b))),
                "golden_absmax": scale,
            }
    # Matching survives quantization if descriptor ORDER is preserved:
    # report the argmax-agreement of a dense desc similarity row sample.
    d_a = o1["desc"].reshape(-1, o1["desc"].shape[-1])
    d_b = q1["desc"].reshape(-1, q1["desc"].shape[-1])
    k_a = o2["desc"].reshape(-1, o2["desc"].shape[-1])
    k_b = q2["desc"].reshape(-1, q2["desc"].shape[-1])
    sel = rng.choice(d_a.shape[0], size=min(2048, d_a.shape[0]), replace=False)
    am_a = np.argmax(np.float32(d_a[sel]) @ np.float32(k_a).T, axis=1)
    am_b = np.argmax(np.float32(d_b[sel]) @ np.float32(k_b).T, axis=1)
    report["desc_argmax_agreement"] = float(np.mean(am_a == am_b))

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["outputs"], indent=1), file=sys.stderr)
    print(f"[quant] desc argmax agreement: {report['desc_argmax_agreement']:.4f}"
          f" -> {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
