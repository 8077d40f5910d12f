"""Probe: does this toolchain run int8 convolutions faster than bf16 at
the DPT fusion shapes that dominate the window frame?

The round-5 cost analysis left exactly one device-FPS lever class:
arithmetic rate. v5e's MXU does 394 TOPS int8 vs 197 TFLOP/s bf16 — IF
XLA lowers s8xs8->s32 convs onto the int8 path at our shapes. This probe
times the three conv shapes that carry most of the 10.2 ms/frame
convolution-fusion share (refine-level RCU 3x3x256x256 at the two big
pyramid grids, head_conv2 3x3x128x32 at full res) in bf16 vs int8,
chained-timing protocol. Decision rule: int8 >= 1.5x on the RCU shapes
-> build a quantized-DPT path; else record the negative and stop.

Run ON THE TPU: python scripts/probe_int8_conv.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mast3r")


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    # (name, input NHWC, kernel HWIO) — DPT hot shapes at 384x512/p16
    # (hooks grid 24x32; l1 grid 96x128, l2 48x64; head_conv2 at half res
    # 192x256 input -> but it runs at FULL res 384x512 after the resize).
    cases = [
        ("rcu_l1 3x3 256ch @96x128", (1, 96, 128, 256), (3, 3, 256, 256)),
        ("rcu_l2 3x3 256ch @48x64", (1, 48, 64, 256), (3, 3, 256, 256)),
        ("head_conv2 3x3 128->32 @384x512", (1, 384, 512, 128), (3, 3, 128, 32)),
    ]

    from benchmarks.timing import time_device_chained

    for name, xs, ks in cases:
        xf = jnp.asarray(rng.normal(size=xs).astype(np.float32))
        kf = jnp.asarray(rng.normal(size=ks).astype(np.float32))

        def conv(x, k, **kw):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw,
            )

        @jax.jit
        def conv_bf16(x, k):
            return conv(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16))

        @jax.jit
        def conv_int8(x, k):
            xq = jnp.clip(jnp.round(x * 8), -127, 127).astype(jnp.int8)
            kq = jnp.clip(jnp.round(k * 8), -127, 127).astype(jnp.int8)
            return conv(xq, kq, preferred_element_type=jnp.int32)

        flops = 2 * np.prod(xs[:3]) * ks[0] * ks[1] * ks[2] * ks[3]
        try:
            t_b, _ = time_device_chained(conv_bf16, xf, kf, iters=30)
            print(f"{name}: bf16 {t_b*1e3:.3f} ms "
                  f"({flops/t_b/1e12:.1f} TF/s)", flush=True)
        except Exception as e:
            print(f"{name}: bf16 FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        try:
            t_q, _ = time_device_chained(conv_int8, xf, kf, iters=30)
            print(f"{name}: int8 {t_q*1e3:.3f} ms "
                  f"({flops/t_q/1e12:.1f} TOP/s)  speedup {t_b/t_q:.2f}x",
                  flush=True)
        except Exception as e:
            print(f"{name}: int8 FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
    probe_dots()
    return 0





def probe_dots() -> None:
    """Same question for dot_general at the ViT matmul shapes (encoder
    fc1/qkv run at up to 178 TF/s bf16 — does s8 dot reach the 394-TOPS
    path, net of dynamic activation-quant cost?)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.timing import time_device_chained

    rng = np.random.default_rng(1)
    cases = [
        ("enc fc1 [768,1024]x[1024,4096]", (768, 1024), (1024, 4096)),
        ("enc qkv [768,1024]x[1024,3072]", (768, 1024), (1024, 3072)),
        ("dec fc1 [768,768]x[768,3072]", (768, 768), (768, 3072)),
    ]
    for name, xs, ws in cases:
        xf = jnp.asarray(rng.normal(size=xs).astype(np.float32))
        wf = jnp.asarray(rng.normal(size=ws).astype(np.float32))

        @jax.jit
        def dot_bf16(x, w):
            return jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))

        @jax.jit
        def dot_int8(x, w):
            # dynamic per-tensor activation quant (the real deployment
            # cost) + static weight quant
            sx = jnp.max(jnp.abs(x)) / 127.0 + 1e-12
            xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
            wq = jnp.clip(jnp.round(w * 8), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.astype(jnp.float32) * (sx / 8.0)  # /8 = weight scale

        flops = 2 * xs[0] * xs[1] * ws[1]
        try:
            t_b, _ = time_device_chained(dot_bf16, xf, wf, iters=40)
            print(f"{name}: bf16 {t_b*1e3:.3f} ms ({flops/t_b/1e12:.1f} TF/s)",
                  flush=True)
        except Exception as e:
            print(f"{name}: bf16 FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        try:
            t_q, _ = time_device_chained(dot_int8, xf, wf, iters=40)
            print(f"{name}: int8 {t_q*1e3:.3f} ms ({flops/t_q/1e12:.1f} "
                  f"TOP/s)  speedup {t_b/t_q:.2f}x", flush=True)
        except Exception as e:
            print(f"{name}: int8 FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
