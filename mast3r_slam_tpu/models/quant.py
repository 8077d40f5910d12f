"""Int8 weight-streaming quantization for inference programs.

Motivation (docs/PLAN.md round-4 roadmap item 3; VERDICT r4 item 1): the
ViT-L window program streams ~1.37 GB of bf16 weights per frame. Storing
large kernels as int8 + per-output-channel scales halves the weight bytes
read from HBM; the dequantize (convert + scale multiply) is traced INSIDE
each jitted program so XLA fuses it into the consumer matmul's operand
load — no bf16 weight copy is ever materialized in HBM.

The analytic cost model (benchmarks/cost_model.py) predicts this is NOT
the frame's bound — weight streams are ~10% of HBM peak while the frame
is compute-bound at ~42% MXU — so this path exists to be *measured*, not
assumed: `scripts/measure_weight_quant.py` runs the A/B on chip.

Semantics: per-output-channel symmetric quantization (scale = absmax/127
over all input axes). Only floating kernels with >= `min_elems` elements
quantize (biases, norms, small heads stay exact). Opt-in everywhere:
`MASt3RModel.quantize_weights()` or `runtime.weight_quant: "int8"`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

QKEY = "__w8__"
_DEFAULT_MIN_ELEMS = 16384


def is_quantized_leaf(x: Any) -> bool:
    return isinstance(x, dict) and QKEY in x


def quantize_params(params, min_elems: int = _DEFAULT_MIN_ELEMS):
    """Replace large floating kernels with {QKEY: int8, "scale": f32}.

    The output-channel axis is the LAST axis (flax Dense/Conv/ConvTranspose
    kernel convention), so one scale per output channel preserves each
    column's dynamic range.
    """

    def q(x):
        if (
            hasattr(x, "ndim")
            and x.ndim >= 2
            and x.size >= min_elems
            and jnp.issubdtype(x.dtype, jnp.floating)
        ):
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            s = jnp.max(jnp.abs(xf), axis=axes, keepdims=True) / 127.0
            s = jnp.maximum(s, 1e-12)
            qv = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
            return {QKEY: qv, "scale": s}
        return x

    return jax.tree.map(q, params)


def dequantize_params(qparams, dtype=jnp.bfloat16):
    """Inverse map, jit-traceable: int8 * scale -> `dtype` at use site.

    Called inside every jitted program over quantized params; XLA fuses the
    convert+multiply into the consumer matmul/conv operand stream (the same
    operand-load fusion class as the measured erf-gelu fusion, docs/PLAN.md
    round-3) so HBM sees only the int8 bytes.
    """

    def dq(x):
        if is_quantized_leaf(x):
            # multiply in f32 and round the PRODUCT once: casting the
            # scale to bf16 first would stack a second rounding on top of
            # the int8 step (~2x worst-case weight error); the f32
            # broadcast multiply fuses into the consumer identically.
            return (
                x[QKEY].astype(jnp.float32) * x["scale"]
            ).astype(dtype)
        return x

    return jax.tree.map(dq, qparams, is_leaf=is_quantized_leaf)


def quantized_fraction(qparams) -> float:
    """Fraction of parameter SCALARS stored as int8 (diagnostics)."""
    total = 0
    quant = 0
    for leaf in jax.tree.leaves(
        qparams, is_leaf=is_quantized_leaf
    ):
        if is_quantized_leaf(leaf):
            quant += leaf[QKEY].size
            total += leaf[QKEY].size + leaf["scale"].size
        else:
            total += leaf.size
    return quant / max(total, 1)


class QuantApplyNet:
    """Proxy over a flax module whose `apply` dequantizes params first.

    Every inference program in the repo reaches the network through
    `model.net.apply(params, ...)` inside its own jit trace, so swapping
    `model.net` for this proxy routes ALL programs (encode/decode/fused
    tracker/serving) through int8 weight streams with zero call-site
    changes.
    """

    def __init__(self, net, dtype=jnp.bfloat16):
        self._net = net
        self._dtype = dtype

    def apply(self, params, *args, **kwargs):
        return self._net.apply(
            dequantize_params(params, self._dtype), *args, **kwargs
        )

    def __getattr__(self, name):
        return getattr(self._net, name)
