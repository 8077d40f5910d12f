"""Fused multi-head attention: Pallas TPU flash kernel + jnp twin.

The MASt3R ViT-L encoder/decoder dominates per-frame latency (SURVEY.md §6:
183 ms of the reference's tracking budget is model inference), and attention
is its memory-bound core. This kernel keeps the online-softmax state in VMEM
and streams K/V tiles, so the [S, S] score matrix never touches HBM.

Sequence lengths here are short (a 512x384 image at patch 16 -> 768 tokens),
so single-chip flash attention suffices — no sequence parallelism needed
(SURVEY.md §5.7).

Dispatch: `attention()` uses the Pallas kernel on TPU and the jnp twin
elsewhere (tests run the kernel in interpreter mode for parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None
) -> jax.Array:
    """Plain softmax attention; q/k/v: [B, H, S, D]."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float, kv_len: int
):
    """One (batch*head, q-tile) grid step: online softmax over K/V tiles.

    `kv_len` masks padded K/V rows (sequence lengths that don't tile to
    128 are zero-padded by the wrapper; padded scores get -inf here)."""
    q = q_ref[0].astype(jnp.float32) * scale  # [Bq, D]
    bq, d = q.shape
    s_len = k_ref.shape[1]
    num_kb = s_len // block_k
    needs_mask = kv_len < s_len

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [Bq, Bk]
        if needs_mask:
            col = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1
            )
            s = jnp.where(col < kv_len, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Pallas flash attention. q/k/v: [B, H, S, D] (S padded to block size).

    D is zero-padded to the 128-lane tile internally; K/V padding rows get
    -inf scores via an additive mask folded into the first K tile... not
    needed: S must be a multiple of block_k (caller pads tokens; ViT token
    counts here are multiples of 128 by construction: 768 @ 512x384).
    """
    b, h, sq, d = q.shape
    skv = k.shape[-2]
    if scale is None:
        scale = d**-0.5

    # Zero-pad tokens to the tile grid; padded K/V rows are masked to -inf
    # inside the kernel, padded Q rows produce garbage that is sliced off.
    sq_pad = ((sq + block_q - 1) // block_q) * block_q
    skv_pad = ((skv + block_k - 1) // block_k) * block_k
    d_pad = max(128, ((d + 127) // 128) * 128)
    q = jnp.pad(q, [(0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)])
    k = jnp.pad(k, [(0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)])
    v = jnp.pad(v, [(0, 0), (0, 0), (0, skv_pad - skv), (0, d_pad - d)])

    qf = q.reshape(b * h, sq_pad, d_pad)
    kf = k.reshape(b * h, skv_pad, d_pad)
    vf = v.reshape(b * h, skv_pad, d_pad)

    grid = (b * h, sq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale, kv_len=skv),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, skv_pad, d_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, skv_pad, d_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    out = out.reshape(b, h, sq_pad, d_pad)
    return out[..., :sq, :d]


def attention_xla(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None
) -> jax.Array:
    """Unfused attention left to the XLA fuser: matmuls in the input dtype
    with f32 accumulation, softmax in f32. At ViT scale this BEATS the
    Pallas flash kernel (see `attention` dispatch note)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


# Below this KV length the [S, S] score matrix is small enough that XLA's
# own fusion wins and flash attention only costs: with head_dim 64 the
# Pallas kernel must pad lanes to 128 (2x the matmul work) and every
# pallas_call is an XLA fusion barrier. Measured on TPU v5e inside the
# fused tracking step (ViT-L, S=768, D=64, bf16, unique inputs per call):
# XLA 25.8 ms/frame vs flash kernel 34.4 ms/frame — the kernel is reserved
# for sequence lengths where the score matrix actually stresses VMEM/HBM.
FLASH_MIN_KV = 4096


def attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None
) -> jax.Array:
    """Dispatch: XLA-fused attention for short sequences (the ViT regime —
    measurably faster, see FLASH_MIN_KV note), Pallas flash kernel on TPU
    for long ones (padded K/V rows are masked in-kernel), jnp twin off-TPU.

    `runtime.attention_impl` overrides the auto rule ("xla" | "flash") for
    on-chip A/Bs — the B=1 measurement behind FLASH_MIN_KV does not
    automatically transfer to the batched B=K window encode, where the
    score matrix is K x larger and the kernel's grid has K x the rows."""
    mode = "auto"
    try:  # config is optional here: ops/ stays importable standalone
        from mast3r_slam_tpu.config import get_config

        mode = get_config().runtime.attention_impl
    except Exception:
        pass
    if mode == "flash" or (
        mode == "auto"
        and jax.default_backend() == "tpu"
        and k.shape[-2] >= FLASH_MIN_KV
    ):
        return flash_attention(q, k, v, scale)
    return attention_xla(q, k, v, scale)
