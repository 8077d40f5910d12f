"""Vision-transformer building blocks (flax.linen) for the MASt3R family.

Faithful to the CroCo-v2 / DUSt3R / MASt3R architecture so upstream
checkpoints can be mapped onto these parameters (models/io.py), but written
TPU-first: channels-last everywhere, bf16 compute with fp32 LayerNorms and
heads, fused Pallas flash attention for the attention cores, shapes that
tile the MXU (head dim 64, token counts multiples of 128 at the canonical
SLAM resolutions).

Reference-side provenance: the reference outsources this entire layer to the
external `mlx-mast3r` package (SURVEY.md §2.4, mast3r_utils.py:30-38); the
interface contract reconstructed there (encode / two-view decode with
pts3d+conf+desc+desc_conf) is implemented natively here.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mast3r_slam_tpu.ops.attention import attention


# ---------------------------------------------------------------------------
# RoPE-2D (CroCo v2, freq base 100.0)
# ---------------------------------------------------------------------------


def rope_2d_angles(
    positions: jax.Array, head_dim: int, base: float = 100.0
) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for CroCo-v2 2D rotary embeddings.

    CroCo's RoPE2D splits the head dim D into a y-half and an x-half; each
    half is rotated GPT-NeoX style (rotate_half over D/4-sized chunks) with
    frequencies base^(-2i/(D/2)) duplicated across the two chunks. Matching
    this exact layout is required for upstream checkpoint fidelity — an
    interleaved-pair layout would permute the effective q/k dimensions.

    Args:
        positions: [B, S, 2] integer (x, y) patch coordinates
        head_dim: per-head dim D (must be divisible by 4)

    Returns:
        cos, sin: [B, S, D] tables laid out [fy, fy, fx, fx] (quarters)
    """
    assert head_dim % 4 == 0, f"RoPE-2D needs head_dim % 4 == 0, got {head_dim}"
    quarter = head_dim // 4
    freqs = 1.0 / (base ** (jnp.arange(0, quarter, dtype=jnp.float32) / quarter))
    y = positions[..., 1].astype(jnp.float32)
    x = positions[..., 0].astype(jnp.float32)
    ang_y = y[..., None] * freqs  # [B, S, quarter]
    ang_x = x[..., None] * freqs
    ang = jnp.concatenate([ang_y, ang_y, ang_x, ang_x], axis=-1)  # [B, S, D]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """CroCo-exact rotation: x [B, H, S, D], cos/sin [B, S, D].

    out = x * cos + rotate_half_per_axis(x) * sin, where rotate_half acts
    independently on the y-half x[..., :D/2] and the x-half x[..., D/2:].
    """
    d = x.shape[-1]
    q = d // 4
    y1, y2 = x[..., 0:q], x[..., q : 2 * q]
    x1, x2 = x[..., 2 * q : 3 * q], x[..., 3 * q :]
    rot = jnp.concatenate([-y2, y1, -x2, x1], axis=-1)
    c = cos[:, None, :, :]
    s = sin[:, None, :, :]
    return x * c + rot * s


# ---------------------------------------------------------------------------
# Core modules
# ---------------------------------------------------------------------------


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = _gelu(x)
        x = _maybe_gelu_barrier(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


def _gelu(x):
    """Exact-erf gelu (upstream torch nn.GELU semantics) or the tanh
    approximation, per runtime.gelu_impl.

    Why a knob: profiled on v5e, the exact erf costs ~2.1 ms/frame of VPU
    transcendental work across encoder+decoder MLPs (fc1/fc2 matmuls run
    at 38-59% MXU whichever side the erf fuses into — moving it just moves
    the tax). In bf16 activations the tanh form is within ~1 ulp of erf
    everywhere that matters (max abs deviation 4.7e-4 at |x|=2.7, where
    the bf16 ulp is already 7.8e-3), so "tanh" trades bit-identity in f32
    for bf16-level identity at a measured VPU saving."""
    impl = "erf"
    try:
        from mast3r_slam_tpu.config import get_config

        impl = get_config().runtime.gelu_impl
    except Exception:
        pass
    return nn.gelu(x, approximate=(impl == "tanh"))


def _maybe_gelu_barrier(x):
    """Optionally materialize the gelu output before the down-projection.

    Profiled on v5e: every fc2-style matmul that consumes the exact-erf
    gelu runs at 38-59% of the throughput of its identically-sized fc1/qkv
    siblings (encoder fc2 75 TF/s vs fc1 178 TF/s) — XLA fuses the erf
    into fc2's operand load and the VPU transcendental starves the MXU.
    An optimization_barrier forces the gelu to materialize (ideally fused
    into fc1's epilogue), letting fc2 stream plain bf16. Exact semantics:
    same math, only scheduling changes. Gated by runtime.gelu_barrier for
    the on-chip A/B."""
    try:
        from mast3r_slam_tpu.config import get_config

        if not get_config().runtime.gelu_barrier:
            return x
    except Exception:
        return x
    return jax.lax.optimization_barrier(x)


class Attention(nn.Module):
    """Self-attention with optional RoPE, fused flash core."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope: Optional[tuple[jax.Array, jax.Array]] = None):
        b, s, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, s, 3, self.num_heads, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each [B, S, H, hd]
        q = jnp.swapaxes(q, 1, 2)  # [B, H, S, hd]
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        out = attention(q, k, v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, s, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class CrossAttention(nn.Module):
    """Cross-attention: queries from x, keys/values from y (other view)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        y,
        rope_q: Optional[tuple[jax.Array, jax.Array]] = None,
        rope_k: Optional[tuple[jax.Array, jax.Array]] = None,
    ):
        b, s, _ = x.shape
        sy = y.shape[1]
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="projq")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="projk")(y)
        v = nn.Dense(self.dim, dtype=self.dtype, name="projv")(y)
        q = q.reshape(b, s, self.num_heads, hd).swapaxes(1, 2)
        k = k.reshape(b, sy, self.num_heads, hd).swapaxes(1, 2)
        v = v.reshape(b, sy, self.num_heads, hd).swapaxes(1, 2)
        if rope_q is not None:
            q = apply_rope(q, *rope_q)
        if rope_k is not None:
            k = apply_rope(k, *rope_k)
        out = attention(q, k, v)
        out = out.swapaxes(1, 2).reshape(b, s, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope=None):
        # LayerNorms in fp32 for stability under bf16 compute.
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, self.dtype, name="attn")(h, rope)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype, name="mlp")(h)
        return x


class DecoderBlock(nn.Module):
    """DUSt3R decoder block: self-attn + cross-attn to the other view + MLP."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, rope_x=None, rope_y=None):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, self.dtype, name="attn")(h, rope_x)
        hq = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        hy = nn.LayerNorm(dtype=jnp.float32, name="norm_y")(y)
        x = x + CrossAttention(self.dim, self.num_heads, self.dtype, name="cross_attn")(
            hq, hy, rope_q=rope_x, rope_k=rope_y
        )
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype, name="mlp")(h)
        return x


class PatchEmbed(nn.Module):
    """Conv patchifier; returns tokens + integer (x, y) patch positions."""

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):  # img: [B, H, W, 3], normalized
        b, h, w, _ = img.shape
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            dtype=self.dtype,
            name="proj",
        )(img)
        hp, wp = h // p, w // p
        x = x.reshape(b, hp * wp, self.embed_dim)
        xs = jnp.arange(wp, dtype=jnp.int32)
        ys = jnp.arange(hp, dtype=jnp.int32)
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        pos = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)  # [S, 2] (x, y)
        pos = jnp.broadcast_to(pos[None], (b, hp * wp, 2))
        return x, pos


class ViTEncoder(nn.Module):
    """CroCo-v2 style RoPE ViT encoder (no cls token, no learned pos embed).

    `remat=True` rematerializes each block on the backward pass
    (jax.checkpoint) — trades ~30% extra FLOPs for O(depth) less activation
    HBM during fine-tuning."""

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 16
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, img):
        x, pos = PatchEmbed(self.patch_size, self.embed_dim, self.dtype, name="patch_embed")(img)
        head_dim = self.embed_dim // self.num_heads
        rope = rope_2d_angles(pos, head_dim, self.rope_base)
        block_cls = nn.remat(EncoderBlock) if self.remat else EncoderBlock
        for i in range(self.depth):
            x = block_cls(
                self.embed_dim, self.num_heads, self.mlp_ratio, self.dtype, name=f"blocks_{i}"
            )(x, rope)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        return x, pos
