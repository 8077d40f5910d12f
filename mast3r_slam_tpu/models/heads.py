"""Regression heads: DPT (pts3d + conf) and local-feature MLP (desc + conf).

Structure follows the MASt3R 'catmlp+dpt' head family so upstream weights
can be mapped, with the canonical DUSt3R output parameterizations:

* pts3d: direction * expm1(norm) ("exp" distance mode — unbounded depth,
  smooth gradients near zero)
* conf / desc_conf: 1 + exp(x) (>= 1 by construction)
* desc: L2-normalized 24-dim local features

The reference consumes exactly these outputs from its external model
package (mast3r_utils.py:281-294: pts3d/conf/desc/desc_conf dicts).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def postprocess_pts3d(raw: jax.Array) -> jax.Array:
    """[..., 3] raw -> pts3d = unit(raw) * expm1(||raw||)."""
    d = jnp.linalg.norm(raw, axis=-1, keepdims=True)
    return raw / jnp.maximum(d, 1e-8) * jnp.expm1(d)


def postprocess_conf(raw: jax.Array) -> jax.Array:
    """conf = 1 + exp(x) (upstream conf_mode ('exp', 1, inf)); the clip only
    guards exp overflow (exp(50) ~ 5e21 is representable in fp32/bf16) and is
    a no-op for any realistic checkpoint logit."""
    return 1.0 + jnp.exp(jnp.clip(raw, -50.0, 50.0))


def postprocess_desc_conf(raw: jax.Array) -> jax.Array:
    """desc_conf = exp(x): the released MASt3R checkpoints use
    desc_conf_mode ('exp', 0, inf), i.e. vmin 0 — NOT the 1+exp of conf."""
    return jnp.exp(jnp.clip(raw, -50.0, 50.0))


def tokens_to_grid(tokens: jax.Array, hp: int, wp: int) -> jax.Array:
    """[B, S, C] -> [B, hp, wp, C]."""
    b, s, c = tokens.shape
    return tokens.reshape(b, hp, wp, c)


def pixel_shuffle(x: jax.Array, p: int) -> jax.Array:
    """[B, hp, wp, C*p*p] -> [B, hp*p, wp*p, C], torch F.pixel_shuffle order.

    Channel index (c, ry, rx) = c*p*p + ry*p + rx — channel-major, matching
    torch so upstream head weights (which produce these channels) map 1:1.
    """
    b, hp, wp, c = x.shape
    cc = c // (p * p)
    x = x.reshape(b, hp, wp, cc, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, hp, py, wp, px, cc
    return x.reshape(b, hp * p, wp * p, cc)


def resize_bilinear_ac(x: jax.Array, oh: int, ow: int) -> jax.Array:
    """Bilinear resize with align_corners=True (torch F.interpolate semantics).

    Upstream DPT fusion blocks and the head upsample with align_corners=True;
    jax.image.resize is half-pixel (align_corners=False), so we build the
    two 1-D interpolation matrices and contract them — exact, and the
    einsum form rides the MXU instead of doing gathers.
    """
    b, h, w, c = x.shape
    if (oh, ow) == (h, w):
        return x

    def interp_matrix(n_out: int, n_in: int) -> jax.Array:
        if n_in == 1:
            return jnp.ones((n_out, 1), x.dtype)
        pos = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / max(n_out - 1, 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        frac = pos - lo
        m = jnp.zeros((n_out, n_in), jnp.float32)
        rows = jnp.arange(n_out)
        m = m.at[rows, lo].set(1.0 - frac)
        m = m.at[rows, lo + 1].add(frac)
        return m.astype(x.dtype)

    my = interp_matrix(oh, h)
    mx = interp_matrix(ow, w)
    x = jnp.einsum("oh,bhwc->bowc", my, x)
    x = jnp.einsum("pw,bowc->bopc", mx, x)
    return x


class ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, prev, skip=None):
        x = prev
        if skip is not None:
            # Align to the skip's grid (odd token grids halve inexactly);
            # upstream crops path_4 to layer_3's grid, so crop — not resize.
            if x.shape[1:3] != skip.shape[1:3]:
                x = x[:, : skip.shape[1], : skip.shape[2], :]
            x = x + ResidualConvUnit(self.features, self.dtype, name="rcu_skip")(skip)
        x = ResidualConvUnit(self.features, self.dtype, name="rcu_out")(x)
        h, w = x.shape[1:3]
        # out_conv (1x1) BEFORE the x2 align-corners resize: a 1x1 conv has
        # no spatial support and the interp-matrix rows sum to 1, so
        # conv(resize(x)) == resize(conv(x)) EXACTLY (bias included) — but
        # running the conv first does its matmul at 1/4 the pixels. Upstream
        # applies them in the other order (dpt_block.py FeatureFusionBlock);
        # the imported out_conv weights are unchanged.
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)
        x = resize_bilinear_ac(x, h * 2, w * 2)
        return x


class DPTHead(nn.Module):
    """Dense prediction head over 4 transformer hook layers.

    Reassembles hook tokens into a multi-scale pyramid (1/4, 1/8, 1/16, 1/32
    of input res for patch 16), fuses top-down, and regresses `out_channels`
    per pixel at full resolution.
    """

    out_channels: int = 4
    patch_size: int = 16
    features: int = 256
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hooks: Sequence[jax.Array], hp: int, wp: int, out_hw):
        """hooks: 4 token tensors [B, S, C_i]; out_hw: (H, W) target size."""
        assert len(hooks) == 4
        h_img, w_img = out_hw
        feats = []
        # Reassemble: project tokens, spatialize, rescale to pyramid levels.
        scale_ops = ("up4", "up2", "id", "down2")
        for i, (tok, ldim, op) in enumerate(zip(hooks, self.layer_dims, scale_ops)):
            x = nn.Dense(ldim, dtype=self.dtype, name=f"act_postprocess_{i}")(tok)
            x = tokens_to_grid(x, hp, wp)
            # transpose_kernel=True + VALID matches torch ConvTranspose2d
            # (padding=0) exactly, so upstream weights map by pure transpose.
            if op == "up4":
                x = nn.ConvTranspose(
                    ldim, (4, 4), strides=(4, 4), padding="VALID",
                    transpose_kernel=True, dtype=self.dtype, name=f"resample_{i}"
                )(x)
            elif op == "up2":
                x = nn.ConvTranspose(
                    ldim, (2, 2), strides=(2, 2), padding="VALID",
                    transpose_kernel=True, dtype=self.dtype, name=f"resample_{i}"
                )(x)
            elif op == "down2":
                # explicit pad 1 = torch Conv2d(k=3, s=2, padding=1); flax
                # 'SAME' would pad (0,1) and shift the grid by one pixel.
                x = nn.Conv(
                    ldim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"resample_{i}"
                )(x)
            x = nn.Conv(
                self.features, (3, 3), use_bias=False, dtype=self.dtype, name=f"layer_rn_{i}"
            )(x)
            feats.append(x)

        l1, l2, l3, l4 = feats  # finest -> coarsest
        path = FeatureFusionBlock(self.features, self.dtype, name="refine4")(l4)
        path = FeatureFusionBlock(self.features, self.dtype, name="refine3")(path, l3)
        path = FeatureFusionBlock(self.features, self.dtype, name="refine2")(path, l2)
        path = FeatureFusionBlock(self.features, self.dtype, name="refine1")(path, l1)
        # path is now at 1/2 input resolution (1/4 grid upsampled x2 in refine1)

        x = nn.Conv(self.features // 2, (3, 3), dtype=self.dtype, name="head_conv1")(path)
        x = resize_bilinear_ac(x, h_img, w_img)
        x = nn.Conv(32, (3, 3), dtype=self.dtype, name="head_conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32, name="head_conv3")(x)
        return x  # [B, H, W, out_channels]


class LinearPts3dHead(nn.Module):
    """DUSt3R linear head: one Dense to patch_size^2 * 4 then pixel shuffle."""

    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, hp: int, wp: int, out_hw):
        p = self.patch_size
        x = nn.Dense(p * p * 4, dtype=jnp.float32, name="proj")(tokens)
        x = tokens_to_grid(x, hp, wp)
        return pixel_shuffle(x, p)  # [B, H, W, 4]


class LocalFeaturesHead(nn.Module):
    """MASt3R 'catmlp' descriptor head: MLP over [dec_tokens ; enc_tokens],
    pixel-shuffled to per-pixel desc(24) + desc_conf(1)."""

    local_feat_dim: int = 24
    patch_size: int = 16
    hidden_factor: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dec_tokens, enc_tokens, hp: int, wp: int):
        p = self.patch_size
        # Upstream Cat_MLP concatenates [encoder_tokens, decoder_tokens]
        # (mast3r catmlp head contract); order matters for fc1 weight import.
        x = jnp.concatenate([enc_tokens.astype(dec_tokens.dtype), dec_tokens], axis=-1)
        idim = x.shape[-1]
        h = nn.Dense(int(self.hidden_factor * idim), dtype=self.dtype, name="fc1")(x)
        from mast3r_slam_tpu.models.vit import _gelu

        h = _gelu(h)
        # Deliberately NOT behind _maybe_gelu_barrier: measured on v5e, the
        # barrier HELPS the encoder/decoder Mlp fc2 (2.05->0.91 / 1.46->0.49
        # ms/frame) but HURTS this fc2 (1.43->3.81 ms/frame, K=7168
        # contraction) — XLA's fused form wins here, so the knob is scoped
        # to the transformer MLPs (docs/PLAN.md A/B matrix).
        # fc2 + pixel shuffle run in the model compute dtype: fc2 is the
        # single largest dot_general in the fused tracking step and the
        # shuffle's transpose is pure HBM traffic, so bf16 here halves both
        # (profiled ~1.6 ms/frame on v5e). Normalization and the conf
        # nonlinearity still reduce in f32 — a unit-norm over 24 bf16
        # channels keeps ~3 significant digits either way, and the cast
        # fuses into the reduction (no extra materialization).
        h = nn.Dense(
            (self.local_feat_dim + 1) * p * p, dtype=self.dtype, name="fc2"
        )(h)
        grid = tokens_to_grid(h, hp, wp)
        pix = pixel_shuffle(grid, p)  # [B, H, W, feat+1]
        raw_desc = pix[..., : self.local_feat_dim].astype(jnp.float32)
        desc = raw_desc / jnp.maximum(
            jnp.linalg.norm(raw_desc, axis=-1, keepdims=True), 1e-8
        )
        desc_conf = postprocess_desc_conf(pix[..., self.local_feat_dim].astype(jnp.float32))
        return desc, desc_conf
