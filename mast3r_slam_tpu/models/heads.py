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
    """conf = 1 + exp(x), clipped for stability."""
    return 1.0 + jnp.exp(jnp.clip(raw, -10.0, 10.0))


def tokens_to_grid(tokens: jax.Array, hp: int, wp: int) -> jax.Array:
    """[B, S, C] -> [B, hp, wp, C]."""
    b, s, c = tokens.shape
    return tokens.reshape(b, hp, wp, c)


def pixel_shuffle(x: jax.Array, p: int) -> jax.Array:
    """[B, hp, wp, p*p*C] -> [B, hp*p, wp*p, C] (channels-last shuffle)."""
    b, hp, wp, c = x.shape
    cc = c // (p * p)
    x = x.reshape(b, hp, wp, p, p, cc)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp * p, wp * p, cc)


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
            # Align to the skip's grid (odd token grids halve inexactly).
            if x.shape[1:3] != skip.shape[1:3]:
                b, _, _, c = x.shape
                x = jax.image.resize(
                    x, (b, skip.shape[1], skip.shape[2], c), method="bilinear"
                )
            x = x + ResidualConvUnit(self.features, self.dtype, name="rcu_skip")(skip)
        x = ResidualConvUnit(self.features, self.dtype, name="rcu_out")(x)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)
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
            if op == "up4":
                x = nn.ConvTranspose(
                    ldim, (4, 4), strides=(4, 4), dtype=self.dtype, name=f"resample_{i}"
                )(x)
            elif op == "up2":
                x = nn.ConvTranspose(
                    ldim, (2, 2), strides=(2, 2), dtype=self.dtype, name=f"resample_{i}"
                )(x)
            elif op == "down2":
                x = nn.Conv(
                    ldim, (3, 3), strides=(2, 2), dtype=self.dtype, name=f"resample_{i}"
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
        b, hh, ww, c = x.shape
        x = jax.image.resize(x, (b, h_img, w_img, c), method="bilinear")
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
        x = jnp.concatenate([dec_tokens, enc_tokens.astype(dec_tokens.dtype)], axis=-1)
        idim = x.shape[-1]
        h = nn.Dense(int(self.hidden_factor * idim), dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(
            (self.local_feat_dim + 1) * p * p, dtype=jnp.float32, name="fc2"
        )(h)
        grid = tokens_to_grid(h, hp, wp)
        pix = pixel_shuffle(grid, p)  # [B, H, W, feat+1]
        raw_desc = pix[..., : self.local_feat_dim]
        desc = raw_desc / jnp.maximum(
            jnp.linalg.norm(raw_desc, axis=-1, keepdims=True), 1e-8
        )
        desc_conf = postprocess_conf(pix[..., self.local_feat_dim])
        return desc, desc_conf
