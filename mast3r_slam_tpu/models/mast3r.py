"""MASt3R two-view pointmap network: encoder + twin decoders + heads.

Model families (parity: reference mast3r_utils.py:47-80):
* "mast3r_full": ViT-L/16 encoder (1024, d24, h16), twin ViT-B decoders
  (768, d12, h12), DPT pts3d head + catmlp descriptor head. 512px class.
* "dunemast3r":  compact DUNE-style encoder (ViT-S/B, patch 14), same
  decoder/heads. 336px class, "small" (384) / "base" (768) variants.

TPU-native execution model
--------------------------
The network is pure flax; `MASt3RModel` wraps params + three jitted
programs:

* `encode(imgs)`            — encoder only (features cached per frame)
* `decode(f1, p1, f2, p2)`  — twin decoders + heads from cached features;
                              this is what the backend's symmetric matching
                              calls (the reference STUBBED this path,
                              mast3r_utils.py:572-632 — here it is real)
* `reconstruct(img1, img2)` — fused encode+decode for the frontend

All three batch over view-pairs; symmetric inference is ONE decode call
with batch 2 (i->j and j->i), not two sequential model calls.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models.heads import (
    DPTHead,
    LinearPts3dHead,
    LocalFeaturesHead,
    postprocess_conf,
    postprocess_pts3d,
)
from mast3r_slam_tpu.models.vit import (
    DecoderBlock,
    ViTEncoder,
    rope_2d_angles,
)


@dataclasses.dataclass(frozen=True)
class MASt3RConfig:
    # encoder
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    patch_size: int = 16
    # decoder
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    # heads
    head_type: str = "dpt"  # "dpt" | "linear"
    local_feat_dim: int = 24
    # numerics
    dtype: Any = jnp.bfloat16
    rope_base: float = 100.0
    # rematerialize transformer blocks on backward (training memory)
    remat: bool = False

    @staticmethod
    def mast3r_full(precision: str = "bf16") -> "MASt3RConfig":
        return MASt3RConfig(dtype=_dtype(precision))

    @staticmethod
    def dunemast3r(variant: str = "base", precision: str = "bf16") -> "MASt3RConfig":
        dims = {"small": (384, 12, 6), "base": (768, 12, 12)}
        d, depth, heads = dims[variant]
        return MASt3RConfig(
            enc_embed_dim=d,
            enc_depth=depth,
            enc_num_heads=heads,
            patch_size=14,
            dtype=_dtype(precision),
        )

    @staticmethod
    def tiny(patch_size: int = 16) -> "MASt3RConfig":
        """Test-scale config (structure-identical, fast on CPU)."""
        return MASt3RConfig(
            enc_embed_dim=64,
            enc_depth=2,
            enc_num_heads=2,
            patch_size=patch_size,
            dec_embed_dim=48,
            dec_depth=2,
            dec_num_heads=2,
            head_type="linear",
            dtype=jnp.float32,
        )


def _dtype(precision: str):
    return {"fp32": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.bfloat16}[
        precision
    ]  # fp16 -> bf16: TPUs prefer bfloat16 (same storage cost, wider exponent)


class MASt3RNet(nn.Module):
    """The flax module. Methods: encode / decode / full two-view forward."""

    cfg: MASt3RConfig

    def setup(self):
        c = self.cfg
        self.encoder = ViTEncoder(
            embed_dim=c.enc_embed_dim,
            depth=c.enc_depth,
            num_heads=c.enc_num_heads,
            patch_size=c.patch_size,
            rope_base=c.rope_base,
            dtype=c.dtype,
            remat=c.remat,
        )
        dec_block_cls = nn.remat(DecoderBlock) if c.remat else DecoderBlock
        self.decoder_embed = nn.Dense(c.dec_embed_dim, dtype=c.dtype)
        self.dec_blocks = [
            dec_block_cls(c.dec_embed_dim, c.dec_num_heads, dtype=c.dtype)
            for _ in range(c.dec_depth)
        ]
        self.dec_blocks2 = [
            dec_block_cls(c.dec_embed_dim, c.dec_num_heads, dtype=c.dtype)
            for _ in range(c.dec_depth)
        ]
        # One shared final decoder norm (upstream DUSt3R/MASt3R convention).
        self.dec_norm = nn.LayerNorm(dtype=jnp.float32)
        if c.head_type == "dpt":
            self.head1 = DPTHead(out_channels=4, patch_size=c.patch_size, dtype=c.dtype)
            self.head2 = DPTHead(out_channels=4, patch_size=c.patch_size, dtype=c.dtype)
        else:
            self.head1 = LinearPts3dHead(patch_size=c.patch_size)
            self.head2 = LinearPts3dHead(patch_size=c.patch_size)
        self.local_head1 = LocalFeaturesHead(
            local_feat_dim=c.local_feat_dim, patch_size=c.patch_size, dtype=c.dtype
        )
        self.local_head2 = LocalFeaturesHead(
            local_feat_dim=c.local_feat_dim, patch_size=c.patch_size, dtype=c.dtype
        )

    # -- encoder ----------------------------------------------------------

    def encode(self, img: jax.Array):
        """img [B, H, W, 3] (normalized to [-1, 1]) -> (feat [B,S,C], pos)."""
        return self.encoder(img)

    # -- decoder ----------------------------------------------------------

    def _run_decoder(self, f1, pos1, f2, pos2):
        c = self.cfg
        head_dim = c.dec_embed_dim // c.dec_num_heads
        rope1 = rope_2d_angles(pos1, head_dim, c.rope_base)
        rope2 = rope_2d_angles(pos2, head_dim, c.rope_base)
        x1 = self.decoder_embed(f1)
        x2 = self.decoder_embed(f2)
        hooks1, hooks2 = [f1], [f2]  # hook 0 = encoder tokens (DPT contract)
        for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
            x1_new = blk1(x1, x2, rope_x=rope1, rope_y=rope2)
            x2_new = blk2(x2, x1, rope_x=rope2, rope_y=rope1)
            x1, x2 = x1_new, x2_new
            hooks1.append(x1)
            hooks2.append(x2)
        x1 = self.dec_norm(x1)
        x2 = self.dec_norm(x2)
        hooks1[-1] = x1
        hooks2[-1] = x2
        return x1, x2, hooks1, hooks2

    def _apply_heads(self, which: int, enc_tokens, dec_last, hooks, hp, wp, out_hw):
        c = self.cfg
        head = self.head1 if which == 1 else self.head2
        local = self.local_head1 if which == 1 else self.local_head2
        if c.head_type == "dpt":
            d = c.dec_depth
            idx = [0, d * 2 // 4, d * 3 // 4, d]
            sel = [hooks[i] for i in idx]
            raw = head(sel, hp, wp, out_hw)
        else:
            raw = head(dec_last, hp, wp, out_hw)
        pts3d = postprocess_pts3d(raw[..., :3])
        conf = postprocess_conf(raw[..., 3])
        desc, desc_conf = local(dec_last, enc_tokens, hp, wp)
        return {"pts3d": pts3d, "conf": conf, "desc": desc, "desc_conf": desc_conf}

    def decode(self, f1, pos1, f2, pos2, out_hw: tuple[int, int]):
        """Cached-feature two-view decode -> (out1, out2) dicts."""
        p = self.cfg.patch_size
        hp, wp = out_hw[0] // p, out_hw[1] // p
        x1, x2, hooks1, hooks2 = self._run_decoder(f1, pos1, f2, pos2)
        out1 = self._apply_heads(1, f1, x1, hooks1, hp, wp, out_hw)
        out2 = self._apply_heads(2, f2, x2, hooks2, hp, wp, out_hw)
        return out1, out2

    def __call__(self, img1: jax.Array, img2: jax.Array):
        """Full two-view forward (encode + decode)."""
        out_hw = (img1.shape[1], img1.shape[2])
        f1, pos1 = self.encode(img1)
        f2, pos2 = self.encode(img2)
        return self.decode(f1, pos1, f2, pos2, out_hw)


# ---------------------------------------------------------------------------
# User-facing wrapper (params + jitted apply programs)
# ---------------------------------------------------------------------------


class MASt3RModel:
    """Holds params and jit-compiled inference programs.

    API mirrors what the reference pipeline expects from its external model
    (encode / reconstruct; mast3r_utils.py:277-294) plus the cached-feature
    `decode` the reference was missing.
    """

    def __init__(self, cfg: MASt3RConfig, params, resolution: int = 512):
        self.cfg = cfg
        self.params = params
        self.resolution = resolution
        self.net = MASt3RNet(cfg)
        self._out_hw: Optional[tuple[int, int]] = None
        self._build_programs()

    def _build_programs(self) -> None:
        """(Re)build the jitted inference programs. decode/mono close over
        `_out_hw`, so they must be rebuilt whenever it changes — otherwise a
        stale trace for the same token count would reshape wrongly."""
        self._encode_jit = jax.jit(
            lambda p, img: self.net.apply(p, img, method=MASt3RNet.encode)
        )
        self._decode_jit = jax.jit(
            lambda p, f1, pos1, f2, pos2: self.net.apply(
                p, f1, pos1, f2, pos2, self._out_hw, method=MASt3RNet.decode
            )
        )
        self._reconstruct_jit = jax.jit(
            lambda p, i1, i2: self.net.apply(p, i1, i2)
        )

        def _mono(p, f, pos):
            out1, _ = self.net.apply(p, f, pos, f, pos, self._out_hw,
                                     method=MASt3RNet.decode)
            h, w = out1["pts3d"].shape[1:3]
            Xii = out1["pts3d"][0].reshape(h * w, 3)
            Cii = out1["conf"][0].reshape(h * w, 1)
            return Xii, Cii

        self._mono_jit = jax.jit(_mono)

    def set_out_hw(self, h: int, w: int) -> None:
        """Pin the decode output resolution to the ACTUAL processed frame
        shape. Preprocessing crops to the input's own aspect ratio (e.g.
        EuRoC 752x480 -> 320x512), which need not match the canonical 4:3
        shape assumed at creation — the SLAM pipeline calls this on the
        first frame."""
        if (h, w) == self._out_hw:
            return
        p = self.cfg.patch_size
        assert h % p == 0 and w % p == 0, f"out_hw {(h, w)} not /{p}"
        self._out_hw = (h, w)
        self._build_programs()

    @property
    def embed_dim(self) -> int:
        return self.cfg.enc_embed_dim

    @property
    def patch_size(self) -> int:
        return self.cfg.patch_size

    # -- factory ----------------------------------------------------------

    @classmethod
    def create(
        cls,
        model_type: str = "mast3r_full",
        variant: str = "base",
        resolution: int = 512,
        precision: str = "bf16",
        checkpoint: str | None = None,
        seed: int = 0,
        head_type: str | None = None,
        _test_cfg: MASt3RConfig | None = None,
    ) -> "MASt3RModel":
        """Build a model; load a local checkpoint if given, else random init.

        (No network egress in this environment — `checkpoint` must be a
        local safetensors path produced by models/io.py conversion.)
        """
        if _test_cfg is not None:
            cfg = _test_cfg
        elif model_type == "mast3r_full":
            cfg = MASt3RConfig.mast3r_full(precision)
        elif model_type == "dunemast3r":
            cfg = MASt3RConfig.dunemast3r(variant, precision)
        else:
            raise ValueError(f"unknown model_type {model_type!r}")
        if head_type is not None:
            cfg = dataclasses.replace(cfg, head_type=head_type)

        h, w = _canonical_hw(resolution, cfg.patch_size)
        net = MASt3RNet(cfg)
        rng = jax.random.PRNGKey(seed)
        img = jnp.zeros((1, h, w, 3), jnp.float32)
        params = jax.jit(net.init)(rng, img, img)
        model = cls(cfg, params, resolution)
        model._out_hw = (h, w)
        if checkpoint is not None:
            from mast3r_slam_tpu.models.io import load_checkpoint_into

            model.params = load_checkpoint_into(model.params, checkpoint)
        return model

    # -- inference --------------------------------------------------------

    def encode(self, img: jax.Array):
        """img [B, H, W, 3] normalized -> (feat, pos)."""
        return self._encode_jit(self.params, img)

    def decode(self, f1, pos1, f2, pos2):
        return self._decode_jit(self.params, f1, pos1, f2, pos2)

    def mono(self, feat, pos):
        """Self-pair pointmap from cached features: ONE fused program
        returning flattened (Xii [N,3], Cii [N,1])."""
        return self._mono_jit(self.params, feat[None], pos[None])

    def reconstruct(self, img1: jax.Array, img2: jax.Array):
        """Two-view inference -> (out1, out2); batched over pairs."""
        return self._reconstruct_jit(self.params, img1, img2)

    def num_params(self) -> int:
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(self.params))

    # -- weight quantization ----------------------------------------------

    def quantize_weights(
        self, mode: str = "int8", min_elems: int | None = None
    ) -> "MASt3RModel":
        """Switch inference to int8 weight streaming (models/quant.py):
        large kernels are stored int8 + per-output-channel scales, and
        every program (encode/decode/fused tracker/serving — they all
        reach the network through `self.net.apply`) dequantizes inside its
        own trace, so HBM streams half the weight bytes. Idempotent;
        `mode="none"` is a no-op. Opt-in: numerics deviate at the ~1%
        output level (tests/test_quant.py pins bands)."""
        if mode == "none" or getattr(self, "_quant_mode", None) == mode:
            return self
        if mode != "int8":
            raise ValueError(f"unknown weight_quant mode {mode!r}")
        from mast3r_slam_tpu.models.quant import QuantApplyNet, quantize_params

        kw = {} if min_elems is None else {"min_elems": min_elems}
        self.params = jax.jit(partial(quantize_params, **kw))(self.params)
        self.net = QuantApplyNet(self.net, dtype=self.cfg.dtype)
        self._quant_mode = mode
        self._build_programs()
        return self


def _canonical_hw(resolution: int, patch: int) -> tuple[int, int]:
    """Canonical (H, W) for a resolution class: 4:3 landscape, multiples of
    the patch size (512 -> 384x512 @p16; 336 -> 252x336 @p14)."""
    w = resolution
    h = int(round(w * 3 / 4))
    h = (h // patch) * patch
    w = (w // patch) * patch
    return h, w


def load_mast3r(
    model_type: str = "mast3r_full",
    variant: str = "base",
    resolution: int = 512,
    precision: str = "bf16",
    checkpoint: str | None = None,
    head_type: str | None = None,
) -> MASt3RModel:
    """Model factory (parity: reference mast3r_utils.py:47-80)."""
    return MASt3RModel.create(
        model_type=model_type,
        variant=variant,
        resolution=resolution,
        precision=precision,
        checkpoint=checkpoint,
        head_type=head_type,
    )
