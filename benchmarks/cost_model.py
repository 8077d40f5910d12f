"""Analytic FLOP / byte cost model of the deployment programs (SURVEY §6
derived-budget method; VERDICT r4 item 7).

Exact matmul/conv FLOP enumeration of the MASt3R forward (2 FLOPs per MAC,
the XLA cost-analysis convention) so the bench can report achieved TFLOP/s
and %-of-peak per leg without re-tracing the 686M-param programs on the
1-core bench host (a warm trace+lower alone costs minutes through the
relay). Elementwise/softmax/norm work is excluded — it is <2% of the FLOP
total at these shapes (validated against XLA cost analysis at toy scale in
tests/test_cost_model.py).

Byte counts are LOWER BOUNDS: parameter bytes streamed from HBM per
execution (weights are far larger than VMEM, so each use streams) plus the
major activation writes. True HBM traffic additionally depends on XLA
fusion decisions, so %HBM-peak derived from these is a floor, not a
measurement.

v5e peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
"""

from __future__ import annotations

from dataclasses import dataclass

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBPS = 819.0


@dataclass
class ProgramCost:
    flops: float  # total matmul/conv FLOPs (2 per MAC)
    weight_bytes: float  # parameter bytes streamed per execution

    def __add__(self, other: "ProgramCost") -> "ProgramCost":
        return ProgramCost(
            self.flops + other.flops, self.weight_bytes + other.weight_bytes
        )

    def scale(self, k: float) -> "ProgramCost":
        return ProgramCost(self.flops * k, self.weight_bytes * k)


def _attn_flops(S: int, D: int, S_kv: int | None = None) -> float:
    """QK^T + AV for one attention (all heads together: 2*S*S_kv*D each)."""
    S_kv = S if S_kv is None else S_kv
    return 2 * 2.0 * S * S_kv * D


def encoder_cost(S: int, D: int, depth: int, patch: int, bytes_per_param: int
                 ) -> ProgramCost:
    """ViT encoder: patch embed + depth x (self-attn + MLP(4x))."""
    flops = 2.0 * S * (patch * patch * 3) * D  # patch embed conv
    per_block = (
        2.0 * S * D * (3 * D)      # qkv
        + _attn_flops(S, D)
        + 2.0 * S * D * D          # out proj
        + 2 * 2.0 * S * D * (4 * D)  # mlp fc1+fc2
    )
    flops += depth * per_block
    params = (patch * patch * 3) * D + depth * (12 * D * D)
    return ProgramCost(flops, params * bytes_per_param)


def decoder_cost(S: int, D_enc: int, D: int, depth: int,
                 bytes_per_param: int) -> ProgramCost:
    """BOTH views through the dual cross-attention decoder
    (decoder_embed + depth x (self-attn + cross-attn + MLP) per view;
    two weight sets: dec_blocks + dec_blocks2)."""
    per_view = 2.0 * S * D_enc * D  # decoder_embed (shared weights)
    per_block = (
        2.0 * S * D * (3 * D)        # self qkv
        + _attn_flops(S, D)
        + 2.0 * S * D * D            # self proj
        + 4 * 2.0 * S * D * D        # cross projq/projk/projv/proj
        + _attn_flops(S, D, S)       # cross QK^T + AV
        + 2 * 2.0 * S * D * (4 * D)  # mlp
    )
    per_view += depth * per_block
    params = D_enc * D + 2 * depth * (16 * D * D)  # two decoder stacks
    return ProgramCost(2 * per_view, params * bytes_per_param)


def dpt_head_cost(S: int, D_enc: int, D_dec: int, patch: int,
                  bytes_per_param: int, features: int = 256,
                  layer_dims=(96, 192, 384, 768)) -> ProgramCost:
    """One DPTHead forward (models/heads.py DPTHead): reassemble 4 hooks,
    top-down fusion, full-res regression. Pixel counts are in units of S
    (token count); full res = patch^2 * S pixels."""
    d = layer_dims
    hook_dims = (D_enc, D_dec, D_dec, D_dec)
    # pyramid pixel counts after resample ops (up4, up2, id, down2)
    pix = (16 * S, 4 * S, S, S / 4)
    flops = 0.0
    params = 0.0
    for i, (hd, ld, px) in enumerate(zip(hook_dims, d, pix)):
        flops += 2.0 * S * hd * ld               # act_postprocess 1x1
        params += hd * ld
        if i == 0:   # ConvT 4x4 s4: one input tap per output pixel
            flops += 2.0 * px * ld * ld
            params += 16 * ld * ld
        elif i == 1:  # ConvT 2x2 s2
            flops += 2.0 * px * ld * ld
            params += 4 * ld * ld
        elif i == 3:  # Conv 3x3 s2
            flops += 2.0 * px * 9 * ld * ld
            params += 9 * ld * ld
        flops += 2.0 * px * 9 * ld * features    # layer_rn 3x3
        params += 9 * ld * features
    # FeatureFusionBlocks refine4..refine1. Grid entering refine_k matches
    # l_k's grid; rcu convs run there, out_conv (1x1) runs pre-resize.
    f2 = features * features
    for k, px in ((4, S / 4), (3, S), (2, 4 * S), (1, 16 * S)):
        n_rcu = 1 if k == 4 else 2  # refine4 has no skip branch
        flops += n_rcu * 2 * 2.0 * px * 9 * f2   # rcu conv1+conv2 (3x3)
        flops += 2.0 * px * features * features  # out_conv 1x1 (pre-resize)
        params += n_rcu * 2 * 9 * f2 + f2
    full = patch * patch * S
    flops += 2.0 * (64 * S) * 9 * features * (features // 2)  # head_conv1
    flops += 2.0 * full * 9 * (features // 2) * 32            # head_conv2
    flops += 2.0 * full * 32 * 4                              # head_conv3
    params += 9 * features * (features // 2) + 9 * (features // 2) * 32 + 32 * 4
    return ProgramCost(flops, params * bytes_per_param)


def local_head_cost(S: int, D_enc: int, D_dec: int, patch: int,
                    local_feat_dim: int, bytes_per_param: int) -> ProgramCost:
    """One LocalFeaturesHead: MLP over [enc;dec] -> (feat+1)*p^2 channels."""
    idim = D_enc + D_dec
    hid = 4 * idim
    out = (local_feat_dim + 1) * patch * patch
    flops = 2.0 * S * idim * hid + 2.0 * S * hid * out
    params = idim * hid + hid * out
    return ProgramCost(flops, params * bytes_per_param)


def matcher_cost(n_pix: int, desc_dim: int, taps: int) -> ProgramCost:
    """Dense shifted-tap cost volume: desc dot per (pixel, tap)."""
    return ProgramCost(2.0 * n_pix * desc_dim * taps, 0.0)


def model_costs(cfg, h: int, w: int, taps: int = 89) -> dict[str, ProgramCost]:
    """Per-stage costs for one frame of the deployment program.

    cfg: MASt3RConfig. Returns stages keyed to the profile decomposition
    (docs/PLAN.md): encode (1 image), decode (two-view), heads (2x DPT +
    2x local), matcher (c2f lattice).
    """
    p = cfg.patch_size
    S = (h // p) * (w // p)
    bpp = 2 if "bfloat16" in str(cfg.dtype) else 4
    enc = encoder_cost(S, cfg.enc_embed_dim, cfg.enc_depth, p, bpp)
    dec = decoder_cost(S, cfg.enc_embed_dim, cfg.dec_embed_dim,
                       cfg.dec_depth, bpp)
    if cfg.head_type == "dpt":
        head = dpt_head_cost(S, cfg.enc_embed_dim, cfg.dec_embed_dim, p, bpp)
    else:
        out = p * p * 4
        head = ProgramCost(2.0 * S * cfg.dec_embed_dim * out,
                           cfg.dec_embed_dim * out * bpp)
    local = local_head_cost(S, cfg.enc_embed_dim, cfg.dec_embed_dim, p,
                            cfg.local_feat_dim, bpp)
    heads = (head + local).scale(2)  # both views
    match = matcher_cost(h * w, cfg.local_feat_dim, taps)
    return {"encode": enc, "decode": dec, "heads": heads, "matcher": match}


def leg_summary(stages: dict[str, ProgramCost], include: tuple[str, ...],
                seconds_per_frame: float, encodes_per_frame: float = 1.0
                ) -> dict:
    """Achieved-rate summary for a bench leg.

    include: stage names summed into the per-frame cost. The window program
    runs ONE encode + ONE two-view decode + heads + matcher per frame.
    """
    total = ProgramCost(0.0, 0.0)
    for name in include:
        c = stages[name]
        if name == "encode":
            c = c.scale(encodes_per_frame)
        total = total + c
    tflops = total.flops / seconds_per_frame / 1e12
    gbps = total.weight_bytes / seconds_per_frame / 1e9
    return {
        "gflop_per_frame": round(total.flops / 1e9, 1),
        "achieved_tflops": round(tflops, 1),
        "mxu_pct_of_peak": round(100 * tflops / V5E_PEAK_BF16_TFLOPS, 1),
        "weight_stream_gb_per_frame": round(total.weight_bytes / 1e9, 3),
        "hbm_gbps_weight_stream_lb": round(gbps, 1),
        "hbm_pct_of_peak_lb": round(100 * gbps / V5E_PEAK_HBM_GBPS, 1),
    }
