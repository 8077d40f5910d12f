"""Sequence parallelism for the ViT encoder (mesh axis "sp").

Fourth scaling axis next to dp/tp/pp: the TOKEN axis of the encoder's
residual stream is sharded over "sp", so per-chip activation memory for
norms/MLPs scales down by the sp degree — the Megatron-SP layout, expressed
the TPU way: sharding constraints on the activations and GSPMD inserting
the collectives (all-gather of K/V around attention, reduce-scatter back),
rather than hand-written NCCL calls.

When to use: high-resolution encodes (token counts grow quadratically with
image size: 1024 tokens @512px, 4096 @1024px) or large serving batches
where the [B, S, 4*D] MLP transients dominate HBM. For ViT-scale S this is
a memory lever, not a latency one — attention still sees the full sequence.

Like `pipeline.py`, this is a standalone pure function over the exact same
params — no model surgery; equality with the unsharded encode is pinned in
tests/test_sequence_parallel.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mast3r_slam_tpu.models.vit import EncoderBlock, PatchEmbed, rope_2d_angles


def sequence_parallel_encode(
    cfg,
    params,
    imgs: jax.Array,
    mesh: Mesh,
    batch_axis: str | None = "dp",
    token_axis: str = "sp",
):
    """ViT-encode `imgs` with the token axis sharded over `token_axis`.

    Args:
        cfg: MASt3RConfig (encoder geometry + dtype)
        params: full model param tree (as in `MASt3RModel.params`)
        imgs: [B, H, W, 3] normalized images
        mesh: Mesh containing `token_axis` (and `batch_axis` if not None)
        batch_axis: mesh axis for the batch dim (None = replicated batch)
        token_axis: mesh axis for the token dim

    Returns:
        (tokens [B, S, D] — identical to `MASt3RNet.encode` —, pos [B, S, 2])
    """
    enc = params["params"]["encoder"]
    spec = NamedSharding(mesh, P(batch_axis, token_axis))

    patch = PatchEmbed(cfg.patch_size, cfg.enc_embed_dim, cfg.dtype)
    x, pos = patch.apply({"params": enc["patch_embed"]}, imgs)
    head_dim = cfg.enc_embed_dim // cfg.enc_num_heads
    rope = rope_2d_angles(pos, head_dim, cfg.rope_base)

    block = EncoderBlock(cfg.enc_embed_dim, cfg.enc_num_heads, 4.0, cfg.dtype)
    x = jax.lax.with_sharding_constraint(x, spec)
    block_keys = sorted(
        (k for k in enc if k.startswith("blocks_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    for k in block_keys:
        x = block.apply({"params": enc[k]}, x, rope)
        # Re-pin after every block: norms/MLP stay token-sharded; GSPMD
        # all-gathers K/V only where attention genuinely needs them.
        x = jax.lax.with_sharding_constraint(x, spec)

    tokens = nn.LayerNorm(dtype=jnp.float32).apply({"params": enc["norm"]}, x)
    return tokens, pos


def jit_sequence_parallel_encode(cfg, mesh: Mesh, batch_axis="dp", token_axis="sp"):
    """jit-wrapped `sequence_parallel_encode` (params/imgs as traced args)."""
    from functools import partial

    return jax.jit(
        partial(
            sequence_parallel_encode,
            cfg,
            mesh=mesh,
            batch_axis=batch_axis,
            token_axis=token_axis,
        )
    )
