"""GPipe pipeline parallelism for the ViT encoder (mesh axis "pp").

The reference has no distributed execution of any kind (SURVEY.md §2.9,
`slam.py:31` "single-threaded implementation"); the (dp, tp) mesh in
`parallel/sharding.py` already exceeds it. This module adds the third
TPU-native scaling axis: PIPELINE parallelism over encoder depth, for
deployments where the encoder's weights or activations outgrow one chip's
HBM (e.g. high-resolution batched serving) or where stage-parallel
throughput over an ICI ring is wanted.

Design (TPU-first):

* **Stage slabs, not per-stage modules.** Encoder blocks are structurally
  identical, so each stage's blocks stack into ONE pytree whose leaves have
  leading dims [n_stages, blocks_per_stage, ...]. Sharding the leading axis
  over "pp" gives every device exactly its stage's weights — no python-side
  model surgery, and the stage application is a `lax.scan` over the local
  slab (weights stream VMEM-resident per block).
* **shard_map GPipe schedule.** M microbatches flow through P stages in
  M + P - 1 steps. Each step, every device applies its stage to its current
  activation and hands the result to the next stage via `ppermute` over the
  ICI ring. Pipeline-bubble fraction is the standard GPipe (P-1)/(M+P-1);
  callers pick M >= P to keep it under 50%.
* **Replicated in / replicated out.** Patch-embed, RoPE tables, and the
  final LayerNorm are cheap and run outside the loop on every device; the
  last stage's outputs are psum-broadcast so the result is bit-stable and
  composable with the rest of the dryrun. A production topology would keep
  outputs dp-sharded instead; the schedule itself is unchanged.

Equality with the unsharded encoder is exact up to float-reassociation
(tests/test_pipeline_parallel.py pins it at fp32 tolerance).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mast3r_slam_tpu.models.vit import EncoderBlock, PatchEmbed, rope_2d_angles

try:  # moved to jax.shard_map in newer releases
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    """A 1D ("pp",) mesh over the first n_stages devices."""
    devs = list(jax.devices() if devices is None else devices)
    if len(devs) < n_stages:
        raise ValueError(f"need {n_stages} devices for {n_stages} stages, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_stages]), ("pp",))


def encoder_stage_params(params, n_stages: int):
    """Stack `encoder/blocks_*` into stage slabs [n_stages, L, ...].

    `params` is the full model param tree ({"params": {"encoder": ...}}).
    Block order follows the numeric suffix; depth must divide evenly.
    """
    enc = params["params"]["encoder"]
    block_keys = sorted(
        (k for k in enc if k.startswith("blocks_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    depth = len(block_keys)
    if depth % n_stages != 0:
        raise ValueError(f"encoder depth {depth} not divisible by {n_stages} stages")
    per_stage = depth // n_stages
    stages = []
    for s in range(n_stages):
        blocks = [enc[block_keys[s * per_stage + i]] for i in range(per_stage)]
        stages.append(jax.tree.map(lambda *xs: jnp.stack(xs), *blocks))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


def pipelined_encode(cfg, params, imgs: jax.Array, mesh: Mesh, n_microbatches: int):
    """ViT-encode `imgs` with the encoder blocks pipelined over mesh axis "pp".

    Args:
        cfg: MASt3RConfig (encoder geometry + dtype)
        params: full model param tree (as in `MASt3RModel.params`)
        imgs: [B, H, W, 3] normalized images; n_microbatches must divide B
        mesh: a Mesh with a "pp" axis (see `make_pipeline_mesh`)
        n_microbatches: GPipe M (M >= n_stages recommended)

    Returns:
        (tokens [B, S, D] — identical to `MASt3RNet.encode` —, pos [B, S, 2])
    """
    n_stages = mesh.shape["pp"]
    enc = params["params"]["encoder"]

    patch = PatchEmbed(cfg.patch_size, cfg.enc_embed_dim, cfg.dtype)
    x, pos = patch.apply({"params": enc["patch_embed"]}, imgs)
    head_dim = cfg.enc_embed_dim // cfg.enc_num_heads
    cos, sin = rope_2d_angles(pos, head_dim, cfg.rope_base)

    b, s, d = x.shape
    m = n_microbatches
    if b % m != 0:
        raise ValueError(f"batch {b} not divisible into {m} microbatches")
    mb = b // m
    x_mb = x.reshape(m, mb, s, d)
    # RoPE tables are identical across the batch row axis (same image grid),
    # so one microbatch-sized slice serves every microbatch.
    cos_mb, sin_mb = cos[:mb], sin[:mb]

    block = EncoderBlock(cfg.enc_embed_dim, cfg.enc_num_heads, 4.0, cfg.dtype)
    slabs = encoder_stage_params(params, n_stages)
    n_steps = m + n_stages - 1

    def gpipe(slab, xs, cos_, sin_):
        slab = jax.tree.map(lambda a: a[0], slab)  # [1, L, ...] -> [L, ...]
        sid = jax.lax.axis_index("pp")

        def apply_stage(h):
            def blk(h, p):
                return block.apply({"params": p}, h, (cos_, sin_)), None

            h, _ = jax.lax.scan(blk, h, slab)
            return h

        def stepf(carry, t):
            state, outs = carry
            feed = jax.lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, m - 1), 0, False)
            out = apply_stage(jnp.where(sid == 0, feed, state))
            # The last stage finishes microbatch t-(P-1) at step t.
            oidx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, oidx, 0, False)
            keep = (t >= n_stages - 1) & (sid == n_stages - 1)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(keep, out, cur), oidx, 0
            )
            state = jax.lax.ppermute(
                out, "pp", [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return (state, outs), None

        # The scan carry is device-varying from step 1 on (it holds each
        # stage's own activation); mark the zero init as varying over 'pp'
        # so the carry type is stable (shard_map VMA typing).
        pcast = getattr(jax.lax, "pcast", None)
        mark = (
            (lambda a: pcast(a, "pp", to="varying"))
            if pcast is not None
            else (lambda a: jax.lax.pvary(a, "pp"))
        )
        init = (mark(jnp.zeros_like(xs[0])), mark(jnp.zeros_like(xs)))
        (_, outs), _ = jax.lax.scan(stepf, init, jnp.arange(n_steps))
        # Broadcast the last stage's outputs to every device.
        outs = jnp.where(sid == n_stages - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, "pp")

    run = shard_map(
        gpipe,
        mesh=mesh,
        in_specs=(P("pp"), P(), P(), P()),
        out_specs=P(),
    )
    tokens = run(slabs, x_mb, cos_mb, sin_mb).reshape(b, s, d)

    import flax.linen as nn

    tokens = nn.LayerNorm(dtype=jnp.float32).apply({"params": enc["norm"]}, tokens)
    return tokens, pos


def jit_pipelined_encode(cfg, mesh: Mesh, n_microbatches: int):
    """jit-wrapped `pipelined_encode` (params/imgs as traced args)."""
    return jax.jit(
        partial(pipelined_encode, cfg, mesh=mesh, n_microbatches=n_microbatches)
    )
