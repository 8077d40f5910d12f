"""Parameter sharding rules: Megatron-style tensor parallelism for the ViT.

Column-parallel the up-projections (qkv, cross projq/k/v, mlp fc1), row-
parallel the down-projections (attn proj, mlp fc2) — XLA then inserts the
single all-reduce per block over the "tp" ICI axis. Everything else
(norms, biases of row-parallel layers, patch embed, heads) is replicated.
Data-parallel batching rides the "dp" axis; with dp > 1 the gradient
all-reduce is inserted by XLA from the output sharding of the train step.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_COL_PARALLEL = ("qkv", "projq", "projk", "projv", "fc1")  # split output dim
_ROW_PARALLEL = ("proj", "fc2")  # split input dim


def _spec_for(path: tuple[str, ...], shape) -> P:
    names = [p for p in path]
    if any("head" in n for n in names):  # regression heads stay replicated
        return P()
    leaf = names[-1]
    module = names[-2] if len(names) >= 2 else ""
    # int8 weight streaming (models/quant.py) wraps a kernel leaf as
    # {"__w8__": int8 [in,out], "scale": f32 [1,out]} — one path level
    # deeper. Shard the int8 payload exactly as the kernel it replaced;
    # the per-OUTPUT-channel scale follows the output axis (split for
    # column-parallel, replicated for row-parallel where the output dim
    # is intact).
    if module == "kernel" and len(names) >= 3:
        owner = names[-3]
        if leaf == "__w8__" and len(shape) == 2:
            if owner in _COL_PARALLEL:
                return P(None, "tp")
            if owner in _ROW_PARALLEL:
                return P("tp", None)
        if leaf == "scale" and owner in _COL_PARALLEL and len(shape) == 2:
            return P(None, "tp")
        return P()
    if leaf == "kernel" and len(shape) == 2:
        if module in _COL_PARALLEL:
            return P(None, "tp")
        if module in _ROW_PARALLEL:
            return P("tp", None)
    if leaf == "bias" and module in _COL_PARALLEL:
        return P("tp")
    return P()  # replicated


def infer_param_shardings(params, mesh: Mesh):
    """PartitionSpec pytree for a MASt3R/ViT param tree."""

    def assign(path, leaf):
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        return NamedSharding(mesh, _spec_for(keys, leaf.shape))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh):
    """Device-put params onto the mesh according to the inferred specs."""
    shardings = infer_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
