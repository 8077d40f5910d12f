"""Checkpoint IO: map upstream (naver MASt3R / CroCo, torch) weights onto
the flax parameter tree.

This environment has no network egress, so `from_pretrained`-style HTTP
download is out of scope; instead this module converts a LOCAL safetensors
file containing an upstream-style state dict. The name/layout mapping is
exercised in tests by round-tripping our own randomly initialized params
through the torch naming (export -> import -> bitwise equality), so when a
real checkpoint is dropped in, only genuinely-missing keys can fail (and
are reported).

Torch -> flax layout rules:
* Linear:  weight [out, in]        -> kernel [in, out] (transpose)
* Conv2d:  weight [out, in, kh, kw]-> kernel [kh, kw, in, out]
* ConvT2d: weight [in, out, kh, kw]-> kernel [kh, kw, in, out] (flipped? —
  flax ConvTranspose stores [kh, kw, in, out]; torch stores [in, out, kh, kw])
* LayerNorm: weight/bias           -> scale/bias
"""

from __future__ import annotations

import re
from typing import Any, Callable

import jax
import numpy as np


# -- name translation -------------------------------------------------------

_RULES: list[tuple[str, str]] = [
    # encoder
    (r"^encoder/patch_embed/proj/(.*)$", r"patch_embed.proj.\1"),
    (r"^encoder/blocks_(\d+)/(.*)$", r"enc_blocks.\1.\2"),
    (r"^encoder/norm/(.*)$", r"enc_norm.\1"),
    # decoder
    (r"^decoder_embed/(.*)$", r"decoder_embed.\1"),
    (r"^dec_blocks_(\d+)/(.*)$", r"dec_blocks.\1.\2"),
    (r"^dec_blocks2_(\d+)/(.*)$", r"dec_blocks2.\1.\2"),
    (r"^dec_norm/(.*)$", r"dec_norm.\1"),
    # heads
    (r"^head1/(.*)$", r"downstream_head1.\1"),
    (r"^head2/(.*)$", r"downstream_head2.\1"),
    (r"^local_head1/(.*)$", r"head_local_features1.\1"),
    (r"^local_head2/(.*)$", r"head_local_features2.\1"),
]

_LEAF_RENAME = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
}


def _flax_path_to_torch_name(path: tuple[str, ...]) -> str:
    """('params', 'encoder', 'blocks_0', 'attn', 'qkv', 'kernel') ->
    'enc_blocks.0.attn.qkv.weight'."""
    parts = [p for p in path if p != "params"]
    leaf = parts[-1]
    joined = "/".join(parts[:-1]) + "/" + _LEAF_RENAME.get(leaf, leaf)
    name = joined
    for pat, repl in _RULES:
        new, n = re.subn(pat, repl, name)
        if n:
            name = new
            break
    return name.replace("/", ".")


def _to_torch_layout(leaf_name: str, module_hint: str, value: np.ndarray) -> np.ndarray:
    """Transpose a flax param into torch layout for export."""
    if leaf_name != "weight":
        return value
    if value.ndim == 2:  # linear kernel [in, out] -> [out, in]
        return value.T
    if value.ndim == 4:  # conv kernel [kh, kw, in, out] -> [out, in, kh, kw]
        return value.transpose(3, 2, 0, 1)
    return value


def _from_torch_layout(flax_leaf: str, flax_shape, value: np.ndarray) -> np.ndarray:
    """Inverse of _to_torch_layout (leaf-driven; shape checks only verify)."""
    v = value
    if flax_leaf == "kernel":
        if v.ndim == 2:  # [out, in] -> [in, out]
            v = v.T
        elif v.ndim == 4:  # [out, in, kh, kw] -> [kh, kw, in, out]
            v = v.transpose(2, 3, 1, 0)
    if v.shape != tuple(flax_shape):
        raise ValueError(
            f"cannot map torch tensor {value.shape} -> flax {tuple(flax_shape)}"
        )
    return v


def export_torch_state_dict(params) -> dict[str, np.ndarray]:
    """Flax params -> upstream-style torch state dict (numpy values)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, value in flat:
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        name = _flax_path_to_torch_name(keys)
        leaf = name.rsplit(".", 1)[-1]
        out[name] = _to_torch_layout(leaf, name, np.asarray(value))
    return out


def import_torch_state_dict(
    params, state: dict[str, np.ndarray], strict: bool = False
):
    """Upstream-style state dict -> flax params (same tree structure).

    Unknown/missing keys are collected; strict=True raises on any.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    used, missing = set(), []
    new_leaves = []
    for path, value in flat:
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        name = _flax_path_to_torch_name(keys)
        if name in state:
            new_leaves.append(
                _from_torch_layout(keys[-1], value.shape, np.asarray(state[name])).astype(
                    np.asarray(value).dtype
                )
            )
            used.add(name)
        else:
            missing.append(name)
            new_leaves.append(np.asarray(value))
    unexpected = sorted(set(state) - used)
    if strict and (missing or unexpected):
        raise KeyError(f"missing={missing[:10]} unexpected={unexpected[:10]}")
    if missing:
        print(f"[models/io] {len(missing)} params not found in checkpoint "
              f"(kept initialized), e.g. {missing[:5]}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_checkpoint_into(params, path: str, strict: bool = False):
    """Load a local safetensors (or .npz) checkpoint into a param tree."""
    if path.endswith(".npz"):
        state = dict(np.load(path))
    else:
        from safetensors.numpy import load_file

        state = load_file(path)
    return import_torch_state_dict(params, state, strict=strict)


def save_checkpoint(params, path: str) -> None:
    """Save params as an upstream-style safetensors/npz state dict."""
    state = export_torch_state_dict(params)
    if path.endswith(".npz"):
        np.savez(path, **state)
    else:
        from safetensors.numpy import save_file

        save_file(state, path)
