"""Checkpoint IO: map upstream (naver MASt3R / CroCo-v2, torch) weights onto
the flax parameter tree.

This environment has no network egress, so `from_pretrained`-style HTTP
download is out of scope; this module converts a LOCAL safetensors/npz file
containing an upstream state dict (e.g. the released
``MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric`` checkpoint).

The name mapping targets the ACTUAL upstream module tree (reconstructed from
the naver dust3r/croco/mast3r sources; the reference consumes the same
checkpoint through its external package, reference
mast3r_utils.py:66-76,277-294):

==========================================================  =========================================
flax tree (ours)                                            torch state-dict key (upstream)
==========================================================  =========================================
encoder/patch_embed/proj                                    patch_embed.proj.{weight,bias}
encoder/blocks_{i}/{norm1,norm2}                            enc_blocks.{i}.{norm1,norm2}.*
encoder/blocks_{i}/attn/{qkv,proj}                          enc_blocks.{i}.attn.{qkv,proj}.*
encoder/blocks_{i}/mlp/{fc1,fc2}                            enc_blocks.{i}.mlp.{fc1,fc2}.*
encoder/norm                                                enc_norm.*
decoder_embed                                               decoder_embed.*
dec_blocks_{i}/...   (same sublayout + cross_attn/norm_y)   dec_blocks.{i}.{norm1,attn.qkv,attn.proj,
                                                              cross_attn.projq/projk/projv/proj,
                                                              norm2,norm3,norm_y,mlp.fc1,mlp.fc2}.*
dec_blocks2_{i}/...                                         dec_blocks2.{i}.*
dec_norm                                                    dec_norm.*
head{n}/act_postprocess_{i}  (Dense == 1x1 conv)            downstream_head{n}.dpt.act_postprocess.{i}.0.*
head{n}/resample_{0,1}       (ConvTranspose, k=s)           downstream_head{n}.dpt.act_postprocess.{0,1}.1.*
head{n}/resample_3           (Conv k3 s2 p1)                downstream_head{n}.dpt.act_postprocess.3.1.*
head{n}/layer_rn_{i}                                        downstream_head{n}.dpt.scratch.layer{i+1}_rn.weight
head{n}/refine{k}/rcu_skip/conv{j}                          downstream_head{n}.dpt.scratch.refinenet{k}.resConfUnit1.conv{j}.*
head{n}/refine{k}/rcu_out/conv{j}                           downstream_head{n}.dpt.scratch.refinenet{k}.resConfUnit2.conv{j}.*
head{n}/refine{k}/out_conv                                  downstream_head{n}.dpt.scratch.refinenet{k}.out_conv.*
head{n}/head_conv{1,2,3}                                    downstream_head{n}.dpt.head.{0,2,4}.*
head{n}/proj                 (linear head variant)          downstream_head{n}.proj.*
local_head{n}/{fc1,fc2}                                     downstream_head{n}.head_local_features.{fc1,fc2}.*
==========================================================  =========================================

Layout rules (torch -> flax):
* Linear  weight [out, in]          -> kernel [in, out]           (.T)
* Conv2d  weight [out, in, kh, kw]  -> kernel [kh, kw, in, out]   (2,3,1,0)
* ConvT2d weight [in, out, kh, kw]  -> kernel [kh, kw, out, in]   (2,3,1,0)
  (our ConvTranspose layers use transpose_kernel=True, whose kernel layout
  [kh, kw, out, in] makes the ConvT permutation identical to Conv2d's —
  and whose compute semantics match torch's gradient-of-conv exactly; the
  numeric fixture test vs torch.nn.ConvTranspose2d covers this)
* act_postprocess.{i}.0 is a 1x1 Conv2d upstream but a Dense here:
  [out, in, 1, 1] <-> [in, out] via squeeze + transpose.
* LayerNorm weight/bias -> scale/bias.

Upstream keys that are PRESENT in real checkpoints but intentionally
unmapped (strict load ignores exactly these, nothing else):
* ``mask_token`` — CroCo pretraining artifact, unused at inference.
* ``downstream_head{n}.dpt.scratch.refinenet4.resConfUnit1.*`` — refinenet4
  is called with a single input upstream (no skip), so its resConfUnit1
  weights are dead parameters in the upstream forward as well.
"""

from __future__ import annotations

import re

import jax
import numpy as np

# -- name translation -------------------------------------------------------

# (flax-path regex with '/' separators, torch replacement with '.')
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
    # DPT heads
    (r"^head([12])/act_postprocess_(\d+)/(.*)$",
     r"downstream_head\1.dpt.act_postprocess.\2.0.\3"),
    (r"^head([12])/resample_(\d+)/(.*)$",
     r"downstream_head\1.dpt.act_postprocess.\2.1.\3"),
    (r"^head([12])/layer_rn_0/(.*)$", r"downstream_head\1.dpt.scratch.layer1_rn.\2"),
    (r"^head([12])/layer_rn_1/(.*)$", r"downstream_head\1.dpt.scratch.layer2_rn.\2"),
    (r"^head([12])/layer_rn_2/(.*)$", r"downstream_head\1.dpt.scratch.layer3_rn.\2"),
    (r"^head([12])/layer_rn_3/(.*)$", r"downstream_head\1.dpt.scratch.layer4_rn.\2"),
    (r"^head([12])/refine(\d)/rcu_skip/(.*)$",
     r"downstream_head\1.dpt.scratch.refinenet\2.resConfUnit1.\3"),
    (r"^head([12])/refine(\d)/rcu_out/(.*)$",
     r"downstream_head\1.dpt.scratch.refinenet\2.resConfUnit2.\3"),
    (r"^head([12])/refine(\d)/out_conv/(.*)$",
     r"downstream_head\1.dpt.scratch.refinenet\2.out_conv.\3"),
    (r"^head([12])/head_conv1/(.*)$", r"downstream_head\1.dpt.head.0.\2"),
    (r"^head([12])/head_conv2/(.*)$", r"downstream_head\1.dpt.head.2.\2"),
    (r"^head([12])/head_conv3/(.*)$", r"downstream_head\1.dpt.head.4.\2"),
    # linear head variant (DUSt3R LinearPts3d)
    (r"^head([12])/proj/(.*)$", r"downstream_head\1.proj.\2"),
    # catmlp local-features head
    (r"^local_head([12])/(.*)$", r"downstream_head\1.head_local_features.\2"),
]

_LEAF_RENAME = {"kernel": "weight", "scale": "weight", "bias": "bias"}

# Upstream keys a real checkpoint contains that we deliberately don't load.
_IGNORED_UPSTREAM = [
    re.compile(r"^mask_token$"),
    re.compile(r"^downstream_head[12]\.dpt\.scratch\.refinenet4\.resConfUnit1\."),
]

# flax params that map onto a 1x1 Conv2d upstream (Dense here).
_DENSE_AS_CONV1X1 = re.compile(r"\.dpt\.act_postprocess\.\d+\.0\.weight$")


def _flax_path_to_torch_name(path: tuple[str, ...]) -> str:
    """('params','encoder','blocks_0','attn','qkv','kernel') ->
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


def _to_torch_layout(torch_name: str, value: np.ndarray) -> np.ndarray:
    """Flax param -> torch layout for export."""
    if not torch_name.endswith("weight"):
        return value
    if _DENSE_AS_CONV1X1.search(torch_name):
        return value.T[..., None, None]  # [in,out] -> [out,in,1,1]
    if value.ndim == 2:  # linear [in,out] -> [out,in]
        return value.T
    if value.ndim == 4:  # conv/convT [kh,kw,a,b] -> [b,a,kh,kw]
        return value.transpose(3, 2, 0, 1)
    return value


def _from_torch_layout(torch_name: str, flax_shape, value: np.ndarray) -> np.ndarray:
    """Torch tensor -> flax layout; shape-checked."""
    v = value
    if torch_name.endswith("weight"):
        if _DENSE_AS_CONV1X1.search(torch_name) and v.ndim == 4:
            v = v[..., 0, 0].T  # [out,in,1,1] -> [in,out]
        elif v.ndim == 2:
            v = v.T
        elif v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)
    if v.shape != tuple(flax_shape):
        raise ValueError(
            f"cannot map torch tensor {value.shape} ({torch_name}) "
            f"-> flax {tuple(flax_shape)}"
        )
    return v


def _is_ignored(torch_name: str) -> bool:
    return any(p.search(torch_name) for p in _IGNORED_UPSTREAM)


def export_torch_state_dict(params) -> dict[str, np.ndarray]:
    """Flax params -> upstream-style torch state dict (numpy values)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, value in flat:
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        name = _flax_path_to_torch_name(keys)
        out[name] = _to_torch_layout(name, np.asarray(value))
    return out


def import_torch_state_dict(
    params, state: dict[str, np.ndarray], strict: bool = True
):
    """Upstream state dict -> flax params (same tree structure).

    strict=True (default) raises on ANY missing param or unexpected
    checkpoint key, except the documented-dead upstream keys
    (_IGNORED_UPSTREAM). strict=False keeps unmatched params at their
    current values and prints a summary.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    used, missing = set(), []
    new_leaves = []
    for path, value in flat:
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        name = _flax_path_to_torch_name(keys)
        if name in state:
            new_leaves.append(
                _from_torch_layout(name, value.shape, np.asarray(state[name]))
                .astype(np.asarray(value).dtype)
            )
            used.add(name)
        else:
            missing.append(name)
            new_leaves.append(np.asarray(value))
    unexpected = sorted(k for k in set(state) - used if not _is_ignored(k))
    if strict and (missing or unexpected):
        raise KeyError(
            f"strict checkpoint load failed: {len(missing)} missing "
            f"(e.g. {missing[:8]}), {len(unexpected)} unexpected "
            f"(e.g. {unexpected[:8]})"
        )
    if missing:
        print(
            f"[models/io] {len(missing)} params not found in checkpoint "
            f"(kept initialized), e.g. {missing[:5]}"
        )
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_state_dict_file(path: str) -> dict[str, np.ndarray]:
    """Read a safetensors / .npz / torch .pth state dict as numpy arrays.

    Torch checkpoints may wrap the state dict as ``{"model": ..., "args":
    ...}`` (naver releases do); extra top-level entries are dropped.
    """
    if path.endswith(".npz"):
        return dict(np.load(path))
    if path.endswith((".pth", ".pt", ".bin")):
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "model" in raw:
            raw = raw["model"]  # naver releases wrap the state dict
        return {
            k.removeprefix("module."): v.detach().to(torch.float32).numpy()
            if hasattr(v, "detach") else np.asarray(v)
            for k, v in raw.items()
        }
    from safetensors.numpy import load_file

    return load_file(path)


def load_checkpoint_into(params, path: str, strict: bool = True):
    """Load a local safetensors / .npz / torch .pth checkpoint."""
    state = load_state_dict_file(path)
    return import_torch_state_dict(params, state, strict=strict)


# -- naver retrieval head ----------------------------------------------------

def is_retrieval_state_dict(state: dict[str, np.ndarray]) -> bool:
    """Heuristic: a naver retrieval checkpoint carries attention + at least
    one naver-specific whitener/projector tensor, and no decoder/head keys.

    The whitener markers are the ``.m``/``.p`` parameter names (and the
    ``projector.N.weight`` Linear stack) — NOT bare ``postwhiten.`` /
    ``prewhiten.`` prefixes: this repo's own exported RetrievalNet state
    dicts carry ``postwhiten.weight/bias`` (Dense) and must fall through
    to the generic name-mapped loader in RetrievalModel.from_pretrained.
    """
    keys = set(state)
    has_att = "attention.weight" in keys
    has_naver_whitener = any(
        k in keys
        for k in ("prewhiten.m", "prewhiten.p", "postwhiten.m", "postwhiten.p")
    ) or any(re.match(r"^projector\.\d+\.weight$", k) for k in keys)
    has_backbone_heads = any(k.startswith("downstream_head") for k in keys)
    return has_att and has_naver_whitener and not has_backbone_heads


def import_retrieval_state_dict(params, state: dict[str, np.ndarray]):
    """Map a naver retrieval checkpoint onto RetrievalNet params.

    The upstream retrieval model (naver mast3r ``retrieval/model.py``; the
    reference consumes it through its absent external package, reference
    mast3r_utils.py:671-694) is, per released config::

        y   = (x - prewhiten.m) @ prewhiten.p          # token whitening
        y   = y @ projector.0.weight.T + projector.0.bias   # single Linear
        a   = attention(y)                             # Linear(hdim, 1)
        g   = aggregate(y, a)                          # weighted mean here
        sig = l2norm((g - postwhiten.m) @ postwhiten.p)

    Both affine stages BEFORE attention fold exactly into the single
    ``whiten`` Dense (kernel = P_pre @ W_proj.T, bias = b_proj - m_pre @
    kernel), because attention and aggregation here consume the folded
    output; postwhiten commutes with the weighted mean (affine map of an
    affine combination) and loads into the ``postwhiten`` Dense. Whitener
    parameters are stored double upstream — cast to f32 on load.

    Raises on a multi-layer projector (hdims beyond the released
    single-Linear config add LayerNorm+GELU stages that cannot fold) and on
    any unrecognized non-backbone key.
    """
    import flax

    state = {k.removeprefix("module."): np.asarray(v) for k, v in state.items()}
    known: set[str] = set()

    def take(name):
        if name in state:
            known.add(name)
            return np.asarray(state[name], np.float32)
        return None

    proj_linear_idx = sorted(
        {
            int(m.group(1))
            for k in state
            if (m := re.match(r"^projector\.(\d+)\.weight$", k))
        }
    )
    if proj_linear_idx not in ([], [0]):
        raise NotImplementedError(
            "retrieval checkpoint has a multi-layer projector "
            f"(linear indices {proj_linear_idx}); only the released "
            "single-Linear config (hdims=[backbone_dim]) folds into the "
            "whiten Dense"
        )

    tree = flax.core.unfreeze(params) if isinstance(
        params, flax.core.FrozenDict
    ) else jax.tree_util.tree_map(np.asarray, params)
    p = tree["params"]
    d_in, d_out = np.asarray(p["whiten"]["kernel"]).shape

    m_pre, P_pre = take("prewhiten.m"), take("prewhiten.p")
    W_proj, b_proj = take("projector.0.weight"), take("projector.0.bias")
    att_w, att_b = take("attention.weight"), take("attention.bias")
    m_post, P_post = take("postwhiten.m"), take("postwhiten.p")

    # take() marks keys consumed, so a half-present pair would otherwise
    # be silently dropped (the fold only applies m under `if P is not
    # None`) and still pass the strict unexpected-key check below.
    for pair, a, b in (
        (("prewhiten.m", "prewhiten.p"), m_pre, P_pre),
        (("postwhiten.m", "postwhiten.p"), m_post, P_post),
        (("projector.0.bias", "projector.0.weight"), b_proj, W_proj),
    ):
        if a is not None and b is None:
            raise KeyError(
                f"retrieval checkpoint has {pair[0]} without {pair[1]} — "
                "refusing to silently drop it"
            )

    kernel = np.eye(d_in, dtype=np.float32)
    bias = np.zeros(d_in, dtype=np.float32)
    if P_pre is not None:
        m = np.zeros(d_in, np.float32) if m_pre is None else m_pre.reshape(-1)
        kernel = P_pre
        bias = -(m @ P_pre)
    if W_proj is not None:
        kernel = kernel @ W_proj.T
        bias = bias @ W_proj.T + (0.0 if b_proj is None else b_proj)
        if b_proj is not None:
            known.add("projector.0.bias")
    if kernel.shape != (d_in, d_out):
        raise ValueError(
            f"retrieval fold produced kernel {kernel.shape}, RetrievalNet "
            f"whiten expects {(d_in, d_out)} — backbone_dim mismatch"
        )
    p["whiten"]["kernel"] = kernel
    p["whiten"]["bias"] = bias.reshape(d_out)

    if att_w is None or att_b is None:
        raise KeyError("retrieval checkpoint missing attention.{weight,bias}")
    p["attention"]["kernel"] = att_w.T  # [1, D] -> [D, 1]
    p["attention"]["bias"] = att_b

    if P_post is not None:
        m = np.zeros(d_out, np.float32) if m_post is None else m_post.reshape(-1)
        p["postwhiten"]["kernel"] = P_post
        p["postwhiten"]["bias"] = -(m @ P_post)

    unexpected = sorted(
        k for k in set(state) - known if not k.startswith("backbone.")
    )
    if unexpected:
        raise KeyError(
            f"retrieval checkpoint has {len(unexpected)} unrecognized "
            f"non-backbone keys, e.g. {unexpected[:8]}"
        )
    import jax.numpy as jnp

    tree["params"] = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), p
    )
    return tree


def save_checkpoint(params, path: str) -> None:
    """Save params as an upstream-style safetensors/npz state dict."""
    state = export_torch_state_dict(params)
    if path.endswith(".npz"):
        np.savez(path, **state)
    else:
        from safetensors.numpy import save_file

        save_file(state, path)
