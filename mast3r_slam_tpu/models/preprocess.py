"""Host-side image preprocessing for MASt3R input.

Behavior contract (parity: reference mast3r_utils.py:121-207, itself exact
MASt3R preprocessing):
* size 224: resize SHORT side to 224 (LANCZOS down / BICUBIC up), center
  square crop
* other sizes: resize LONG side to `size`, center crop both dims to
  multiples of 16 (and force 4:3 for square inputs unless square_ok)
* normalize uint8 [0,255] -> float32 [-1, 1]

Runs on host (PIL) inside the prefetch pipeline; the device only ever sees
fixed-shape normalized tensors.
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def _resize_long_edge(img: "Image.Image", long_edge: int) -> "Image.Image":
    s = max(img.size)
    interp = Image.LANCZOS if s > long_edge else Image.BICUBIC
    new_size = tuple(int(round(x * long_edge / s)) for x in img.size)
    return img.resize(new_size, interp)


def resize_img_native(
    img: np.ndarray,
    size: int,
    square_ok: bool = False,
    patch: int = 16,
):
    """Native (C++/OpenMP) fast path of `resize_img`: identical crop
    geometry, area/bilinear filters, fused crop+normalize. Falls back to
    Python internally when no compiler is available."""
    from mast3r_slam_tpu import native

    if img.dtype in (np.float32, np.float64):
        img = (img * 255).astype(np.uint8) if img.max() <= 1.0 else img.astype(np.uint8)
    H1, W1 = img.shape[:2]

    # target resize dims: long edge -> size (size!=224 path)
    if size == 224:
        long_edge = round(size * max(W1 / H1, H1 / W1))
    else:
        long_edge = size
    s = max(H1, W1)
    W = int(round(W1 * long_edge / s))
    H = int(round(H1 * long_edge / s))
    resized = native.resize_u8(img, H, W)

    cx, cy = W // 2, H // 2
    if size == 224:
        half = min(cx, cy)
        cw = ch = 2 * half
        cx0, cy0 = cx - half, cy - half
    else:
        halfw, halfh = _patch_halves(W, H, square_ok, patch)
        cw, ch = 2 * halfw, 2 * halfh
        cx0, cy0 = cx - halfw, cy - halfh

    normalized = native.crop_normalize(resized, cy0, cx0, ch, cw)
    return {
        "img": normalized[None],
        "true_shape": np.asarray([[ch, cw]], np.int32),
        "unnormalized_img": resized[cy0 : cy0 + ch, cx0 : cx0 + cw],
    }


def _patch_halves(
    W: int, H: int, square_ok: bool, patch: int
) -> tuple[int, int]:
    """Half-extents of the center crop, aligned so the crop's H and W are
    multiples of `patch` (the model's token grid; the /16 alignment the
    reference hardcodes at image.py:75 breaks its own patch-14 DUNE family
    through any loader that enforces token alignment)."""
    hp = patch // 2
    cx, cy = W // 2, H // 2
    halfw = ((2 * cx) // patch) * hp
    halfh = ((2 * cy) // patch) * hp
    if not square_ok and W == H:
        # 4:3 from a square source, rounded down to keep patch alignment
        halfh = (int(3 * halfw / 4) // hp) * hp
    return halfw, halfh


def resize_img(
    img: np.ndarray,
    size: int,
    square_ok: bool = False,
    return_transformation: bool = False,
    patch: int = 16,
):
    """Preprocess one image.

    Args:
        img: [H, W, 3] uint8 (or float in [0,1])
        size: target class (224 / 336 / 512)
        patch: model patch size — crop H/W align to it (16 ViT-L, 14 DUNE)

    Returns dict with:
        img: float32 [1, H', W', 3] in [-1, 1]
        true_shape: int array [[H', W']]
        unnormalized_img: uint8 [H', W', 3]
    (+ optional (scale_w, scale_h, half_crop_w, half_crop_h))
    """
    if not _HAVE_PIL:  # pragma: no cover
        raise RuntimeError("PIL required for preprocessing")
    if img.dtype in (np.float32, np.float64):
        img = (img * 255).astype(np.uint8) if img.max() <= 1.0 else img.astype(np.uint8)

    pil = Image.fromarray(img)
    W1, H1 = pil.size
    if size == 224:
        pil = _resize_long_edge(pil, round(size * max(W1 / H1, H1 / W1)))
    else:
        pil = _resize_long_edge(pil, size)

    W, H = pil.size
    cx, cy = W // 2, H // 2
    if size == 224:
        half = min(cx, cy)
        pil = pil.crop((cx - half, cy - half, cx + half, cy + half))
    else:
        halfw, halfh = _patch_halves(W, H, square_ok, patch)
        pil = pil.crop((cx - halfw, cy - halfh, cx + halfw, cy + halfh))

    arr = np.asarray(pil).astype(np.float32) / 255.0
    normalized = (arr - 0.5) / 0.5

    res = {
        "img": normalized[None],
        "true_shape": np.asarray([[pil.size[1], pil.size[0]]], np.int32),
        "unnormalized_img": np.asarray(pil),
    }
    if return_transformation:
        scale_w = W1 / W
        scale_h = H1 / H
        half_crop_w = (W - pil.size[0]) / 2
        half_crop_h = (H - pil.size[1]) / 2
        return res, (scale_w, scale_h, half_crop_w, half_crop_h)
    return res


# ---------------------------------------------------------------------------
# Device-side resize (reference image.py:103-176 — defined there but its
# pipeline always resizes on host; live here for library use, e.g.
# resizing pointmap-aligned buffers already resident in HBM)
# ---------------------------------------------------------------------------


def _interp_matrix_jnp(n_out: int, n_in: int, dtype):
    """Align-corners bilinear interpolation matrix [n_out, n_in].

    TPU-first: a resize along one axis becomes ONE dense matmul (MXU)
    instead of a gather — same trick the DPT head uses for its fixed
    upsamples (heads.py:77-84)."""
    import jax.numpy as jnp

    if n_out == n_in:
        return jnp.eye(n_out, dtype=dtype)
    pos = jnp.arange(n_out, dtype=jnp.float32) * (
        (n_in - 1) / max(n_out - 1, 1)
    )
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
    frac = pos - lo.astype(jnp.float32)
    m = jnp.zeros((n_out, n_in), jnp.float32)
    rows = jnp.arange(n_out)
    m = m.at[rows, lo].set(1.0 - frac).at[rows, lo + 1].set(frac)
    return m.astype(dtype)


def resize_image_device(img, target_size, keep_aspect: bool = True):
    """Bilinear resize of a device-resident image, [H, W, C] or [C, H, W]
    (auto-detected like the reference's `resize_image`, image.py:103-158,
    which samples the same align-corners grid but nearest-neighbor; its
    pipeline never calls it — host PIL does all input resizing — so this
    upgrade to bilinear changes no parity surface). Separable
    align-corners interpolation as two matmuls — gather-free, MXU-tiled.
    `target_size` is an int (long edge if keep_aspect, square otherwise)
    or an (h, w) tuple. Shapes are static under jit as long as
    target_size is a Python constant."""
    import jax.numpy as jnp

    img = jnp.asarray(img)
    if img.ndim != 3:
        raise ValueError(f"expected 3D image, got shape {img.shape}")
    hwc = img.shape[-1] in (1, 3, 4)
    if not hwc:
        img = jnp.transpose(img, (1, 2, 0))  # CHW -> HWC
    h, w = img.shape[:2]
    if isinstance(target_size, (tuple, list)):
        th, tw = int(target_size[0]), int(target_size[1])
    elif keep_aspect:
        # truncation (not round) matches reference image.py:133-135
        scale = target_size / max(h, w)
        th, tw = int(h * scale), int(w * scale)
    else:
        th = tw = int(target_size)
    dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    x = img.astype(dtype)
    Mh = _interp_matrix_jnp(th, h, dtype)  # [th, h]
    Mw = _interp_matrix_jnp(tw, w, dtype)  # [tw, w]
    x = jnp.einsum("oh,hwc->owc", Mh, x)
    x = jnp.einsum("pw,owc->opc", Mw, x)
    if not jnp.issubdtype(img.dtype, jnp.floating):
        x = jnp.clip(jnp.round(x), 0, 255).astype(img.dtype)
    if not hwc:
        x = jnp.transpose(x, (2, 0, 1))
    return x
