"""Model-to-SLAM glue: mono / asymmetric / symmetric inference + matching.

Parity surface: reference mast3r_utils.py:255-632. Differences by design:

* Encoder features are cached per frame and the decoder runs FROM CACHE
  (`model.decode`) — the reference re-ran its encoder inside `reconstruct`
  on every tracking step even when features were cached.
* Symmetric inference is ONE batched decode (batch 2: i->j and j->i), and
  multi-edge backend matching batches ALL edges through the decoder in one
  call — the reference looped, and its symmetric path was a stub returning
  identity matches (mast3r_utils.py:556-569). Here it is real.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.frame import Frame
from mast3r_slam_tpu.matching import match
from mast3r_slam_tpu.models.mast3r import MASt3RModel


def _ensure_encoded(model: MASt3RModel, frame: Frame) -> None:
    """Encode-and-cache. Frame images are [0, 1]; the model takes [-1, 1]."""
    if frame.feat is None:
        feat, pos = model.encode(frame.img[None] * 2.0 - 1.0)
        frame.feat = feat[0]
        frame.pos = pos[0]


def _flatten_out(out: dict) -> tuple[jax.Array, ...]:
    """Model out dict -> (X [B,H,W,3], C [B,H,W], D [B,H,W,d], Q [B,H,W]),
    with optional stride subsampling per dataset.img_downsample
    (parity: reference `downsample`, mast3r_utils.py:234-252)."""
    from mast3r_slam_tpu.config import get_config

    X, C, D, Q = out["pts3d"], out["conf"], out["desc"], out["desc_conf"]
    f = get_config().dataset.img_downsample
    if f > 1:
        X = X[:, ::f, ::f, :]
        C = C[:, ::f, ::f]
        D = D[:, ::f, ::f, :]
        Q = Q[:, ::f, ::f]
    return X, C, D, Q


def mast3r_inference_mono(model: MASt3RModel, frame: Frame):
    """Self-pair reconstruction -> canonical pointmap.

    Returns (Xii [N,3], Cii [N,1], feat [S,D], pos [S,2]).
    (parity: mast3r_utils.py:255-321; one fused device program)
    """
    _ensure_encoded(model, frame)
    from mast3r_slam_tpu.config import get_config

    if get_config().dataset.img_downsample > 1:
        # subsampled path (rare): go through the generic decode + downsample
        f, p = frame.feat[None], frame.pos[None]
        out1, _ = model.decode(f, p, f, p)
        X, C, _, _ = _flatten_out(out1)
        h, w = X.shape[1:3]
        return X[0].reshape(h * w, 3), C[0].reshape(h * w, 1), frame.feat, frame.pos
    Xii, Cii = model.mono(frame.feat, frame.pos)
    return Xii, Cii, frame.feat, frame.pos


def mast3r_asymmetric_inference(model: MASt3RModel, frame_i: Frame, frame_j: Frame):
    """Two-view decode from cached features.

    Returns X, C, D, Q stacked [2, H, W, ...] with row 0 = view i in its own
    frame, row 1 = view j in view i's frame (parity: mast3r_utils.py:324-379).
    """
    _ensure_encoded(model, frame_i)
    _ensure_encoded(model, frame_j)
    out_i, out_j = model.decode(
        frame_i.feat[None], frame_i.pos[None], frame_j.feat[None], frame_j.pos[None]
    )
    Xi, Ci, Di, Qi = _flatten_out(out_i)
    Xj, Cj, Dj, Qj = _flatten_out(out_j)
    X = jnp.concatenate([Xi, Xj], axis=0)
    C = jnp.concatenate([Ci, Cj], axis=0)
    D = jnp.concatenate([Di, Dj], axis=0)
    Q = jnp.concatenate([Qi, Qj], axis=0)
    return X, C, D, Q


def mast3r_symmetric_inference(model: MASt3RModel, frame_i: Frame, frame_j: Frame):
    """Both directions in ONE batched decode.

    Returns X, C, D, Q stacked [4, H, W, ...] ordered (ii, ji, jj, ij)
    (parity: mast3r_utils.py:382-443, minus its two sequential model calls).
    """
    _ensure_encoded(model, frame_i)
    _ensure_encoded(model, frame_j)
    f1 = jnp.stack([frame_i.feat, frame_j.feat])  # [2, S, D]
    p1 = jnp.stack([frame_i.pos, frame_j.pos])
    f2 = jnp.stack([frame_j.feat, frame_i.feat])
    p2 = jnp.stack([frame_j.pos, frame_i.pos])
    out_first, out_second = model.decode(f1, p1, f2, p2)
    Xf, Cf, Df, Qf = _flatten_out(out_first)  # rows: (ii, jj)
    Xs, Cs, Ds, Qs = _flatten_out(out_second)  # rows: (ji, ij)
    X = jnp.stack([Xf[0], Xs[0], Xf[1], Xs[1]])
    C = jnp.stack([Cf[0], Cs[0], Cf[1], Cs[1]])
    D = jnp.stack([Df[0], Ds[0], Df[1], Ds[1]])
    Q = jnp.stack([Qf[0], Qs[0], Qf[1], Qs[1]])
    return X, C, D, Q


def mast3r_match_asymmetric(
    model: MASt3RModel,
    frame_i: Frame,
    frame_j: Frame,
    idx_i2j_init: jax.Array | None = None,
):
    """Asymmetric inference + dense matching.

    Returns (idx_i2j [1,N], valid_match_j [1,N,1], Xii, Cii, Qii, Xji, Cji,
    Qji — all flattened [1, N, .]). (parity: mast3r_utils.py:451-500)
    """
    X, C, D, Q = mast3r_asymmetric_inference(model, frame_i, frame_j)
    h, w = X.shape[1:3]
    n = h * w
    Xii, Xji = X[0:1], X[1:2]
    Dii, Dji = D[0:1], D[1:2]
    idx_i2j, valid_match_j = match(Xii, Xji, Dii, Dji, idx_1_to_2_init=idx_i2j_init)

    flat = lambda a: a.reshape(1, n, -1)
    return (
        idx_i2j,
        valid_match_j,
        flat(X[0]),
        flat(C[0]),
        flat(Q[0]),
        flat(X[1]),
        flat(C[1]),
        flat(Q[1]),
    )


def mast3r_decode_symmetric_batch(
    model: MASt3RModel,
    feat_i: jax.Array,
    pos_i: jax.Array,
    feat_j: jax.Array,
    pos_j: jax.Array,
):
    """Batch-decode B keyframe pairs in both directions.

    Returns X, C, D, Q as [4, B, H, W, ...] ordered (ii, ji, jj, ij) —
    the reference declared this API but returned placeholder zeros
    (mast3r_utils.py:572-632); real here via one decoder call on 2B pairs.
    """
    B = feat_i.shape[0]
    f1 = jnp.concatenate([feat_i, feat_j], axis=0)
    p1 = jnp.concatenate([pos_i, pos_j], axis=0)
    f2 = jnp.concatenate([feat_j, feat_i], axis=0)
    p2 = jnp.concatenate([pos_j, pos_i], axis=0)
    out_first, out_second = model.decode(f1, p1, f2, p2)
    X1, C1, D1, Q1 = _flatten_out(out_first)  # rows: ii*B + jj*B
    X2, C2, D2, Q2 = _flatten_out(out_second)  # rows: ji*B + ij*B
    X = jnp.stack([X1[:B], X2[:B], X1[B:], X2[B:]])
    C = jnp.stack([C1[:B], C2[:B], C1[B:], C2[B:]])
    D = jnp.stack([D1[:B], D2[:B], D1[B:], D2[B:]])
    Q = jnp.stack([Q1[:B], Q2[:B], Q1[B:], Q2[B:]])
    return X, C, D, Q


def mast3r_match_symmetric(
    model: MASt3RModel,
    feat_i: jax.Array,  # [B, S, D] stacked keyframe features
    pos_i: jax.Array,
    feat_j: jax.Array,
    pos_j: jax.Array,
):
    """Bidirectional matching for B keyframe pairs in ONE decoder batch.

    The decoder consumes [2B] pairs: rows 0..B-1 = (i->j), rows B..2B-1 =
    (j->i). Returns the 8-tuple contract of the reference
    (mast3r_utils.py:503-569 — which stubbed this; real here):
    idx_i2j, idx_j2i [B,N]; valid_match_j, valid_match_i [B,N,1];
    Qii, Qjj, Qji, Qij [B,N,1].
    """
    f1 = jnp.concatenate([feat_i, feat_j], axis=0)  # [2B, S, D]
    p1 = jnp.concatenate([pos_i, pos_j], axis=0)
    f2 = jnp.concatenate([feat_j, feat_i], axis=0)
    p2 = jnp.concatenate([pos_j, pos_i], axis=0)
    out_first, out_second = model.decode(f1, p1, f2, p2)
    X1, C1, D1, Q1 = _flatten_out(out_first)  # rows: (ii)*B + (jj)*B
    X2, C2, D2, Q2 = _flatten_out(out_second)  # rows: (ji)*B + (ij)*B

    B = feat_i.shape[0]
    h, w = X1.shape[1:3]
    n = h * w
    Xii, Xjj = X1[:B], X1[B:]
    Xji, Xij = X2[:B], X2[B:]
    Dii, Djj = D1[:B], D1[B:]
    Dji, Dij = D2[:B], D2[B:]

    # i->j: match keyframe-j pixels (Xji) into view-i canonical map (Xii);
    # j->i symmetric. One call on the doubled batch.
    idx_both, valid_both = match(
        jnp.concatenate([Xii, Xjj], axis=0),
        jnp.concatenate([Xji, Xij], axis=0),
        jnp.concatenate([Dii, Djj], axis=0),
        jnp.concatenate([Dji, Dij], axis=0),
    )
    idx_i2j, idx_j2i = idx_both[:B], idx_both[B:]
    valid_match_j, valid_match_i = valid_both[:B], valid_both[B:]

    flat = lambda a: a.reshape(B, n, 1)
    Qii_f, Qjj_f = flat(Q1[:B]), flat(Q1[B:])
    Qji_f, Qij_f = flat(Q2[:B]), flat(Q2[B:])
    return idx_i2j, idx_j2i, valid_match_j, valid_match_i, Qii_f, Qjj_f, Qji_f, Qij_f
