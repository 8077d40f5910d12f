"""SLAM state snapshots: save/resume long runs.

The reference had NO checkpoint/resume — state lived in Python objects for
the run's duration (SURVEY.md §5.4). Here all SLAM state is flat arrays
(keyframe arena, factor-graph arenas, poses, retrieval signatures), so a
snapshot is one compressed npz + a small JSON header.

Resume contract: the restored session must be indistinguishable from the
one that saved — that includes the parts that are easy to forget and hard
to debug when missed: the pending backend-optimization queue, the online
whitening state (the fitted affine lives in the retrieval head's params;
stored signatures are in the whitened space), the ASMK codebook fit size
(else every resume triggers a spurious full refit), and the keyframe
filtering-mode bookkeeping (N_updates/score mirrors).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


SNAPSHOT_VERSION = 2

_RETP_PREFIX = "retp::"


def _flatten_params(params, prefix=()):
    """Flax param tree -> {joined.path: leaf} (stable, JSON-safe keys)."""
    out = {}
    if isinstance(params, dict) or hasattr(params, "items"):
        for k, v in params.items():
            out.update(_flatten_params(v, prefix + (str(k),)))
    else:
        out[".".join(prefix)] = params
    return out


def _unflatten_into(params, flat: dict):
    """Write {joined.path: array} values back into a (nested dict) tree."""
    import flax

    tree = flax.core.unfreeze(params) if hasattr(params, "unfreeze") or isinstance(
        params, flax.core.FrozenDict
    ) else params
    for path, value in flat.items():
        node = tree
        keys = path.split(".")
        for k in keys[:-1]:
            node = node[k]
        import jax.numpy as jnp

        node[keys[-1]] = jnp.asarray(value)
    return tree


def save_snapshot(slam, path: str | Path) -> None:
    """Serialize a running SLAM instance (excluding model weights)."""
    path = Path(path)
    kfs = slam.keyframes
    fg = slam.factor_graph
    rdb = slam.retrieval_db
    f = max(1, slam.config.dataset.img_downsample)

    arrays = dict(
        kf_X=np.asarray(kfs.X),
        kf_C=np.asarray(kfs.C),
        kf_T=np.asarray(kfs.T_WC),
        kf_N=np.asarray(kfs.N),
        kf_imgs=np.stack([np.asarray(i) for i in kfs.imgs])
        if kfs.imgs
        else np.zeros((0,)),
        fg_ii=fg.ii,
        fg_jj=fg.jj,
        fg_idx_ii2jj=np.asarray(fg.idx_ii2jj),
        fg_idx_jj2ii=np.asarray(fg.idx_jj2ii),
        fg_valid_j=np.asarray(fg.valid_match_j),
        fg_valid_i=np.asarray(fg.valid_match_i),
        fg_Q_ii2jj=np.asarray(fg.Q_ii2jj),
        fg_Q_jj2ii=np.asarray(fg.Q_jj2ii),
        rdb_signatures=np.asarray(rdb.signatures),
        poses=np.stack(slam.poses) if slam.poses else np.zeros((0, 8)),
        timestamps=np.asarray(slam.timestamps),
    )
    if kfs._feat is not None:
        arrays["kf_feat"] = np.asarray(kfs._feat)
        arrays["kf_pos"] = np.asarray(kfs._pos)
    if kfs.K is not None:
        arrays["kf_K"] = np.asarray(kfs.K)

    # Online signature whitening: the fitted affine lives in the retrieval
    # head's params and the stored signatures are already in its output
    # space — dropping it would make a resumed run whiten new queries
    # differently from the restored arena (and re-fit over the WRONG
    # keyframes later).
    if rdb.retrieval is not None and rdb._whitening_fitted:
        for k, v in _flatten_params(rdb.retrieval.params).items():
            arrays[_RETP_PREFIX + k] = np.asarray(v)
    if rdb._sig_pending:
        arrays["sig_pending"] = np.stack(
            [np.asarray(x) for x in rdb._sig_pending]
        )

    asmk_count = 0
    if rdb.asmk is not None:
        a = rdb.asmk
        asmk_count = a.count
        arrays["asmk_mu"] = np.asarray(a.mu)
        arrays["asmk_projection"] = np.asarray(a.projection)
        arrays["asmk_B"] = np.asarray(a.B)
        arrays["asmk_present"] = np.asarray(a.present)
        if a.codebook is not None:
            arrays["asmk_codebook"] = np.asarray(a.codebook)
        if rdb._asmk_pending:
            arrays["asmk_pending"] = np.stack(
                [np.asarray(f) for f in rdb._asmk_pending]
            )

    header = dict(
        version=SNAPSHOT_VERSION,
        h=kfs.h,
        w=kfs.w,
        # PROCESSED-FRAME dims + the downsample factor: _initialize_state
        # divides by img_downsample itself, so a resume must hand it the
        # pre-downsample dims (passing kfs.h back would divide twice).
        frame_h=kfs.h * f,
        frame_w=kfs.w * f,
        img_downsample=f,
        capacity=kfs.capacity,
        kf_count=len(kfs),
        kf_frame_ids=kfs.frame_ids,
        kf_nups=kfs._nups_host,
        kf_scores=kfs._score_host,
        fg_n_edges=fg.n_edges,
        rdb_kf_ids=rdb.kf_ids,
        whitening_fitted=rdb._whitening_fitted,
        asmk_count=asmk_count,
        asmk_fit_size=rdb._asmk_fit_size,
        mode=slam.state.mode.name,
        # pending backend work: a keyframe queued but not yet solved at
        # save time must still get its factor-graph edges after resume
        tasks=list(slam.state.global_optimizer_tasks),
        reloc_pending=slam.state.reloc_pending,
    )
    np.savez_compressed(path, header=json.dumps(header), **arrays)


def load_snapshot(slam, path: str | Path) -> None:
    """Restore a snapshot into a SLAM instance (same model class and
    dataset geometry; re-initializes internal state as needed)."""
    import jax.numpy as jnp

    from mast3r_slam_tpu.frame import Mode

    data = np.load(Path(path), allow_pickle=False)
    header = json.loads(str(data["header"]))
    assert header["version"] == SNAPSHOT_VERSION, (
        f"snapshot version {header['version']} != {SNAPSHOT_VERSION}"
    )

    f_now = max(1, slam.config.dataset.img_downsample)
    if f_now != header["img_downsample"]:
        raise ValueError(
            f"snapshot was saved with dataset.img_downsample="
            f"{header['img_downsample']}, current config has {f_now} — "
            "pointmap resolutions are incompatible"
        )
    kfs = slam.keyframes
    needs_init = (
        kfs is None
        or kfs.h != header["h"]
        or kfs.w != header["w"]
        or kfs.capacity != header["capacity"]
    )
    if needs_init:
        slam._initialize_state(header["frame_h"], header["frame_w"])
    kfs = slam.keyframes
    if kfs.capacity != header["capacity"]:
        raise ValueError(
            f"snapshot keyframe capacity {header['capacity']} != configured "
            f"{kfs.capacity} (set runtime.keyframe_capacity to match)"
        )
    fg = slam.factor_graph
    rdb = slam.retrieval_db

    kfs.X = jnp.asarray(data["kf_X"])
    kfs.C = jnp.asarray(data["kf_C"])
    kfs.T_WC = jnp.asarray(data["kf_T"])
    kfs.N = jnp.asarray(data["kf_N"])
    kfs._n_host = [float(x) for x in np.asarray(data["kf_N"])[:, 0, 0]]
    kfs._nups_host = [int(x) for x in header.get("kf_nups", [0] * kfs.capacity)]
    kfs._score_host = [
        (None if x is None else float(x))
        for x in header.get("kf_scores", [None] * kfs.capacity)
    ]
    kfs.frame_ids = list(header["kf_frame_ids"])
    kfs.imgs = (
        [jnp.asarray(x) for x in data["kf_imgs"]]
        if data["kf_imgs"].ndim > 1
        else []
    )
    if "kf_feat" in data:
        kfs._feat = jnp.asarray(data["kf_feat"])
        kfs._pos = jnp.asarray(data["kf_pos"])
    if "kf_K" in data:
        kfs.K = jnp.asarray(data["kf_K"])
    # Invalidate version-keyed caches (tracker._kf_state) — the arena
    # contents changed under them.
    kfs.version += 1

    fg.ii = data["fg_ii"].copy()
    fg.jj = data["fg_jj"].copy()
    fg.n_edges = int(header["fg_n_edges"])
    fg.idx_ii2jj = jnp.asarray(data["fg_idx_ii2jj"])
    fg.idx_jj2ii = jnp.asarray(data["fg_idx_jj2ii"])
    fg.valid_match_j = jnp.asarray(data["fg_valid_j"])
    fg.valid_match_i = jnp.asarray(data["fg_valid_i"])
    fg.Q_ii2jj = jnp.asarray(data["fg_Q_ii2jj"])
    fg.Q_jj2ii = jnp.asarray(data["fg_Q_jj2ii"])

    rdb.signatures = jnp.asarray(data["rdb_signatures"])
    rdb.kf_ids = list(header["rdb_kf_ids"])
    rdb._whitening_fitted = bool(header.get("whitening_fitted", False))
    rdb._sig_pending = (
        [jnp.asarray(x) for x in data["sig_pending"]]
        if "sig_pending" in data
        else []
    )
    retp = {
        k[len(_RETP_PREFIX):]: data[k]
        for k in data.files
        if k.startswith(_RETP_PREFIX)
    }
    if retp:
        if rdb.retrieval is None:
            # The saving session had a retrieval head (fitted whitening in
            # its params); a fresh init degraded to simple retrieval (e.g.
            # non-1024 backbone). Reconstruct the head so restored
            # signatures stay comparable to new queries.
            from mast3r_slam_tpu.models.retrieval import RetrievalModel

            rdb.retrieval = RetrievalModel(rdb.backbone_dim, rdb.backbone_dim)
            rdb.use_simple = False
        rdb.retrieval.params = _unflatten_into(rdb.retrieval.params, retp)
    if rdb.asmk is not None and "asmk_mu" in data:
        a = rdb.asmk
        a.mu = jnp.asarray(data["asmk_mu"])
        a.projection = jnp.asarray(data["asmk_projection"])
        a.B = jnp.asarray(data["asmk_B"])
        a.present = jnp.asarray(data["asmk_present"])
        a.count = int(header.get("asmk_count", 0))
        if "asmk_codebook" in data:
            a.codebook = jnp.asarray(data["asmk_codebook"])
        rdb._asmk_pending = (
            [jnp.asarray(f) for f in data["asmk_pending"]]
            if "asmk_pending" in data
            else []
        )
    rdb._asmk_fit_size = int(header.get("asmk_fit_size", 0))

    slam.poses = [p for p in data["poses"]]
    slam.timestamps = list(data["timestamps"])
    slam.state.mode = Mode[header["mode"]]
    slam.state.global_optimizer_tasks = list(header.get("tasks", []))
    slam.state.reloc_pending = int(header.get("reloc_pending", 0))
    # A live device chain (pipelined tracking) predates the restored state.
    if slam.tracker is not None:
        slam.tracker.abort_chain()
