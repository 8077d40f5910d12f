"""SLAM state snapshots: save/resume long runs.

The reference had NO checkpoint/resume — state lived in Python objects for
the run's duration (SURVEY.md §5.4). Here all SLAM state is flat arrays
(keyframe arena, factor-graph arenas, poses, retrieval signatures), so a
snapshot is one compressed npz + a small JSON header.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


SNAPSHOT_VERSION = 1


def save_snapshot(slam, path: str | Path) -> None:
    """Serialize a running SLAM instance (excluding model weights)."""
    path = Path(path)
    kfs = slam.keyframes
    fg = slam.factor_graph
    rdb = slam.retrieval_db

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
        capacity=kfs.capacity,
        kf_count=len(kfs),
        kf_frame_ids=kfs.frame_ids,
        fg_n_edges=fg.n_edges,
        rdb_kf_ids=rdb.kf_ids,
        asmk_count=asmk_count,
        mode=slam.state.mode.name,
    )
    np.savez_compressed(path, header=json.dumps(header), **arrays)


def load_snapshot(slam, path: str | Path) -> None:
    """Restore a snapshot into an initialized SLAM instance (same model
    class/resolution; call after `_initialize_state`)."""
    import jax.numpy as jnp

    from mast3r_slam_tpu.frame import Mode

    data = np.load(Path(path), allow_pickle=False)
    header = json.loads(str(data["header"]))
    assert header["version"] == SNAPSHOT_VERSION

    if slam.keyframes is None or slam.keyframes.h != header["h"]:
        slam._initialize_state(header["h"], header["w"])
    kfs = slam.keyframes
    fg = slam.factor_graph
    rdb = slam.retrieval_db

    kfs.X = jnp.asarray(data["kf_X"])
    kfs.C = jnp.asarray(data["kf_C"])
    kfs.T_WC = jnp.asarray(data["kf_T"])
    kfs.N = jnp.asarray(data["kf_N"])
    kfs._n_host = [float(x) for x in np.asarray(data["kf_N"])[:, 0, 0]]
    kfs.frame_ids = list(header["kf_frame_ids"])
    if data["kf_imgs"].ndim > 1:
        kfs.imgs = [jnp.asarray(x) for x in data["kf_imgs"]]
    if "kf_feat" in data:
        kfs._feat = jnp.asarray(data["kf_feat"])
        kfs._pos = jnp.asarray(data["kf_pos"])
    if "kf_K" in data:
        kfs.K = jnp.asarray(data["kf_K"])

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

    slam.poses = [p for p in data["poses"]]
    slam.timestamps = list(data["timestamps"])
    slam.state.mode = Mode[header["mode"]]
