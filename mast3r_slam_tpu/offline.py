"""Offline multi-view reconstruction (no temporal ordering assumed).

Given a set of images: encode all, build a retrieval pair graph, match all
pairs through the decoder in batches, chain pairwise pose estimates for
initialization, then run the global factor-graph GN — the offline
counterpart of the online SLAM loop (upstream ecosystem's sparse global
alignment role), built from the same stage programs.

Usage:
    rec = OfflineReconstructor(model)
    result = rec.reconstruct(list_of_frames)
    # result: poses [F, 8], pointmaps [F, N, 3], confidences [F, N, 1]
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.config import get_config
from mast3r_slam_tpu.frame import Frame, Keyframes
from mast3r_slam_tpu.geometry import point_to_ray_dist
from mast3r_slam_tpu.global_opt import FactorGraph
from mast3r_slam_tpu.inference import _ensure_encoded, mast3r_inference_mono
from mast3r_slam_tpu.lie import core as lie
from mast3r_slam_tpu.ops.gauss_newton import GNParams, gauss_newton_pose_rays
from mast3r_slam_tpu.retrieval_db import select_pairs_from_retrieval


class OfflineReconstructor:
    def __init__(self, model, pair_k: int = 3, pair_batch: int = 8):
        self.model = model
        self.pair_k = pair_k
        self.pair_batch = pair_batch
        self.cfg = get_config()

    def reconstruct(self, frames: list[Frame]) -> dict:
        n_frames = len(frames)
        assert n_frames >= 2

        # 1. Encode + canonical pointmaps for every frame.
        for f in frames:
            _ensure_encoded(self.model, f)
            if f.X_canon is None:
                X, C, _, _ = mast3r_inference_mono(self.model, f)
                f.X_canon, f.C, f.N, f.N_updates = X, C, 1, 1

        h = w = None
        hw = frames[0].img.shape[:2]
        kfs = Keyframes(hw[0], hw[1], capacity=max(n_frames, 2))
        for f in frames:
            kfs.append(f)

        # 2. Pair graph from encoder-feature signatures.
        sigs = jnp.stack(
            [feat.mean(axis=0) / jnp.linalg.norm(feat.mean(axis=0)) for feat in (f.feat for f in frames)]
        )
        pairs = select_pairs_from_retrieval(
            sigs, k=self.pair_k, min_thresh=-1.0, include_consecutive=True
        )

        # 3. Batched symmetric matching over all pairs -> factor graph.
        graph = FactorGraph(self.model, kfs)
        for s in range(0, len(pairs), self.pair_batch):
            chunk = pairs[s : s + self.pair_batch]
            graph.add_factors(
                [p[0] for p in chunk],
                [p[1] for p in chunk],
                min_match_frac=self.cfg.local_opt.min_match_frac,
            )

        # 4. Initialization: chain consecutive relative poses via pose GN.
        self._chain_initialize(kfs, frames)

        # 5. Global refinement.
        graph.solve_GN_rays()

        return dict(
            poses=np.asarray(kfs.get_poses()),
            points=np.asarray(kfs.get_points()),
            confidences=np.asarray(kfs.get_confidences()),
            pairs=pairs,
            n_edges=graph.n_edges,
        )

    def _chain_initialize(self, kfs: Keyframes, frames: list[Frame]) -> None:
        """T_W,i+1 = T_W,i * T_i,i+1 with T_i,i+1 from a two-view pose GN."""
        from mast3r_slam_tpu.inference import mast3r_match_asymmetric

        t = self.cfg.tracking
        params = GNParams(
            sigma_ray=t.sigma_ray,
            sigma_dist=t.sigma_dist,
            huber_k=t.huber,
            max_iter=t.max_iters,
            delta_thresh=t.delta_norm,
        )
        for i in range(len(frames) - 1):
            fi, fj = frames[i + 1], frames[i]  # track i+1 against i
            idx, valid, Xff, Cff, Qff, Xkf, Ckf, Qkf = mast3r_match_asymmetric(
                self.model, fi, fj
            )
            idx0, valid0 = idx[0], valid[0]
            n = idx0.shape[0]
            Qk = jnp.sqrt(jnp.take_along_axis(Qff[0], idx0[:, None], axis=0) * Qkf[0])
            gate = (valid0 & (Qk > t.Q_conf)).astype(jnp.float32)
            Xf_g = jnp.take_along_axis(Xff[0], idx0[:, None], axis=0)
            rd_k = point_to_ray_dist(frames[i].X_canon)
            wgt = gate * jnp.sqrt(Qk)
            sqrt_info = jnp.concatenate(
                [jnp.broadcast_to(wgt / t.sigma_ray, (n, 3)), wgt / t.sigma_dist], -1
            )
            T_rel, _ = gauss_newton_pose_rays(
                lie.sim3_identity(), Xf_g, rd_k, sqrt_info, params
            )  # T_{i, i+1}
            T_next = lie.sim3_mul(jnp.asarray(kfs.T_WC[i]), T_rel)
            kfs.write_pose(i + 1, T_next)
