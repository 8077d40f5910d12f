"""Loop-closure retrieval database: device-resident signature matrix.

Behavior parity: reference RetrievalDatabase (mast3r_utils.py:640-793).
TPU-native: signatures live in a preallocated [capacity, D] device matrix;
query = one jitted masked matvec + top-k (the reference stacked a Python
list of signatures and `.item()`-looped the results).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.config import get_config
from mast3r_slam_tpu.frame import Frame
from mast3r_slam_tpu.models.retrieval import RetrievalModel


@partial(jax.jit, static_argnames=("k",))
def _topk_scores(signatures: jax.Array, count: jax.Array, query: jax.Array, k: int):
    """Masked dot-product top-k over the signature arena."""
    scores = signatures @ query  # [cap]
    idx = jnp.arange(scores.shape[0])
    scores = jnp.where(idx < count, scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


@jax.jit
def _mean_pool_signature(feat: jax.Array) -> jax.Array:
    sig = jnp.mean(feat, axis=0)
    return sig / jnp.maximum(jnp.linalg.norm(sig), 1e-8)


class RetrievalDatabase:
    """Global-signature retrieval with optional learned whitening head.

    With a full-dim backbone (1024) the learned RetrievalModel head is used;
    otherwise mean-pool + L2 ("simple retrieval"), matching the reference's
    degradation policy (mast3r_utils.py:667-674).
    """

    def __init__(self, model, backbone_dim: int = 1024, capacity: int | None = None):
        cfg = get_config()
        self.model = model
        self.backbone_dim = backbone_dim
        self.capacity = capacity or cfg.runtime.keyframe_capacity
        self.use_simple = backbone_dim != 1024
        self.retrieval: Optional[RetrievalModel] = None
        if not self.use_simple:
            try:
                self.retrieval = RetrievalModel.from_pretrained(backbone_dim)
            except Exception:
                self.use_simple = True
        self.signatures = jnp.zeros((self.capacity, backbone_dim), jnp.float32)
        self.kf_ids: list[int] = []

        # Optional online PCA-whitening for the signature path: accumulate
        # the first `whitening_kf` keyframes' features, fit the whitening
        # affine, then recompute the stored signatures (the upstream model
        # ships pretrained whitening; this learns it from the run itself).
        rcfg = cfg.retrieval
        self._whitening_kf = rcfg.whitening_kf
        self._sig_pending: list[jax.Array] = []
        self._whitening_fitted = False

        # Optional real-ASMK backend (upstream loop-closure method).
        self.method = rcfg.method
        self.asmk = None
        self._asmk_pending: list[jax.Array] = []
        self._asmk_codebook_kf = rcfg.asmk_codebook_kf
        self._asmk_fit_size = 0  # db size when the codebook was (re)fitted
        # Optional keyframe arena (wired by the SLAM loop): source of the
        # live map's features for codebook re-fits at doubling thresholds.
        self.keyframes = None
        if self.method == "asmk":
            from mast3r_slam_tpu.models.asmk import ASMKRetriever

            self.asmk = ASMKRetriever(
                feat_dim=backbone_dim,
                n_words=rcfg.asmk_n_words,
                proj_dim=rcfg.asmk_proj_dim,
                capacity=self.capacity,
            )

    @property
    def kf_counter(self) -> int:
        return len(self.kf_ids)

    def compute_signature(self, feat: jax.Array) -> jax.Array:
        if feat.ndim == 1:
            return feat / jnp.maximum(jnp.linalg.norm(feat), 1e-8)
        if self.use_simple or self.retrieval is None:
            return _mean_pool_signature(feat.astype(jnp.float32))
        return self.retrieval.forward_global(feat.astype(jnp.float32))

    def prep_features(self, feat: jax.Array):
        if self.retrieval is None:
            return feat
        whitened, _ = self.retrieval.forward_features(feat)
        return whitened

    def update(
        self,
        frame: Frame,
        add_after_query: bool = True,
        k: int = 3,
        min_thresh: float = 0.0,
    ) -> list[int]:
        """Query top-k similar keyframes, then optionally insert.

        (parity: mast3r_utils.py:717-768)
        """
        if frame.feat is None:
            from mast3r_slam_tpu.inference import _ensure_encoded

            _ensure_encoded(self.model, frame)
        sig = self.compute_signature(frame.feat)

        topk: list[int] = []
        count = self.kf_counter
        use_asmk = self.asmk is not None and self.asmk.ready() and self.asmk.count > 0
        if use_asmk:
            ids, scores = self.asmk.query(frame.feat, k=k)
            topk = [self.kf_ids[i] for i, s in zip(ids, scores) if s > min_thresh]
        elif count > 0:
            k_eff = min(k, count)
            scores, idx = _topk_scores(
                self.signatures, jnp.asarray(count), sig, k_eff
            )
            scores = np.asarray(scores)
            idx = np.asarray(idx)
            for s, i in zip(scores, idx):
                if s > min_thresh:
                    topk.append(self.kf_ids[int(i)])

        if add_after_query:
            assert count < self.capacity, "retrieval arena full"
            self.signatures = self.signatures.at[count].set(sig)
            self.kf_ids.append(count)
            if self.asmk is not None:
                self._asmk_add(frame.feat)
            self._maybe_fit_whitening(frame.feat)
        return topk

    def _maybe_fit_whitening(self, feat: jax.Array) -> None:
        """Online whitening for the signature path (retrieval.whitening_kf
        keyframes accumulate, then PCA-whitening is fitted and all stored
        signatures are recomputed in the whitened space)."""
        if (
            self._whitening_kf <= 0
            or self._whitening_fitted
            or self.retrieval is None
            or feat is None
        ):
            return
        self._sig_pending.append(feat)
        if len(self._sig_pending) < self._whitening_kf:
            return
        stacked = jnp.concatenate(
            [
                f.astype(jnp.float32).reshape(-1, f.shape[-1])
                for f in self._sig_pending
            ],
            axis=0,
        )
        self.retrieval.fit_whitening(stacked)
        self._whitening_fitted = True
        # Recompute stored signatures so old and new entries are comparable.
        for i, f in enumerate(self._sig_pending):
            self.signatures = self.signatures.at[i].set(self.compute_signature(f))
        self._sig_pending = []

    def remove(self, idx: int) -> None:
        """Evict keyframe `idx`'s signature and compact (keyframe-arena
        compaction contract: higher indices shift down one)."""
        count = self.kf_counter
        if not (0 <= idx < count):
            return
        from mast3r_slam_tpu.frame import _arena_remove

        self.signatures = _arena_remove(self.signatures, idx)
        self.kf_ids.pop()  # kf_ids is the identity map [0..count); shrink it
        if self.asmk is not None:
            if self.asmk.ready():
                self.asmk.remove(idx)
            elif idx < len(self._asmk_pending):
                # codebook not fitted yet: entries are per-keyframe features
                self._asmk_pending.pop(idx)
        if not self._whitening_fitted and idx < len(self._sig_pending):
            self._sig_pending.pop(idx)

    def _asmk_add(self, feat: jax.Array) -> None:
        """Insert into the ASMK arena, fitting the codebook lazily from the
        first keyframes' features, and refreshing it once the map doubles
        past the last fit size (stale visual words tile a grown map badly;
        the refit re-aggregates every stored entry against the new words)."""
        if not self.asmk.ready():
            self._asmk_pending.append(feat)
            if len(self._asmk_pending) >= self._asmk_codebook_kf:
                self.asmk.fit_codebook(self._asmk_pending)
                for f in self._asmk_pending:
                    self.asmk.add(f)
                self._asmk_fit_size = len(self._asmk_pending)
                self._asmk_pending = []
            return
        self.asmk.add(feat)
        if (
            self.keyframes is not None
            and self.keyframes._feat is not None
            and self.asmk.count >= 2 * max(self._asmk_fit_size, 1)
            and self.asmk.count <= len(self.keyframes)
        ):
            count = self.asmk.count
            feats = [self.keyframes._feat[i] for i in range(count)]
            self.asmk.refit(feats)
            self._asmk_fit_size = count

    def query(self, feat: jax.Array, k: int = 3) -> tuple[list[int], list[float]]:
        if self.kf_counter == 0:
            return [], []
        sig = self.compute_signature(feat)
        k_eff = min(k, self.kf_counter)
        scores, idx = _topk_scores(self.signatures, jnp.asarray(self.kf_counter), sig, k_eff)
        return (
            [self.kf_ids[int(i)] for i in np.asarray(idx)],
            [float(s) for s in np.asarray(scores)],
        )


def load_retriever(model, backbone_dim: int | None = None) -> RetrievalDatabase:
    """(parity: mast3r_utils.py:83-113)"""
    if backbone_dim is None:
        backbone_dim = getattr(model, "embed_dim", 1024)
    return RetrievalDatabase(model, backbone_dim=backbone_dim)


# ---------------------------------------------------------------------------
# Offline pair selection (parity surface: the upstream helpers the reference
# re-exports — compute_similarity_matrix / select_pairs_from_retrieval,
# mast3r_utils.py:30-38 — used for offline reconstruction graph building).
# ---------------------------------------------------------------------------


@jax.jit
def compute_similarity_matrix(signatures: jax.Array) -> jax.Array:
    """[N, D] L2-normalized signatures -> [N, N] cosine similarities (MXU)."""
    sig = signatures / jnp.maximum(
        jnp.linalg.norm(signatures, axis=-1, keepdims=True), 1e-8
    )
    return sig @ sig.T


def select_pairs_from_retrieval(
    signatures: jax.Array,
    k: int = 3,
    min_thresh: float = 0.0,
    include_consecutive: bool = True,
) -> list[tuple[int, int]]:
    """Top-k most-similar pairs per image (deduplicated, i < j), optionally
    forcing the consecutive chain — the standard retrieval graph for
    offline alignment / loop-closure candidate generation."""
    n = signatures.shape[0]
    sim = np.array(compute_similarity_matrix(signatures))  # writable copy
    sim[np.arange(n), np.arange(n)] = -np.inf
    pairs: set[tuple[int, int]] = set()
    if include_consecutive:
        pairs.update((i, i + 1) for i in range(n - 1))
    for i in range(n):
        order = np.argsort(-sim[i])[:k]
        for j in order:
            if sim[i, j] > min_thresh:
                pairs.add((min(i, int(j)), max(i, int(j))))
    return sorted(pairs)
