"""Retrieval database: insertion, top-k, thresholds, pair selection."""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.frame import create_frame
from mast3r_slam_tpu.retrieval_db import (
    RetrievalDatabase,
    compute_similarity_matrix,
    select_pairs_from_retrieval,
)


def _frame_with_feat(rng, fid, feat=None):
    f = create_frame(fid, jnp.zeros((4, 6, 3)))
    if feat is None:
        feat = rng.normal(size=(10, 32)).astype(np.float32)
    f.feat = jnp.asarray(feat)
    return f


@pytest.fixture
def db():
    set_config(Config.from_dict({"runtime": {"keyframe_capacity": 16}}))
    return RetrievalDatabase(model=None, backbone_dim=32)


class TestDatabase:
    def test_insert_and_self_retrieve(self, db, rng):
        feats = [rng.normal(size=(10, 32)).astype(np.float32) for _ in range(4)]
        for i, ft in enumerate(feats):
            got = db.update(_frame_with_feat(rng, i, ft), add_after_query=True)
            assert db.kf_counter == i + 1
        # query with a stored frame's features: itself must rank first
        ids, scores = db.query(jnp.asarray(feats[2]), k=2)
        assert ids[0] == 2
        assert scores[0] == pytest.approx(1.0, abs=1e-4)

    def test_threshold_filters(self, db, rng):
        a = rng.normal(size=(10, 32)).astype(np.float32)
        db.update(_frame_with_feat(rng, 0, a), add_after_query=True)
        # orthogonal-ish query
        b = rng.normal(size=(10, 32)).astype(np.float32)
        hits = db.update(_frame_with_feat(rng, 1, b), add_after_query=False, min_thresh=0.99)
        assert hits == []

    def test_query_without_add(self, db, rng):
        db.update(_frame_with_feat(rng, 0), add_after_query=True)
        db.update(_frame_with_feat(rng, 1), add_after_query=False)
        assert db.kf_counter == 1


class TestPairSelection:
    def test_similarity_matrix(self, rng):
        sigs = rng.normal(size=(5, 8)).astype(np.float32)
        S = np.asarray(compute_similarity_matrix(jnp.asarray(sigs)))
        np.testing.assert_allclose(np.diag(S), 1.0, atol=1e-5)
        np.testing.assert_allclose(S, S.T, atol=1e-5)

    def test_select_pairs(self, rng):
        # two clusters: {0,1}, {2,3} + consecutive chain
        base1 = rng.normal(size=8).astype(np.float32)
        base2 = rng.normal(size=8).astype(np.float32)
        sigs = np.stack(
            [base1, base1 + 0.01, base2, base2 + 0.01]
        )
        pairs = select_pairs_from_retrieval(jnp.asarray(sigs), k=1, min_thresh=0.5)
        assert (0, 1) in pairs and (2, 3) in pairs
        assert (1, 2) in pairs  # consecutive chain
        pairs_nc = select_pairs_from_retrieval(
            jnp.asarray(sigs), k=1, min_thresh=0.99, include_consecutive=False
        )
        assert (1, 2) not in pairs_nc


class TestOnlineWhitening:
    def test_whitening_fit_and_recompute(self, rng):
        """retrieval.whitening_kf: PCA-whitening is fitted from the first
        keyframes' features, stored signatures are recomputed, and
        same-cluster queries still rank first."""
        set_config(
            Config.from_dict(
                {
                    "runtime": {"keyframe_capacity": 16},
                    "retrieval": {"whitening_kf": 2},
                }
            )
        )
        db = RetrievalDatabase(model=None, backbone_dim=1024)
        assert db.retrieval is not None and not db.use_simple

        # anisotropic features: two clusters along a dominant axis
        base_a = rng.normal(size=(1, 1024)).astype(np.float32)
        base_b = rng.normal(size=(1, 1024)).astype(np.float32)
        fa = base_a + 0.05 * rng.normal(size=(16, 1024)).astype(np.float32)
        fb = base_b + 0.05 * rng.normal(size=(16, 1024)).astype(np.float32)

        db.update(_frame_with_feat(rng, 0, fa), add_after_query=True)
        assert not db._whitening_fitted
        db.update(_frame_with_feat(rng, 1, fb), add_after_query=True)
        assert db._whitening_fitted
        assert not db._sig_pending

        # signatures stay unit-norm after the recompute
        sigs = np.asarray(db.signatures[:2])
        np.testing.assert_allclose(
            np.linalg.norm(sigs, axis=-1), 1.0, atol=1e-4
        )

        # a query near cluster A must rank keyframe 0 first
        fa2 = base_a + 0.05 * rng.normal(size=(16, 1024)).astype(np.float32)
        ids, scores = db.query(jnp.asarray(fa2), k=2)
        assert ids[0] == 0

    def test_whitening_off_by_default(self, rng):
        set_config(Config.from_dict({"runtime": {"keyframe_capacity": 16}}))
        db = RetrievalDatabase(model=None, backbone_dim=1024)
        f = _frame_with_feat(rng, 0, rng.normal(size=(8, 1024)).astype(np.float32))
        db.update(f, add_after_query=True)
        assert not db._whitening_fitted and not db._sig_pending
