"""ASMK retrieval: codebook, aggregation, kernel similarity, integration."""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.frame import create_frame
from mast3r_slam_tpu.models.asmk import (
    ASMKRetriever,
    aggregate_binarize,
    asmk_similarity,
    kmeans_codebook,
)
from mast3r_slam_tpu.retrieval_db import RetrievalDatabase


def _clustered_feats(rng, centers, n_per=20, noise=0.05):
    out = []
    for c in centers:
        out.append(c[None] + rng.normal(size=(n_per, c.shape[0])) * noise)
    f = np.concatenate(out).astype(np.float32)
    return f / np.linalg.norm(f, axis=-1, keepdims=True)


class TestKMeans:
    def test_recovers_clusters(self, rng):
        d = 16
        centers = rng.normal(size=(4, d))
        centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
        feats = jnp.asarray(_clustered_feats(rng, centers, n_per=50))
        cb = np.asarray(kmeans_codebook(feats, 4, iters=15))
        # every true center must have a nearby centroid
        sim = centers @ cb.T
        assert (sim.max(axis=1) > 0.95).all()


class TestAggregation:
    def test_presence_and_sign(self, rng):
        d, w = 8, 16
        cb = rng.normal(size=(w, d)).astype(np.float32)
        cb /= np.linalg.norm(cb, axis=-1, keepdims=True)
        feats = jnp.asarray(rng.normal(size=(30, d)).astype(np.float32))
        B, present = aggregate_binarize(feats, jnp.asarray(cb))
        assert B.shape == (w, d) and present.shape == (w,)
        B = np.asarray(B)
        present = np.asarray(present)
        assert set(np.unique(B[present])) <= {-1, 1}
        assert (B[~present] == 0).all()

    def test_self_similarity_is_max(self, rng):
        d, w = 8, 16
        cb = rng.normal(size=(w, d)).astype(np.float32)
        cb /= np.linalg.norm(cb, axis=-1, keepdims=True)
        imgs = [
            jnp.asarray(rng.normal(size=(25, d)).astype(np.float32)) for _ in range(4)
        ]
        descs = [aggregate_binarize(f, jnp.asarray(cb)) for f in imgs]
        Bdb = jnp.stack([b for b, _ in descs])
        Pdb = jnp.stack([p for _, p in descs])
        s = np.asarray(
            asmk_similarity(descs[1][0], descs[1][1], Bdb, Pdb, jnp.asarray(4))
        )
        assert s.argmax() == 1


class TestRetriever:
    def test_end_to_end_retrieval(self, rng):
        feat_dim = 64
        ret = ASMKRetriever(feat_dim=feat_dim, n_words=32, proj_dim=16, capacity=16)
        scenes = [rng.normal(size=(40, feat_dim)).astype(np.float32) for _ in range(5)]
        ret.fit_codebook([jnp.asarray(s) for s in scenes[:3]])
        for s in scenes:
            ret.add(jnp.asarray(s))
        # query with a noisy revisit of scene 2
        q = scenes[2] + rng.normal(size=scenes[2].shape).astype(np.float32) * 0.05
        ids, scores = ret.query(jnp.asarray(q), k=2)
        assert ids[0] == 2
        assert scores[0] > scores[1]


class TestDatabaseIntegration:
    def test_asmk_method_in_database(self, rng):
        set_config(
            Config.from_dict(
                {
                    "runtime": {"keyframe_capacity": 16},
                    "retrieval": {
                        "method": "asmk",
                        "asmk_n_words": 32,
                        "asmk_proj_dim": 16,
                        "asmk_codebook_kf": 2,
                    },
                }
            )
        )
        db = RetrievalDatabase(model=None, backbone_dim=64)
        scenes = [rng.normal(size=(30, 64)).astype(np.float32) for _ in range(4)]
        frames = []
        for i, s in enumerate(scenes):
            f = create_frame(i, jnp.zeros((4, 6, 3)))
            f.feat = jnp.asarray(s)
            frames.append(f)
            db.update(f, add_after_query=True)
        assert db.asmk.ready()
        assert db.asmk.count == 4
        # revisit scene 1
        q = create_frame(9, jnp.zeros((4, 6, 3)))
        q.feat = jnp.asarray(
            scenes[1] + rng.normal(size=scenes[1].shape).astype(np.float32) * 0.05
        )
        hits = db.update(q, add_after_query=False, k=2, min_thresh=-1.0)
        assert hits and hits[0] == 1
