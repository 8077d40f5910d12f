"""Naver retrieval-checkpoint import (VERDICT r4 item 6).

Builds a synthetic naver-style retrieval ``.pth`` (the layout of
``MASt3R_..._retrieval_trainingfree.pth``: ``{"model": state, "args": ...}``
with prewhiten/projector/attention/postwhiten keys, double-precision
Whitener params — reconstructed contract; the reference consumes the same
file through its absent external package, reference
mast3r_utils.py:671-694), loads it through
``RetrievalModel.from_pretrained``, and pins the forward against an
independent numpy twin of the upstream math. This proves the 7-Scenes
loop-closure config (BASELINE config 4) is zero-code-change ready — the
only missing piece is the checkpoint artifact itself.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mast3r_slam_tpu.models.retrieval import RetrievalModel

D = 32  # backbone dim (tiny stand-in for 1024)


def _softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)


def _make_naver_state(rng, with_pre=True, with_proj=True, with_post=True):
    state = {}
    if with_pre:
        state["prewhiten.m"] = torch.tensor(
            rng.standard_normal((1, D)), dtype=torch.float64
        )
        state["prewhiten.p"] = torch.tensor(
            rng.standard_normal((D, D)) * 0.2 + np.eye(D), dtype=torch.float64
        )
    if with_proj:
        state["projector.0.weight"] = torch.tensor(
            rng.standard_normal((D, D)) * 0.1, dtype=torch.float32
        )
        state["projector.0.bias"] = torch.tensor(
            rng.standard_normal(D) * 0.1, dtype=torch.float32
        )
    state["attention.weight"] = torch.tensor(
        rng.standard_normal((1, D)) * 0.3, dtype=torch.float32
    )
    state["attention.bias"] = torch.tensor(
        rng.standard_normal(1), dtype=torch.float32
    )
    if with_post:
        state["postwhiten.m"] = torch.tensor(
            rng.standard_normal((1, D)) * 0.05, dtype=torch.float64
        )
        state["postwhiten.p"] = torch.tensor(
            rng.standard_normal((D, D)) * 0.1 + np.eye(D), dtype=torch.float64
        )
    # Frozen-backbone keys ride along in real checkpoints; must be ignored.
    state["backbone.patch_embed.proj.weight"] = torch.zeros(4, 3, 2, 2)
    return state


def _twin_forward(state, x):
    """Numpy twin of the upstream retrieval forward (f32, like our load)."""
    y = x
    if "prewhiten.p" in state:
        m = state["prewhiten.m"].numpy().astype(np.float32).reshape(-1)
        P = state["prewhiten.p"].numpy().astype(np.float32)
        y = (y - m) @ P
    if "projector.0.weight" in state:
        W = state["projector.0.weight"].numpy()
        b = state["projector.0.bias"].numpy()
        y = y @ W.T + b
    a = _softplus(y @ state["attention.weight"].numpy().T
                  + state["attention.bias"].numpy()) + 1e-6
    g = (a * y).sum(axis=0) / a.sum(axis=0)
    if "postwhiten.p" in state:
        m = state["postwhiten.m"].numpy().astype(np.float32).reshape(-1)
        P = state["postwhiten.p"].numpy().astype(np.float32)
        g = (g - m) @ P
    return y, a, g / max(np.linalg.norm(g), 1e-8)


@pytest.mark.parametrize(
    "with_pre,with_proj,with_post",
    [(True, True, True), (False, True, False), (True, False, True)],
)
def test_naver_pth_roundtrip_matches_twin(
    tmp_path, with_pre, with_proj, with_post
):
    rng = np.random.default_rng(7)
    state = _make_naver_state(rng, with_pre, with_proj, with_post)
    path = tmp_path / "retrieval_trainingfree.pth"
    torch.save({"model": state, "args": {"hdims": [D]}}, path)

    model = RetrievalModel.from_pretrained(
        backbone_dim=D, checkpoint=str(path)
    )
    x = rng.standard_normal((50, D)).astype(np.float32)
    y_exp, a_exp, sig_exp = _twin_forward(state, x)

    w, att = model.forward_features(x)
    sig = model.forward_global(x)
    np.testing.assert_allclose(np.asarray(w), y_exp, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(att), a_exp, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(sig), sig_exp, rtol=5e-4, atol=5e-4
    )
    assert abs(float(np.linalg.norm(np.asarray(sig))) - 1.0) < 1e-5


def test_multilayer_projector_rejected(tmp_path):
    rng = np.random.default_rng(3)
    state = _make_naver_state(rng)
    state["projector.3.weight"] = torch.zeros(D, D)
    state["projector.3.bias"] = torch.zeros(D)
    path = tmp_path / "multi.pth"
    torch.save({"model": state}, path)
    with pytest.raises(NotImplementedError, match="multi-layer projector"):
        RetrievalModel.from_pretrained(backbone_dim=D, checkpoint=str(path))


def test_unrecognized_keys_rejected(tmp_path):
    rng = np.random.default_rng(4)
    state = _make_naver_state(rng)
    state["mystery.scale"] = torch.ones(3)
    path = tmp_path / "bad.pth"
    torch.save({"model": state}, path)
    with pytest.raises(KeyError, match="unrecognized"):
        RetrievalModel.from_pretrained(backbone_dim=D, checkpoint=str(path))


def test_loaded_head_drives_retrieval_db(tmp_path):
    """The imported head must work end-to-end through RetrievalDatabase:
    re-querying a stored keyframe's own features ranks it first."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    from mast3r_slam_tpu.retrieval_db import RetrievalDatabase

    rng = np.random.default_rng(11)
    state = _make_naver_state(rng)
    path = tmp_path / "retrieval.pth"
    torch.save({"model": state}, path)

    db = RetrievalDatabase(model=None, backbone_dim=D, capacity=8)
    db.retrieval = RetrievalModel.from_pretrained(
        backbone_dim=D, checkpoint=str(path)
    )
    db.use_simple = False
    db._whitening_kf = 0  # keep the checkpoint whitening, no online refit
    feats = [
        jnp.asarray(rng.standard_normal((40, D)).astype(np.float32))
        for _ in range(3)
    ]
    for f in feats:
        db.update(SimpleNamespace(feat=f), add_after_query=True, k=2)
    topk = db.update(
        SimpleNamespace(feat=feats[1]), add_after_query=False, k=2,
        min_thresh=0.005,
    )
    assert topk and topk[0] == 1


def test_own_export_takes_generic_path_not_naver_mapper(tmp_path):
    """This repo's own exported RetrievalNet state dict carries
    postwhiten.weight/bias (Dense names) — the naver heuristic must NOT
    claim it (its markers are the .m/.p whitener tensors), so
    from_pretrained round-trips through the generic name-mapped loader."""
    import jax

    from mast3r_slam_tpu.models import io

    m = RetrievalModel.from_pretrained(backbone_dim=D)
    path = tmp_path / "head.npz"
    io.save_checkpoint(m.params, str(path))
    state = io.load_state_dict_file(str(path))
    assert not io.is_retrieval_state_dict(state)
    m2 = RetrievalModel.from_pretrained(backbone_dim=D, checkpoint=str(path))
    for a, b in zip(jax.tree.leaves(m.params), jax.tree.leaves(m2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_half_present_whitener_pair_rejected(tmp_path):
    """prewhiten.m without prewhiten.p must raise, not silently drop the
    mean subtraction (take() would otherwise mark it consumed)."""
    rng = np.random.default_rng(13)
    state = _make_naver_state(rng)
    del state["prewhiten.p"]
    path = tmp_path / "half.pth"
    torch.save(state, path)
    with pytest.raises(KeyError, match="prewhiten.m without prewhiten.p"):
        RetrievalModel.from_pretrained(backbone_dim=D, checkpoint=str(path))
