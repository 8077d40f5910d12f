"""Checkpoint IO: torch-naming round trip + preprocessing + retrieval net."""

import numpy as np
import jax.numpy as jnp
import pytest

from mast3r_slam_tpu.models import MASt3RConfig, MASt3RModel
from mast3r_slam_tpu.models.io import (
    export_torch_state_dict,
    import_torch_state_dict,
)
from mast3r_slam_tpu.models.preprocess import resize_img
from mast3r_slam_tpu.models.retrieval import RetrievalModel


class TestIO:
    def test_torch_roundtrip_bitwise(self):
        m = MASt3RModel.create(resolution=64, _test_cfg=MASt3RConfig.tiny())
        state = export_torch_state_dict(m.params)
        # names look like upstream
        assert any(k.startswith("enc_blocks.0.attn.qkv.weight") for k in state)
        assert any(k.startswith("dec_blocks2.") for k in state)
        assert "patch_embed.proj.weight" in state
        # conv layout is torch-style [out, in, kh, kw]
        w = state["patch_embed.proj.weight"]
        assert w.shape[-2:] == (16, 16)

        restored = import_torch_state_dict(m.params, state, strict=True)
        import jax

        for a, b in zip(jax.tree.leaves(m.params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_partial_load_keeps_init(self):
        m = MASt3RModel.create(resolution=64, _test_cfg=MASt3RConfig.tiny())
        state = export_torch_state_dict(m.params)
        key = "patch_embed.proj.weight"
        state_partial = {key: state[key] * 2.0}
        restored = import_torch_state_dict(m.params, state_partial, strict=False)
        r_state = export_torch_state_dict(restored)
        np.testing.assert_allclose(r_state[key], state[key] * 2.0)
        np.testing.assert_array_equal(
            r_state["dec_norm.weight"], state["dec_norm.weight"]
        )


class TestPreprocess:
    def test_512_landscape(self, rng):
        img = (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
        res = resize_img(img, 512)
        h, w = res["true_shape"][0]
        assert w == 512 and h % 16 == 0
        assert res["img"].shape == (1, h, w, 3)
        assert -1.0 <= res["img"].min() and res["img"].max() <= 1.0

    def test_224_square_crop(self, rng):
        img = (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
        res = resize_img(img, 224)
        h, w = res["true_shape"][0]
        assert h == w == 224

    def test_square_input_forced_4_3(self, rng):
        img = (rng.uniform(0, 255, (500, 500, 3))).astype(np.uint8)
        res = resize_img(img, 512)
        h, w = res["true_shape"][0]
        assert w > h  # forced landscape

    def test_transformation_returned(self, rng):
        img = (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
        _, (sw, sh, cw, ch) = resize_img(img, 512, return_transformation=True)
        assert sw == pytest.approx(640 / 512, rel=1e-3)


class TestRetrievalModel:
    def test_signature_contract(self, rng):
        model = RetrievalModel(backbone_dim=32)
        feat = jnp.asarray(rng.normal(size=(10, 32)).astype(np.float32))
        w, att = model.forward_features(feat)
        assert w.shape == (10, 32) and att.shape == (10, 1)
        assert float(att.min()) > 0
        sig = model.forward_global(feat)
        assert sig.shape == (32,)
        np.testing.assert_allclose(float(jnp.linalg.norm(sig)), 1.0, atol=1e-5)

    def test_identity_init_matches_weighted_mean(self, rng):
        """With identity whitening, the signature reduces to an attention-
        weighted mean — the graceful-degradation contract."""
        model = RetrievalModel(backbone_dim=16)
        feat = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
        sig = model.forward_global(feat)
        _, att = model.forward_features(feat)
        expect = np.sum(np.asarray(feat) * np.asarray(att), 0) / np.sum(np.asarray(att))
        expect /= np.linalg.norm(expect)
        np.testing.assert_allclose(np.asarray(sig), expect, atol=1e-5)
