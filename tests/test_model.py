"""MASt3R network: shapes, output-contract invariants, cached-feature decode
equivalence, jit stability. (Runs the tiny structure-identical config.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.models import MASt3RConfig, MASt3RModel


# tiny_model fixture: session-scoped in conftest.py


@pytest.fixture(scope="module")
def imgs(tiny_model):
    rng = np.random.default_rng(0)
    h, w = tiny_model._out_hw
    mk = lambda: jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
    return mk(), mk()


class TestForward:
    def test_output_contract(self, tiny_model, imgs):
        img1, img2 = imgs
        out1, out2 = tiny_model.reconstruct(img1, img2)
        h, w = tiny_model._out_hw
        for out in (out1, out2):
            assert out["pts3d"].shape == (1, h, w, 3)
            assert out["conf"].shape == (1, h, w)
            assert out["desc"].shape == (1, h, w, 24)
            assert out["desc_conf"].shape == (1, h, w)
            # conf = 1+exp(x) >= 1; desc_conf = exp(x) > 0 (upstream
            # desc_conf_mode ('exp', 0, inf) — different lower bound)
            assert float(jnp.min(out["conf"])) >= 1.0
            assert float(jnp.min(out["desc_conf"])) > 0.0
            # descriptors are unit-norm
            norms = jnp.linalg.norm(out["desc"], axis=-1)
            np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-3)

    def test_two_views_differ(self, tiny_model, imgs):
        out1, out2 = tiny_model.reconstruct(*imgs)
        assert not np.allclose(np.asarray(out1["pts3d"]), np.asarray(out2["pts3d"]))

    def test_cached_decode_matches_full_forward(self, tiny_model, imgs):
        """encode+decode must equal the fused reconstruct (the backend's
        symmetric matching depends on this path; the reference stubbed it)."""
        img1, img2 = imgs
        f1, p1 = tiny_model.encode(img1)
        f2, p2 = tiny_model.encode(img2)
        out_a, out_b = tiny_model.decode(f1, p1, f2, p2)
        ref_a, ref_b = tiny_model.reconstruct(img1, img2)
        np.testing.assert_allclose(
            np.asarray(out_a["pts3d"]), np.asarray(ref_a["pts3d"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_b["desc"]), np.asarray(ref_b["desc"]), atol=1e-5
        )

    def test_batched_pairs(self, tiny_model, imgs):
        """Symmetric inference = one decode at batch 2; per-item results must
        match the single-pair results."""
        img1, img2 = imgs
        b1 = jnp.concatenate([img1, img2], axis=0)
        b2 = jnp.concatenate([img2, img1], axis=0)
        out_f, out_s = tiny_model.reconstruct(b1, b2)
        ref_ij = tiny_model.reconstruct(img1, img2)
        ref_ji = tiny_model.reconstruct(img2, img1)
        np.testing.assert_allclose(
            np.asarray(out_f["pts3d"][0]), np.asarray(ref_ij[0]["pts3d"][0]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_f["pts3d"][1]), np.asarray(ref_ji[0]["pts3d"][0]), atol=1e-5
        )

    def test_deterministic(self, tiny_model, imgs):
        a, _ = tiny_model.reconstruct(*imgs)
        b, _ = tiny_model.reconstruct(*imgs)
        np.testing.assert_array_equal(np.asarray(a["pts3d"]), np.asarray(b["pts3d"]))


class TestConfigs:
    def test_dpt_head_tiny(self):
        cfg = MASt3RConfig(
            enc_embed_dim=64,
            enc_depth=2,
            enc_num_heads=2,
            patch_size=16,
            dec_embed_dim=48,
            dec_depth=4,
            dec_num_heads=2,
            head_type="dpt",
            dtype=jnp.float32,
        )
        m = MASt3RModel.create(resolution=64, _test_cfg=cfg)
        h, w = m._out_hw
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
        out1, _ = m.reconstruct(img, img)
        assert out1["pts3d"].shape == (1, h, w, 3)

    def test_family_configs_exist(self):
        full = MASt3RConfig.mast3r_full()
        assert (full.enc_embed_dim, full.enc_depth, full.patch_size) == (1024, 24, 16)
        dune = MASt3RConfig.dunemast3r("small")
        assert (dune.enc_embed_dim, dune.patch_size) == (384, 14)

    def test_patch14_dune_structure(self, rng):
        """Tiny DUNE-style variant (patch 14 -> non-128-multiple tokens)."""
        import jax.numpy as jnp

        cfg = MASt3RConfig(
            enc_embed_dim=56,
            enc_depth=2,
            enc_num_heads=2,
            patch_size=14,
            dec_embed_dim=40,
            dec_depth=2,
            dec_num_heads=2,
            head_type="linear",
            dtype=jnp.float32,
        )
        m = MASt3RModel.create(resolution=112, _test_cfg=cfg)
        h, w = m._out_hw
        assert h % 14 == 0 and w % 14 == 0
        img = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
        )
        out1, _ = m.reconstruct(img, img)
        assert out1["pts3d"].shape == (1, h, w, 3)

    def test_remat_preserves_params_and_outputs(self, rng):
        import dataclasses
        import jax.numpy as jnp

        cfg = MASt3RConfig.tiny()
        m = MASt3RModel.create(resolution=64, _test_cfg=cfg, seed=3)
        cfg_r = dataclasses.replace(cfg, remat=True)
        mr = MASt3RModel.create(resolution=64, _test_cfg=cfg_r, seed=3)
        import jax

        assert jax.tree_util.tree_structure(m.params) == jax.tree_util.tree_structure(
            mr.params
        )
        h, w = m._out_hw
        img = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
        )
        a, _ = m.reconstruct(img, img)
        b, _ = mr.reconstruct(img, img)
        np.testing.assert_allclose(
            np.asarray(a["pts3d"]), np.asarray(b["pts3d"]), atol=1e-5
        )
