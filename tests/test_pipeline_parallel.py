"""Pipeline-parallel encoder (GPipe over mesh axis "pp").

Equality contract: the pipelined encode must reproduce the unsharded
`MASt3RModel.encode` tokens on the virtual CPU mesh — the schedule
(stage slabs, ppermute ring, bubble steps) must be invisible in the
output. Reference contrast: the reference has no distributed execution
at all (SURVEY.md §2.9).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.models import MASt3RConfig, MASt3RModel
from mast3r_slam_tpu.parallel.pipeline import (
    encoder_stage_params,
    make_pipeline_mesh,
    pipelined_encode,
)


def _model(depth: int):
    cfg = dataclasses.replace(MASt3RConfig.tiny(), enc_depth=depth)
    return MASt3RModel.create(resolution=32, _test_cfg=cfg)


@pytest.fixture(scope="module")
def model4():
    return _model(depth=4)


def _imgs(rng, b, hw):
    return jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)).astype(np.float32))


class TestStageParams:
    def test_slab_shapes(self, model4):
        slabs = encoder_stage_params(model4.params, 2)
        leaves = jax.tree.leaves(slabs)
        assert all(l.shape[:2] == (2, 2) for l in leaves)  # [P, L, ...]

    def test_depth_not_divisible_raises(self, model4):
        with pytest.raises(ValueError, match="not divisible"):
            encoder_stage_params(model4.params, 3)

    def test_block_order_is_numeric(self, model4):
        # blocks_10 must not sort before blocks_2 (string sort trap).
        enc = model4.params["params"]["encoder"]
        keys = sorted(
            (k for k in enc if k.startswith("blocks_")),
            key=lambda k: int(k.rsplit("_", 1)[1]),
        )
        assert keys == [f"blocks_{i}" for i in range(len(keys))]


class TestPipelinedEncode:
    @pytest.mark.parametrize("n_stages,m", [(4, 4), (2, 4), (2, 2)])
    def test_matches_unsharded(self, model4, rng, n_stages, m):
        imgs = _imgs(rng, b=4, hw=32)
        ref, pos_ref = model4.encode(imgs)
        mesh = make_pipeline_mesh(n_stages)
        tok, pos = pipelined_encode(model4.cfg, model4.params, imgs, mesh, m)
        np.testing.assert_allclose(
            np.asarray(tok), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(pos), np.asarray(pos_ref))

    def test_more_microbatches_than_stages(self, model4, rng):
        # M > P: the steady-state regime (bubble fraction (P-1)/(M+P-1)).
        imgs = _imgs(rng, b=8, hw=32)
        ref, _ = model4.encode(imgs)
        mesh = make_pipeline_mesh(2)
        tok, _ = pipelined_encode(model4.cfg, model4.params, imgs, mesh, 8)
        np.testing.assert_allclose(
            np.asarray(tok), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_batch_not_divisible_raises(self, model4, rng):
        imgs = _imgs(rng, b=3, hw=32)
        mesh = make_pipeline_mesh(2)
        with pytest.raises(ValueError, match="microbatch"):
            pipelined_encode(model4.cfg, model4.params, imgs, mesh, 2)

    def test_under_jit(self, model4, rng):
        from mast3r_slam_tpu.parallel.pipeline import jit_pipelined_encode

        imgs = _imgs(rng, b=4, hw=32)
        ref, _ = model4.encode(imgs)
        mesh = make_pipeline_mesh(2)
        fn = jit_pipelined_encode(model4.cfg, mesh, 2)
        tok, _ = fn(model4.params, imgs)
        np.testing.assert_allclose(
            np.asarray(tok), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
