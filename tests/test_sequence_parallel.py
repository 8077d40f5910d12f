"""Sequence-parallel encoder (token axis sharded over mesh axis "sp").

Equality contract: sharding the residual stream's token axis must be
invisible in the output — GSPMD inserts the attention gathers, the math
is unchanged.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from mast3r_slam_tpu.models import MASt3RConfig, MASt3RModel
from mast3r_slam_tpu.parallel import make_mesh
from mast3r_slam_tpu.parallel.sequence import (
    jit_sequence_parallel_encode,
    sequence_parallel_encode,
)


@pytest.fixture(scope="module")
def model4():
    cfg = dataclasses.replace(MASt3RConfig.tiny(), enc_depth=4)
    return MASt3RModel.create(resolution=32, _test_cfg=cfg)


def _imgs(rng, b, hw=32):
    return jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)).astype(np.float32))


class TestSequenceParallelEncode:
    def test_matches_unsharded(self, model4, rng):
        imgs = _imgs(rng, b=4)
        ref, pos_ref = model4.encode(imgs)
        mesh = make_mesh(8, tp=4, axis_names=("dp", "sp"))
        tok, pos = sequence_parallel_encode(model4.cfg, model4.params, imgs, mesh)
        np.testing.assert_allclose(
            np.asarray(tok), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(pos), np.asarray(pos_ref))

    def test_sp_only_mesh(self, model4, rng):
        # Replicated batch, tokens sharded over all 8 devices... token count
        # (4 @32px/p16) is below 8, exercising the uneven-shard path GSPMD
        # must still handle.
        imgs = _imgs(rng, b=2)
        ref, _ = model4.encode(imgs)
        mesh = make_mesh(8, tp=2, axis_names=("dp", "sp"))
        tok, _ = sequence_parallel_encode(
            model4.cfg, model4.params, imgs, mesh, batch_axis=None
        )
        np.testing.assert_allclose(
            np.asarray(tok), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_under_jit(self, model4, rng):
        imgs = _imgs(rng, b=4)
        ref, _ = model4.encode(imgs)
        mesh = make_mesh(8, tp=4, axis_names=("dp", "sp"))
        fn = jit_sequence_parallel_encode(model4.cfg, mesh)
        tok, _ = fn(model4.params, imgs)
        np.testing.assert_allclose(
            np.asarray(tok), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
