"""Multi-chip: mesh construction, TP shardings, sharded train step on the
8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from mast3r_slam_tpu.models import MASt3RConfig, MASt3RModel
from mast3r_slam_tpu.models.mast3r import MASt3RNet
from mast3r_slam_tpu.parallel import (
    infer_param_shardings,
    make_mesh,
    make_train_step,
    mast3r_loss,
    shard_params,
)


@pytest.fixture(scope="module")
def tiny(tiny_model):
    return tiny_model


def _batch(rng, h, w, b=2, m=16):
    n = h * w
    return dict(
        img1=jnp.asarray(rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)),
        img2=jnp.asarray(rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)),
        gt_pts1=jnp.asarray(rng.normal(size=(b, h, w, 3)).astype(np.float32)),
        gt_pts2=jnp.asarray(rng.normal(size=(b, h, w, 3)).astype(np.float32)),
        valid1=jnp.ones((b, h, w), bool),
        valid2=jnp.ones((b, h, w), bool),
        corr_idx1=jnp.asarray(rng.integers(0, n, (b, m)), jnp.int32),
        corr_idx2=jnp.asarray(rng.integers(0, n, (b, m)), jnp.int32),
        corr_valid=jnp.ones((b, m), bool),
    )


class TestMesh:
    def test_shapes(self):
        mesh = make_mesh(8)
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("dp", "tp")
        assert mesh.shape["tp"] in (2, 4)

    def test_single_device(self):
        mesh = make_mesh(1)
        assert mesh.shape["dp"] == 1 and mesh.shape["tp"] == 1


class TestShardings:
    def test_tp_rules(self, tiny):
        mesh = make_mesh(8)
        sh = infer_param_shardings(tiny.params, mesh)
        flat = jax.tree_util.tree_flatten_with_path(sh)[0]
        by_name = {
            ".".join(p.key if hasattr(p, "key") else str(p) for p in path): s
            for path, s in flat
        }
        qkv = [v for k, v in by_name.items() if "attn.qkv.kernel" in k][0]
        assert qkv.spec == P(None, "tp")
        fc2 = [v for k, v in by_name.items() if "mlp.fc2.kernel" in k][0]
        assert fc2.spec == P("tp", None)
        norm = [v for k, v in by_name.items() if "norm1.scale" in k][0]
        assert norm.spec == P()

    def test_sharded_forward_matches_single(self, tiny, rng):
        """The sharded model must produce the same outputs."""
        mesh = make_mesh(8)
        h, w = tiny._out_hw
        img = jnp.asarray(rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32))
        ref1, _ = tiny.reconstruct(img, img)
        params_sh = shard_params(tiny.params, mesh)
        out1, _ = jax.jit(tiny.net.apply)(params_sh, img, img)
        np.testing.assert_allclose(
            np.asarray(out1["pts3d"]), np.asarray(ref1["pts3d"]), atol=2e-4
        )

    def test_tp_rules_see_through_int8_quant(self, rng):
        """int8 weight streaming wraps kernels one path level deeper
        ({kernel: {__w8__, scale}}); the TP rules must shard the int8
        payload like the kernel it replaced (and the per-output-channel
        scale along the output axis for column-parallel), and the sharded
        quantized forward must match the single-device quantized one."""
        quant = MASt3RModel.create(
            resolution=64, _test_cfg=MASt3RConfig.tiny()
        )
        quant.quantize_weights("int8", min_elems=1024)
        mesh = make_mesh(8)
        sh = infer_param_shardings(quant.params, mesh)
        flat = jax.tree_util.tree_flatten_with_path(sh)[0]
        by_name = {
            ".".join(p.key if hasattr(p, "key") else str(p) for p in path): s
            for path, s in flat
        }
        qkv_q = [v for k, v in by_name.items()
                 if "attn.qkv.kernel.__w8__" in k][0]
        assert qkv_q.spec == P(None, "tp")
        qkv_s = [v for k, v in by_name.items()
                 if "attn.qkv.kernel.scale" in k][0]
        assert qkv_s.spec == P(None, "tp")
        fc2_q = [v for k, v in by_name.items()
                 if "mlp.fc2.kernel.__w8__" in k][0]
        assert fc2_q.spec == P("tp", None)
        fc2_s = [v for k, v in by_name.items()
                 if "mlp.fc2.kernel.scale" in k][0]
        assert fc2_s.spec == P()

        h, w = quant._out_hw
        img = jnp.asarray(rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32))
        ref1, _ = quant.reconstruct(img, img)
        params_sh = shard_params(quant.params, mesh)
        out1, _ = jax.jit(quant.net.apply)(params_sh, img, img)
        np.testing.assert_allclose(
            np.asarray(out1["pts3d"]), np.asarray(ref1["pts3d"]), atol=2e-4
        )


class TestTrainStep:
    def test_loss_finite_and_grads_flow(self, tiny, rng):
        h, w = tiny._out_hw
        batch = _batch(rng, h, w)
        net = MASt3RNet(tiny.cfg)
        loss, aux = mast3r_loss(net, tiny.params, batch)
        assert np.isfinite(float(loss))
        assert float(aux["match"]) > 0

    def test_sharded_train_step_runs(self, tiny, rng):
        mesh = make_mesh(8)
        h, w = tiny._out_hw
        net = MASt3RNet(tiny.cfg)
        opt = optax.adamw(1e-4)
        step = make_train_step(net, opt, mesh, tiny.params)
        # Copy before sharding: the train step donates its inputs, and
        # device_put may alias buffers with the session-shared model.
        fresh = jax.tree.map(jnp.array, tiny.params)
        params = shard_params(fresh, mesh)
        opt_state = opt.init(params)
        batch = _batch(rng, h, w, b=4)
        new_params, opt_state, loss, aux = step(params, opt_state, batch)
        assert np.isfinite(float(loss))
        # one more step: loss should change (params updated)
        _, _, loss2, _ = step(new_params, opt_state, batch)
        assert float(loss2) != float(loss)
