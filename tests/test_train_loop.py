"""Training driver: loop, checkpoint/resume determinism (parallel/trainer).

Resume must be exact: running 4 steps straight equals running 2 steps,
checkpointing, and resuming for 2 more — same per-step batches (batch_fn
seeded by step index), restored optimizer state, same final params.
"""

import jax
import numpy as np

from mast3r_slam_tpu.models.mast3r import MASt3RNet
from mast3r_slam_tpu.parallel.mesh import make_mesh
from mast3r_slam_tpu.parallel.trainer import synthetic_pair_batch, train_loop


def _batch_fn(h, w):
    return lambda i: synthetic_pair_batch(
        np.random.default_rng(100 + i), 4, h, w, m=8
    )


def test_resume_matches_straight_run(tiny_model, tmp_path):
    mesh = make_mesh(4, tp=2)
    h, w = tiny_model._out_hw
    net = MASt3RNet(tiny_model.cfg)
    bf = _batch_fn(h, w)
    logs = []

    p_straight, l_straight = train_loop(
        net, tiny_model.params, mesh, 4, bf, log=logs.append
    )
    assert len(l_straight) == 4 and np.isfinite(l_straight).all()

    ckpt = str(tmp_path / "ck.npz")
    train_loop(
        net, tiny_model.params, mesh, 2, bf, ckpt_path=ckpt, log=logs.append
    )
    p_resumed, l_resumed = train_loop(
        net, tiny_model.params, mesh, 4, bf, ckpt_path=ckpt, log=logs.append
    )
    assert len(l_resumed) == 2  # steps 2 and 3 only
    np.testing.assert_allclose(l_resumed, l_straight[2:], rtol=1e-5)
    assert any("resumed" in s for s in logs)

    fl_s = jax.tree_util.tree_leaves(p_straight)
    fl_r = jax.tree_util.tree_leaves(p_resumed)
    for a, b in zip(fl_s[:3] + fl_s[-3:], fl_r[:3] + fl_r[-3:]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
