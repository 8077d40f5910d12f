"""Batched multi-sequence tracking (serving mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.serving import BatchTracker


@pytest.fixture
def setup(tiny_model, rng):
    set_config(
        Config.from_dict(
            {
                # random-weight heads put the two views' pointmaps far apart;
                # open the occlusion gate (geometry is exercised by the
                # oracle tests — this one exercises the batching machinery)
                "matching": {"use_simple": True, "dist_thresh": 1e6},
                "tracking": {"min_match_frac": 0.01},
            }
        )
    )
    B = 3
    h, w = tiny_model._out_hw
    imgs = [
        jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
        for _ in range(B)
    ]
    feats, poss, Xs, Cs = [], [], [], []
    for img in imgs:
        f, p = tiny_model.encode(img)
        X, C = tiny_model.mono(f[0], p[0])
        feats.append(f[0])
        poss.append(p[0])
        Xs.append(X)
        Cs.append(C)
    return (
        tiny_model,
        imgs,
        jnp.stack(feats),
        jnp.stack(poss),
        jnp.stack(Xs),
        jnp.stack(Cs),
    )


class TestBatchTracker:
    def test_static_scenes_track_identity(self, setup):
        model, imgs, feats, poss, Xs, Cs = setup
        bt = BatchTracker(model)
        bt.init_from_keyframes(feats, poss, Xs, Cs)

        # re-feed the same frames: all sequences must track at identity
        for _ in range(2):
            out = bt.step(feats, poss)
        assert out["tracked"].all()
        poses = np.asarray(out["poses"])
        # rotation+translation must stay at identity; scale is unconstrained
        # between the two random-weight heads (correctly absorbed by Sim3)
        for b in range(poses.shape[0]):
            np.testing.assert_allclose(poses[b][:3], 0.0, atol=0.05)
            np.testing.assert_allclose(
                poses[b][3:7], [0, 0, 0, 1], atol=0.05
            )

    def test_per_sequence_isolation(self, setup, rng):
        """Corrupting one sequence's frame must not perturb the others."""
        model, imgs, feats, poss, Xs, Cs = setup
        bt = BatchTracker(model)
        bt.init_from_keyframes(feats, poss, Xs, Cs)
        h, w = model._out_hw
        other = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
        f_o, p_o = model.encode(other)
        mixed_feats = feats.at[1].set(f_o[0])
        out = bt.step(mixed_feats, poss)
        poses = np.asarray(out["poses"])
        for b in (0, 2):
            np.testing.assert_allclose(poses[b][:3], 0.0, atol=0.05)
            np.testing.assert_allclose(poses[b][3:7], [0, 0, 0, 1], atol=0.05)

    def test_slot_lifecycle(self, setup, rng):
        """Continuous batching: close a slot (masked out of stats), open a
        NEW sequence in it mid-stream, and verify the join neither breaks
        its own tracking nor perturbs the other lanes."""
        model, imgs, feats, poss, Xs, Cs = setup
        bt = BatchTracker(model)
        bt.init_from_keyframes(feats, poss, Xs, Cs)

        final_pose = bt.close_slot(1)
        assert final_pose.shape == (8,)
        out = bt.step(feats, poss)
        assert out["tracked"][0] and out["tracked"][2]
        assert not out["tracked"][1] and not out["new_kf"][1]
        assert list(out["active"]) == [True, False, True]

        # a new sequence joins slot 1
        h, w = model._out_hw
        img = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
        f, p = model.encode(img)
        X, C = model.mono(f[0], p[0])
        bt.open_slot(1, f[0], p[0], X, C)
        out = bt.step(feats.at[1].set(f[0]), poss.at[1].set(p[0]))
        assert out["tracked"].all() and out["active"].all()
        poses = np.asarray(out["poses"])
        for b in range(3):  # joiner at identity, others unperturbed
            np.testing.assert_allclose(poses[b][:3], 0.0, atol=0.05)
            np.testing.assert_allclose(poses[b][3:7], [0, 0, 0, 1], atol=0.05)

    def test_image_input_matches_feature_input(self, setup):
        """step_images_async (in-dispatch batched encode from raw [0,1]
        images) must match encode-then-step_async to float tolerance."""
        model, imgs, feats, poss, Xs, Cs = setup
        bt_f = BatchTracker(model)
        bt_f.init_from_keyframes(feats, poss, Xs, Cs)
        bt_i = BatchTracker(model)
        bt_i.init_from_keyframes(feats, poss, Xs, Cs)

        new = jnp.concatenate(imgs, axis=0)  # [B, h, w, 3] in [-1, 1]
        f2, p2 = model.encode(new)
        s_f = bt_f.step_async(f2, p2)
        # the image program maps [0,1] -> [-1,1] itself
        s_i = bt_i.step_images_async((new + 1.0) * 0.5)
        np.testing.assert_allclose(
            np.asarray(s_i), np.asarray(s_f), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(bt_i.state.T_WC), np.asarray(bt_f.state.T_WC),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(bt_i.state.kf_X), np.asarray(bt_f.state.kf_X),
            rtol=2e-3, atol=2e-4,
        )

    def test_keyframe_promotion(self, setup):
        model, imgs, feats, poss, Xs, Cs = setup
        bt = BatchTracker(model)
        bt.init_from_keyframes(feats, poss, Xs, Cs)
        bt.step(feats, poss)
        # promote sequences 0 and 2
        sel = np.asarray([0, 2])
        bt.update_keyframes(sel, feats[sel], poss[sel], Xs[sel], Cs[sel])
        assert float(bt.state.kf_N[0]) == 1.0
        assert float(bt.state.fr_N[0]) == 0.0
        out = bt.step(feats, poss)
        assert out["tracked"].all()


class TestSingleSequenceParity:
    def test_matches_frame_tracker(self, tiny_model, rng):
        """B=1 serving equals the single-sequence fused tracker on the same
        frame: same decode, same fresh-frame fusion, same GN solve — the
        batching machinery must be semantically invisible. (Regression for
        the cross-frame canonical-state fusion serving used to do.)"""
        from mast3r_slam_tpu.frame import Frame, Keyframes
        from mast3r_slam_tpu.tracker import FrameTracker

        set_config(
            Config.from_dict(
                {
                    "matching": {"use_simple": True, "dist_thresh": 1e6},
                    "tracking": {"min_match_frac": 0.0},
                }
            )
        )
        h, w = tiny_model._out_hw
        imgA = jnp.asarray(np.asarray(rng.uniform(-1, 1, (1, h, w, 3)), np.float32))
        imgB = jnp.asarray(np.asarray(rng.uniform(-1, 1, (1, h, w, 3)), np.float32))
        fA, pA = tiny_model.encode(imgA)
        XA, CA = tiny_model.mono(fA[0], pA[0])
        fB, pB = tiny_model.encode(imgB)

        kfs = Keyframes(
            h, w, capacity=4, feat_dim=fA.shape[-1], num_patches=fA.shape[1]
        )
        frameA = Frame(frame_id=0, img=imgA[0])
        frameA.X_canon, frameA.C = XA, CA
        frameA.feat, frameA.pos = fA[0], pA[0]
        frameA.N = frameA.N_updates = 1
        kfs.append(frameA)
        frameB = Frame(frame_id=1, img=imgB[0])
        frameB.feat, frameB.pos = fB[0], pB[0]
        tracker = FrameTracker(tiny_model, kfs)
        tracker.track(frameB, None)

        bt = BatchTracker(tiny_model)
        bt.init_from_keyframes(fA, pA, XA[None], CA[None])
        out = bt.step(fB, pB)
        assert bool(out["tracked"][0])
        np.testing.assert_allclose(
            np.asarray(out["poses"][0]),
            np.asarray(frameB.T_WC),
            rtol=1e-5,
            atol=1e-5,
        )


class TestShardedServing:
    def test_dp_sharded_matches_unsharded(self, tiny_model, rng):
        """Sequences sharded over an (8, 1) dp mesh produce the SAME poses
        as the single-device batch — the multi-chip serving path."""
        import jax
        from mast3r_slam_tpu.parallel.mesh import make_mesh

        set_config(
            Config.from_dict(
                {
                    "matching": {"use_simple": True, "dist_thresh": 1e6},
                    "tracking": {"min_match_frac": 0.01},
                }
            )
        )
        B = 8
        h, w = tiny_model._out_hw
        feats, poss, Xs, Cs = [], [], [], []
        for _ in range(B):
            img = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
            f, p = tiny_model.encode(img)
            X, C = tiny_model.mono(f[0], p[0])
            feats.append(f[0]); poss.append(p[0]); Xs.append(X); Cs.append(C)
        feats, poss = jnp.stack(feats), jnp.stack(poss)
        Xs, Cs = jnp.stack(Xs), jnp.stack(Cs)

        ref = BatchTracker(tiny_model)
        ref.init_from_keyframes(feats, poss, Xs, Cs)
        out_ref = ref.step(feats, poss)

        mesh = make_mesh(8, tp=1)
        bt = BatchTracker(tiny_model, mesh=mesh)
        bt.init_from_keyframes(feats, poss, Xs, Cs)
        out = bt.step(feats, poss)

        # state is actually dp-sharded across the 8 virtual devices
        shard_devs = {s.device for s in bt.state.kf_X.addressable_shards}
        assert len(shard_devs) == 8

        np.testing.assert_allclose(
            np.asarray(out["poses"]), np.asarray(out_ref["poses"]), atol=1e-4
        )
        np.testing.assert_array_equal(out["tracked"], out_ref["tracked"])

    def test_slot_lifecycle_dp_sharded(self, tiny_model, rng):
        """open_slot/close_slot on a dp-sharded tracker: the scatter
        updates must land in the right shard and leave other lanes
        bit-identical to an unsharded tracker doing the same churn."""
        from mast3r_slam_tpu.parallel.mesh import make_mesh

        set_config(
            Config.from_dict(
                {
                    "matching": {"use_simple": True, "dist_thresh": 1e6},
                    "tracking": {"min_match_frac": 0.01},
                }
            )
        )
        B = 4
        h, w = tiny_model._out_hw
        feats, poss, Xs, Cs = [], [], [], []
        for _ in range(B + 1):  # one extra sequence for the mid-run join
            img = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
            f, p = tiny_model.encode(img)
            X, C = tiny_model.mono(f[0], p[0])
            feats.append(f[0]); poss.append(p[0]); Xs.append(X); Cs.append(C)
        extra = (feats[B], poss[B], Xs[B], Cs[B])
        feats, poss = jnp.stack(feats[:B]), jnp.stack(poss[:B])
        Xs, Cs = jnp.stack(Xs[:B]), jnp.stack(Cs[:B])

        def churn(bt):
            bt.init_from_keyframes(feats, poss, Xs, Cs)
            bt.step(feats, poss)
            bt.close_slot(2)
            bt.open_slot(2, *extra)
            return bt.step(
                feats.at[2].set(extra[0]), poss.at[2].set(extra[1])
            )

        out_ref = churn(BatchTracker(tiny_model))
        out = churn(BatchTracker(tiny_model, mesh=make_mesh(4, tp=1)))
        np.testing.assert_allclose(
            np.asarray(out["poses"]), np.asarray(out_ref["poses"]), atol=1e-4
        )
        np.testing.assert_array_equal(out["tracked"], out_ref["tracked"])
        assert out["tracked"].all()

    def test_dp_tp_sharded_matches_unsharded(self, tiny_model, rng):
        """(dp=2, tp=4) mesh: sequences dp-sharded AND model weights
        Megatron-sharded over tp — poses must match the single-device
        batch (model parallelism is numerically transparent)."""
        import jax
        from mast3r_slam_tpu.parallel.mesh import make_mesh
        from mast3r_slam_tpu.parallel.sharding import infer_param_shardings

        set_config(
            Config.from_dict(
                {
                    "matching": {"use_simple": True, "dist_thresh": 1e6},
                    "tracking": {"min_match_frac": 0.01},
                }
            )
        )
        B = 4
        h, w = tiny_model._out_hw
        feats, poss, Xs, Cs = [], [], [], []
        for _ in range(B):
            img = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
            f, p = tiny_model.encode(img)
            X, C = tiny_model.mono(f[0], p[0])
            feats.append(f[0]); poss.append(p[0]); Xs.append(X); Cs.append(C)
        feats, poss = jnp.stack(feats), jnp.stack(poss)
        Xs, Cs = jnp.stack(Xs), jnp.stack(Cs)

        ref = BatchTracker(tiny_model)
        ref.init_from_keyframes(feats, poss, Xs, Cs)
        out_ref = ref.step(feats, poss)

        mesh = make_mesh(8, tp=4)
        assert dict(mesh.shape) == {"dp": 2, "tp": 4}
        # sanity: the inferred specs actually split something over tp
        specs = infer_param_shardings(tiny_model.params, mesh)
        leaves = jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: hasattr(x, "spec")
        )
        assert any("tp" in str(s.spec) for s in leaves)

        bt = BatchTracker(tiny_model, mesh=mesh)
        bt.init_from_keyframes(feats, poss, Xs, Cs)
        out = bt.step(feats, poss)
        np.testing.assert_allclose(
            np.asarray(out["poses"]), np.asarray(out_ref["poses"]), atol=1e-4
        )
        np.testing.assert_array_equal(out["tracked"], out_ref["tracked"])

    def test_sharded_keyframe_promotion(self, tiny_model, rng):
        """update_keyframes on dp-sharded state: scatter into sharded
        arenas must keep tracking working and stay finite."""
        from mast3r_slam_tpu.parallel.mesh import make_mesh

        set_config(
            Config.from_dict(
                {
                    "matching": {"use_simple": True, "dist_thresh": 1e6},
                    "tracking": {"min_match_frac": 0.0},
                }
            )
        )
        B = 8
        h, w = tiny_model._out_hw
        img = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
        f, p = tiny_model.encode(img)
        X, C = tiny_model.mono(f[0], p[0])
        tile = lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim)
        bt = BatchTracker(tiny_model, mesh=make_mesh(8, tp=1))
        bt.init_from_keyframes(tile(f[0]), tile(p[0]), tile(X), tile(C))
        bt.step(tile(f[0]), tile(p[0]))
        bt.update_keyframes(
            [1, 3],
            jnp.stack([f[0]] * 2), jnp.stack([p[0]] * 2),
            jnp.stack([X] * 2), jnp.stack([C] * 2),
        )
        out = bt.step(tile(f[0]), tile(p[0]))
        assert np.isfinite(np.asarray(out["poses"])).all()
        assert out["tracked"].all()
        assert float(bt.state.fr_N[1]) == 1.0  # reset then re-fused once

    def test_indivisible_batch_rejected(self, tiny_model, rng):
        from mast3r_slam_tpu.parallel.mesh import make_mesh

        set_config(Config.from_dict({}))
        mesh = make_mesh(8, tp=1)
        bt = BatchTracker(tiny_model, mesh=mesh)
        h, w = tiny_model._out_hw
        with pytest.raises(ValueError, match="divisible"):
            bt.init_from_keyframes(
                jnp.zeros((3, 16, 32)), jnp.zeros((3, 16, 2), jnp.int32),
                jnp.zeros((3, h * w, 3)), jnp.zeros((3, h * w, 1)),
            )


class TestMicrobatchScan:
    def test_microbatch_matches_flat(self, tiny_model, rng):
        """The in-dispatch microbatch scan (serving_microbatch) must be a
        pure scheduling change: B=6 scanned in chunks of 2 produces the
        SAME poses/stats as the flat vmap."""
        set_config(
            Config.from_dict(
                {
                    "matching": {"use_simple": True, "dist_thresh": 1e6},
                    "tracking": {"min_match_frac": 0.01},
                }
            )
        )
        B = 6
        h, w = tiny_model._out_hw
        feats, poss, Xs, Cs = [], [], [], []
        for _ in range(B):
            img = jnp.asarray(
                rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
            )
            f, p = tiny_model.encode(img)
            X, C = tiny_model.mono(f[0], p[0])
            feats.append(f[0]); poss.append(p[0]); Xs.append(X); Cs.append(C)
        feats, poss = jnp.stack(feats), jnp.stack(poss)
        Xs, Cs = jnp.stack(Xs), jnp.stack(Cs)

        flat = BatchTracker(tiny_model, microbatch=0)
        flat.init_from_keyframes(feats, poss, Xs, Cs)
        out_flat = flat.step(feats, poss)

        mb = BatchTracker(tiny_model, microbatch=2)
        assert mb.microbatch == 2
        mb.init_from_keyframes(feats, poss, Xs, Cs)
        out_mb = mb.step(feats, poss)

        np.testing.assert_allclose(
            np.asarray(out_mb["poses"]), np.asarray(out_flat["poses"]),
            atol=1e-5,
        )
        np.testing.assert_array_equal(out_mb["tracked"], out_flat["tracked"])
        # scanned vs flat programs fuse/reassociate differently: equal up
        # to fp32 reassociation noise
        np.testing.assert_allclose(
            np.asarray(mb.state.kf_X), np.asarray(flat.state.kf_X),
            rtol=1e-4, atol=1e-4,
        )

    def test_scan_unroll_matches_plain_scan(self, tiny_model, rng):
        """runtime.serving_scan_unroll is a pure scheduling change: B=8 in
        chunks of 2 with unroll=2 produces the same poses/stats as the
        plain (unroll=1) scan."""
        B = 8
        h, w = tiny_model._out_hw
        feats, poss, Xs, Cs = [], [], [], []
        for _ in range(B):
            img = jnp.asarray(
                rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
            )
            f, p = tiny_model.encode(img)
            X, C = tiny_model.mono(f[0], p[0])
            feats.append(f[0]); poss.append(p[0]); Xs.append(X); Cs.append(C)
        feats, poss = jnp.stack(feats), jnp.stack(poss)
        Xs, Cs = jnp.stack(Xs), jnp.stack(Cs)

        set_config(
            Config.from_dict(
                {
                    "matching": {"use_simple": True, "dist_thresh": 1e6},
                    "tracking": {"min_match_frac": 0.01},
                }
            )
        )
        plain = BatchTracker(tiny_model, microbatch=2)
        plain.init_from_keyframes(feats, poss, Xs, Cs)
        out_plain = plain.step(feats, poss)

        set_config(
            Config.from_dict(
                {
                    "runtime": {"serving_scan_unroll": 2},
                    "matching": {"use_simple": True, "dist_thresh": 1e6},
                    "tracking": {"min_match_frac": 0.01},
                }
            )
        )
        un = BatchTracker(tiny_model, microbatch=2)
        assert un.scan_unroll == 2
        un.init_from_keyframes(feats, poss, Xs, Cs)
        out_un = un.step(feats, poss)

        np.testing.assert_allclose(
            np.asarray(out_un["poses"]), np.asarray(out_plain["poses"]),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            out_un["tracked"], out_plain["tracked"]
        )
        np.testing.assert_allclose(
            np.asarray(un.state.kf_X), np.asarray(plain.state.kf_X),
            rtol=1e-4, atol=1e-4,
        )

    def test_indivisible_microbatch_runs_flat(self, tiny_model):
        """Config-default microbatch that doesn't divide B falls back to
        one flat vmap (B < microbatch is the common small-batch case)."""
        set_config(Config.from_dict({}))
        bt = BatchTracker(tiny_model)  # default serving_microbatch=4
        assert bt.microbatch == 4  # program falls back internally for B<4

    def test_explicit_microbatch_mesh_mismatch_raises(self, tiny_model):
        from mast3r_slam_tpu.parallel.mesh import make_mesh

        set_config(Config.from_dict({}))
        with pytest.raises(ValueError, match="microbatch"):
            BatchTracker(tiny_model, mesh=make_mesh(8, tp=1), microbatch=3)


class TestAsyncServing:
    def test_async_chain_matches_sync_steps(self, setup, rng):
        """step_async dispatches batches back-to-back with zero host syncs
        (the tracked gate runs on device); resolving the stats handles at
        the END must reproduce the synchronous step-by-step results."""
        model, imgs, feats, poss, Xs, Cs = setup
        h, w = model._out_hw
        B = feats.shape[0]

        frames = [
            jnp.stack([
                jnp.asarray(rng.uniform(-1, 1, (h, w, 3)).astype(np.float32))
                for _ in range(B)
            ])
            for _ in range(3)
        ]
        enc = [model.encode(f) for f in frames]

        sync = BatchTracker(model)
        sync.init_from_keyframes(feats, poss, Xs, Cs)
        sync_out = [sync.step(f, p) for f, p in enc]

        asy = BatchTracker(model)
        asy.init_from_keyframes(feats, poss, Xs, Cs)
        handles = [asy.step_async(f, p) for f, p in enc]  # no host syncs
        final = asy.resolve_stats(handles[-1])

        np.testing.assert_allclose(
            np.asarray(final["poses"]), np.asarray(sync_out[-1]["poses"]),
            atol=1e-5,
        )
        for hnd, ref in zip(handles, sync_out):
            got = np.asarray(hnd)  # [B, 5]
            np.testing.assert_allclose(got[:, 0], ref["match_frac"], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(asy.state.kf_X), np.asarray(sync.state.kf_X), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(asy.state.fr_N), np.asarray(sync.state.fr_N), atol=1e-6
        )
