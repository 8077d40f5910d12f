"""FrameTracker unit tests with a synthetic match function and known
ground-truth relative pose (no network involved)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.frame import Frame, Keyframes, create_frame
from mast3r_slam_tpu.lie import core as lie
from mast3r_slam_tpu.tracker import FrameTracker
from tests.fixtures import camera_K, world_surface


def _setup(rng, h=12, w=16, xi_mag=0.04):
    """Keyframe at identity sees surface S (camera coords Xk). The new frame
    sits at T_WCf_gt with pointmap Xf = T_gt^-1 . Xk. The fake matcher
    returns identity correspondences with perfect confidence."""
    set_config(
        Config.from_dict(
            {
                "runtime": {"keyframe_capacity": 8},
                "tracking": {"min_match_frac": 0.05},
            }
        )
    )
    K = camera_K(h, w)
    n = h * w
    Xk = jnp.asarray(world_surface(rng, h, w, K))
    xi = jnp.asarray(rng.normal(size=7) * xi_mag, jnp.float32)
    T_gt = lie.sim3_exp(xi)  # T_WCf (keyframe frame == world)
    Xf = lie.sim3_act(lie.sim3_inv(T_gt)[None], Xk)

    kfs = Keyframes(h, w)
    kf = create_frame(0, jnp.zeros((h, w, 3)))
    kf.X_canon, kf.C = Xk, jnp.full((n, 1), 5.0)
    kf.feat = jnp.zeros((4, 8))
    kf.pos = jnp.zeros((4, 2), jnp.int32)
    kf.N = kf.N_updates = 1
    kfs.append(kf)

    frame = create_frame(1, jnp.zeros((h, w, 3)))

    def fake_match(model, fr, kfr, idx_i2j_init=None):
        idx = jnp.arange(n, dtype=jnp.int32)[None]
        valid = jnp.ones((1, n, 1), bool)
        ones = jnp.full((1, n, 1), 4.0)  # Q above the 1.5 gate
        conf = jnp.full((1, n, 1), 5.0)
        return (
            idx,
            valid,
            Xf[None],  # Xff: frame points in frame coords
            conf,  # Cff
            ones,  # Qff
            Xk[None],  # Xkf: keyframe points in frame coords? see note
            conf,  # Ckf
            ones,  # Qkf
        )

    return kfs, frame, fake_match, T_gt, Xk, Xf


class TestTrack:
    def test_recovers_pose(self, rng):
        kfs, frame, fake_match, T_gt, Xk, Xf = _setup(rng)
        tracker = FrameTracker(model=None, keyframes=kfs)
        new_kf, info, try_reloc = tracker.track(frame, fake_match)
        assert not try_reloc
        # T_WCf should equal T_gt (keyframe frame == world)
        rel = lie.sim3_mul(frame.T_WC, lie.sim3_inv(T_gt))
        err = float(jnp.linalg.norm(lie.sim3_log(rel)))
        assert err < 1e-3

    def test_low_overlap_triggers_reloc(self, rng):
        kfs, frame, fake_match, *_ = _setup(rng)

        def bad_match(model, fr, kfr, idx_i2j_init=None):
            out = list(fake_match(model, fr, kfr))
            n = out[1].shape[1]
            out[1] = jnp.zeros((1, n, 1), bool)  # no valid matches
            return tuple(out)

        tracker = FrameTracker(model=None, keyframes=kfs)
        new_kf, info, try_reloc = tracker.track(frame, bad_match)
        assert try_reloc and not new_kf

    def test_warm_start_indices_cached(self, rng):
        kfs, frame, fake_match, *_ = _setup(rng)
        tracker = FrameTracker(model=None, keyframes=kfs)
        tracker.track(frame, fake_match)
        assert tracker.idx_f2k is not None
        tracker.reset_idx_f2k()
        assert tracker.idx_f2k is None

    def test_keyframe_decision_on_poor_uniqueness(self, rng):
        kfs, frame, fake_match, T_gt, Xk, Xf = _setup(rng)
        n = Xk.shape[0]

        def degenerate_match(model, fr, kfr, idx_i2j_init=None):
            out = list(fake_match(model, fr, kfr))
            # every keyframe pixel matches frame pixel 0 -> unique_frac ~ 0
            out[0] = jnp.zeros((1, n), jnp.int32)
            out[2] = jnp.broadcast_to(Xf[0:1][:, :1], (1, n, 3)).reshape(1, n, 3)
            return tuple(out)

        tracker = FrameTracker(model=None, keyframes=kfs)
        new_kf, _, try_reloc = tracker.track(frame, degenerate_match)
        if not try_reloc:
            assert new_kf  # uniqueness collapse must trigger a new keyframe


class TestChainPoseCorrections:
    """Backend corrections vs an in-flight chain: a correction spanning two
    window drains must be applied exactly once (the drained window's pose
    belief predates corrections applied at later dispatches, so the drain
    must bring it up to date before measuring a new arena delta)."""

    @staticmethod
    def _tracker(rng):
        kfs, frame, fake_match, T_gt, Xk, Xf = _setup(rng)
        return FrameTracker(model=None, keyframes=kfs)

    @staticmethod
    def _apply_pending(tracker, T):
        """Mimic _ensure_chain's delta application at a dispatch."""
        tracker._chain = dict(kf_idx=0, T=T, T_prev=None)
        chain = tracker._ensure_chain(0)
        return chain["T"]

    def test_correction_spanning_two_drains_applied_once(self, rng):
        tracker = self._tracker(rng)
        T0 = lie.sim3_exp(jnp.asarray([0.1, -0.2, 0.3, 0.02, -0.01, 0.03, 0.01]))
        g1 = lie.sim3_exp(jnp.asarray([0.05, 0.0, -0.1, 0.01, 0.02, 0.0, -0.02]))
        g2 = lie.sim3_exp(jnp.asarray([-0.03, 0.08, 0.0, 0.0, -0.02, 0.01, 0.0]))

        tracker._chain = dict(kf_idx=0, T=T0, T_prev=None)
        snap_w1 = (tracker._chain_gen, tracker._corr_cum)  # dispatch(W1)
        snap_w2 = (tracker._chain_gen, tracker._corr_cum)  # dispatch(W2)

        # drain(W1): backend solve g1 landed; arena = g1*T0; belief = T0.
        arena1 = lie.sim3_mul(g1, T0)
        tracker.queue_arena_correction(arena1, T0, snap_w1)
        T_after = self._apply_pending(tracker, T0)  # dispatch(W3)
        np.testing.assert_allclose(
            np.asarray(T_after), np.asarray(arena1), atol=1e-6
        )

        # drain(W2): its belief is STILL T0 (dispatched before g1 applied);
        # a second solve g2 landed, arena = g2*g1*T0. The queued delta must
        # be exactly g2 — not g2*g1 again.
        arena2 = lie.sim3_mul(g2, arena1)
        tracker.queue_arena_correction(arena2, T0, snap_w2)
        T_final = self._apply_pending(tracker, T_after)  # dispatch(W4)
        np.testing.assert_allclose(
            np.asarray(T_final), np.asarray(arena2), atol=1e-6
        )

    def test_pending_delta_counts_toward_belief(self, rng):
        """Two drains with NO dispatch in between: the second drain's
        belief update must include the still-pending first delta."""
        tracker = self._tracker(rng)
        T0 = lie.sim3_exp(jnp.asarray([0.0, 0.1, -0.1, 0.01, 0.0, -0.01, 0.0]))
        g1 = lie.sim3_exp(jnp.asarray([0.02, -0.04, 0.0, 0.0, 0.01, 0.0, 0.01]))
        g2 = lie.sim3_exp(jnp.asarray([0.0, 0.03, 0.05, -0.01, 0.0, 0.02, 0.0]))
        snap = (tracker._chain_gen, tracker._corr_cum)

        arena1 = lie.sim3_mul(g1, T0)
        tracker.queue_arena_correction(arena1, T0, snap)
        arena2 = lie.sim3_mul(g2, arena1)
        tracker.queue_arena_correction(arena2, T0, snap)  # g1 still pending
        T_final = self._apply_pending(tracker, T0)
        np.testing.assert_allclose(
            np.asarray(T_final), np.asarray(arena2), atol=1e-6
        )

    def test_stale_generation_ignored(self, rng):
        tracker = self._tracker(rng)
        T0 = lie.sim3_identity()
        snap_old = (tracker._chain_gen, tracker._corr_cum)
        tracker.abort_chain()  # rebuild: arena is already the truth
        g = lie.sim3_exp(jnp.asarray([0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
        tracker.queue_arena_correction(lie.sim3_mul(g, T0), T0, snap_old)
        assert tracker._pending_delta is None
