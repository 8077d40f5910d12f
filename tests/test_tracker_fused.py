"""Fused one-dispatch tracker vs the legacy multi-program path: identical
results on identical inputs (regression guard for the fusion rewrite)."""

import copy

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.frame import Keyframes, create_frame
from mast3r_slam_tpu.inference import mast3r_inference_mono, mast3r_match_asymmetric
from mast3r_slam_tpu.models import MASt3RConfig, MASt3RModel
from mast3r_slam_tpu.tracker import FrameTracker


# tiny_model fixture: session-scoped in conftest.py


def _setup(tiny_model, rng, use_calib=False):
    set_config(
        Config.from_dict(
            {
                "use_calib": use_calib,
                "runtime": {"keyframe_capacity": 8},
                "matching": {"use_simple": True},
            }
        )
    )
    h, w = tiny_model._out_hw
    img_kf = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    img_f = jnp.clip(
        img_kf + rng.normal(0, 0.01, (h, w, 3)).astype(np.float32), 0, 1
    )
    kfs = Keyframes(h, w)
    kf = create_frame(0, img_kf)
    X, C, feat, pos = mast3r_inference_mono(tiny_model, kf)
    kf.X_canon, kf.C, kf.feat, kf.pos = X, C, feat, pos
    kf.N = kf.N_updates = 1
    kfs.append(kf)
    frame = create_frame(1, img_f)
    return kfs, frame


def test_fused_matches_legacy(tiny_model, rng):
    kfs_a, frame_a = _setup(tiny_model, np.random.default_rng(5))
    kfs_b, frame_b = _setup(tiny_model, np.random.default_rng(5))

    tr_a = FrameTracker(tiny_model, kfs_a)
    assert tr_a._use_fused
    new_kf_a, _, reloc_a = tr_a.track(frame_a, mast3r_match_asymmetric)

    tr_b = FrameTracker(tiny_model, kfs_b)
    tr_b._use_fused = False
    new_kf_b, _, reloc_b = tr_b.track(frame_b, mast3r_match_asymmetric)

    assert (new_kf_a, reloc_a) == (new_kf_b, reloc_b)
    np.testing.assert_allclose(
        np.asarray(frame_a.T_WC), np.asarray(frame_b.T_WC), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(frame_a.X_canon), np.asarray(frame_b.X_canon), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(kfs_a.X[0]), np.asarray(kfs_b.X[0]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(kfs_a.C[0]), np.asarray(kfs_b.C[0]), atol=1e-4
    )
    # warm-start indices agree
    np.testing.assert_array_equal(
        np.asarray(tr_a.idx_f2k), np.asarray(tr_b.idx_f2k)
    )


def test_fused_calib_matches_legacy(tiny_model, rng):
    """Calibrated objective through the fused one-dispatch path equals the
    legacy multi-program _track_calib path (VERDICT r1 item 7)."""
    kfs_a, frame_a = _setup(tiny_model, np.random.default_rng(9), use_calib=True)
    kfs_b, frame_b = _setup(tiny_model, np.random.default_rng(9), use_calib=True)
    h, w = tiny_model._out_hw
    K = jnp.asarray(
        [[float(w), 0.0, w / 2.0], [0.0, float(w), h / 2.0], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    kfs_a.set_intrinsics(K)
    kfs_b.set_intrinsics(K)

    tr_a = FrameTracker(tiny_model, kfs_a)
    assert tr_a._use_fused and tr_a._calib_live()
    new_kf_a, _, reloc_a = tr_a.track(frame_a, mast3r_match_asymmetric)

    tr_b = FrameTracker(tiny_model, kfs_b)
    tr_b._use_fused = False
    new_kf_b, _, reloc_b = tr_b.track(frame_b, mast3r_match_asymmetric)

    assert (new_kf_a, reloc_a) == (new_kf_b, reloc_b)
    np.testing.assert_allclose(
        np.asarray(frame_a.T_WC), np.asarray(frame_b.T_WC), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(kfs_a.X[0]), np.asarray(kfs_b.X[0]), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(tr_a.idx_f2k), np.asarray(tr_b.idx_f2k)
    )
