"""Window scan program == K sequential per-frame chain steps.

The window program batches the ViT-L encode over all K frames before the
unrolled decode chain (tracker._make_fused_track_chain_scan); the per-frame
chain program encodes inline (tracker._make_fused_track_chain). A batched
encoder pass is mathematically identical to K single-frame passes (layer
norm / attention / MLP act per frame; no cross-batch mixing), so every
per-frame output of the window program must match the sequential chain to
float tolerance — promotion decisions (exact integers) must match exactly.
"""

import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.frame import Keyframes, create_frame
from mast3r_slam_tpu.inference import mast3r_inference_mono
from mast3r_slam_tpu.tracker import (
    _make_fused_track_chain,
    _make_fused_track_chain_scan,
)


import pytest


@pytest.mark.parametrize(
    "spec_decode,batched_encode,matching",
    [
        (False, True, {}),
        (True, True, {}),
        # inline per-frame encodes inside the chain (the A/B twin of the
        # hoisted B=K window encode; numerically identical by construction)
        (False, False, {}),
        # speculative batched decode + the dense matcher inside the
        # unrolled window chain (the full deployment composition)
        (True, True, {"method": "dense", "dense_radius": 2,
                      "dist_thresh": 1e6}),
    ],
    ids=["base", "spec", "inline-encode", "spec+dense"],
)
def test_scan_matches_sequential_chain(
    tiny_model, rng, spec_decode, batched_encode, matching
):
    set_config(
        Config.from_dict(
            {
                "runtime": {
                    "keyframe_capacity": 8,
                    # speculative batched decode must be EXACT: the world
                    # below promotes mid-window, exercising both the
                    # speculative fast path (pre-promotion frames) and the
                    # live-decode lax.cond fallback (post-promotion frames),
                    # through the chunked (microbatch 2, K=4) spec pass.
                    "window_spec_decode": spec_decode,
                    "window_batched_encode": batched_encode,
                    "window_decode_microbatch": 2,
                },
                "matching": matching,
                # promotion thresholds left at defaults: the drifting frames
                # below trigger at least one on-device promotion, exercising
                # the lax.cond path inside the scan
            }
        )
    )
    h, w = tiny_model._out_hw
    K = 4
    base = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)

    kfs = Keyframes(h, w)
    kf = create_frame(0, jnp.asarray(base))
    X, C, feat, pos = mast3r_inference_mono(tiny_model, kf)
    kf.X_canon, kf.C, kf.feat, kf.pos = X, C, feat, pos
    kf.N = kf.N_updates = 1
    kfs.append(kf)

    imgs_np = np.stack(
        [
            np.clip(np.roll(base, 2 * j, axis=1)
                    + rng.normal(0, 0.01, base.shape).astype(np.float32), 0, 1)
            for j in range(K)
        ]
    ).astype(np.float32)
    imgs = jnp.asarray(imgs_np)

    from mast3r_slam_tpu.config import get_config

    cfg = get_config().tracking
    fmode = get_config().tracking.filtering_mode

    chain_fn = _make_fused_track_chain(tiny_model, cfg, fmode)
    scan_fn = _make_fused_track_chain_scan(tiny_model, cfg, fmode)

    n = h * w
    idx0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (1, n))
    state = dict(
        feat=kf.feat, pos=kf.pos, idx=idx0, X=kf.X_canon, C=kf.C,
        N=jnp.asarray(1.0), Tp=kf.T_WC, Tk=kf.T_WC,
    )

    # Sequential reference: K per-frame chain programs.
    seq_stats, seq_T = [], []
    st = dict(state)
    for j in range(K):
        out = chain_fn(
            tiny_model.params, imgs[j], st["feat"], st["pos"], st["idx"],
            st["X"], st["C"], st["N"], st["Tp"], st["Tk"], None,
        )
        seq_stats.append(np.asarray(out["stats"]))
        seq_T.append(np.asarray(out["T_WCf"]))
        st = dict(
            feat=out["kf_feat"], pos=out["kf_pos"], idx=out["idx"],
            X=out["kf_X"], C=out["kf_C"], N=out["kN"],
            Tp=out["T_WCf"], Tk=out["kf_T"],
        )

    # Window program: one dispatch.
    win = scan_fn(
        tiny_model.params, imgs, state["feat"], state["pos"], state["idx"],
        state["X"], state["C"], state["N"], state["Tp"], state["Tk"], None,
    )
    win_stats = np.asarray(win["stats"])
    win_T = np.asarray(win["T_WCf"])

    # Events (slot 3) are integer-coded decisions: must match exactly.
    np.testing.assert_array_equal(
        win_stats[:, 3], np.stack(seq_stats)[:, 3],
        err_msg="window promotion/skip decisions deviate from sequential",
    )
    assert np.stack(seq_stats)[:, 3].max() >= 1.0, (
        "test world never promoted a keyframe — the lax.cond path was not "
        "exercised; make the frames drift more"
    )
    np.testing.assert_allclose(
        win_stats, np.stack(seq_stats), rtol=1e-4, atol=1e-5,
        err_msg="window stats deviate from sequential chain",
    )
    np.testing.assert_allclose(
        win_T, np.stack(seq_T), rtol=1e-4, atol=1e-5,
        err_msg="window poses deviate from sequential chain",
    )
    # Final chain state: keyframe pointmap + pose.
    np.testing.assert_allclose(
        np.asarray(win["final"]["kf_X"]), np.asarray(st["X"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(win["final"]["kf_T"]), np.asarray(st["Tk"]),
        rtol=1e-4, atol=1e-5,
    )
