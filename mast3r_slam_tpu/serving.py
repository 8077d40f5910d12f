"""Serving mode: batched multi-sequence tracking.

Tracks B independent video streams in lockstep on one chip: the fused
per-frame program (decode-from-cache + matching + Sim3 GN + fusion +
statistics) is vmapped over the sequence axis, so B tracking steps cost one
device program launch and amortize the MXU far better than B sequential
steps — the offline/throughput counterpart of the real-time loop
(production deployment: map-reduce style clip processing, multi-camera
rigs, dataset annotation).

Keyframe state lives as batched arrays [B, ...]; per-sequence keyframe
promotion is the caller's host decision (flags returned per sequence), with
`update_keyframes` accepting any subset.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.config import get_config
from mast3r_slam_tpu.frame import fuse_pointmap_masked
from mast3r_slam_tpu.lie import core as lie
from mast3r_slam_tpu.matching import match
from mast3r_slam_tpu.ops.gauss_newton import GNParams, gauss_newton_pose_rays
from mast3r_slam_tpu.geometry import point_to_ray_dist
from mast3r_slam_tpu.tracker import _track_core_rays


@dataclasses.dataclass
class BatchState:
    """Batched per-sequence tracking state (all leading dim B)."""

    kf_feat: jax.Array  # [B, S, D]
    kf_pos: jax.Array  # [B, S, 2]
    kf_X: jax.Array  # [B, N, 3]
    kf_C: jax.Array  # [B, N, 1]
    kf_N: jax.Array  # [B]
    kf_T: jax.Array  # [B, 8]
    # Current frame's fused canonical state (reset every step — each step
    # is a new video frame; kept so callers can promote without re-decode).
    fr_X: jax.Array  # [B, N, 3]
    fr_C: jax.Array  # [B, N, 1]
    fr_N: jax.Array  # [B]
    T_WC: jax.Array  # [B, 8] current poses


def _make_batch_program(model, cfg, filtering_mode: str, mesh=None,
                        microbatch: int = 0, image_input: bool = False,
                        scan_unroll: int = 1):
    """Build the vmapped per-frame program; with a `jax.sharding.Mesh`,
    the sequence axis is sharded over the mesh's 'dp' axis (one GSPMD
    program: decode/matching/GN run fully data-parallel over ICI, model
    params replicated) — multi-chip serving without code changes above.

    `microbatch` > 0 runs the batch as a `lax.scan` over chunks of that
    size inside the ONE dispatch: the decoder/DPT activation transients
    (the HLO-temp blowup that capped v5e serving at B=4) scale with the
    chunk, not the batch, so B=8/16 compile and run at B=4's working set
    while still amortizing launch overhead across the whole batch."""
    from mast3r_slam_tpu.models.mast3r import MASt3RNet

    from mast3r_slam_tpu.tracker import _rays_cfg_key

    cfg_key = _rays_cfg_key(cfg)
    out_hw = model._out_hw

    def one(params, feat_f, pos_f, kf_feat, kf_pos, kX, kC, kN, T, Tk):
        out_f, out_k = model.net.apply(
            params,
            feat_f[None],
            pos_f[None],
            kf_feat[None],
            kf_pos[None],
            out_hw,
            method=MASt3RNet.decode,
        )
        h, w = out_f["pts3d"].shape[1:3]
        n = h * w
        Xff = out_f["pts3d"].reshape(n, 3)
        Cff = out_f["conf"].reshape(n, 1)
        Qff = out_f["desc_conf"].reshape(n, 1)
        Xkf = out_k["pts3d"].reshape(n, 3)
        Ckf = out_k["conf"].reshape(n, 1)
        Qkf = out_k["desc_conf"].reshape(n, 1)
        # Each serving step is a NEW video frame: its canonical state starts
        # empty and IS the fused model output — matching the single-sequence
        # twins (FrameTracker feeds a fresh Frame with N=0 per image; the
        # chained window program passes the decode directly). Fusing into
        # the PREVIOUS frame's state would average pointmaps expressed in
        # different camera frames, so the previous state is not even an
        # input here. fr_X/fr_C/fr_N still ride BatchState so callers can
        # promote the current frame without a re-decode.
        fX2, fC2, fN2 = fuse_pointmap_masked(
            jnp.zeros_like(Xff), jnp.zeros_like(Cff), jnp.zeros(()),
            Xff, Cff, filtering_mode,
        )
        fC2_avg = fC2 / jnp.maximum(fN2, 1.0)
        # NOTE: serving deliberately does NOT use the matcher's
        # window-stream extras (matching.match(payload=, want_hit=)): under
        # the vmapped microbatch `lax.scan`, the extras' ~340 shifted tap
        # passes land inside the scan's while-body region, whose
        # loop-carried buffer constraints block their fusion — measured
        # 8x slower serving batches (1366 vs 168 ms at B=8). The generic
        # row gather + scatter in `_track_core_rays` stay out of the tap
        # loop and fuse fine there.
        idx, valid = match(
            out_f["pts3d"], out_k["pts3d"], out_f["desc"], out_k["desc"], None
        )
        core = _track_core_rays(
            idx[0],
            valid[0],
            Qff,
            Qkf,
            fX2,
            fC2_avg,
            kX,
            kC / jnp.maximum(kN, 1.0),
            Xkf,
            T,
            Tk,
            cfg_key,
        )
        kX2, kC2, kN2 = fuse_pointmap_masked(kX, kC, kN, core["Xkk"], Ckf, filtering_mode)
        stats = jnp.concatenate([core["stats"], fN2[None], kN2[None]])
        # On-device tracked gate (min_match_frac = cfg_key[2]): the state
        # update no longer needs the host to see stats, so batches can be
        # dispatched back-to-back with the stats fetch deferred/overlapped
        # (same zero-sync design as the chained tracking loop).
        tracked = core["stats"][0] >= cfg_key[2]
        return dict(
            T_WC=jnp.where(tracked, core["T_WCf"], T),
            fr_X=fX2,
            fr_C=fC2,
            fr_N=fN2,
            kf_X=jnp.where(tracked, kX2, kX),
            kf_C=jnp.where(tracked, kC2, kC),
            kf_N=jnp.where(tracked, kN2, kN),
            stats=stats,
        )

    vone = jax.vmap(one, in_axes=(None,) + (0,) * 9)

    def batched(params, *args):
        B = args[0].shape[0]
        mb = microbatch
        if mb <= 0 or mb >= B or B % mb != 0:
            return vone(params, *args)
        nc = B // mb
        chunked = tuple(
            a.reshape((nc, mb) + a.shape[1:]) for a in args
        )

        def body(carry, chunk):
            return carry, vone(params, *chunk)

        # Partial unroll (runtime.serving_scan_unroll): the per-step
        # stacked-output writes of a plain scan defeat in-place aliasing
        # (measured 8x/batch at nc=4 — docs/PLAN.md round-3); unrolling
        # lets XLA fuse across `unroll` chunks while the activation
        # working set stays one chunk at a time in program order.
        unroll = max(1, min(scan_unroll, nc))
        _, outs = jax.lax.scan(body, None, chunked, unroll=unroll)
        return jax.tree.map(
            lambda o: o.reshape((B,) + o.shape[2:]), outs
        )

    run = batched
    n_data_args = 9
    if image_input:
        # Image-input serving: ONE dispatch = batched ViT encode (full B —
        # token-level transients are small; only decode/DPT need the
        # microbatch working-set bound) + the tracking program above.
        def run(params, imgs, *rest):
            x = imgs
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
            f, p = model.net.apply(
                params, x * 2.0 - 1.0, method=MASt3RNet.encode
            )
            return batched(params, f, p, *rest)

        n_data_args = 8

    if mesh is None:
        return jax.jit(run)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    # With a tp axis, shard the ViT weights Megatron-style (column/row
    # parallel, parallel/sharding.py) instead of replicating: every chip
    # holds 1/tp of the model and GSPMD inserts one all-reduce per block
    # over ICI — memory-constrained serving (big model, small per-chip HBM)
    # without touching the program above.
    if mesh.shape.get("tp", 1) > 1:
        from mast3r_slam_tpu.parallel.sharding import infer_param_shardings

        par = infer_param_shardings(model.params, mesh)
    else:
        par = rep
    return jax.jit(
        run,
        in_shardings=(par,) + (dp,) * n_data_args,
        out_shardings=dp,
    )


class BatchTracker:
    """Lockstep tracker over B sequences (rays objective, elementwise
    fusion modes)."""

    def __init__(self, model, mesh=None, microbatch: Optional[int] = None):
        """With `mesh` (a jax.sharding.Mesh with a 'dp' axis), sequences
        shard over devices — each chip tracks B/n_dp streams; the batch
        size must be divisible by the dp axis size. A 'tp' axis > 1
        additionally shards the model weights Megatron-style across chips
        (1/tp of the ViT per chip, all-reduce over ICI).

        `microbatch` (default `runtime.serving_microbatch`) bounds the
        activation working set: the batch runs as an in-dispatch scan over
        chunks of this size (0 = one flat vmap)."""
        self.model = model
        cfg = get_config()
        self.cfg = cfg.tracking
        self.mesh = mesh
        explicit = microbatch is not None
        if microbatch is None:
            microbatch = cfg.runtime.serving_microbatch
        if mesh is not None and microbatch:
            dp = mesh.shape.get("dp", 1)
            if microbatch % dp:
                if explicit:
                    raise ValueError(
                        f"serving microbatch {microbatch} not divisible by "
                        f"dp axis {dp}"
                    )
                # config default that doesn't tile the mesh: per-chip batch
                # is already B/dp, so just run flat
                microbatch = 0
        self.microbatch = microbatch
        self.scan_unroll = cfg.runtime.serving_scan_unroll
        self._program = _make_batch_program(
            model, self.cfg, self.cfg.filtering_mode, mesh, microbatch,
            scan_unroll=self.scan_unroll,
        )
        self._program_img = None  # built on first step_images_async
        self.state: Optional[BatchState] = None
        # Continuous batching: which slots hold live sequences. Inactive
        # slots still ride the lockstep SPMD program (an SPMD batch cannot
        # skip lanes) but their stats are masked out and their state is
        # re-initialized when a new sequence joins via `open_slot`.
        self.active: Optional[np.ndarray] = None

    def _require_state(self, op: str) -> BatchState:
        if self.state is None:
            raise RuntimeError(f"call init_from_keyframes before {op}")
        return self.state

    def _shard_batch(self, x: jax.Array) -> jax.Array:
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(self.mesh, P("dp")))

    def init_from_keyframes(self, feats, poss, Xs, Cs) -> None:
        """Initialize B sequences from their first keyframes.

        feats [B,S,D], poss [B,S,2], Xs [B,N,3], Cs [B,N,1] (mono pointmaps).
        """
        B = feats.shape[0]
        if self.mesh is not None and B % self.mesh.shape["dp"]:
            raise ValueError(
                f"batch {B} not divisible by dp axis {self.mesh.shape['dp']}"
            )
        ident = jnp.tile(lie.sim3_identity()[None], (B, 1))
        n = Xs.shape[1]
        sh = self._shard_batch
        self.state = BatchState(
            kf_feat=sh(feats),
            kf_pos=sh(poss),
            kf_X=sh(Xs),
            kf_C=sh(Cs),
            kf_N=sh(jnp.ones((B,))),
            kf_T=sh(ident),
            fr_X=sh(jnp.zeros((B, n, 3))),
            fr_C=sh(jnp.zeros((B, n, 1))),
            fr_N=sh(jnp.zeros((B,))),
            T_WC=sh(ident),
        )
        self.active = np.ones((B,), bool)

    def step_async(self, feats: jax.Array, poss: jax.Array) -> jax.Array:
        """Track one new frame per sequence (pre-encoded features) with NO
        host sync: the tracked/untracked gate is applied on device inside
        the program, the batched state updates from device arrays only, and
        the per-sequence stats come back as a DEVICE array [B, 5] the
        caller fetches whenever convenient (e.g. every K batches, or
        overlapped with the next batch's compute). Feed the handle to
        `resolve_stats` for the host-side interpretation."""
        s = self._require_state("step_async")
        out = self._program(
            self.model.params,
            feats,
            poss,
            s.kf_feat,
            s.kf_pos,
            s.kf_X,
            s.kf_C,
            s.kf_N,
            s.T_WC,
            s.kf_T,
        )
        self.state = dataclasses.replace(
            s,
            fr_X=out["fr_X"],
            fr_C=out["fr_C"],
            fr_N=out["fr_N"],
            kf_X=out["kf_X"],
            kf_C=out["kf_C"],
            kf_N=out["kf_N"],
            T_WC=out["T_WC"],
        )
        return out["stats"]

    def step_images_async(self, imgs: jax.Array) -> jax.Array:
        """`step_async` from raw images [B, H, W, 3] (uint8 or [0, 1]
        float): the batched ViT encode runs INSIDE the same dispatch, so an
        image-fed server costs one program launch per batch, same as the
        feature-fed path — no separate encode round trip."""
        if self._program_img is None:
            self._program_img = _make_batch_program(
                self.model, self.cfg, self.cfg.filtering_mode, self.mesh,
                self.microbatch, image_input=True,
                scan_unroll=self.scan_unroll,
            )
        s = self._require_state("step_images_async")
        out = self._program_img(
            self.model.params, imgs,
            s.kf_feat, s.kf_pos,
            s.kf_X, s.kf_C, s.kf_N, s.T_WC, s.kf_T,
        )
        self.state = dataclasses.replace(
            s,
            fr_X=out["fr_X"], fr_C=out["fr_C"], fr_N=out["fr_N"],
            kf_X=out["kf_X"], kf_C=out["kf_C"], kf_N=out["kf_N"],
            T_WC=out["T_WC"],
        )
        return out["stats"]

    def resolve_stats(self, stats_dev: jax.Array) -> dict:
        """Fetch + interpret one `step_async` stats handle (ONE host sync):
        poses refer to the CURRENT state (exact if resolved before further
        steps; after later steps the flags still refer to their own frame)."""
        self._require_state("resolve_stats")
        stats = np.asarray(stats_dev)  # [B, 5]
        match_frac = stats[:, 0]
        tracked = match_frac >= self.cfg.min_match_frac
        # Promotion only for TRACKED frames — same gate as the chained
        # program's logical_and(not skip, ...) (tracker.py) and
        # FrameTracker's early skip return: an untracked frame must never
        # become a keyframe.
        new_kf = tracked & (
            np.minimum(stats[:, 1], stats[:, 2]) < self.cfg.match_frac_thresh
        )
        if self.active is not None:
            tracked &= self.active
            new_kf &= self.active
        return dict(
            poses=self.state.T_WC,
            match_frac=match_frac,
            new_kf=new_kf,
            tracked=tracked,
            active=None if self.active is None else self.active.copy(),
        )

    def step(self, feats: jax.Array, poss: jax.Array) -> dict:
        """Synchronous convenience wrapper: `step_async` + `resolve_stats`
        (one host sync per batch)."""
        return self.resolve_stats(self.step_async(feats, poss))

    def open_slot(self, i: int, feat, poss, X, C) -> None:
        """Continuous batching: start a NEW sequence in slot `i` (its first
        keyframe's features/positions + mono pointmap), pose reset to
        identity. Slots are independent lanes of the lockstep program, so
        joining mid-stream never perturbs the other sequences
        (test_per_sequence_isolation); the handful of `.at[i].set` updates
        dispatch once per join, not per frame."""
        s = self._require_state("open_slot")
        ident = lie.sim3_identity()
        self.state = dataclasses.replace(
            s,
            kf_feat=s.kf_feat.at[i].set(feat),
            kf_pos=s.kf_pos.at[i].set(poss),
            kf_X=s.kf_X.at[i].set(X),
            kf_C=s.kf_C.at[i].set(C),
            kf_N=s.kf_N.at[i].set(1.0),
            kf_T=s.kf_T.at[i].set(ident),
            fr_X=s.fr_X.at[i].set(0.0),
            fr_C=s.fr_C.at[i].set(0.0),
            fr_N=s.fr_N.at[i].set(0.0),
            T_WC=s.T_WC.at[i].set(ident),
        )
        self.active[i] = True

    def close_slot(self, i: int) -> np.ndarray:
        """Continuous batching: retire the sequence in slot `i` and return
        its final Sim3 pose. The slot keeps riding the SPMD program as a
        masked lane until `open_slot` reuses it."""
        self._require_state("close_slot")
        self.active[i] = False
        return np.asarray(self.state.T_WC[i])

    def update_keyframes(self, seq_ids, feats, poss, Xs, Cs) -> None:
        """Promote the given sequences' current frames to keyframes.

        seq_ids: python list of sequence indices; remaining args are the
        new keyframes' [K, ...] arrays (mono pointmaps + features)."""
        s = self._require_state("update_keyframes")
        ids = jnp.asarray(seq_ids)
        self.state = dataclasses.replace(
            s,
            kf_feat=s.kf_feat.at[ids].set(feats),
            kf_pos=s.kf_pos.at[ids].set(poss),
            kf_X=s.kf_X.at[ids].set(Xs),
            kf_C=s.kf_C.at[ids].set(Cs),
            kf_N=s.kf_N.at[ids].set(1.0),
            kf_T=s.kf_T.at[ids].set(s.T_WC[ids]),
            fr_N=s.fr_N.at[ids].set(0.0),
        )
