"""Frontend tracker: per-frame Sim(3) visual odometry vs the last keyframe.

Behavior parity: reference tracker.py:23-406. TPU-native differences:

* The whole tracking step (encode, decode, matching, confidence fusion,
  validity gates, GN pose solve, pointmap fusion, keyframe-selection
  statistics — and in the chained program, the keyframe/skip DECISION plus
  conditional promotion with mono decode) is ONE jitted program; the host
  drains a tiny stats/event bundle once per `runtime.sync_every` frames.
* The uniqueness statistic uses a scatter-count (static shapes) instead of
  the reference's host-side `mx.unique` (tracker.py:155).
* `use_calib` is read from the top-level config, fixing the reference's
  dead `tracking.use_calib` lookup (tracker.py:97 vs config.py:56).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.config import get_config
from mast3r_slam_tpu.frame import Frame, Keyframes
from mast3r_slam_tpu.geometry import (
    constrain_points_to_ray,
    get_pixel_coords,
    point_to_ray_dist,
)
from mast3r_slam_tpu.lie import core as lie
from mast3r_slam_tpu.ops.gauss_newton import (
    GNParams,
    gauss_newton_pose_calib,
    gauss_newton_pose_rays,
)


@partial(jax.jit, static_argnames=("cfg_key",))
def _track_core_rays(
    idx_f2k: jax.Array,  # [N]
    valid_match_k: jax.Array,  # [N, 1]
    Qff: jax.Array,  # [N, 1]
    Qkf: jax.Array,  # [N, 1]
    Xf_canon: jax.Array,  # [N, 3] frame canonical points (post-fusion)
    Cf_avg: jax.Array,  # [N, 1]
    Xk_canon: jax.Array,  # [N, 3] keyframe canonical points
    Ck_avg: jax.Array,  # [N, 1]
    Xkf: jax.Array,  # [N, 3] keyframe points in frame coords (model output)
    T_WCf: jax.Array,  # [8]
    T_WCk: jax.Array,  # [8]
    cfg_key: tuple,  # static knobs (see caller)
    pay_g: jax.Array | None = None,  # [N, 5] pre-selected (Q, C, X) payload
    unique_hit: jax.Array | None = None,  # [N] bool pre-computed hit mask
):
    """Fused tracking step, ray-distance objective. Returns a dict of device
    results; the caller syncs one scalar bundle.

    `pay_g` / `unique_hit` let the matcher supply the per-point payload and
    the uniqueness mask window-locally (matching.match(payload=, want_hit=));
    when absent this falls back to the packed row gather and the scatter-max
    — required for callers whose indices are not window-structured (e.g. the
    backend's edge gathers)."""
    (
        C_conf,
        Q_conf,
        min_match_frac,
        max_iters,
        huber_k,
        sigma_ray,
        sigma_dist,
        rel_error,
        delta_norm,
        match_frac_thresh,
        robust,
        tukey_t,
    ) = cfg_key
    n = idx_f2k.shape[0]

    # ONE packed gather for all per-point frame payloads (Q, C, X share
    # idx_f2k): three separate [N,1]/[N,3] take_along_axis calls emitted
    # three narrow-row gathers that together cost 3.7 ms/step at N=196k
    # (profiled: the single largest op in the fused step, ahead of every
    # decoder fusion) — TPU gathers pay per ROW, so one 5-lane row costs
    # the same as a 1-lane row and the pack is ~3x cheaper.
    if pay_g is None:
        payload = jnp.concatenate([Qff, Cf_avg, Xf_canon], axis=-1)  # [N, 5]
        pay_g = jnp.take_along_axis(payload, idx_f2k[:, None], axis=0)
    pay_g = pay_g.astype(jnp.float32)
    Qk = jnp.sqrt(jnp.maximum(pay_g[:, 0:1], 0.0) * Qkf)  # [N, 1]

    Cf_g = pay_g[:, 1:2]
    valid_opt = (
        valid_match_k & (Cf_g > C_conf) & (Ck_avg > C_conf) & (Qk > Q_conf)
    )
    valid_kf = valid_match_k & (Qk > Q_conf)
    match_frac = jnp.mean(valid_opt.astype(jnp.float32))

    # GN solve (always computed; caller discards if match_frac too low —
    # branching is host-side to keep one compiled program).
    Xf_g = pay_g[:, 2:5]
    rd_k = point_to_ray_dist(Xk_canon)
    w = valid_opt.astype(jnp.float32) * jnp.sqrt(Qk)
    sqrt_info = jnp.concatenate(
        [jnp.broadcast_to(w / sigma_ray, (n, 3)), w / sigma_dist], axis=-1
    )
    T_CkCf_init = lie.sim3_mul(lie.sim3_inv(T_WCk), T_WCf)
    params = GNParams(
        sigma_ray=sigma_ray,
        sigma_dist=sigma_dist,
        huber_k=huber_k,
        robust=robust,
        tukey_t=tukey_t,
        max_iter=max_iters,
        delta_thresh=delta_norm,
    )
    T_CkCf, cost = gauss_newton_pose_rays(T_CkCf_init, Xf_g, rd_k, sqrt_info, params)
    T_WCf_new = lie.sim3_mul(T_WCk, T_CkCf)

    # Keyframe pointmap fusion input: keyframe points mapped into kf frame.
    Xkk = lie.sim3_act(T_CkCf[None], Xkf)

    # Keyframe selection statistics.
    match_frac_k = jnp.mean(valid_kf.astype(jnp.float32))
    if unique_hit is None:
        unique_hit = (
            jnp.zeros((n,), jnp.float32).at[idx_f2k].max(
                valid_match_k[:, 0].astype(jnp.float32)
            )
            > 0.5
        )
    unique_frac_f = jnp.mean(unique_hit.astype(jnp.float32))

    return dict(
        Qk=Qk,
        T_WCf=T_WCf_new,
        T_CkCf=T_CkCf,
        Xkk=Xkk,
        cost=cost,
        stats=jnp.stack([match_frac, match_frac_k, unique_frac_f]),
    )


@partial(jax.jit, static_argnames=("img_size", "cfg_key"))
def _track_core_calib(
    idx_f2k: jax.Array,  # [N]
    valid_match_k: jax.Array,  # [N, 1]
    Qff: jax.Array,  # [N, 1]
    Qkf: jax.Array,  # [N, 1]
    Xf_canon: jax.Array,  # [N, 3]
    Cf_avg: jax.Array,  # [N, 1]
    Xk_canon: jax.Array,  # [N, 3]
    Ck_avg: jax.Array,  # [N, 1]
    Xkf: jax.Array,  # [N, 3]
    T_WCf: jax.Array,  # [8]
    T_WCk: jax.Array,  # [8]
    K: jax.Array,  # [4] or [3,3] intrinsics
    img_size: tuple,  # static (h, w) of the pointmap grid
    cfg_key: tuple,
):
    """Fused tracking step, calibrated pixel+log-depth objective (parity:
    reference tracker.py:326-406). Same contract as `_track_core_rays`."""
    (
        C_conf,
        Q_conf,
        min_match_frac,
        max_iters,
        huber_k,
        sigma_pixel,
        sigma_depth,
        rel_error,
        delta_norm,
        match_frac_thresh,
        pixel_border,
        depth_eps,
        robust,
        tukey_t,
    ) = cfg_key
    n = idx_f2k.shape[0]

    # Constrain both pointmaps to their camera rays (reference
    # geometry.py:273-302 usage at tracker.py:334-336).
    Xf_c = constrain_points_to_ray(img_size, Xf_canon[None], K)[0]
    Xk_c = constrain_points_to_ray(img_size, Xk_canon[None], K)[0]
    uv = get_pixel_coords(1, img_size, dtype=Xf_c.dtype).reshape(-1, 2)
    meas_k = jnp.concatenate(
        [uv, jnp.log(jnp.maximum(Xk_c[:, 2:3], 1e-10))], -1
    )
    valid_meas = Xk_c[:, 2:3] > depth_eps

    # ONE packed gather for all per-point frame payloads (see the rays
    # core above: three narrow-row gathers were the largest op in the
    # fused step; TPU gathers pay per row, so pack the lanes).
    payload = jnp.concatenate([Qff, Cf_avg, Xf_c], axis=-1)  # [N, 5]
    pay_g = jnp.take_along_axis(payload, idx_f2k[:, None], axis=0)
    Qk = jnp.sqrt(pay_g[:, 0:1] * Qkf)  # [N, 1]
    Cf_g = pay_g[:, 1:2]
    valid_opt = (
        valid_match_k & (Cf_g > C_conf) & (Ck_avg > C_conf) & (Qk > Q_conf)
    )
    valid_kf = valid_match_k & (Qk > Q_conf)
    match_frac = jnp.mean(valid_opt.astype(jnp.float32))

    Xf_g = pay_g[:, 2:5]
    w = valid_opt.astype(jnp.float32) * jnp.sqrt(Qk)
    sqrt_info = jnp.concatenate(
        [jnp.broadcast_to(w / sigma_pixel, (n, 2)), w / sigma_depth], -1
    )
    T_CkCf_init = lie.sim3_mul(lie.sim3_inv(T_WCk), T_WCf)
    params = GNParams(
        sigma_pixel=sigma_pixel,
        sigma_depth=sigma_depth,
        huber_k=huber_k,
        robust=robust,
        tukey_t=tukey_t,
        max_iter=max_iters,
        delta_thresh=delta_norm,
        pixel_border=pixel_border,
        z_eps=depth_eps,
    )
    T_CkCf, cost = gauss_newton_pose_calib(
        T_CkCf_init, Xf_g, meas_k, sqrt_info, valid_meas, K, img_size, params
    )
    T_WCf_new = lie.sim3_mul(T_WCk, T_CkCf)
    Xkk = lie.sim3_act(T_CkCf[None], Xkf)

    match_frac_k = jnp.mean(valid_kf.astype(jnp.float32))
    hit = jnp.zeros((n,), jnp.float32).at[idx_f2k].max(
        valid_match_k[:, 0].astype(jnp.float32)
    )
    unique_frac_f = jnp.mean(hit)

    return dict(
        Qk=Qk,
        T_WCf=T_WCf_new,
        T_CkCf=T_CkCf,
        Xkk=Xkk,
        cost=cost,
        stats=jnp.stack([match_frac, match_frac_k, unique_frac_f]),
    )


def _rays_cfg_key(cfg) -> tuple:
    """Positional config bundle for `_track_core_rays` (trace-time
    constants). ONE definition — the core unpacks positionally, so every
    producer must agree on the order."""
    return (
        cfg.C_conf,
        cfg.Q_conf,
        cfg.min_match_frac,
        cfg.max_iters,
        cfg.huber,
        cfg.sigma_ray,
        cfg.sigma_dist,
        cfg.rel_error,
        cfg.delta_norm,
        cfg.match_frac_thresh,
        cfg.robust,
        cfg.tukey_t,
    )


def _calib_cfg_key(cfg) -> tuple:
    return (
        cfg.C_conf,
        cfg.Q_conf,
        cfg.min_match_frac,
        cfg.max_iters,
        cfg.huber,
        cfg.sigma_pixel,
        cfg.sigma_depth,
        cfg.rel_error,
        cfg.delta_norm,
        cfg.match_frac_thresh,
        cfg.pixel_border,
        cfg.depth_eps,
        cfg.robust,
        cfg.tukey_t,
    )


_ELEMENTWISE_FUSION = (
    "recent",
    "indep_conf",
    "weighted_pointmap",
    "weighted_spherical",
)


# Event codes returned per chained frame (stats slot 3).
EVENT_TRACKED = 0
EVENT_NEW_KF = 1
EVENT_SKIP = 2


def _make_fused_track_chain(
    model, cfg, filtering_mode: str, img_downsample: int = 1,
    use_calib: bool = False, _return_body: bool = False,
):
    """Zero-sync per-frame program: ENCODE + decode + dense matching + GN
    pose + keyframe fusion + ON-DEVICE keyframe/skip decision, in ONE jit.

    The keyframe-selection thresholds (reference tracker.py:116-119 and
    :151-161) are evaluated on device, and promotion runs inside a
    `lax.cond`: the mono self-pair decode produces the new keyframe's
    canonical pointmap and the chain's current-keyframe state switches to
    the frame — so consecutive frames chain device-side across keyframe
    boundaries with NO host round trip. The host drains a tiny per-frame
    stats/event bundle every `runtime.sync_every` frames and replays only
    on tracking failure (relocalization, the rare path).

    Per-frame event (stats slot 3): 0 = tracked, 1 = promoted to keyframe,
    2 = skipped (match fraction under `min_match_frac` -> reloc). On skip
    the chain state (keyframe pointmap, pose) passes through unchanged.

    Outputs also carry the RETIRED keyframe state (`ret_X`/`ret_C`, count
    in stats slot 5): the old keyframe's pointmap including this frame's
    fusion — what the host writes back into the arena slot when the device
    promoted a new keyframe mid-window.

    (Params stay an ARGUMENT: closing them over the jit embeds 686M
    weights as HLO constants and explodes compile time. The ~4.7 ms/frame
    of param-handle serialization this costs over a relay is amortized by
    the scan window program below, which ships them once per window.)
    """
    from mast3r_slam_tpu.matching import match
    from mast3r_slam_tpu.models.mast3r import MASt3RNet

    if use_calib:
        cfg_key = _calib_cfg_key(cfg)
    else:
        cfg_key = _rays_cfg_key(cfg)
    out_hw = model._out_hw
    f = max(1, img_downsample)

    def body(
        params,
        feat_f,  # [1, S, D] pre-encoded frame tokens
        pos_f,
        feat_k,
        pos_k,
        idx_init,  # [1, N] int32 or None
        kX,
        kC,
        kN,  # [] device scalar fusion count
        T_WCf,  # pose init (previous frame's pose)
        T_WCk,
        K=None,  # [4]/[3,3] intrinsics (calib mode only)
        spec_f=None,  # speculative decode outputs for THIS frame (no batch
        spec_k=None,  # dim), valid while spec_ok — see the scan builder
        spec_ok=None,
    ):
        def _decode_live(_):
            return model.net.apply(
                params,
                feat_f,
                pos_f,
                feat_k[None],
                pos_k[None],
                out_hw,
                method=MASt3RNet.decode,
            )

        if spec_f is None:
            out_f, out_k = _decode_live(None)
        else:
            # Speculative batched window decode: use the precomputed
            # window-start-keyframe outputs while no promotion has changed
            # the chain's keyframe; afterwards decode live. lax.cond
            # executes ONE branch on TPU (no vmap here), so the live
            # decode costs nothing on the speculative path.
            out_f, out_k = jax.lax.cond(
                spec_ok,
                lambda _: (
                    jax.tree_util.tree_map(lambda a: a[None], spec_f),
                    jax.tree_util.tree_map(lambda a: a[None], spec_k),
                ),
                _decode_live,
                None,
            )

        def sub(a):  # dataset.img_downsample stride slicing (static)
            return a[:, ::f, ::f] if f > 1 else a

        Xs_f, Cs_f, Ds_f, Qs_f = (
            sub(out_f["pts3d"]), sub(out_f["conf"]), sub(out_f["desc"]),
            sub(out_f["desc_conf"]),
        )
        Xs_k, Cs_k, Ds_k, Qs_k = (
            sub(out_k["pts3d"]), sub(out_k["conf"]), sub(out_k["desc"]),
            sub(out_k["desc_conf"]),
        )
        h, w = Xs_f.shape[1:3]
        n = h * w
        Xff = Xs_f.reshape(1, n, 3)
        Cff = Cs_f.reshape(1, n, 1)
        Qff = Qs_f.reshape(1, n, 1)
        Xkf = Xs_k.reshape(1, n, 3)
        Ckf = Cs_k.reshape(1, n, 1)
        Qkf = Qs_k.reshape(1, n, 1)

        # The (Q, C, X) payload the tracking core needs at the matched
        # view-1 pixels rides the matcher's window streams (no row gather),
        # and the uniqueness mask comes back as shifted ORs (no scatter).
        # The calibrated core constrains points to rays BEFORE selection,
        # so it keeps the generic gather path.
        if use_calib:
            idx, valid = match(Xs_f, Xs_k, Ds_f, Ds_k, idx_init)
            core = _track_core_calib(
                idx[0], valid[0], Qff[0], Qkf[0],
                Xff[0], Cff[0], kX, kC / jnp.maximum(kN, 1.0), Xkf[0],
                T_WCf, T_WCk, K, (h, w), cfg_key,
            )
        else:
            pay_img = jnp.concatenate(
                [Qs_f[..., None], Cs_f[..., None], Xs_f], axis=-1
            )
            idx, valid, pay_g, hit = match(
                Xs_f, Xs_k, Ds_f, Ds_k, idx_init,
                payload=pay_img, want_hit=True,
            )
            core = _track_core_rays(
                idx[0], valid[0], Qff[0], Qkf[0],
                Xff[0],  # fresh frame: canonical state IS the model output
                Cff[0], kX, kC / jnp.maximum(kN, 1.0), Xkf[0],
                T_WCf, T_WCk, cfg_key,
                pay_g=pay_g[0], unique_hit=hit[0],
            )
        from mast3r_slam_tpu.frame import fuse_pointmap_masked

        kX2, kC2, kN2 = fuse_pointmap_masked(
            kX, kC, kN, core["Xkk"], Ckf[0], filtering_mode
        )

        # -- on-device decision (reference tracker.py:116-119, :151-161) --
        match_frac, match_frac_k, unique_frac_f = (
            core["stats"][0], core["stats"][1], core["stats"][2]
        )
        min_match_frac, match_frac_thresh = cfg_key[2], cfg_key[9]
        skip = match_frac < min_match_frac
        new_kf = jnp.logical_and(
            jnp.logical_not(skip),
            jnp.minimum(match_frac_k, unique_frac_f) < match_frac_thresh,
        )
        # Retired (= old-keyframe) state: fused through this frame unless
        # the frame was skipped, in which case it passes through untouched.
        ret_X = jnp.where(skip, kX, kX2)
        ret_C = jnp.where(skip, kC, kC2)
        ret_N = jnp.where(skip, kN, kN2)

        def promote(_):
            # Mono self-pair decode: the new keyframe's canonical pointmap
            # (reference mast3r_utils.py:255-321 via slam.py:199-214).
            out_m, _ = model.net.apply(
                params, feat_f, pos_f, feat_f, pos_f, out_hw,
                method=MASt3RNet.decode,
            )
            Xm = sub(out_m["pts3d"]).reshape(n, 3)
            Cm = sub(out_m["conf"]).reshape(n, 1)
            return (
                feat_f[0], pos_f[0], Xm, Cm,
                jnp.asarray(1.0, ret_N.dtype), core["T_WCf"],
            )

        def keep(_):
            return feat_k, pos_k, ret_X, ret_C, ret_N, T_WCk

        nfeat, npos, nX, nC, nN, nT = jax.lax.cond(new_kf, promote, keep, None)

        T_out = jnp.where(skip, T_WCf, core["T_WCf"])
        iota = jnp.arange(n, dtype=idx.dtype)[None]
        idx_next = jnp.where(jnp.logical_or(skip, new_kf), iota, idx)

        event = jnp.where(
            skip, float(EVENT_SKIP), jnp.where(new_kf, float(EVENT_NEW_KF), 0.0)
        )
        stats6 = jnp.stack(
            [match_frac, match_frac_k, unique_frac_f, event, nN, ret_N]
        )
        return dict(
            idx=idx_next,
            stats=stats6,
            T_WCf=T_out,
            frame_X=Xff[0],
            frame_C=Cff[0],
            kf_feat=nfeat,
            kf_pos=npos,
            kf_X=nX,
            kf_C=nC,
            kN=nN,
            kf_T=nT,
            ret_X=ret_X,
            ret_C=ret_C,
            feat=feat_f[0],
            pos=pos_f[0],
        )

    def program(params, img_f, *rest):
        feat_f, pos_f = model.net.apply(
            params, img_f[None] * 2.0 - 1.0, method=MASt3RNet.encode
        )
        return body(params, feat_f, pos_f, *rest)

    if _return_body:
        return body
    return jax.jit(program)


def _make_fused_track_chain_scan(
    model, cfg, filtering_mode: str, img_downsample: int = 1,
    use_calib: bool = False,
):
    """ONE dispatch per WINDOW: the per-frame chained program scanned over
    a [K, H, W, 3] image batch. Over a relay link this amortizes the
    per-dispatch cost (~4.7 ms of param-handle serialization per call —
    the largest host-side cost left after the stats sync moved to window
    cadence) down to once per window, on top of the one batched image
    transfer and one stats fetch. Per-frame outputs come back stacked
    [K, ...]; the final chain state is returned under "final"."""
    # `_return_body` yields the post-encode per-frame body, traced inline
    # (a nested jit keeps a `closed_call` label in profiles; inlining keeps
    # op attribution flat) — the window encodes all K frames in ONE
    # batched ViT-L pass below instead of per-frame inside the chain.
    from mast3r_slam_tpu.models.mast3r import MASt3RNet

    step_fn = _make_fused_track_chain(
        model, cfg, filtering_mode, img_downsample, use_calib,
        _return_body=True,
    )
    out_hw = model._out_hw
    _PER_FRAME = (
        "stats", "T_WCf", "frame_X", "frame_C", "feat", "pos",
        "ret_X", "ret_C", "kf_X", "kf_C", "kf_T",
    )
    _STATE = ("kf_feat", "kf_pos", "idx", "kf_X", "kf_C", "kN", "T_prev", "kf_T")

    def program(
        params,
        imgs,  # [K, H, W, 3] uint8 or float
        feat_k,
        pos_k,
        idx_init,  # [1, N] int32 (host passes iota when no warm start)
        kX,
        kC,
        kN,
        T_WCf,
        T_WCk,
        K=None,
    ):
        if imgs.dtype == jnp.uint8:
            imgs = imgs.astype(jnp.float32) / 255.0
        rt = get_config().runtime
        # ONE batched ViT-L encode for the whole window: each frame's
        # encode is independent of the chain state (only decode consumes
        # the keyframe side), so hoisting it out of the sequential chain
        # turns K weight-streaming B=1 passes into one B=K pass — the
        # encoder's 300M bf16 params ride HBM once per window and the
        # [S, D] matmuls run at K x the M dimension (MXU utilization).
        # Gated (runtime.window_batched_encode) for the on-chip A/B vs
        # inline per-frame encodes; spec decode consumes the batched
        # features so it forces the hoist.
        batched_encode = rt.window_batched_encode or (
            rt.window_spec_decode and not use_calib
        )
        feat_all = pos_all = None
        if batched_encode:
            feat_all, pos_all = model.net.apply(
                params, imgs * 2.0 - 1.0, method=MASt3RNet.encode
            )

        # Speculative batched decode (runtime.window_spec_decode): all K
        # frames against the WINDOW-START keyframe in one pass — decoder +
        # DPT weights ride HBM once per window, like the batched encode
        # above. Chunked by window_decode_microbatch to bound activation
        # transients (v5e HLO-temp ceiling, same fix as serving). Exact:
        # frames after an on-device promotion fall back to live decodes
        # via the per-frame lax.cond in `body`.
        spec_f_all = spec_k_all = None
        # (calib mode keeps per-frame decodes: the decode itself is
        # calib-independent, but the calib window path has no scan-parity
        # test yet — enable there only with that evidence in place)
        if rt.window_spec_decode and not use_calib:
            kn = imgs.shape[0]

            def spec_decode(ff, pf):
                rep = lambda a: jnp.broadcast_to(  # noqa: E731
                    a, (ff.shape[0],) + a.shape
                )
                return model.net.apply(
                    params, ff, pf, rep(feat_k), rep(pos_k), out_hw,
                    method=MASt3RNet.decode,
                )

            mb = rt.window_decode_microbatch
            if mb and kn > mb:
                # Chunk floor(kn/mb) full microbatches + a remainder pass:
                # the chunking exists to bound the decoder/DPT activation
                # working set, so an indivisible window must NOT silently
                # fall back to the full-batch decode it was added to avoid.
                nfull = kn // mb
                kfull = nfull * mb

                def chunk(_, xs):
                    return 0, spec_decode(*xs)

                _, (spec_f_all, spec_k_all) = jax.lax.scan(
                    chunk, 0,
                    (feat_all[:kfull].reshape(nfull, mb, *feat_all.shape[1:]),
                     pos_all[:kfull].reshape(nfull, mb, *pos_all.shape[1:])),
                )
                unchunk = lambda a: a.reshape(kfull, *a.shape[2:])  # noqa: E731
                spec_f_all = jax.tree_util.tree_map(unchunk, spec_f_all)
                spec_k_all = jax.tree_util.tree_map(unchunk, spec_k_all)
                if kfull < kn:
                    rem_f, rem_k = spec_decode(feat_all[kfull:], pos_all[kfull:])
                    cat = lambda a, b: jnp.concatenate([a, b], axis=0)  # noqa: E731
                    spec_f_all = jax.tree_util.tree_map(cat, spec_f_all, rem_f)
                    spec_k_all = jax.tree_util.tree_map(cat, spec_k_all, rem_k)
            else:
                spec_f_all, spec_k_all = spec_decode(feat_all, pos_all)

        state = (
            (feat_k, pos_k, idx_init, kX, kC, kN, T_WCf, T_WCk),
            jnp.asarray(True),  # spec still valid (no promotion yet)
        )

        def step(st, xs):
            if batched_encode:
                feat_f, pos_f, sf, sk = xs
                feat_f, pos_f = feat_f[None], pos_f[None]
            else:
                img_f, sf, sk = xs
                feat_f, pos_f = model.net.apply(
                    params, img_f[None] * 2.0 - 1.0, method=MASt3RNet.encode
                )
            (fk, pk, idx, X, C, N, Tp, Tk), ok = st
            out = step_fn(
                params, feat_f, pos_f,
                fk, pk, idx, X, C, N, Tp, Tk, K,
                spec_f=sf, spec_k=sk, spec_ok=ok,
            )
            ok2 = jnp.logical_and(ok, out["stats"][3] != float(EVENT_NEW_KF))
            st2 = (
                out["kf_feat"], out["kf_pos"], out["idx"], out["kf_X"],
                out["kf_C"], out["kN"], out["T_WCf"], out["kf_T"],
            )
            return (st2, ok2), {k: out[k] for k in _PER_FRAME}

        # FULLY UNROLLED window (K is small and static — runtime.sync_every,
        # default 8). A `lax.scan` here costs ~2x on device: the while body
        # is compiled as an isolated region whose loop-carried [N,*] buffers
        # pick up aliasing/double-buffering constraints that block the
        # packed-gather fusions of the correspondence core (profiled on
        # v5e: the same `_track_core_rays` gather is 1.95 ms/frame inside
        # the scan body vs 0.49 ms flat; scatter-max 1.31 vs <0.12), plus
        # per-iteration device idle. Unrolling hands XLA the flat dataflow
        # of K chained steps — identical fusion freedom to the standalone
        # per-frame program — at the price of a longer (cached) compile.
        # `unroll=K` (not a Python loop): the body jaxpr is traced ONCE and
        # duplicated at the jaxpr level — a Python loop re-traces the
        # 686M-param body K times, which costs minutes of host time per
        # process even when the XLA compile itself is cache-served.
        xs = (
            (feat_all, pos_all, spec_f_all, spec_k_all)
            if batched_encode
            else (imgs, spec_f_all, spec_k_all)
        )
        (state2, _), outs = jax.lax.scan(
            step, state, xs, unroll=imgs.shape[0],
        )
        outs["final"] = dict(zip(_STATE, state2))
        return outs

    return jax.jit(program)


class WindowRow:
    """Lazy per-frame view into a window handle's stacked outputs — heavy
    arrays are sliced only when an event actually needs them."""

    __slots__ = ("_out", "_j")

    def __init__(self, out: dict, j: int):
        self._out, self._j = out, j

    def __getitem__(self, key: str):
        return self._out[key][self._j]


def _make_fused_track(
    model, cfg, filtering_mode: str, img_downsample: int = 1,
    use_calib: bool = False,
):
    """Build THE per-frame program: decode-from-cache + dense matching +
    pointmap fusion + GN pose + keyframe fusion + statistics, all in ONE
    jit. Over a high-latency host<->device link, per-frame cost is then one
    dispatch and one scalar-bundle sync — the eager glue the reference did
    between kernels (dozens of small ops) never exists on the wire."""
    from mast3r_slam_tpu.frame import fuse_pointmap_masked
    from mast3r_slam_tpu.matching import match
    from mast3r_slam_tpu.models.mast3r import MASt3RNet

    f = max(1, img_downsample)

    if use_calib:
        cfg_key = _calib_cfg_key(cfg)
    else:
        cfg_key = _rays_cfg_key(cfg)
    out_hw = model._out_hw

    def program(
        params,
        feat_f,
        pos_f,
        feat_k,
        pos_k,
        idx_init,  # [1, N] int32 or None
        fX,
        fC,
        fN,  # frame canonical state (pre-update)
        kX,
        kC,
        kN,  # keyframe canonical state
        T_WCf,
        T_WCk,
        K=None,  # intrinsics (calib mode only)
    ):
        out_f, out_k = model.net.apply(
            params,
            feat_f[None],
            pos_f[None],
            feat_k[None],
            pos_k[None],
            out_hw,
            method=MASt3RNet.decode,
        )
        def sub(a):  # dataset.img_downsample stride slicing (static)
            return a[:, ::f, ::f] if f > 1 else a

        Xi_f, Ci_f, Di_f, Qi_f = (
            sub(out_f["pts3d"]), sub(out_f["conf"]), sub(out_f["desc"]),
            sub(out_f["desc_conf"]),
        )
        Xi_k, Ci_k, Di_k, Qi_k = (
            sub(out_k["pts3d"]), sub(out_k["conf"]), sub(out_k["desc"]),
            sub(out_k["desc_conf"]),
        )
        h, w = Xi_f.shape[1:3]
        n = h * w
        Xff = Xi_f.reshape(1, n, 3)
        Cff = Ci_f.reshape(1, n, 1)
        Qff = Qi_f.reshape(1, n, 1)
        Xkf = Xi_k.reshape(1, n, 3)
        Ckf = Ci_k.reshape(1, n, 1)
        Qkf = Qi_k.reshape(1, n, 1)

        fX2, fC2, fN2 = fuse_pointmap_masked(
            fX, fC, fN, Xff[0], Cff[0], filtering_mode
        )
        fC2_avg = fC2 / jnp.maximum(fN2, 1.0)
        if use_calib:
            idx, valid = match(Xi_f, Xi_k, Di_f, Di_k, idx_init)
            core = _track_core_calib(
                idx[0], valid[0], Qff[0], Qkf[0], fX2, fC2_avg,
                kX, kC / jnp.maximum(kN, 1.0), Xkf[0],
                T_WCf, T_WCk, K, (h, w), cfg_key,
            )
        else:
            # Payload selection + uniqueness ride the matcher's window
            # streams (see _make_fused_track_chain); calib keeps the
            # generic path (ray constraint precedes selection there).
            pay_img = jnp.concatenate(
                [
                    Qff.reshape(1, h, w, 1),
                    fC2_avg.reshape(1, h, w, 1),
                    fX2.reshape(1, h, w, 3),
                ],
                axis=-1,
            )
            idx, valid, pay_g, hit = match(
                Xi_f, Xi_k, Di_f, Di_k,
                idx_init, payload=pay_img, want_hit=True,
            )
            core = _track_core_rays(
                idx[0], valid[0], Qff[0], Qkf[0], fX2, fC2_avg,
                kX, kC / jnp.maximum(kN, 1.0), Xkf[0],
                T_WCf, T_WCk, cfg_key,
                pay_g=pay_g[0], unique_hit=hit[0],
            )
        kX2, kC2, kN2 = fuse_pointmap_masked(
            kX, kC, kN, core["Xkk"], Ckf[0], filtering_mode
        )
        # ONE scalar bundle for the host decision: every extra fetch is a
        # full link round trip.
        stats5 = jnp.concatenate(
            [core["stats"], fN2[None], kN2[None]], axis=0
        )
        return dict(
            idx=idx,
            stats=stats5,
            T_WCf=core["T_WCf"],
            frame_X=fX2,
            frame_C=fC2,
            kf_X=kX2,
            kf_C=kC2,
            Qkf=Qkf,
            Qff=Qff,
        )

    return jax.jit(program)


class FrameTracker:
    """Tracks each frame against the last keyframe (parity: tracker.py:23)."""

    def __init__(self, model, keyframes: Keyframes):
        self.model = model
        self.keyframes = keyframes
        cfg = get_config()
        self.cfg = cfg.tracking
        self.use_calib = cfg.use_calib
        self._img_downsample = max(1, cfg.dataset.img_downsample)
        self.idx_f2k: Optional[jax.Array] = None
        self.last_stats: Optional[dict] = None  # per-frame scalar bundle
        self._fused = None
        self._fused_chain = None
        self._fused_scan = None
        self._kf_cache: Optional[dict] = None
        self._chain: Optional[dict] = None  # device-chained keyframe state
        # world-frame pose correction awaiting application to the chain
        # (backend solves land while a window is in flight; a left delta
        # commutes through on-device promotions, so deferring it to the
        # next dispatch is exact)
        self._pending_delta: Optional[jax.Array] = None
        # Cumulative correction applied to THIS chain since it was (re)built
        # + a generation counter: window handles snapshot (gen, corr) at
        # dispatch so a drain can bring the window's stale pose belief up
        # to date before measuring a new arena delta (see
        # queue_arena_correction) — without this, a correction spanning two
        # drains is applied twice.
        self._corr_cum: jax.Array = lie.sim3_identity()
        self._chain_gen: int = 0
        self._use_fused = (
            model is not None
            and hasattr(model, "net")
            and self.cfg.filtering_mode in _ELEMENTWISE_FUSION
        )

    @property
    def can_pipeline(self) -> bool:
        return self._use_fused

    def _calib_live(self) -> bool:
        """Calibrated objective active: top-level use_calib AND intrinsics
        installed (reference falls back to rays when K is missing,
        tracker.py:97+326)."""
        return self.use_calib and self.keyframes.K is not None

    def reset_idx_f2k(self) -> None:
        self.idx_f2k = None

    # --------------------------------------------- zero-sync chained dispatch

    def _ensure_chain(self, kf_idx: int) -> dict:
        """Current device-chain state, rebuilt from the arena when absent
        or re-anchored to a different keyframe; applies any pending
        world-frame pose correction (left delta — commutes through the
        chain's on-device promotions, so late application is exact)."""
        chain = self._chain
        if chain is None or chain["kf_idx"] != kf_idx:
            kf = self._kf_state(kf_idx)
            chain = dict(
                kf_idx=kf_idx,
                feat=kf["feat"],
                pos=kf["pos"],
                X=kf["X"],
                C=kf["C"],
                N=jnp.asarray(kf["N"], jnp.float32),
                T=kf["T"],
                T_prev=None,
            )
            self._pending_delta = None  # arena poses are already corrected
            self._corr_cum = lie.sim3_identity()
            self._chain_gen += 1
        elif self._pending_delta is not None:
            delta = self._pending_delta
            chain["T"] = lie.sim3_mul(delta, chain["T"])
            if chain["T_prev"] is not None:
                chain["T_prev"] = lie.sim3_mul(delta, chain["T_prev"])
            self._pending_delta = None
            self._corr_cum = lie.sim3_mul(delta, self._corr_cum)
        return chain

    def _warm_idx(self) -> jax.Array:
        if self.idx_f2k is not None:
            return self.idx_f2k
        n = self.keyframes.h * self.keyframes.w
        return jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (1, n))

    def dispatch(self, frame: Frame, T_init: Optional[jax.Array] = None):
        """Dispatch the one-program chained tracking step for `frame`. NO
        host sync happens here — the keyframe/skip decision runs on device
        and the chain's keyframe state (including on-device promotions)
        threads through device futures. The host drains a window of handles
        with `sync_chain()` (one round trip per window).

        Returns an opaque handle, or None if there is no keyframe yet.
        """
        kf_idx = self.keyframes.last_index()
        if kf_idx is None:
            return None
        if self._fused_chain is None:
            self._fused_chain = _make_fused_track_chain(
                self.model, self.cfg, self.cfg.filtering_mode,
                self._img_downsample, use_calib=self._calib_live(),
            )

        chain = self._ensure_chain(kf_idx)
        T_WCf = chain["T_prev"]
        if T_WCf is None:
            T_WCf = T_init if T_init is not None else frame.T_WC

        out = self._fused_chain(
            self.model.params,
            frame.img,
            chain["feat"],
            chain["pos"],
            # _warm_idx (never None): an idx_init=None first call would be
            # a second trace signature — a second full compile of the
            # whole-model program; match() treats the identity iota and
            # None identically.
            self._warm_idx(),
            chain["X"],
            chain["C"],
            chain["N"],
            T_WCf,
            chain["T"],
            self.keyframes.K if self._calib_live() else None,
        )
        self.idx_f2k = out["idx"]
        self._chain = dict(
            kf_idx=chain["kf_idx"],
            feat=out["kf_feat"],
            pos=out["kf_pos"],
            X=out["kf_X"],
            C=out["kf_C"],
            N=out["kN"],
            T=out["kf_T"],
            T_prev=out["T_WCf"],
        )
        return dict(
            frame=frame, out=out, corr=(self._chain_gen, self._corr_cum)
        )

    def dispatch_window(
        self,
        frames: list,
        imgs: jax.Array,  # [K, H, W, 3] uint8/float, ONE batched transfer
        T_init: Optional[jax.Array] = None,
    ):
        """ONE device dispatch for a whole window of frames (the scanned
        chain program): params ship once, images ship as the given batch,
        and the stats for all frames come back in one stacked array.

        Returns a window handle (frames + stacked outputs), or None if
        there is no keyframe yet.
        """
        kf_idx = self.keyframes.last_index()
        if kf_idx is None:
            return None
        if self._fused_scan is None:
            self._fused_scan = _make_fused_track_chain_scan(
                self.model, self.cfg, self.cfg.filtering_mode,
                self._img_downsample, use_calib=self._calib_live(),
            )
        chain = self._ensure_chain(kf_idx)
        T_WCf = chain["T_prev"]
        if T_WCf is None:
            T_WCf = T_init if T_init is not None else frames[0].T_WC

        out = self._fused_scan(
            self.model.params,
            imgs,
            chain["feat"],
            chain["pos"],
            self._warm_idx(),
            chain["X"],
            chain["C"],
            chain["N"],
            T_WCf,
            chain["T"],
            self.keyframes.K if self._calib_live() else None,
        )
        fin = out["final"]
        self.idx_f2k = fin["idx"]
        self._chain = dict(
            kf_idx=chain["kf_idx"],
            feat=fin["kf_feat"],
            pos=fin["kf_pos"],
            X=fin["kf_X"],
            C=fin["kf_C"],
            N=fin["kN"],
            T=fin["kf_T"],
            T_prev=fin["T_prev"],
        )
        return dict(
            frames=frames,
            out=out,
            window=True,
            corr=(self._chain_gen, self._corr_cum),
        )

    def sync_chain(self, handles: list) -> np.ndarray:
        """Fetch all handles' stats bundles in ONE host round trip.

        Returns [K, 6] float: (match_frac, match_frac_k, unique_frac_f,
        event, kf_N_next, retired_N) per frame."""
        stats = jnp.stack([h["out"]["stats"] for h in handles])
        return np.asarray(stats)

    def commit_chain_frame(self, frame, row, stats_row, tracked: bool = True):
        """Record one chained frame's results host-side (no sync — the
        stats row came from the window's one stats fetch). `row` indexes
        the frame's outputs (a dict or a WindowRow)."""
        self.last_stats = dict(
            match_frac=float(stats_row[0]),
            match_frac_k=float(stats_row[1]),
            unique_frac_f=float(stats_row[2]),
        )
        frame.feat, frame.pos = row["feat"], row["pos"]
        frame.X_canon, frame.C = row["frame_X"], row["frame_C"]
        frame.N = frame.N_updates = 1
        if tracked:
            frame.T_WC = row["T_WCf"]

    def abort_chain(self) -> None:
        """Drop the device chain (reloc / mode change); the next dispatch
        rebuilds from the arena."""
        self._chain = None
        self._kf_cache = None
        self._pending_delta = None
        self._corr_cum = lie.sim3_identity()
        self._chain_gen += 1
        self.reset_idx_f2k()

    def push_pose_delta(self, delta: jax.Array) -> None:
        """Queue a world-frame pose correction for the next dispatch. Left
        deltas compose and commute through on-device promotions; callers
        measuring a delta against a DRAINED window's pose belief must go
        through `queue_arena_correction` instead, which first brings that
        belief up to date with corrections applied since the window was
        dispatched."""
        if self._pending_delta is None:
            self._pending_delta = delta
        else:
            self._pending_delta = lie.sim3_mul(delta, self._pending_delta)

    def queue_arena_correction(
        self,
        arena_T: jax.Array,
        window_kf_T: jax.Array,
        corr_at_dispatch: tuple[int, jax.Array],
    ) -> None:
        """Re-align the chain's pose belief with the arena after backend
        solves: queue `arena_T · inv(belief)` as a left world delta.

        `window_kf_T` is the drained window's final keyframe-pose belief
        and `corr_at_dispatch` the (generation, correction) snapshot from
        that window's handle. Corrections applied or queued since that
        dispatch are already in the live chain but NOT in `window_kf_T`,
        so the belief is brought up to date first — measuring against the
        stale belief would re-queue those corrections and apply them twice
        (one backend solve landing across two drains would double its
        delta). A snapshot from a previous chain generation is ignored:
        the rebuilt chain re-read the arena, which already carries every
        correction."""
        gen, corr0 = corr_at_dispatch
        if gen != self._chain_gen:
            return
        corr_now = self._corr_cum
        if self._pending_delta is not None:
            corr_now = lie.sim3_mul(self._pending_delta, corr_now)
        corr_since = lie.sim3_mul(corr_now, lie.sim3_inv(corr0))
        belief = lie.sim3_mul(corr_since, window_kf_T)
        self.push_pose_delta(lie.sim3_mul(arena_T, lie.sim3_inv(belief)))

    def refresh_chain(self, kf_idx: int) -> None:
        """Re-anchor the live chain's arena slot after a window drain (it
        moves on promotion or eviction compaction)."""
        if self._chain is not None:
            self._chain["kf_idx"] = kf_idx

    def track(self, frame: Frame, mast3r_match_fn: Callable):
        """Returns (new_kf: bool, match_info: list, try_reloc: bool)."""
        kf_idx = self.keyframes.last_index()
        if kf_idx is None:
            return False, [], True

        if self._use_fused:
            # the fused path reads keyframe state through its version cache
            # (no per-frame arena slicing)
            return self._track_fused(frame, kf_idx)
        keyframe = self.keyframes[kf_idx]

        (idx_f2k, valid_match_k, Xff, Cff, Qff, Xkf, Ckf, Qkf) = mast3r_match_fn(
            self.model, frame, keyframe, idx_i2j_init=self.idx_f2k
        )
        self.idx_f2k = idx_f2k
        idx0 = idx_f2k[0]
        valid0 = valid_match_k[0]

        # Frame pointmap fusion (mode per config).
        frame.update_pointmap(Xff[0], Cff[0])

        if self.use_calib and keyframe.K is not None:
            return self._track_calib(
                frame, keyframe, kf_idx, idx0, valid0, Qff[0], Qkf[0], Xkf[0], Ckf[0]
            )

        c = self.cfg
        cfg_key = (
            c.C_conf,
            c.Q_conf,
            c.min_match_frac,
            c.max_iters,
            c.huber,
            c.sigma_ray,
            c.sigma_dist,
            c.rel_error,
            c.delta_norm,
            c.match_frac_thresh,
            c.robust,
            c.tukey_t,
        )
        out = _track_core_rays(
            idx0,
            valid0,
            Qff[0],
            Qkf[0],
            frame.X_canon,
            frame.get_average_conf(),
            keyframe.X_canon,
            keyframe.get_average_conf(),
            Xkf[0],
            frame.T_WC,
            keyframe.T_WC,
            cfg_key,
        )
        return self._finish(frame, kf_idx, out, Ckf[0], Qkf, Qff)

    def _kf_state(self, kf_idx: int):
        """Device arrays of the tracked keyframe, cached against the arena
        version (rebuilding from arena slices costs several link dispatches
        per frame; the cache is refreshed from the fused outputs below)."""
        kfs = self.keyframes
        cache = self._kf_cache
        if cache is not None and cache["key"] == (kf_idx, kfs.version):
            return cache
        cache = dict(
            key=(kf_idx, kfs.version),
            feat=kfs._feat[kf_idx],
            pos=kfs._pos,
            X=kfs.X[kf_idx],
            C=kfs.C[kf_idx],
            N=float(kfs._n_host[kf_idx]),
            T=kfs.T_WC[kf_idx],
        )
        self._kf_cache = cache
        return cache

    def _track_fused(self, frame: Frame, kf_idx: int):
        """One-dispatch tracking step (see _make_fused_track)."""
        from mast3r_slam_tpu.inference import _ensure_encoded

        _ensure_encoded(self.model, frame)
        if self._fused is None:
            self._fused = _make_fused_track(
                self.model, self.cfg, self.cfg.filtering_mode,
                self._img_downsample, use_calib=self._calib_live(),
            )
            n = self.keyframes.h * self.keyframes.w
            self._zeros3 = jnp.zeros((n, 3))
            self._zeros1 = jnp.zeros((n, 1))
        kf = self._kf_state(kf_idx)
        fX = frame.X_canon if frame.X_canon is not None else self._zeros3
        fC = frame.C if frame.C is not None else self._zeros1
        # weak python scalars avoid a device-array dispatch per frame
        fN = float(frame.N)

        out = self._fused(
            self.model.params,
            frame.feat,
            frame.pos,
            kf["feat"],
            kf["pos"],
            # never None: a None first call would add a second trace
            # signature — a second full compile of the whole-model program
            self._warm_idx(),
            fX,
            fC,
            fN,
            kf["X"],
            kf["C"],
            kf["N"],
            frame.T_WC,
            kf["T"],
            self.keyframes.K if self._calib_live() else None,
        )
        self.idx_f2k = out["idx"]

        # ONE host sync for the whole frame.
        stats = np.asarray(out["stats"])
        match_frac, match_frac_k, unique_frac_f, frame_N, kf_N = (
            float(x) for x in stats
        )
        self.last_stats = dict(
            match_frac=match_frac,
            match_frac_k=match_frac_k,
            unique_frac_f=unique_frac_f,
        )

        # Frame pointmap fusion applies regardless of the tracking gate
        # (reference order: tracker.py:94 then :116).
        frame.X_canon, frame.C = out["frame_X"], out["frame_C"]
        frame.N = int(frame_N)
        frame.N_updates += 1

        c = self.cfg
        if match_frac < c.min_match_frac:
            print(f"Skipped frame {frame.frame_id}")
            return False, [], True

        frame.T_WC = out["T_WCf"]
        self.keyframes.write_pointmap(kf_idx, out["kf_X"], out["kf_C"], kf_N)
        # refresh the keyframe cache from the fused outputs (the arena write
        # above bumped the version)
        self._kf_cache = dict(
            key=(kf_idx, self.keyframes.version),
            feat=kf["feat"],
            pos=kf["pos"],
            X=out["kf_X"],
            C=out["kf_C"],
            N=kf_N,
            T=kf["T"],
        )

        new_kf = min(match_frac_k, unique_frac_f) < c.match_frac_thresh
        if new_kf:
            self.reset_idx_f2k()
        match_info = [
            out["kf_X"],
            out["kf_C"] / max(kf_N, 1.0),
            frame.X_canon,
            frame.get_average_conf(),
            out["Qkf"],
            out["Qff"],
        ]
        return new_kf, match_info, False

    def _track_calib(self, frame, keyframe, kf_idx, idx0, valid0, Qff, Qkf, Xkf, Ckf):
        """Calibrated objective path (parity: tracker.py:326-406)."""
        c = self.cfg
        K = keyframe.K
        h, w = self.keyframes.h, self.keyframes.w  # pointmap resolution
        n = h * w

        Qk = jnp.sqrt(jnp.take_along_axis(Qff, idx0[:, None], axis=0) * Qkf)
        Cf_avg = frame.get_average_conf()
        Ck_avg = keyframe.get_average_conf()
        Cf_g = jnp.take_along_axis(Cf_avg, idx0[:, None], axis=0)
        valid_opt = valid0 & (Cf_g > c.C_conf) & (Ck_avg > c.C_conf) & (Qk > c.Q_conf)
        valid_kf = valid0 & (Qk > c.Q_conf)

        Xf_c = constrain_points_to_ray((h, w), frame.X_canon[None], K)[0]
        Xk_c = constrain_points_to_ray((h, w), keyframe.X_canon[None], K)[0]
        uv = get_pixel_coords(1, (h, w), dtype=Xf_c.dtype).reshape(-1, 2)
        meas_k = jnp.concatenate([uv, jnp.log(jnp.maximum(Xk_c[:, 2:3], 1e-10))], -1)
        valid_meas = Xk_c[:, 2:3] > c.depth_eps

        Xf_g = jnp.take_along_axis(Xf_c, idx0[:, None], axis=0)
        wgt = valid_opt.astype(jnp.float32) * jnp.sqrt(Qk)
        sqrt_info = jnp.concatenate(
            [jnp.broadcast_to(wgt / c.sigma_pixel, (n, 2)), wgt / c.sigma_depth], -1
        )
        T_init = lie.sim3_mul(lie.sim3_inv(keyframe.T_WC), frame.T_WC)
        params = GNParams(
            sigma_pixel=c.sigma_pixel,
            sigma_depth=c.sigma_depth,
            huber_k=c.huber,
            robust=c.robust,
            tukey_t=c.tukey_t,
            max_iter=c.max_iters,
            delta_thresh=c.delta_norm,
            pixel_border=c.pixel_border,
            z_eps=c.depth_eps,
        )
        T_CkCf, cost = gauss_newton_pose_calib(
            T_init, Xf_g, meas_k, sqrt_info, valid_meas, K, (h, w), params
        )
        Xkk = lie.sim3_act(T_CkCf[None], Xkf)
        hit = jnp.zeros((n,), jnp.float32).at[idx0].max(valid0[:, 0].astype(jnp.float32))
        out = dict(
            Qk=Qk,
            T_WCf=lie.sim3_mul(keyframe.T_WC, T_CkCf),
            T_CkCf=T_CkCf,
            Xkk=Xkk,
            cost=cost,
            stats=jnp.stack(
                [
                    jnp.mean(valid_opt.astype(jnp.float32)),
                    jnp.mean(valid_kf.astype(jnp.float32)),
                    jnp.mean(hit),
                ]
            ),
        )
        return self._finish(frame, kf_idx, out, Ckf, Qkf[None], Qff[None])

    def _finish(self, frame, kf_idx, out, Ckf, Qkf, Qff):
        c = self.cfg
        # ONE host sync for the whole step.
        match_frac, match_frac_k, unique_frac_f = (
            float(x) for x in np.asarray(out["stats"])
        )
        self.last_stats = dict(
            match_frac=match_frac,
            match_frac_k=match_frac_k,
            unique_frac_f=unique_frac_f,
        )

        if match_frac < c.min_match_frac:
            print(f"Skipped frame {frame.frame_id}")
            return False, [], True

        frame.T_WC = out["T_WCf"]

        # Fuse tracked points back into the keyframe pointmap.
        kf = self.keyframes[kf_idx]
        kf.update_pointmap(out["Xkk"], Ckf)
        self.keyframes.write_pointmap(
            kf_idx, kf.X_canon, kf.C, float(kf.N),
            n_updates=kf.N_updates, score=kf._score,
        )

        new_kf = min(match_frac_k, unique_frac_f) < c.match_frac_thresh
        if new_kf:
            self.reset_idx_f2k()

        match_info = [
            kf.X_canon,
            kf.get_average_conf(),
            frame.X_canon,
            frame.get_average_conf(),
            Qkf,
            Qff,
        ]
        return new_kf, match_info, False
