"""End-of-round benchmark: tracking FPS on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

Metric: frontend tracking throughput — the FULL per-frame device program
(per-frame ViT-L/16 encode + two-view decode + dense matching + on-device
Sim3 GN + both pointmap fusions + the on-device keyframe decision) at the
512x384 flagship resolution, bf16, dispatched as chained 8-frame window
programs (the deployment program `slam.py` actually runs; on-host TPU
serving has microsecond sync costs — this harness reaches the chip through
a relay whose ~100 ms per-round-trip would otherwise measure the tunnel,
not the machine). This is apples-to-apples with the baseline derivation
below, which also includes the reference's per-frame encode. The
decode-from-cached-features chained step (r01/r02's headline) and the
fully-orchestrated FPS (one relay round trip per window) are reported on
stderr alongside; if the window leg cannot run, the JSON falls back to the
decode-from-cached metric.

Baseline derivation (BASELINE.md): the reference publishes no end-to-end
FPS, so the baseline is its implied per-frame tracking budget on Apple
M4 Pro: 183 ms ViT-L two-view inference (mast3r_utils.py:58) + 8.7 ms
iter_proj (50k pts) + 15 ms refine + ~10 ms CPU GN ≈ 217 ms -> 4.6 FPS.
vs_baseline = our_fps / 4.6.
"""

from __future__ import annotations

import contextlib
import io
import json
import sys
import time

BASELINE_FPS = 4.6


def _measure_rtt_ms(n: int = 6) -> list[float]:
    """Sample the host<->device round-trip: dispatch a trivial program with
    a DISTINCT input each call (the relay serves repeated identical
    executions from a result cache) and fetch the scalar. Records the link
    health INTO the bench output so orchestrated readings are
    self-adjudicating (VERDICT r4: every orchestrated number in history
    needed after-the-fact relay forensics)."""
    import jax.numpy as jnp

    float(jnp.sum(jnp.full((8, 8), 777.0)))  # absorb compile
    out = []
    for i in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(jnp.full((8, 8), float(i))))
        out.append(round((time.perf_counter() - t0) * 1e3, 2))
    return out


def _device_watchdog(timeout_s: float = 180.0, retries: int = 15) -> None:
    """Fail fast (instead of hanging the driver) if the device tunnel is
    wedged: probe a trivial op from a side thread; on timeout, wait and
    re-probe (the relay's far side wedges transiently for minutes after an
    interrupted client — observed repeatedly; a single hard abort would
    forfeit the run), hard-exiting only after `retries` attempts."""
    import threading
    import os

    done = threading.Event()

    def probe():
        import jax.numpy as jnp

        while True:
            try:
                float(jnp.sum(jnp.ones((8, 8))))
                done.set()
                return
            except Exception:
                time.sleep(10.0)

    threading.Thread(target=probe, daemon=True).start()
    for attempt in range(retries):
        if done.wait(timeout_s):
            return
        print(
            f"[bench] device probe timed out ({timeout_s}s, attempt "
            f"{attempt + 1}/{retries}) — waiting for the tunnel to recover",
            file=sys.stderr,
        )
    print(
        f"[bench] TPU tunnel unresponsive after {retries} probe windows; "
        "aborting",
        file=sys.stderr,
    )
    os._exit(2)


def main() -> int:
    import numpy as np

    t_setup = time.time()
    import jax
    import jax.numpy as jnp

    # --smoke: run every leg at test scale on the host CPU — validates the
    # bench's own code paths (program signatures, chain-state plumbing,
    # stats shapes) without burning a hardware run on a typo. Numbers are
    # meaningless; the JSON line is suppressed.
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update(
        "jax_compilation_cache_dir",
        # smoke runs on whatever host CPU is around: keep its AOT artifacts
        # out of the TPU cache (cross-machine CPU reuse risks SIGILL)
        "/tmp/jax_cache_smoke" if smoke else "/root/repo/.jax_cache",
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if not smoke:
        _device_watchdog()

    from mast3r_slam_tpu.config import Config, set_config
    from mast3r_slam_tpu.frame import Keyframes, Mode, create_frame
    from mast3r_slam_tpu.models import MASt3RModel
    from mast3r_slam_tpu.slam import SLAM
    from mast3r_slam_tpu.tracker import FrameTracker, _make_fused_track

    backend = jax.default_backend()
    # Tracking-throughput configuration: full iterative matching + refine;
    # gates opened so random-weight pointmaps keep the pipeline in TRACKING
    # (we measure the tracking path, not reloc churn).
    set_config(
        Config.from_dict(
            {
                # tanh gelu: the deployment-config default (configs/base.yaml)
                # — 1.7 ms/frame cheaper than exact erf on v5e, sub-bf16-ulp
                # deviation (docs/PLAN.md A/B matrix). serving_scan_unroll=4:
                # the measured knee of the serving microbatch scan (also the
                # base.yaml default; scripts/measure_serving_unroll.py matrix)
                "runtime": {
                    "keyframe_capacity": 32,
                    "gelu_impl": "tanh",
                    "serving_scan_unroll": 4,
                },
                "local_opt": {"max_edges": 32},
                "matching": {
                    # gather-free dense cost-volume matcher (ops/dense_match):
                    # the TPU-native formulation; "iterative" (reference
                    # algorithm) is config-selectable and ~100 ms slower at
                    # this resolution (docs/PLAN.md measurements)
                    "method": "dense",
                    # coarse-to-fine tap lattice (deployment default,
                    # configs/base.yaml): same ±6 px reach as the exhaustive
                    # radius-6 lattice with 89 taps vs 169 — window-program
                    # A/B on v5e 16.70 vs 18.65 ms/frame (docs/PLAN.md)
                    "dense_radius": 3,
                    "dense_dilations": (2, 1),
                    "dist_thresh": 1e6,
                },
                "tracking": {
                    "min_match_frac": 0.0,
                    "match_frac_thresh": 0.0,  # never trigger new keyframes
                    "Q_conf": 0.0,
                },
            }
        )
    )

    if smoke:
        from mast3r_slam_tpu.models import MASt3RConfig

        resolution = 64
        model = MASt3RModel.create(
            resolution=resolution, _test_cfg=MASt3RConfig.tiny()
        )
    else:
        resolution = 512
        model = MASt3RModel.create(
            model_type="mast3r_full", resolution=resolution, precision="bf16"
        )
    h, w = model._out_hw
    print(
        f"[bench] backend={backend} params={model.num_params()/1e6:.1f}M "
        f"{h}x{w} setup={time.time()-t_setup:.1f}s",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)

    # ---- device-chained throughput (headline) -----------------------------
    kfs = Keyframes(h, w)
    kf = create_frame(0, jnp.asarray(base))
    from mast3r_slam_tpu.inference import mast3r_inference_mono

    X, C, feat, pos = mast3r_inference_mono(model, kf)
    kf.X_canon, kf.C, kf.feat, kf.pos = X, C, feat, pos
    kf.N = kf.N_updates = 1
    kfs.append(kf)

    frame = create_frame(
        1,
        jnp.asarray(
            np.clip(base + rng.normal(0, 0.005, base.shape).astype(np.float32), 0, 1)
        ),
    )
    tracker = FrameTracker(model, kfs)
    from mast3r_slam_tpu.inference import _ensure_encoded

    _ensure_encoded(model, frame)
    fused = _make_fused_track(model, tracker.cfg, tracker.cfg.filtering_mode)

    @jax.jit
    def step_once(params, featf, posf, featk, posk, kX, kC, Tk, fX, fC, fN, T):
        out = fused(
            params, featf, posf, featk, posk, None,
            fX, fC, fN, kX, kC, jnp.asarray(1.0), T, Tk,
        )
        return out["frame_X"], out["frame_C"], out["stats"][3], out["T_WCf"]

    consts = (
        model.params, frame.feat, frame.pos, kf.feat, kf.pos,
        kf.X_canon, kf.C, kf.T_WC,
    )
    n0 = h * w
    state0 = (
        jnp.zeros((n0, 3)),
        jnp.zeros((n0, 1)),
        jnp.zeros((), jnp.float32),
        kf.T_WC,
    )
    t0 = time.time()
    state = step_once(*consts, *state0)
    jax.block_until_ready(state[0])
    # One chained call to absorb any second trace (output weak types can
    # differ from the hand-built initial state).
    state = step_once(*consts, *state)
    jax.block_until_ready(state[0])
    print(f"[bench] fused-track compile {time.time()-t0:.1f}s", file=sys.stderr)

    # Throughput: independent dispatches queue on the single device stream;
    # one final sync — the per-call link RTT does not pollute the number.
    # State is THREADED through the chain (frame i+1 consumes frame i's
    # outputs): real SLAM dependency structure, and no two calls share
    # identical inputs (the relay serves repeated identical executions from
    # a result cache, which would measure the cache, not the chip —
    # docs/PLAN.md).
    chain = 20
    t0 = time.perf_counter()
    st = state
    for _ in range(chain):
        st = step_once(*consts, *st)
    # Force COMPLETION of the whole chain with a scalar fetch: on the relay
    # backend block_until_ready can return before the device finishes (a
    # post-block fetch was measured to cost a full program time), so a
    # block-only stop undercounts the last link of the chain.
    float(st[2])
    per_frame = (time.perf_counter() - t0) / chain
    fps_device = 1.0 / per_frame
    print(
        f"[bench] device-chained: {per_frame*1e3:.1f} ms/frame "
        f"({fps_device:.1f} FPS)",
        file=sys.stderr,
    )

    # ---- fully-orchestrated SLAM FPS (secondary, relay-bound) -------------
    from mast3r_slam_tpu.dataloader import Dataset

    # Frames precomputed: __getitem__ must cost what a decoded dataset frame
    # costs (~memcpy), not a 590k-float RNG draw — on this 1-core host that
    # would serialize with the tracking loop under the GIL and measure the
    # synthetic generator, not the pipeline.
    frames_u8 = [
        (
            np.clip(base + rng.normal(0, 0.005, base.shape), 0, 1) * 255
        ).astype(np.uint8)
        for _ in range(8)
    ]

    class Synthetic(Dataset):
        def __len__(self):
            return 96

        def __getitem__(self, idx):
            return float(idx), frames_u8[idx % len(frames_u8)]

    # Steady state only: the first frames absorb the remaining compiles
    # (warm-start-idx trace variant, chained-promotion branch), measured via
    # per-frame callback stamps. The zero-sync chained loop drains stats in
    # windows (runtime.sync_every), so frames complete in bursts — the
    # honest number is AGGREGATE steady-state throughput (frames / elapsed
    # over whole windows), not a per-frame median.
    slam = SLAM(model=model, resolution=resolution)
    stamps = []

    def cb(fr, kfs):
        stamps.append(time.perf_counter())

    sync_every = slam.config.runtime.sync_every
    n_run = 6 * sync_every
    rtt_before = _measure_rtt_ms()
    # Host->device upload bandwidth at the window payload size: through
    # the relay this is the orchestrated leg's usual bound (measured
    # ~10 MB/s on a degraded tunnel = ~0.5 s per 4.7 MB ViT-L window vs
    # a 141 ms device window; on a real TPU host DMA makes it vanish).
    # probe payload = one WINDOW's frames (sync_every, not the fixed 8 of
    # frames_u8) so the implied ceiling scales with the configured window
    up_probe = np.stack(
        [frames_u8[i % len(frames_u8)] for i in range(sync_every)]
    ).copy()
    up_bw = []
    for i in range(3):
        up_probe[0, 0, 0, 0] = np.uint8(200 + i)
        t0 = time.perf_counter()
        xp = jnp.asarray(up_probe)
        float(jnp.sum(xp[0, 0, 0].astype(jnp.float32)))
        up_bw.append(up_probe.nbytes / (time.perf_counter() - t0) / 1e6)
    upload_mbps = sorted(up_bw)[1]
    quiet = io.StringIO()
    t_orch0 = time.perf_counter()
    with contextlib.redirect_stdout(quiet):
        slam.run(Synthetic(), max_frames=n_run, callback=cb)
    rtt_after = _measure_rtt_ms()
    steady = 3 * sync_every  # last 3 whole windows
    orchestrated = steady / (stamps[-1] - stamps[-1 - steady])
    # Per-window host timeline: frames complete in bursts at each window
    # drain, so the window-final stamps ARE the host-side schedule. Recorded
    # into the bench JSON so a regressed orchestrated reading carries its
    # own diagnosis (uniform windows + low RTT = device-bound; one giant
    # window or RTT spikes = relay wedge; first-window outlier = warmup).
    wfinal = [stamps[k * sync_every - 1] - t_orch0
              for k in range(1, len(stamps) // sync_every + 1)]
    window_ms = [round((b - a) * 1e3, 1) for a, b in zip(wfinal, wfinal[1:])]
    window_bytes = up_probe.nbytes
    upload_bound_fps = sync_every / (window_bytes / (upload_mbps * 1e6))
    orch_diag = {
        "fps": round(orchestrated, 2),
        "sync_every": sync_every,
        "rtt_ms_before": rtt_before,
        "rtt_ms_after": rtt_after,
        "upload_mbps": round(upload_mbps, 1),
        "window_upload_mb": round(window_bytes / 1e6, 2),
        # FPS ceiling set by pushing each window's uint8 frames through
        # the link alone (upload-ahead overlaps it with compute, so
        # orchestrated ~ min(device_fps, this)).
        "upload_bound_fps": round(upload_bound_fps, 1),
        "window_final_ms": window_ms,
        "steady_windows_used": 3,
    }
    print(
        f"[bench] orchestrated SLAM steady-state (zero-sync chained loop, "
        f"1 relay round trip per {sync_every} frames): "
        f"{orchestrated:.2f} FPS  rtt(before/after)="
        f"{min(rtt_before):.0f}-{max(rtt_before):.0f}/"
        f"{min(rtt_after):.0f}-{max(rtt_after):.0f} ms  "
        f"upload={upload_mbps:.1f} MB/s (bound {upload_bound_fps:.1f} FPS)  "
        f"windows_ms={window_ms}",
        file=sys.stderr,
    )

    # ---- full-program device window chain (honest per-frame cost) ---------
    # The headline above times decode-from-cached-features; THIS times the
    # deployment window program end-to-end on device: per-frame ViT-L
    # encode + two-view decode + dense match + GN pose + both pointmap
    # fusions + the on-device keyframe decision, one dispatch per
    # `sync_every`-frame window. Reuses the orchestrated run's compiled
    # program and final chain state (re-tracing the unrolled 686M-param
    # body costs minutes). 4 warm windows absorb dispatch-pipeline fill;
    # 8 timed windows close with one scalar fetch.
    fps_full = None
    try:
        scan_fn = slam.tracker._fused_scan
        chain_st = slam.tracker._chain
        if scan_fn is not None and chain_st is not None:
            K = sync_every
            wins = []
            for wseed in range(12):
                arr = np.stack(
                    [frames_u8[(wseed * K + j) % len(frames_u8)] for j in range(K)]
                ).copy()
                arr[:, 0, 0, 0] = np.uint8(wseed)  # distinct inputs/window
                wins.append(jnp.asarray(arr))
            jax.block_until_ready(wins)
            n = chain_st["X"].shape[0]
            idx0 = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None], (1, n)
            )

            def wcall(imgs, st):
                return scan_fn(
                    model.params, imgs, st["feat"], st["pos"], idx0,
                    st["X"], st["C"], st["N"], st["T"], st["T"], None,
                )

            def fin(out):
                f = out["final"]
                return dict(
                    feat=f["kf_feat"], pos=f["kf_pos"], X=f["kf_X"],
                    C=f["kf_C"], N=f["kN"], T=f["kf_T"],
                )

            st = chain_st
            for wnd in range(4):  # pipeline fill / warmup
                out = wcall(wins[wnd], st)
                st = fin(out)
            float(out["stats"][-1, 0])  # warm windows complete
            t0 = time.perf_counter()
            for wnd in range(4, 12):
                out = wcall(wins[wnd], st)
                st = fin(out)
            float(out["stats"][-1, 0])
            per = (time.perf_counter() - t0) / (8 * K)
            fps_full = 1.0 / per
            print(
                f"[bench] full-program device window chain (encode + decode "
                f"+ match + GN + fusion + promotion, 1 dispatch/{K} frames): "
                f"{per*1e3:.2f} ms/frame ({1/per:.1f} FPS)",
                file=sys.stderr,
            )
    except Exception as e:  # must never sink the headline metric
        print(f"[bench] full-program leg skipped: {e}", file=sys.stderr)

    # ---- serving throughput (B sequences per dispatch, secondary) ---------
    serving_results = {}
    try:
        from mast3r_slam_tpu.serving import BatchTracker

        # Amortization curve over batch size; the in-dispatch microbatch scan
        # (runtime.serving_microbatch = 4) keeps decode/DPT transients at the
        # B=4 working set that fits v5e HLO-temp memory at every B, so
        # launch/weight-stream overhead is the only thing B amortizes.
        for B in (8, 16):
            tileB = lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim)
            bt = BatchTracker(model)
            bt.init_from_keyframes(
                tileB(kf.feat), tileB(kf.pos), tileB(kf.X_canon), tileB(kf.C)
            )
            posB = tileB(frame.pos)
            featsB = [tileB(frame.feat) + i * 1e-4 for i in range(10)]
            jax.block_until_ready(featsB)
            bt.step(featsB[0], posB)
            bt.step(featsB[1], posB)
            # Zero-sync dispatch chain (tracked gate applied on device): the
            # per-batch stats handles are drained AFTER the chain, so the
            # relay RTT rides once, not once per batch — the serving analog
            # of the tracking loop's windowed drain.
            k = 8
            t0 = time.perf_counter()
            handles = [bt.step_async(featsB[2 + i], posB) for i in range(k)]
            stats = np.asarray(jnp.stack(handles))  # ONE fetch, all batches
            dt = (time.perf_counter() - t0) / k
            assert stats.shape[0] == k
            serving_results[B] = B / dt
            print(
                f"[bench] serving: {B} sequences/dispatch -> "
                f"{B/dt:.1f} tracked frames/s ({dt*1e3:.1f} ms/batch, stats "
                f"drained once per {k}-batch chain)",
                file=sys.stderr,
            )
    except Exception as e:  # serving must never sink the headline metric
        print(f"[bench] serving leg skipped: {e}", file=sys.stderr)

    # ---- chip-normalized achieved rates (analytic cost model) -------------
    # FLOP/byte totals from benchmarks/cost_model.py (validated against XLA
    # cost analysis in tests/test_cost_model.py) so every leg's number is
    # normalized to hardware peaks — "fast on this chip" becomes %MXU /
    # %HBM-weight-stream, and future regressions are attributable.
    mfu: dict = {}
    try:
        from benchmarks.cost_model import leg_summary, model_costs

        stages = model_costs(model.cfg, h, w)
        if fps_full is not None:
            mfu["window_program"] = leg_summary(
                stages, ("encode", "decode", "heads", "matcher"),
                1.0 / fps_full)
        # device-chained step decodes from cached features (no encode)
        mfu["device_step"] = leg_summary(
            stages, ("decode", "heads", "matcher"), 1.0 / fps_device)
        # the serving leg feeds pre-encoded features (step_async), so its
        # per-frame program is decode+heads+matcher
        for B, tfs in serving_results.items():
            mfu[f"serving_b{B}"] = leg_summary(
                stages, ("decode", "heads", "matcher"), 1.0 / tfs)
        print(f"[bench] mfu: {json.dumps(mfu)}", file=sys.stderr)
    except Exception as e:
        print(f"[bench] mfu computation skipped: {e}", file=sys.stderr)

    if smoke:
        print("[bench] smoke OK (all legs ran; numbers suppressed)",
              file=sys.stderr)
        return 0
    if fps_full is not None:
        headline = ("tracking_fps_512x384_vitl_bf16_full_program", fps_full)
    else:
        headline = ("tracking_fps_512x384_vitl_bf16_device", fps_device)
    orch_diag["pct_of_device"] = round(
        100.0 * orchestrated / (fps_full or fps_device), 1)
    print(
        json.dumps(
            {
                "metric": headline[0],
                "value": round(headline[1], 3),
                "unit": "frames/s",
                "vs_baseline": round(headline[1] / BASELINE_FPS, 3),
                "mfu": mfu,
                "orchestrated": orch_diag,
                "serving_tracked_fps": {
                    str(B): round(v, 1) for B, v in serving_results.items()
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
