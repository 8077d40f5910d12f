"""SLAM orchestration: the top-level pipeline + CLI.

Behavior parity: reference slam.py:28-415 (INIT/TRACKING/RELOC state
machine, keyframe-triggered backend, retrieval-driven relocalization with
tentative-keyframe rollback, results dict, trajectory/PLY export) — plus
the `main()` CLI the reference declared but never shipped
(pyproject.toml:58-59 vs slam.py:28; SURVEY §2.10).

TPU-native: host frame decode runs in a background prefetch thread while
the device tracks the current frame; per-frame work is a handful of jitted
programs with ~one host sync each.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.config import get_config, load_config
from mast3r_slam_tpu.dataloader import Dataset, PrefetchLoader, load_dataset
from mast3r_slam_tpu.frame import Frame, Keyframes, Mode, SLAMState, create_frame
from mast3r_slam_tpu.global_opt import FactorGraph
from mast3r_slam_tpu.inference import (
    mast3r_inference_mono,
    mast3r_match_asymmetric,
)
from mast3r_slam_tpu.lie import core as lie
from mast3r_slam_tpu.models.mast3r import load_mast3r
from mast3r_slam_tpu.retrieval_db import RetrievalDatabase, load_retriever
from mast3r_slam_tpu.tracker import FrameTracker
from mast3r_slam_tpu.utils.export import (
    save_ply,
    save_trajectory_kitti,
    save_trajectory_tum,
)


class SLAM:
    """TPU-native MASt3R-SLAM system (single chip, HBM-resident state)."""

    def __init__(
        self,
        config_path: Optional[str | Path] = None,
        model_type: str = "mast3r_full",
        model_variant: str = "base",
        resolution: int = 512,
        precision: str = "bf16",
        model=None,
    ):
        if config_path:
            load_config(config_path)
        self.config = get_config()

        if model is not None:
            self.model = model
        else:
            print(f"Loading {model_type} ({model_variant}, {resolution}px)...")
            self.model = load_mast3r(
                model_type=model_type,
                variant=model_variant,
                resolution=resolution,
                precision=precision,
                checkpoint=self.config.model.checkpoint,
                head_type=self.config.model.head_type,
            )
        # int8 weight streaming (runtime.weight_quant; models/quant.py) —
        # idempotent, so a caller-supplied pre-quantized model is fine.
        # Oracle/stub models (tests) have no quantize_weights: only a real
        # MASt3RModel can honor the flag.
        wq = self.config.runtime.weight_quant
        if wq != "none":
            if not hasattr(self.model, "quantize_weights"):
                raise ValueError(
                    f"runtime.weight_quant={wq!r} needs a MASt3RModel; "
                    f"got {type(self.model).__name__}"
                )
            self.model.quantize_weights(wq)
        self.resolution = resolution

        self.keyframes: Optional[Keyframes] = None
        self.tracker: Optional[FrameTracker] = None
        self.factor_graph: Optional[FactorGraph] = None
        self.state: Optional[SLAMState] = None
        self.retrieval_db: Optional[RetrievalDatabase] = None
        self.timestamps: list[float] = []
        self.poses: list[np.ndarray] = []
        self.metrics = None  # MetricsLogger when runtime.metrics_path set
        self.viewer = None  # LiveViewer when runtime.viewer_port set
        self._viewer_colors: dict[int, np.ndarray] = {}  # frame_id -> rgb
        self._frame_events: dict = {}
        self._t_last_frame: Optional[float] = None
        self._callback = None
        self._last_T_WC = None
        self._n_done = 0
        self._n_frames_total = 0
        self._t_start = time.perf_counter()

    # ------------------------------------------------------------------ run

    def run(
        self,
        dataset: Dataset | str | Path,
        callback: Optional[Callable[[Frame, Keyframes], None]] = None,
        max_frames: Optional[int] = None,
    ) -> dict:
        if isinstance(dataset, (str, Path)):
            dataset = load_dataset(dataset)

        n_frames = len(dataset) if max_frames is None else min(len(dataset), max_frames)
        loader = PrefetchLoader(
            dataset, img_size=self.resolution, patch=self.model.patch_size
        )

        self.timestamps, self.poses = [], []
        self._callback = callback
        self._n_frames_total = n_frames
        self._n_done = 0
        self._t_start = time.perf_counter()
        self._last_T_WC = None

        # Zero-sync chained tracking (runtime.pipeline + runtime.sync_every):
        # each frame is ONE fused device dispatch whose keyframe/skip
        # decision (including mono decode + keyframe-state switch on
        # promotion) runs on device, so consecutive frames chain through
        # device futures with no host round trip. The host drains a tiny
        # stats/event bundle every `sync_every` frames — over a relay with
        # ~40 ms RTT this is the difference between device-bound and
        # link-bound FPS. Tracking failure (reloc) rewinds to the failed
        # frame and replays host-side. The reference serialized everything
        # through the host (slam.py:124-153).
        from mast3r_slam_tpu.tracker import WindowRow

        window: list[tuple] = []  # per-frame handles (tail / fallback path)
        inflight: list = [None]  # one in-flight scanned window
        sync_every = max(1, self.config.runtime.sync_every)

        def flush_window() -> None:
            if window:
                entries, window[:] = list(window), []
                stats = self.tracker.sync_chain([h for (_f, _t, h) in entries])
                self._drain_window(
                    [(f, t, h["out"]) for (f, t, h) in entries],
                    stats,
                    corr=entries[-1][2]["corr"],
                )

        def drain_inflight() -> None:
            if inflight[0] is None:
                return
            frames_ts, handle, stats_fut = inflight[0]
            inflight[0] = None
            # The ONE sync per window — but the RTT already rode the fetch
            # thread (submitted at dispatch time, below), so by the time
            # the next window calls here, .result() is normally immediate:
            # the relay round trip overlaps this window's device compute
            # instead of blocking the host's dispatch path.
            stats = stats_fut.result()
            self._drain_window(
                [
                    (fr, ts, WindowRow(handle["out"], j))
                    for j, (fr, ts) in enumerate(frames_ts)
                ],
                stats,
                corr=handle["corr"],
            )

        # Frames are consumed in batches of `sync_every`, and each batch's
        # uint8 images ship to the device in ONE stacked transfer: on a
        # relay link, per-frame puts serialize against the chain's compute
        # stream (measured ~45 ms/frame of stream stall at 512x384), while
        # the batched put costs one transfer per window. uint8 (not f32)
        # keeps the bytes 4x down; normalization happens on device. A full
        # TRACKING window is ONE scanned dispatch, and its drain is
        # deferred until the NEXT window has been dispatched — the stats
        # fetch's round trip then overlaps the next window's device
        # compute instead of stalling the stream.
        raw: list[tuple] = []  # [(frame_idx, timestamp, img_u8)]
        # Upload-ahead: the stacked uint8 put of window n+1 is submitted to
        # a one-thread executor BEFORE window n is processed, so the host's
        # relay serialization (~bytes/bandwidth of a 4.7 MB window) overlaps
        # window n's dispatch + drain instead of preceding it. Processing
        # stays strictly ordered (single queue, single worker); the only
        # cost is one window of added latency between ingest and results.
        from concurrent.futures import ThreadPoolExecutor

        upload_q: list[tuple] = []  # [(entries, Future[jax.Array])]

        def process_batch(entries, batch_dev) -> None:
            if entries[0][0] == 0:
                h, w = entries[0][2].shape[:2]
                self._initialize_state(h, w)
            use_pipeline = (
                self.config.runtime.pipeline and self.tracker.can_pipeline
            )
            if (
                use_pipeline
                and self.state.mode == Mode.TRACKING
                and len(entries) == sync_every
                and self.keyframes.last_index() is not None
                and not window
            ):
                frames = [
                    create_frame(i, batch_dev[j])
                    for j, (i, _t, _u) in enumerate(entries)
                ]
                handle = self.tracker.dispatch_window(
                    frames, batch_dev, T_init=self._last_T_WC
                )
                if handle is not None:
                    drain_inflight()  # overlaps this window's device compute
                    if self.tracker._chain is None:
                        # the drain deviated (reloc aborted the chain): this
                        # window was dispatched against pre-reloc state —
                        # reprocess its frames synchronously
                        for j, (_i, ts, _u) in enumerate(entries):
                            self._step_sync(frames[j], ts)
                    else:
                        # Fetch-ahead: the stats sync is submitted NOW, on a
                        # side thread, so its ~one-RTT cost (and the wait for
                        # this window's compute) never blocks the main
                        # thread's next dispatch. Host bookkeeping still
                        # happens strictly in window order in drain_inflight.
                        inflight[0] = (
                            [
                                (frames[j], entries[j][1])
                                for j in range(len(frames))
                            ],
                            handle,
                            fetcher.submit(
                                lambda h=handle: np.asarray(h["out"]["stats"])
                            ),
                        )
                    return
            # strict frame order: anything in flight resolves first
            drain_inflight()
            for j, (i, timestamp, _u8) in enumerate(entries):
                frame = create_frame(i, batch_dev[j])
                if use_pipeline and self.state.mode == Mode.TRACKING:
                    handle = self.tracker.dispatch(
                        frame, T_init=self._last_T_WC
                    )
                    if handle is not None:
                        window.append((frame, timestamp, handle))
                        continue
                flush_window()
                self._step_sync(frame, timestamp)
            flush_window()

        def enqueue_batch(uploader) -> None:
            if not raw:
                return
            entries, raw[:] = list(raw), []
            imgs = np.stack([e[2] for e in entries])
            upload_q.append((entries, uploader.submit(jnp.asarray, imgs)))
            while len(upload_q) > 1:  # keep ONE upload in flight ahead
                e, f = upload_q.pop(0)
                process_batch(e, f.result())

        # Two one-thread side lanes: `uploader` ships window n+1's stacked
        # uint8 put ahead of time; `fetcher` carries the in-flight window's
        # stats sync (each fetch blocks until that window's compute lands,
        # so it must not queue behind — or hold up — uploads).
        with ThreadPoolExecutor(max_workers=1) as uploader, ThreadPoolExecutor(
            max_workers=1
        ) as fetcher:
            for i, (timestamp, processed) in enumerate(
                loader(max_frames=n_frames)
            ):
                raw.append((i, timestamp, processed["unnormalized_img"]))
                if len(raw) >= sync_every:
                    enqueue_batch(uploader)
            enqueue_batch(uploader)
            while upload_q:
                e, f = upload_q.pop(0)
                process_batch(e, f.result())
            drain_inflight()
        self._run_backend(budget=0)  # drain any deferred backend tasks
        if self.viewer is not None:
            # final snapshot with the backend's last pose corrections
            self._publish_viewer(clouds=True)

        print(f"Done! {len(self.keyframes)} keyframes, {len(self.poses)} poses")
        if self.metrics:
            from mast3r_slam_tpu.utils.metrics import summarize

            self.metrics.close()
            print(
                "Run metrics:",
                summarize(self.config.runtime.metrics_path),
            )
        return self._get_results()

    def _step_sync(self, frame: Frame, timestamp: float) -> None:
        """Classic synchronous per-frame step (INIT / RELOC / no-pipeline)."""
        if self.state.mode == Mode.INIT:
            self._process_init(frame)
        elif self.state.mode == Mode.TRACKING:
            self._process_tracking(frame)
        elif self.state.mode == Mode.RELOC:
            self._process_reloc(frame)
        self._bookkeep(frame, timestamp)

    def _drain_window(self, entries: list[tuple], stats: np.ndarray, corr) -> None:
        """Resolve a window of chained results: per-frame host bookkeeping
        driven by the on-device event codes (0 tracked / 1 promoted / 2
        skipped). `entries` is [(frame, timestamp, row)] where `row`
        indexes one frame's outputs (per-frame dict or a WindowRow into
        the scanned window's stacked outputs); `stats` [K, 6] was fetched
        by the caller in one sync. On a skip the chain is aborted, the
        frame goes through relocalization, and the window's remaining
        frames replay synchronously (their chained results assumed the
        skipped frame never happened)."""
        from mast3r_slam_tpu.tracker import EVENT_NEW_KF, EVENT_SKIP

        cur = self.keyframes.last_index()
        pose_dirty = False
        deferred: list[tuple] = []
        completed = True
        for j, (frame, timestamp, row) in enumerate(entries):
            event = int(round(float(stats[j, 3])))
            if event == EVENT_SKIP:
                # Write back the chain's keyframe state as of the failure
                # (fusions from this window's earlier frames), then rewind.
                self.keyframes.write_pointmap(
                    cur, row["ret_X"], row["ret_C"], float(stats[j, 5])
                )
                self.tracker.commit_chain_frame(
                    frame, row, stats[j], tracked=False
                )
                self.tracker.abort_chain()
                print(f"Skipped frame {frame.frame_id}")
                self._frame_events["skipped"] = True
                self.state.mode = Mode.RELOC
                self._process_reloc(frame)
                self._bookkeep(frame, timestamp)
                deferred = entries[j + 1 :]
                completed = False
                break
            self.tracker.commit_chain_frame(frame, row, stats[j])
            if event == EVENT_NEW_KF:
                # Retire the old keyframe's fused state into its slot; the
                # frame's new-keyframe state (mono pointmap) came from the
                # on-device promotion branch.
                self.keyframes.write_pointmap(
                    cur, row["ret_X"], row["ret_C"], float(stats[j, 5])
                )
                frame.X_canon, frame.C = row["kf_X"], row["kf_C"]
                victim = self._evict_if_full()
                if victim is not None and victim < cur:
                    cur -= 1
                kf_idx = self.keyframes.append(frame)
                self.retrieval_db.update(frame, add_after_query=True)
                self.state.queue_global_optimization(kf_idx)
                self._frame_events["new_kf"] = True
                cur = kf_idx
            if self._bookkeep(frame, timestamp):
                pose_dirty = True
        if completed:
            # Flush the chain's latest keyframe state into the arena and
            # re-anchor the chain's slot. Backend pose corrections queue as
            # a world-frame left delta for the next dispatch; the window's
            # pose belief is first brought up to date with corrections
            # applied since ITS dispatch (queue_arena_correction — a delta
            # measured against the stale belief would double-apply them).
            last_row = entries[-1][2]
            self.keyframes.write_pointmap(
                cur, last_row["kf_X"], last_row["kf_C"], float(stats[-1, 4])
            )
            if pose_dirty:
                self.tracker.queue_arena_correction(
                    self.keyframes.T_WC[cur], last_row["kf_T"], corr
                )
            self.tracker.refresh_chain(cur)
        for frame, timestamp, _row in deferred:
            self._step_sync(frame, timestamp)

    def _promote_keyframe(self, frame: Frame) -> None:
        """New-keyframe path for synchronous tracking. The frame's encoder
        tokens are already cached (fused program output), so mono inference
        is a single decode dispatch."""
        X, C, feat, pos = mast3r_inference_mono(self.model, frame)
        frame.X_canon, frame.C, frame.feat, frame.pos = X, C, feat, pos
        frame.N = frame.N_updates = 1
        self.tracker.abort_chain()  # sync-path promotion invalidates a chain
        self._evict_if_full()
        kf_idx = self.keyframes.append(frame)
        self.retrieval_db.update(frame, add_after_query=True)
        self.state.queue_global_optimization(kf_idx)
        self._frame_events["new_kf"] = True

    def _evict_if_full(self) -> Optional[int]:
        """Graceful map scaling: when the keyframe arena is full, evict the
        lowest-covisibility keyframe outside the protected set (gauge
        anchors + the most recent `runtime.eviction_protect`), keeping the
        factor graph, retrieval database, and pending backend tasks
        consistent with the compacted indices. Returns the evicted index,
        or None. (SURVEY §5.7: the reference grew unboundedly; VERDICT r1
        item 5.)"""
        n = len(self.keyframes)
        if n < self.keyframes.capacity:
            return None
        if self.config.runtime.eviction == "off":
            return None  # append() keeps the legacy hard assert
        pin = self.config.local_opt.pin
        protect = max(1, self.config.runtime.eviction_protect)
        lo, hi = pin, n - protect
        if lo >= hi:  # tiny arenas: keep the anchor + current KF only
            lo, hi = min(pin, n - 1), n - 1
        if lo >= hi:
            return None
        deg = self.factor_graph.edge_degree(n)
        victim = min(range(lo, hi), key=lambda i: (deg[i], i))
        self.factor_graph.remove_keyframe(victim)
        self.keyframes.remove(victim)
        self.retrieval_db.remove(victim)
        self.state.global_optimizer_tasks = [
            t - 1 if t > victim else t
            for t in self.state.global_optimizer_tasks
            if t != victim
        ]
        # Invalidate the tracker's arena-slice cache: slots shifted under
        # it. A live device chain is NOT dropped — its keyframe state is
        # self-contained and the caller remaps its slot index.
        self.tracker._kf_cache = None
        print(f"Evicted keyframe {victim} (degree {int(deg[victim])})")
        if self.metrics:
            self.metrics.log(
                dict(event="eviction", victim=victim, degree=int(deg[victim]))
            )
        return victim

    def _bookkeep(self, frame: Frame, timestamp: float) -> int:
        """Per-frame records + backend drain; returns backend solves run."""
        self.timestamps.append(timestamp)
        # keep poses device-side; exporting converts once at the end
        self.poses.append(frame.T_WC)
        self._last_T_WC = frame.T_WC
        if self._callback:
            self._callback(frame, self.keyframes)
        solves = self._run_backend()

        if self.metrics:
            now = time.perf_counter()
            prev = self._t_last_frame if self._t_last_frame is not None else (
                self._t_start
            )
            rec = dict(
                event="frame",
                frame=frame.frame_id,
                ts=timestamp,
                frame_ms=(now - prev) * 1e3,
                mode=self.state.mode.name,
                n_keyframes=len(self.keyframes),
                n_edges=self.factor_graph.n_edges,
                backend_solves=solves,
            )
            if self.tracker.last_stats:
                rec.update(self.tracker.last_stats)
            rec.update(self._frame_events)
            self.metrics.log(rec)
            self._t_last_frame = now
        if self.viewer is not None:
            refresh = max(1, self.config.runtime.viewer_refresh)
            self._publish_viewer(
                clouds=self._frame_events.get("new_kf", False)
                or self._n_done % refresh == 0
            )
        self._frame_events = {}

        self._n_done += 1
        if self._n_done % 10 == 0:
            dt = time.perf_counter() - self._t_start
            print(
                f"Processed {self._n_done}/{self._n_frames_total} frames, "
                f"{len(self.keyframes)} keyframes, {self._n_done / dt:.2f} FPS"
            )
        snap_every = self.config.runtime.snapshot_every
        if snap_every and self._n_done % snap_every == 0:
            self.save_state(self.config.runtime.snapshot_path)
        return solves

    def _initialize_state(self, h: int, w: int) -> None:
        # Decode resolution = the ACTUAL processed frame shape (preprocess
        # crops to the input's own aspect ratio, e.g. EuRoC 752x480 ->
        # 320x512, which need not match the canonical 4:3 creation shape).
        if hasattr(self.model, "set_out_hw"):
            self.model.set_out_hw(h, w)
        # Pointmap resolution follows dataset.img_downsample (model outputs
        # are stride-subsampled in inference._flatten_out).
        f = max(1, self.config.dataset.img_downsample)
        self.keyframes = Keyframes(h // f, w // f)
        self.state = SLAMState(mode=Mode.INIT)
        if self.config.use_calib and self.config.dataset.calib:
            fx, fy, cx, cy = self.config.dataset.calib
            if f > 1:
                # Keyframes live at the subsampled resolution; rescale the
                # intrinsics to it (pixel-center aware: u' = (u+.5)/f - .5).
                fx, fy = fx / f, fy / f
                cx = (cx + 0.5) / f - 0.5
                cy = (cy + 0.5) / f - 0.5
            self.keyframes.set_intrinsics(
                jnp.asarray(
                    [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], jnp.float32
                )
            )
        self.tracker = FrameTracker(self.model, self.keyframes)
        K = self.keyframes.get_intrinsics() if self.config.use_calib else None
        self.factor_graph = FactorGraph(self.model, self.keyframes, K)
        self.retrieval_db = load_retriever(self.model)
        # feature source for ASMK codebook re-fits at map-doubling thresholds
        self.retrieval_db.keyframes = self.keyframes
        if self.config.runtime.metrics_path:
            from mast3r_slam_tpu.utils.metrics import MetricsLogger

            self.metrics = MetricsLogger(self.config.runtime.metrics_path)
        if self.config.runtime.viewer_port and self.viewer is None:
            from mast3r_slam_tpu.viewer import LiveViewer

            self.viewer = LiveViewer(self.config.runtime.viewer_port)
            print(f"Live viewer: http://localhost:{self.viewer.port}/")

    # ------------------------------------------------------- checkpointing

    def save_state(self, path) -> None:
        """Snapshot all SLAM state (keyframes, graph, retrieval, poses)."""
        from mast3r_slam_tpu.utils.snapshot import save_snapshot

        save_snapshot(self, path)
        print(f"Saved SLAM state to {path}")

    def load_state(self, path) -> None:
        """Resume from a snapshot (model must match the saved run)."""
        from mast3r_slam_tpu.utils.snapshot import load_snapshot

        if self.state is None:
            import numpy as _np
            import json as _json

            data = _np.load(path, allow_pickle=False)
            header = _json.loads(str(data["header"]))
            self._initialize_state(header["h"], header["w"])
        load_snapshot(self, path)
        print(f"Resumed SLAM state from {path}")

    # ----------------------------------------------------------- mode steps

    def _process_init(self, frame: Frame) -> None:
        X, C, feat, pos = mast3r_inference_mono(self.model, frame)
        frame.X_canon, frame.C, frame.feat, frame.pos = X, C, feat, pos
        frame.N = frame.N_updates = 1
        if self.config.use_calib and self.keyframes.K is None:
            # Calibration-free mode: estimate the focal from the first
            # mono pointmap (BASELINE config 5 — joint focal estimation).
            from mast3r_slam_tpu.utils.intrinsics import estimate_intrinsics

            K = estimate_intrinsics(X, (self.keyframes.h, self.keyframes.w), C)
            self.keyframes.set_intrinsics(K)
            self.factor_graph.K = K
            print(f"Estimated focal: {float(K[0, 0]):.1f}px")
        self.keyframes.append(frame)
        self.retrieval_db.update(frame, add_after_query=True)
        self.state.queue_global_optimization(0)
        self.state.mode = Mode.TRACKING
        print("Initialized with first keyframe")

    def _process_tracking(self, frame: Frame) -> None:
        new_kf, _info, try_reloc = self.tracker.track(frame, mast3r_match_asymmetric)
        if try_reloc:
            self._frame_events["skipped"] = True
            self.state.mode = Mode.RELOC
            self._process_reloc(frame)
            return
        if new_kf:
            self._promote_keyframe(frame)

    def _process_reloc(self, frame: Frame) -> None:
        """(parity: slam.py:216-290 — retrieval, tentative KF, rollback)"""
        self._frame_events["reloc"] = True
        self.tracker.abort_chain()  # reloc rebuilds tracking state from scratch
        X, C, feat, pos = mast3r_inference_mono(self.model, frame)
        frame.X_canon, frame.C, frame.feat, frame.pos = X, C, feat, pos
        frame.N = frame.N_updates = 1

        rcfg = self.config.retrieval
        similar = self.retrieval_db.update(
            frame, add_after_query=False, k=rcfg.k, min_thresh=rcfg.min_thresh
        )

        # Eviction may shift keyframe indices: remap the candidates.
        victim = self._evict_if_full()
        if victim is not None:
            similar = [s - 1 if s > victim else s for s in similar if s != victim]

        success = False
        if similar:
            kf_idx = self.keyframes.append(frame)
            for ref_idx in similar:
                # Edge order (new_kf, candidate) as in the reference
                # (slam.py:254-256): the consecutive-edge exemption in
                # add_factors must never apply to reloc candidates.
                if self.factor_graph.add_factors(
                    [kf_idx],
                    [ref_idx],
                    min_match_frac=self.config.reloc.min_match_frac,
                    is_reloc=self.config.reloc.strict,
                ):
                    success = True
                    print(f"Relocalized! frame {frame.frame_id} -> KF {ref_idx}")
                    frame.T_WC = self.keyframes.T_WC[ref_idx]
                    self.keyframes.write_pose(kf_idx, frame.T_WC)
                    self.retrieval_db.update(frame, add_after_query=True)
                    if self.config.use_calib:
                        self.factor_graph.solve_GN_calib()
                    else:
                        self.factor_graph.solve_GN_rays()
                    break
            if not success:
                self.keyframes.pop_last()
                print(f"Relocalization failed for frame {frame.frame_id}")
        else:
            kf_idx = self.keyframes.append(frame)
            self.retrieval_db.update(frame, add_after_query=True)
            self.state.queue_global_optimization(kf_idx)
            print(f"No similar keyframes, added frame {frame.frame_id} as new KF")

        self.state.mode = Mode.TRACKING
        self.tracker.reset_idx_f2k()

    def _run_backend(self, budget: Optional[int] = None) -> int:
        """Drain queued global-optimization tasks.

        `budget` bounds tasks processed this call (default: the
        `local_opt.backend_tasks_per_frame` config; None in config = drain
        everything, the reference's serialized behavior, slam.py:292-319).
        A bounded budget interleaves backend solves with subsequent frames'
        tracking — with pipelined tracking the next frame's fused program
        is already in flight on the device stream, so a bound turns the
        new-keyframe latency spike into spread work without changing total
        device time. run() drains the remainder at sequence end.
        """
        if budget is None:
            budget = self.config.local_opt.backend_tasks_per_frame or 0
        solves = 0
        while budget <= 0 or solves < budget:
            idx = self.state.dequeue_global_optimization()
            if idx is None:
                break
            if idx > 0:
                ii = list(range(max(0, idx - 3), idx))
                if ii:
                    self.factor_graph.add_factors(
                        ii,
                        [idx] * len(ii),
                        min_match_frac=self.config.local_opt.min_match_frac,
                    )
            if self.config.use_calib:
                self.factor_graph.solve_GN_calib()
            else:
                self.factor_graph.solve_GN_rays()
            solves += 1
        return solves

    # ---------------------------------------------------------------- viewer

    def _publish_viewer(self, clouds: bool, stride: int = 16) -> None:
        """Push current state to the live viewer (host-side, non-blocking
        for clients). Publishes trajectory AND keyframe clouds together at
        the `clouds` cadence (keyframe promotion or every
        `runtime.viewer_refresh` frames): stacking the device-side pose
        list costs a host sync, and the tracking loop budgets its syncs —
        so nothing is published on other frames. Each publish transforms
        ALL keyframe pointmaps with their CURRENT poses in one device op,
        so backend pose corrections propagate to the display."""
        if not clouds:
            # Trajectory-only updates ride the same cadence: stacking the
            # device-side pose list costs a host sync, and the pipelined
            # loop budgets exactly ONE sync per frame (the stats bundle).
            return
        v = self.viewer
        traj = (
            np.asarray(jnp.stack(self.poses)) if self.poses else np.zeros((0, 8))
        )
        v.publish_traj(traj, mode=self.state.mode.name)
        if len(self.keyframes) == 0:
            return
        cnt = len(self.keyframes)
        X = self.keyframes.X[:cnt, ::stride]
        T = self.keyframes.T_WC[:cnt]
        XW = np.asarray(lie.sim3_act(T[:, None], X))  # [cnt, n/stride, 3]
        live_ids = set()
        for k in range(cnt):
            fid = self.keyframes.frame_ids[k]
            live_ids.add(int(fid))
            cols = self._viewer_colors.get(int(fid))
            if cols is None:
                img = np.asarray(self.keyframes.imgs[k])
                cols = (
                    np.clip(img, 0, 1).reshape(-1, 3)[::stride] * 255
                ).astype(np.uint8)
                self._viewer_colors[int(fid)] = cols
            if len(cols) != len(XW[k]):  # img_downsample mismatch: grey
                cols = None
            v.publish_keyframe(int(fid), XW[k], cols, stride=1)
        for fid in [f for f in list(v._clouds) if f not in live_ids]:
            v.remove_keyframe(fid)  # evicted keyframes leave the display
        self._viewer_colors = {
            f: c for f, c in self._viewer_colors.items() if f in live_ids
        }

    # --------------------------------------------------------------- output

    def _get_results(self) -> dict:
        pose_mats = (
            np.asarray(lie.sim3_matrix(jnp.asarray(np.stack(self.poses))))
            if self.poses
            else np.zeros((0, 4, 4))
        )
        points, colors = [], []
        for k in range(len(self.keyframes)):
            kf = self.keyframes[k]
            X_world = lie.sim3_act(kf.T_WC[None], kf.X_canon)
            points.append(np.asarray(X_world))
            img = np.asarray(kf.img)
            colors.append((np.clip(img, 0, 1).reshape(-1, 3) * 255).astype(np.uint8))
        return {
            "timestamps": np.asarray(self.timestamps),
            "poses": pose_mats,
            "points": np.concatenate(points) if points else np.zeros((0, 3)),
            "colors": np.concatenate(colors) if colors else np.zeros((0, 3), np.uint8),
            "keyframe_indices": list(self.keyframes.frame_ids),
        }

    def save_trajectory(self, path: str | Path, format: str = "tum") -> None:
        poses = np.stack(self.poses)
        if format == "tum":
            save_trajectory_tum(path, self.timestamps, poses)
        elif format == "kitti":
            save_trajectory_kitti(path, poses)
        else:
            raise ValueError(f"unknown trajectory format {format!r}")
        print(f"Saved trajectory to {path}")

    def save_pointcloud(self, path: str | Path) -> None:
        results = self._get_results()
        if len(results["points"]) == 0:
            print("No points to save")
            return
        save_ply(path, results["points"], results["colors"])
        print(f"Saved {len(results['points'])} points to {path}")


def main(argv: list[str] | None = None) -> int:
    """CLI entry point (the reference's declared-but-missing `main`)."""
    import argparse

    ap = argparse.ArgumentParser(prog="mast3r-slam-tpu", description=SLAM.__doc__)
    ap.add_argument("dataset", help="dataset path (TUM/EuRoC dir, folder, video)")
    ap.add_argument("--config", default=None)
    ap.add_argument("--model-type", default="mast3r_full",
                    choices=["mast3r_full", "dunemast3r"])
    ap.add_argument("--variant", default="base", choices=["small", "base"])
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--checkpoint", default=None, metavar="PATH",
                    help="local upstream-layout weights (safetensors/.pth/"
                    ".npz); overrides model.checkpoint in the config")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--save-traj", default=None, metavar="PATH")
    ap.add_argument("--traj-format", default="tum", choices=["tum", "kitti"])
    ap.add_argument("--save-ply", default=None, metavar="PATH")
    ap.add_argument("--viewer-port", type=int, default=None, metavar="PORT",
                    help="serve the live map/trajectory viewer on this port")
    args = ap.parse_args(argv)

    if args.checkpoint:
        from mast3r_slam_tpu.config import set_config

        cfg = load_config(args.config) if args.config else get_config()
        cfg.model.checkpoint = args.checkpoint
        set_config(cfg)
        args.config = None  # already installed globally

    slam = SLAM(
        config_path=args.config,
        model_type=args.model_type,
        model_variant=args.variant,
        resolution=args.resolution,
        precision=args.precision,
    )
    if args.viewer_port is not None:
        slam.config.runtime.viewer_port = args.viewer_port
    slam.run(args.dataset, max_frames=args.max_frames)
    if args.save_traj:
        slam.save_trajectory(args.save_traj, format=args.traj_format)
    if args.save_ply:
        slam.save_pointcloud(args.save_ply)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
