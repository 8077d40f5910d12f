"""Typed configuration system.

Replaces the reference's global-dict YAML config (reference: config.py:13-121)
with frozen dataclasses, while keeping:
  * the exact default hyperparameter values (they encode tuned SLAM behavior
    required for trajectory parity — sigma_ray=0.003, Q_conf=1.5,
    match_frac_thresh=1/3, huber k=1.345, ...),
  * YAML loading with `inherit` / `_base_` config inheritance and
    child-over-base deep-merge (reference: config.py:22-42),
  * a process-global accessor `get_config()` (reference: config.py:117-121).

Unlike the reference, the schema is explicit: unknown keys raise, and the two
config-key bugs of the reference are fixed here by construction:
  * `use_calib` lives at the top level AND is what the tracker consults
    (reference bug: tracker.py:97 read tracking.use_calib which never existed),
  * matching refinement keys are `refine_radius` / `refine_dilation` /
    `use_refine` and exist in the schema (reference bug: matching.py:405-407
    read keys missing from DEFAULT_CONFIG at config.py:64-73).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields
from pathlib import Path
from typing import Any

try:
    import yaml

    _HAVE_YAML = True
except Exception:  # pragma: no cover
    _HAVE_YAML = False


# ---------------------------------------------------------------------------
# Schema
# ---------------------------------------------------------------------------


@dataclass
class DatasetConfig:
    img_size: int = 512
    img_downsample: int = 1
    subsample: int = 1
    reverse: bool = False
    # Camera intrinsics [fx, fy, cx, cy] in PROCESSED-image pixels, for
    # calibrated mode. The reference shipped `Keyframes.set_intrinsics` but
    # nothing ever called it (frame.py:254-256; SURVEY §2.10) — here the
    # config wires K through to the tracker and backend.
    calib: list[float] | None = None


@dataclass
class MatchingConfig:
    # "auto": derive from use_simple (reference semantics). Or explicitly
    # "simple" | "iterative" | "dense" — "dense" is the gather-free TPU
    # cost-volume matcher (ops/dense_match.py).
    method: str = "auto"
    dense_radius: int = 6
    dense_dilations: tuple = (1,)
    dense_desc_weight: float = 1.0
    # Dense-matcher backend. Only "xla" (shifted-tap fusion) remains: the
    # VMEM-tiled Pallas band kernel was measured (6.5 vs 3.4 ms at the
    # tracking config) and deleted in round 5 after its two blocking
    # Mosaic constraints re-probed FAIL (scripts/probe_mosaic_rotate.py;
    # docs/PLAN.md round-4 pruning plan). "auto" = "xla".
    dense_kernel: str = "xla"
    # `use_simple` selects warm-start + 3D-gate matching; False selects full
    # iterative projective matching (reference: matching.py:32-38).
    use_simple: bool = True
    max_iter: int = 10
    lambda_init: float = 1e-8
    convergence_thresh: float = 1e-6
    dist_thresh: float = 0.1
    # Descriptor-refinement window (fixes the reference's dead config keys).
    use_refine: bool = True
    refine_radius: int = 3
    refine_dilation: int = 2

    def __post_init__(self):
        if self.dense_kernel not in ("xla", "auto"):
            raise ValueError(
                f"matching.dense_kernel={self.dense_kernel!r}: the Pallas "
                "dense matcher was deleted (round 5, failed Mosaic "
                "re-probe); only 'xla' (and 'auto' == 'xla') remain"
            )


@dataclass
class TrackingConfig:
    min_match_frac: float = 0.05
    C_conf: float = 0.0
    Q_conf: float = 1.5
    rel_error: float = 1e-3
    delta_norm: float = 1e-3
    max_iters: int = 10
    huber: float = 1.345
    # Robust IRLS loss: huber (reference default) | tukey (redescending —
    # reference optimizer.py:65 defined it but no config could select it)
    robust: str = "huber"
    tukey_t: float = 4.6851
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    pixel_border: int = 0
    depth_eps: float = 0.0
    match_frac_thresh: float = 0.333
    filtering_mode: str = "weighted_pointmap"
    filtering_score: str = "median"


@dataclass
class LocalOptConfig:
    window_size: int = 1_000_000
    pin: int = 1
    max_iters: int = 10
    min_match_frac: float = 0.1
    C_conf: float = 0.0
    Q_conf: float = 1.5
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    pixel_border: int = 0
    depth_eps: float = 0.0
    delta_norm: float = 1e-3
    huber: float = 1.345
    robust: str = "huber"  # huber | tukey (see TrackingConfig.robust)
    tukey_t: float = 4.6851
    # Static capacity of the edge store (factor graph); a TPU-specific knob —
    # shapes under jit must be static, so edges live in a fixed arena.
    max_edges: int = 256
    # Backend tasks processed per frame (0 = drain everything each frame,
    # the reference's serialized behavior). The default bound of 1
    # interleaves backend solves with subsequent frames' tracking — with
    # pipelined tracking the next frame's fused program is already queued
    # on the device stream, so the new-keyframe latency spike spreads into
    # overlap instead of stalling the loop; run() drains leftovers at
    # sequence end. Trajectory effect: pose corrections land at most one
    # frame later than the reference's serialized drain.
    backend_tasks_per_frame: int = 1
    # Edge-system build variant for the graph solve (ops/gauss_newton.py):
    # "base" materializes the [E,7,3N] concat; "noconcat" computes
    # S = sum_k A_k A_k^T without it — algebraically identical (pinned in
    # tests/test_gauss_newton.py::TestSolveVariants) and measured 1.5x
    # faster at full scale on v5e (92 vs 140 ms per 10-iter 8KFx196kx32-edge
    # solve, scripts/profile_backend_solve.py round 4). "+bf16" additionally
    # stores edge transients in bfloat16 (f32 MXU accumulation): 86 ms,
    # loose-band equivalence only — opt-in.
    solve_variant: str = "noconcat"
    # j-side point subsample stride for the graph solve. The round-4 v5e
    # profile shows the solve is ~linear in the j-side point count (59%
    # one-time correspondence gather + HBM-bound iteration streams), so
    # stride s cuts the whole keyframe-burst solve ~s-fold. 1 = reference
    # parity (every pixel); ATE effect at stride 2/4 measured on the
    # system oracle (tests/test_gauss_newton.py::TestPointStride,
    # docs/PLAN.md round-4 decisions).
    point_stride: int = 1


@dataclass
class RetrievalConfig:
    k: int = 3
    min_thresh: float = 0.005
    # Signature-path online whitening: accumulate this many keyframes'
    # features, fit PCA-whitening into the RetrievalModel head, recompute
    # stored signatures (0 = identity whitening, reference degradation).
    whitening_kf: int = 0
    # "signature": whitened global-signature dot product (the reference's
    # reduction). "asmk": real aggregated-selective-match-kernel retrieval
    # (the upstream method; models/asmk.py).
    method: str = "signature"
    asmk_n_words: int = 256
    asmk_proj_dim: int = 64
    # keyframes accumulated before the ASMK codebook is fit (until then the
    # database answers with signature retrieval). The codebook also
    # re-fits from the live map whenever the database doubles past the
    # last fit size (retrieval_db._asmk_add).
    asmk_codebook_kf: int = 8


@dataclass
class RelocConfig:
    min_match_frac: float = 0.3
    strict: bool = True


@dataclass
class ModelConfig:
    """Model-family selection (reference: mast3r_utils.py:47-80)."""

    model_type: str = "mast3r_full"  # or "dunemast3r"
    variant: str = "base"  # DUNE encoder variant: "small" | "base"
    resolution: int = 512
    precision: str = "bf16"  # fp32 | bf16
    checkpoint: str | None = None  # local safetensors path (no egress here)
    # None = family default ("dpt"); "linear" trades pts3d sharpness for a
    # lighter decode (the DPT tail is most of the non-GN step time)
    head_type: str | None = None


@dataclass
class RuntimeConfig:
    """TPU runtime knobs (no analog in the reference — its runtime was a
    single Metal queue)."""

    keyframe_capacity: int = 512  # preallocated HBM keyframe arena slots
    prefetch_depth: int = 2  # host frame-decode lookahead
    donate_buffers: bool = True
    # Pipelined tracking: dispatch frame i+1 before syncing frame i's stats
    # (keyframe decisions lag one frame; deviations re-dispatch). Turns the
    # per-frame host round trip into overlap with device compute.
    pipeline: bool = True
    # Zero-sync chained tracking: frames per host sync. The keyframe/skip
    # decision runs ON DEVICE inside the fused program (lax.cond promotes
    # the frame to the chain's current keyframe, mono decode included), so
    # the host only drains a tiny per-frame event bundle every
    # `sync_every` frames — over a high-latency link the per-frame round
    # trip disappears from the critical path. 1 = sync every frame (the
    # reference-like cadence). Tracking-failure relocalization still
    # rewinds to the failed frame and replays host-side (rare path).
    # Backend pose corrections land at window granularity instead of
    # frame granularity; keyframe/skip decisions are pose-independent and
    # unaffected.
    sync_every: int = 8
    # periodic SLAM-state snapshots (0 = off); long runs resume via
    # SLAM.load_state (SURVEY §5.4 — the reference had no checkpointing)
    snapshot_every: int = 0
    snapshot_path: str = "slam_state.npz"
    # Serving (BatchTracker): run the sequence batch as an in-dispatch
    # lax.scan over chunks of this size so decoder/DPT activation
    # transients scale with the chunk, not the batch (v5e compiles B=4
    # flat but OOMs HLO temps at B=8; chunked, B=8/16 fit). 0 = flat vmap.
    serving_microbatch: int = 4
    # Unroll factor for the serving microbatch scan. At B=16/mb=4 the
    # nc=4-step scan measured 8x slower per batch than B=8's nc=2 (both
    # chip and CPU smoke show it, so it is the scan region, not the relay):
    # the per-step stacked-output writes defeat in-place aliasing. Partial
    # unroll keeps the per-chunk activation working set while letting XLA
    # fuse/alias across `unroll` chunks per loop step. 1 = plain scan.
    serving_scan_unroll: int = 1
    # Speculative batched window decode: decode ALL K window frames against
    # the window-start keyframe in one batched pass (chunked by
    # window_decode_microbatch, same HLO-temp reasoning as
    # serving_microbatch), so decoder/DPT weights stream from HBM once per
    # window instead of once per frame. Each frame's lax.cond falls back to
    # a live per-frame decode once an on-device promotion changes the
    # keyframe mid-window — semantics are EXACT (test_window_scan), only
    # the promotion-window overhead differs. Off until on-chip numbers land.
    window_spec_decode: bool = False
    window_decode_microbatch: int = 4
    # Hoist the window's ViT-L encode into ONE batched B=K pass before the
    # unrolled chain (encoder weights ride HBM once per window) vs encoding
    # each frame inline inside the chain. Numerically identical — A/B'd on
    # v5e (K=8, ViT-L bf16): inline 20.35 ms/frame vs batched 23.41. The
    # batched pass materializes [K,16,768,768] f32 attention scores (302 MB
    # per block) that XLA tiles/fuses fine at B=1, so the weight-streaming
    # saving is swamped. window_spec_decode requires the batched features
    # and forces the hoist back on.
    window_batched_encode: bool = False
    # Attention implementation: "auto" = XLA-fused below FLASH_MIN_KV
    # tokens, Pallas flash kernel above (the measured B=1 rule);
    # "xla"/"flash" force one path for on-chip A/Bs (the batched window
    # encode multiplies the score-matrix footprint by K, which can flip
    # the winner).
    attention_impl: str = "auto"
    # Materialize gelu outputs behind an optimization_barrier so the erf
    # doesn't fuse into the down-projection matmul's operand load (fc2
    # matmuls measure 38-59% of their fc1 siblings' throughput on v5e
    # when it does). Exact semantics; default decided by on-chip A/B.
    gelu_barrier: bool = False
    # Weight storage for inference programs: "none" = model dtype (bf16);
    # "int8" = large kernels stored int8 + per-output-channel scales and
    # dequantized inside each program (models/quant.py) — halves the
    # weight bytes streamed from HBM per frame. Accuracy: ~1e-2-scale
    # relative output deviation (per-channel symmetric); oracle e2e green
    # (tests/test_quant.py). Default off: checkpoint-exact numerics first.
    weight_quant: str = "none"
    # "erf" = exact gelu (upstream torch nn.GELU); "tanh" = the tanh
    # approximation — within ~1 bf16 ulp of erf everywhere, measurably
    # cheaper on the VPU (the erf costs ~2.1 ms/frame at ViT-L scale).
    # Default erf: checkpoint-parity first; flip per-deployment once the
    # e2e oracle + torch-twin tolerances are re-verified under tanh.
    gelu_impl: str = "erf"
    # Keyframe eviction when the arena is full: "covisibility" drops the
    # lowest-edge-degree keyframe outside the protected set (gauge anchors
    # + the most recent `eviction_protect`); "off" restores the hard
    # capacity assert. (The reference grew without bound, frame.py:178.)
    eviction: str = "covisibility"
    eviction_protect: int = 4
    # Per-frame structured metrics (JSON lines; utils/metrics.py). Empty =
    # off. Summarize with `python -m mast3r_slam_tpu.utils.metrics <path>`.
    metrics_path: str = ""
    # Live map/trajectory viewer (viewer.py): HTTP port to serve on, 0 =
    # off. Open http://<host>:<port>/ in a browser (plain port-forward
    # suffices — no websockets, no external assets).
    viewer_port: int = 0
    # Frames between viewer publishes (trajectory + point clouds update
    # together at this cadence, and additionally on keyframe promotion so
    # backend pose updates propagate; per-frame publishing would cost a
    # host sync per frame).
    viewer_refresh: int = 10


@dataclass
class Config:
    use_calib: bool = False
    single_thread: bool = True
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    matching: MatchingConfig = field(default_factory=MatchingConfig)
    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    local_opt: LocalOptConfig = field(default_factory=LocalOptConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    reloc: RelocConfig = field(default_factory=RelocConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    # -- dict interop -------------------------------------------------------

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        return _merge_into(cls(), d)


def _merge_into(cfg: Any, updates: dict[str, Any]) -> Any:
    """Apply a (possibly partial, possibly nested) dict onto a dataclass."""
    known = {f.name: f for f in fields(cfg)}
    kwargs: dict[str, Any] = {}
    for key, value in updates.items():
        if key in ("inherit", "_base_"):
            continue
        if key not in known:
            raise KeyError(
                f"Unknown config key {key!r} for {type(cfg).__name__}; "
                f"known keys: {sorted(known)}"
            )
        current = getattr(cfg, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            kwargs[key] = _merge_into(current, value)
        else:
            kwargs[key] = value
    return dataclasses.replace(cfg, **kwargs)


# ---------------------------------------------------------------------------
# YAML loading with inheritance
# ---------------------------------------------------------------------------


def _load_yaml_with_inherit(config_path: Path) -> dict[str, Any]:
    if not _HAVE_YAML:  # pragma: no cover
        raise RuntimeError("PyYAML unavailable; cannot load YAML configs")
    with open(config_path) as f:
        raw = yaml.safe_load(f) or {}

    base_key = "inherit" if "inherit" in raw else ("_base_" if "_base_" in raw else None)
    if base_key is None:
        return raw

    base_path = Path(raw[base_key])
    if not base_path.is_absolute():
        # Resolve relative to project root first, then to the config dir
        # (same search order as the reference, config.py:29-34).
        candidate = config_path.parent.parent / raw[base_key]
        base_path = candidate if candidate.exists() else config_path.parent / raw[base_key]
    base = _load_yaml_with_inherit(base_path)
    _deep_update(base, raw)
    base.pop(base_key, None)
    return base


def _deep_update(base: dict, update: dict) -> None:
    for key, value in update.items():
        if key in base and isinstance(base[key], dict) and isinstance(value, dict):
            _deep_update(base[key], value)
        else:
            base[key] = value


# ---------------------------------------------------------------------------
# Process-global accessor
# ---------------------------------------------------------------------------

_config: Config | None = None


def default_config() -> Config:
    return Config()


def load_config(config_path: str | Path) -> Config:
    """Load a YAML config (with inheritance) and install it globally."""
    global _config
    raw = _load_yaml_with_inherit(Path(config_path))
    _config = Config.from_dict(raw)
    return _config


def set_config(cfg: Config) -> Config:
    global _config
    _config = cfg
    return cfg


def reset_config() -> None:
    global _config
    _config = None


def get_config() -> Config:
    """Current config, or a fresh default if none was loaded."""
    return _config if _config is not None else Config()
