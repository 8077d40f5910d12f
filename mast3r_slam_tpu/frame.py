"""Frames, the keyframe arena, and SLAM state.

TPU-native design
-----------------
The reference keeps keyframes as a Python list of per-frame MLX arrays
(frame.py:146-260) — a vestige of the upstream shared-memory buffer whose
`buffer_size=512` it kept but never enforced. Here the upstream idea is
implemented for real: a **fixed-capacity, preallocated, HBM-resident
arena** of stacked keyframe state (points / confidences / poses / encoder
features), so that

* every jitted program over keyframes sees static shapes (no recompiles as
  the map grows),
* slot writes compile to in-place dynamic-update-slice via buffer donation
  (no 1.2 GB arena copies per keyframe),
* the backend solver and retrieval top-k consume the arena directly —
  stacking "get_points()" copies never happen.

Per-pixel pointmap fusion (filtering modes) is a jitted pure function,
matching the reference's mode semantics (frame.py:75-133).
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.config import get_config
from mast3r_slam_tpu.geometry import cartesian_to_spherical, spherical_to_cartesian
from mast3r_slam_tpu.lie import Sim3, core as lie


class Mode(enum.Enum):
    INIT = 0
    TRACKING = 1
    RELOC = 2
    TERMINATED = 3


# ---------------------------------------------------------------------------
# Pointmap fusion (jitted; filtering modes)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mode",))
def fuse_pointmap(
    X_old: jax.Array,  # [N, 3]
    C_old: jax.Array,  # [N, 1]
    X_new: jax.Array,
    C_new: jax.Array,
    mode: str = "weighted_pointmap",
) -> tuple[jax.Array, jax.Array]:
    """Merge a new pointmap observation into the canonical one.

    Modes (semantics per reference frame.py:94-131): "recent",
    "indep_conf", "weighted_pointmap", "weighted_spherical". ("first" and
    "best_score" are handled by the caller since they are order/score
    decisions, not per-pixel math.)
    """
    if mode == "recent":
        return X_new, C_new
    if mode == "indep_conf":
        take_new = C_new > C_old
        X = jnp.where(take_new, X_new, X_old)
        C = jnp.where(take_new, C_new, C_old)
        return X, C
    if mode == "weighted_pointmap":
        C_tot = C_old + C_new
        X = (C_old * X_old + C_new * X_new) / jnp.maximum(C_tot, 1e-12)
        return X, C_tot
    if mode == "weighted_spherical":
        s_old = cartesian_to_spherical(X_old)
        s_new = cartesian_to_spherical(X_new)
        C_tot = C_old + C_new
        s = (C_old * s_old + C_new * s_new) / jnp.maximum(C_tot, 1e-12)
        return spherical_to_cartesian(s), C_tot
    raise ValueError(f"unknown filtering mode {mode!r}")


@partial(jax.jit, static_argnames=("mode",))
def fuse_pointmap_masked(
    X_old: jax.Array,
    C_old: jax.Array,
    N_old: jax.Array,  # scalar float fusion count; 0 => first observation
    X_new: jax.Array,
    C_new: jax.Array,
    mode: str = "weighted_pointmap",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Init-aware fusion (first observation bypasses the merge): the form
    used inside fused device programs where `N == 0` cannot branch in
    Python. Returns (X, C, N)."""
    X_f, C_f = fuse_pointmap(X_old, C_old, X_new, C_new, mode)
    first = N_old < 0.5
    X = jnp.where(first, X_new, X_f)
    C = jnp.where(first, C_new, C_f)
    if mode.startswith("weighted"):
        N = jnp.where(first, 1.0, N_old + 1.0)
    else:
        N = jnp.ones_like(N_old)
    return X, C, N


@dataclasses.dataclass
class Frame:
    """One frame's device-resident state (images normalized to [-1, 1])."""

    frame_id: int
    img: jax.Array  # [H, W, 3] float32
    T_WC: jax.Array = None  # Sim3 element [8]
    X_canon: Optional[jax.Array] = None  # [N, 3]
    C: Optional[jax.Array] = None  # [N, 1]
    feat: Optional[jax.Array] = None  # [S, D] encoder tokens
    pos: Optional[jax.Array] = None  # [S, 2] patch positions
    N: int = 0
    N_updates: int = 0
    K: Optional[jax.Array] = None
    _score: Optional[float] = None

    def __post_init__(self):
        if self.T_WC is None:
            self.T_WC = lie.sim3_identity()

    @property
    def T_WC_sim3(self) -> Sim3:
        return Sim3(self.T_WC)

    def get_score(self, C: jax.Array) -> float:
        cfg = get_config().tracking
        if cfg.filtering_score == "median":
            return float(jnp.median(C))
        return float(jnp.mean(C))

    def update_pointmap(self, X: jax.Array, C: jax.Array) -> None:
        cfg = get_config().tracking
        mode = cfg.filtering_mode
        if self.N == 0:
            self.X_canon, self.C, self.N, self.N_updates = X, C, 1, 1
            if mode == "best_score":
                self._score = self.get_score(C)
            return
        if mode == "first":
            if self.N_updates == 1:
                self.X_canon, self.C, self.N = X, C, 1
        elif mode == "best_score":
            new_score = self.get_score(C)
            if new_score > (self._score or 0.0):
                self.X_canon, self.C, self.N, self._score = X, C, 1, new_score
        else:
            self.X_canon, self.C = fuse_pointmap(self.X_canon, self.C, X, C, mode)
            self.N = self.N + 1 if mode.startswith("weighted") else 1
        self.N_updates += 1

    def get_average_conf(self) -> Optional[jax.Array]:
        if self.C is None:
            return None
        return self.C / self.N


def create_frame(frame_id: int, img, T_WC=None) -> Frame:
    """Build a Frame from a [H, W, 3] uint8/float image (host or device)."""
    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    if img.ndim == 3 and img.shape[0] == 3:  # tolerate CHW input
        img = jnp.transpose(img, (1, 2, 0))
    return Frame(frame_id=frame_id, img=img, T_WC=T_WC)


# ---------------------------------------------------------------------------
# Keyframe arena
# ---------------------------------------------------------------------------


@partial(jax.jit, donate_argnums=(0,), static_argnames=())
def _arena_write(buf: jax.Array, idx, value: jax.Array) -> jax.Array:
    """In-place slot write (buffer donated -> dynamic-update-slice)."""
    return buf.at[idx].set(value)


@partial(jax.jit, donate_argnums=(0,))
def _arena_remove(buf: jax.Array, idx) -> jax.Array:
    """Close the gap at slot `idx` by shifting higher slots down one.

    Static-shape compaction: ONE gather over the arena (a few ms at
    512-keyframe scale), traced once for any `idx`. Slots past the last
    live one become duplicates of the tail — callers track the live count.
    """
    cap = buf.shape[0]
    ar = jnp.arange(cap)
    src = jnp.where(ar < idx, ar, jnp.minimum(ar + 1, cap - 1))
    return buf[src]


class Keyframes:
    """Fixed-capacity keyframe store, all buffers HBM-resident.

    API parity with the reference's Keyframes (frame.py:146-260): append /
    pop_last / last_keyframe / __getitem__ / update_T_WCs / get_poses /
    get_points / get_confidences / set_intrinsics — but reads are
    zero-copy views of the arena and writes are donated slot updates.
    """

    def __init__(
        self,
        h: int,
        w: int,
        capacity: int | None = None,
        feat_dim: int = 1024,
        num_patches: int | None = None,
        dtype=jnp.float32,
    ):
        cfg = get_config()
        self.h, self.w = h, w
        self.capacity = capacity or cfg.runtime.keyframe_capacity
        self.dtype = dtype
        n = h * w
        cap = self.capacity
        self.X = jnp.zeros((cap, n, 3), dtype)
        self.C = jnp.zeros((cap, n, 1), dtype)
        self.T_WC = jnp.tile(lie.sim3_identity()[None], (cap, 1))
        self.N = jnp.zeros((cap, 1, 1), dtype)  # fusion counts
        # host mirror of fusion counts: reading a scalar from the arena
        # costs a full link round trip per access
        self._n_host: list[float] = [0.0] * cap
        # host mirrors of the Frame fields the "first"/"best_score"
        # filtering modes depend on — without them a keyframe round-tripped
        # through the arena would lose its update count/score and those
        # modes would silently degrade to "keep the latest"
        self._nups_host: list[int] = [0] * cap
        self._score_host: list[Optional[float]] = [None] * cap
        self._feat: Optional[jax.Array] = None  # lazily sized [cap, S, D]
        self._pos: Optional[jax.Array] = None
        self.frame_ids: list[int] = []
        self.K: Optional[jax.Array] = None
        self.imgs: list[jax.Array] = []  # host-append only (export/colors)
        # bumped on every mutation; consumers may cache slices against it
        self.version: int = 0

    def __len__(self) -> int:
        return len(self.frame_ids)

    @property
    def count(self) -> int:
        return len(self.frame_ids)

    def _ensure_feat(self, feat: jax.Array):
        if self._feat is None:
            s, d = feat.shape[-2:]
            self._feat = jnp.zeros((self.capacity, s, d), feat.dtype)

    def remove(self, idx: int) -> None:
        """Evict keyframe `idx` and compact the arena (map-scaling path:
        the reference grew unboundedly, frame.py:178; a fixed arena that
        aborts at capacity is not deployable either — SURVEY §5.7)."""
        count = len(self.frame_ids)
        if not (0 <= idx < count):
            raise IndexError(f"keyframe {idx} not live (count={count})")
        self.frame_ids.pop(idx)
        self.imgs.pop(idx)
        self._n_host.pop(idx)
        self._n_host.append(0.0)
        self._nups_host.pop(idx)
        self._nups_host.append(0)
        self._score_host.pop(idx)
        self._score_host.append(None)
        self.X = _arena_remove(self.X, idx)
        self.C = _arena_remove(self.C, idx)
        self.T_WC = _arena_remove(self.T_WC, idx)
        self.N = _arena_remove(self.N, idx)
        if self._feat is not None:
            self._feat = _arena_remove(self._feat, idx)
        self.version += 1

    def append(self, frame: Frame) -> int:
        idx = len(self.frame_ids)
        assert idx < self.capacity, "keyframe arena full"
        self.frame_ids.append(frame.frame_id)
        self.imgs.append(frame.img)
        self.X = _arena_write(self.X, idx, frame.X_canon.astype(self.dtype))
        self.C = _arena_write(self.C, idx, frame.C.astype(self.dtype))
        self.T_WC = _arena_write(self.T_WC, idx, frame.T_WC)
        self.N = _arena_write(self.N, idx, jnp.full((1, 1), float(frame.N), self.dtype))
        self._n_host[idx] = float(frame.N)
        self._nups_host[idx] = int(frame.N_updates)
        self._score_host[idx] = frame._score
        if frame.feat is not None:
            self._ensure_feat(frame.feat)
            self._feat = _arena_write(self._feat, idx, frame.feat)
            self._pos = frame.pos
        self.version += 1
        return idx

    def __setitem__(self, idx: int, frame: Frame) -> None:
        """Write a Frame's state back into its arena slot (reference API
        surface, frame.py:187-191)."""
        self.write_pointmap(
            idx, frame.X_canon, frame.C, float(frame.N),
            n_updates=frame.N_updates, score=frame._score,
        )
        self.write_pose(idx, frame.T_WC)

    def pop_last(self) -> None:
        if self.frame_ids:
            self.frame_ids.pop()
            self.imgs.pop()
            self.version += 1

    def last_index(self) -> Optional[int]:
        return len(self.frame_ids) - 1 if self.frame_ids else None

    def last_keyframe(self) -> Optional[Frame]:
        idx = self.last_index()
        return None if idx is None else self[idx]

    def __getitem__(self, idx: int) -> Frame:
        f = Frame(
            frame_id=self.frame_ids[idx],
            img=self.imgs[idx],
            T_WC=self.T_WC[idx],
            X_canon=self.X[idx],
            C=self.C[idx],
            feat=None if self._feat is None else self._feat[idx],
            pos=self._pos,
            N=int(self._n_host[idx]),
            K=self.K,
        )
        # restore the filtering-mode bookkeeping (fall back to N for slots
        # written before these mirrors existed, e.g. old snapshots)
        nups = self._nups_host[idx]
        f.N_updates = nups if nups > 0 else f.N
        f._score = self._score_host[idx]
        return f

    # -- arena-level ops (used by tracker/backend; no stacking copies) -----

    def write_pointmap(
        self,
        idx: int,
        X: jax.Array,
        C: jax.Array,
        n_count: float,
        n_updates: int | None = None,
        score: float | None = None,
    ):
        self.X = _arena_write(self.X, idx, X.astype(self.dtype))
        self.C = _arena_write(self.C, idx, C.astype(self.dtype))
        self.N = _arena_write(self.N, idx, jnp.full((1, 1), n_count, self.dtype))
        self._n_host[idx] = float(n_count)
        if n_updates is not None:
            self._nups_host[idx] = int(n_updates)
        if score is not None:
            self._score_host[idx] = float(score)
        self.version += 1

    def write_pose(self, idx: int, T: jax.Array):
        self.T_WC = _arena_write(self.T_WC, idx, T)
        self.version += 1

    def update_T_WCs(self, T_WCs: jax.Array, indices) -> None:
        """Batch pose write-back (backend solve)."""
        self.T_WC = self.T_WC.at[jnp.asarray(indices)].set(T_WCs)
        self.version += 1

    def get_poses(self) -> jax.Array:
        return self.T_WC[: len(self)]

    def get_points(self) -> jax.Array:
        return self.X[: len(self)]

    def get_confidences(self) -> jax.Array:
        n = len(self)
        return (self.C / jnp.maximum(self.N, 1.0))[:n]

    def get_average_conf_arena(self) -> jax.Array:
        """[cap, N, 1] average confidence over the FULL arena (masked use)."""
        return self.C / jnp.maximum(self.N, 1.0)

    def set_intrinsics(self, K: jax.Array) -> None:
        self.K = K

    def get_intrinsics(self) -> Optional[jax.Array]:
        return self.K


@dataclasses.dataclass
class SLAMState:
    """Pipeline mode + host-side work queues (parity: frame.py:263-296)."""

    mode: Mode = Mode.INIT
    paused: bool = False
    current_frame: Optional[Frame] = None
    global_optimizer_tasks: list[int] = dataclasses.field(default_factory=list)
    reloc_pending: int = 0

    def queue_global_optimization(self, idx: int) -> None:
        self.global_optimizer_tasks.append(idx)

    def dequeue_global_optimization(self) -> Optional[int]:
        return (
            self.global_optimizer_tasks.pop(0) if self.global_optimizer_tasks else None
        )

    def queue_reloc(self) -> None:
        self.reloc_pending += 1

    def dequeue_reloc(self) -> bool:
        if self.reloc_pending > 0:
            self.reloc_pending -= 1
            return True
        return False
