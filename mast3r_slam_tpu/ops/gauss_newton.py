"""Gauss-Newton solvers: frontend pose tracking + backend factor graph.

TPU-native design
-----------------
The reference's backend GN is a three-stage host/device ping-pong per
iteration: a Metal kernel emits per-(edge,point) 119-float Jacobian blocks,
the CPU reduces them into a dense Hessian and calls LAPACK, then another
kernel applies the retraction (gn_metal_runner.py:81-341). Here the whole
iteration is ONE fused XLA program:

* per-(edge,point) residuals/Jacobians are batched jnp math [E, N, r, 7]
  feeding two einsums (MXU) that reduce directly to per-edge 7x7 blocks —
  the per-point blocks are never materialized,
* block scatter-add into the [K, K, 7, 7] Hessian uses XLA scatter
  (deterministic, duplicate-safe),
* Cholesky + retraction run on device; iterations are a lax.while_loop with
  an on-device convergence predicate (no `.item()` host syncs anywhere),
* the frontend pose loops run in structure-of-arrays layout ([*, N], N on
  the TPU lane axis) with the measurement chain rule folded analytically —
  see `_pose_gn_loop_rays_soa` — worth ~6.5 ms/frame in the fused tracking
  step vs the [N, 4, 7] einsum formulation, whose 7-wide trailing dim pads
  to the 128-lane tile.

A key algebraic simplification this build exploits: with consistent left
perturbations, dX_Ci/dxi_i = -dX_Ci/dxi_j exactly (conjugation by Ti), so
only ONE Jacobian J and ONE 7x7 block S_e per edge are computed; the four
blocks of the reference kernel (JtJ_i, JtJ_j, JtJ_ij + gradients,
gauss_newton.metal:191-248) are (S, S, -S, ±b).

Residual modes (parity targets):
* "rays":   3D point error, 1/sigma_ray whitening
            (reference gauss_newton.py:141-152 — its "ray" kernel is
            actually a whitened 3D point residual; we keep those semantics)
* "points": 3D point error with scale-invariant 1/||Xi|| weighting
            (reference gauss_newton_points.py:113-119)
* "calib":  [du, dv, dlog z] pinhole residual with border/depth gating
            (reference gauss_newton_calib.py:137-221)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.lie import core as lie
from mast3r_slam_tpu.ops.linalg import cholesky_solve


def _stride_indices(N: int, stride: int, img_size) -> "np.ndarray":
    """Static flattened-pixel indices for `point_stride` subsampling.

    A plain `[::stride]` on row-major HxW pixels with W divisible by the
    stride keeps only every stride-th COLUMN (full vertical resolution,
    1/stride horizontal) — an anisotropic lattice. When the image shape is
    known, shift the column phase by (row mod stride) so the kept pixels
    form a diagonal (checkerboard-like) lattice with spatially uniform
    constraint coverage. Without img_size the plain stride is used.
    """
    import numpy as np

    base = np.arange(0, N, stride, dtype=np.int32)
    if img_size is not None:
        h, w = img_size
        if h * w == N:
            base = np.minimum(base + (base // w) % stride, N - 1)
    return base


def huber_weight(r: jax.Array, k: float = 1.345) -> jax.Array:
    """IRLS Huber weight: 1 inside the k-tube, k/|r| outside."""
    r_abs = jnp.abs(r)
    return jnp.where(r_abs < k, 1.0, k / jnp.maximum(r_abs, 1e-12))


def tukey_weight(r: jax.Array, t: float = 4.6851) -> jax.Array:
    """IRLS Tukey biweight: (1-(r/t)^2)^2 inside the t-tube, 0 outside —
    a redescending loss that fully rejects gross outliers (reference
    optimizer.py:65-78, defined there but never selected by any config;
    here it is live via the `robust` knob)."""
    tmp = 1.0 - (r / t) ** 2
    return jnp.where(jnp.abs(r) < t, tmp * tmp, 0.0)


def robust_weight(r: jax.Array, p: "GNParams") -> jax.Array:
    """Robust IRLS weight selected by p.robust (a trace-time constant)."""
    if p.robust == "huber":
        return huber_weight(r, p.huber_k)
    if p.robust == "tukey":
        return tukey_weight(r, p.tukey_t)
    raise ValueError(f"unknown robust kind {p.robust!r}")


class GNParams(NamedTuple):
    """Solver knobs (defaults = reference local_opt config, config.py:92-105)."""

    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    C_thresh: float = 0.0
    Q_thresh: float = 1.5
    huber_k: float = 1.345
    robust: str = "huber"  # huber | tukey (trace-time constant)
    tukey_t: float = 4.6851
    max_iter: int = 10
    delta_thresh: float = 1e-3
    pixel_border: int = 0
    z_eps: float = 0.0
    reg: float = 1e-6


# ---------------------------------------------------------------------------
# Backend: factor-graph GN over the keyframe arena
# ---------------------------------------------------------------------------


def _edge_system(
    Twc: jax.Array,  # [K, 8]
    Xi_t: jax.Array,  # [E, 3, N] gathered i-side points (pose-independent)
    Xj_t: jax.Array,  # [E, 3, N] j-side points
    ii: jax.Array,  # [E]
    jj: jax.Array,  # [E]
    weight_mask: jax.Array,  # [E, N] pose-independent weights (conf gates etc.)
    Q: jax.Array,  # [E, N] match confidence
    mode: str,
    K_intr: jax.Array | None,
    img_size: tuple[int, int] | None,
    p: GNParams,
    variant: str = "base",
):
    """Build per-edge 7x7 system blocks S_e and gradients b_e.

    Returns S [E,7,7], b [E,7] (gradient contribution of pose j; pose i gets
    -b), and the scalar cost.

    `Xi_t`/`Xj_t` arrive pre-gathered: the correspondence gather is
    pose-INDEPENDENT, so the caller hoists it out of the GN iteration loop
    (TPU gathers pay per row — re-gathering E x N rows every while_loop
    iteration was pure waste; see gauss_newton_graph).

    SoA layout (same rationale as `_pose_gn_loop_rays_soa`): per-point
    Jacobian stacks live as [E, R, 7, N] with N on the lane axis, never as
    [E, N, R, 7] (whose trailing 7 pads to the 128-lane tile), and the
    chain Jp @ Ad_inv is expanded analytically — Jp = [I | -[P]x | P] means
        (Jp Ad)[r, c] = Ad[r, c] + (-[P]x)[r, :] . Ad[3:6, c] + P_r Ad[6, c]
    which is three fused multiply-adds per entry instead of a batched
    [3, 7] matmul per point. The 7x7 blocks then reduce with ONE batched
    [7, RN] x [RN, 7] MXU matmul per edge.
    """
    Ti = Twc[ii]  # [E, 8]
    Tj = Twc[jj]
    Tij = lie.sim3_mul(lie.sim3_inv(Ti), Tj)  # [E, 8]

    # P = Tij . Xj in SoA: per-edge quaternion rotate + scale + translate.
    t, q, s = Tij[:, :3], Tij[:, 3:7], Tij[:, 7:8]
    qv = q[:, :3, None]  # [E, 3, 1]
    qw = q[:, 3:4, None]
    uv = 2.0 * _cross_soa(jnp.broadcast_to(qv, Xj_t.shape), Xj_t)
    P = s[:, :, None] * (
        Xj_t + qw * uv + _cross_soa(jnp.broadcast_to(qv, uv.shape), uv)
    ) + t[:, :, None]  # [E, 3, N]
    x, y, z = P[:, 0], P[:, 1], P[:, 2]  # [E, N]

    Ad = lie.sim3_adjoint(lie.sim3_inv(Ti))  # [E, 7, 7]
    # JpAd rows [E, 7, N]: (Jp @ Ad)[r] expanded analytically (see above).
    A_r = Ad[:, :, :, None]  # [E, 7(b), 7(c), 1] broadcast helper
    xn, yn, zn = x[:, None, :], y[:, None, :], z[:, None, :]  # [E, 1, N]
    JpAd0 = A_r[:, 0] + zn * A_r[:, 4] - yn * A_r[:, 5] + xn * A_r[:, 6]
    JpAd1 = A_r[:, 1] - zn * A_r[:, 3] + xn * A_r[:, 5] + yn * A_r[:, 6]
    JpAd2 = A_r[:, 2] + yn * A_r[:, 3] - xn * A_r[:, 4] + zn * A_r[:, 6]
    # each [E, 7, N]

    if mode in ("rays", "points"):
        sigma_inv = 1.0 / p.sigma_ray
        r = sigma_inv * (P - Xi_t)  # [E, 3, N]
        Jrows = [sigma_inv * JpAd0, sigma_inv * JpAd1, sigma_inv * JpAd2]
        gate = jnp.ones(r.shape[:1] + r.shape[2:], dtype=r.dtype)  # [E, N]
        if mode == "points":
            scale = 1.0 / (
                jnp.sqrt(jnp.sum(Xi_t * Xi_t, axis=1)) + 1e-6
            )  # [E, N]
            r = r * scale[:, None, :]
            sc = scale[:, None, :]
            Jrows = [sc * Jrows[0], sc * Jrows[1], sc * Jrows[2]]
    elif mode == "calib":
        assert K_intr is not None and img_size is not None
        h, w_img = img_size
        fx, fy = K_intr[0, 0], K_intr[1, 1]
        sp_inv = 1.0 / p.sigma_pixel
        sd_inv = 1.0 / p.sigma_depth
        zi = Xi_t[:, 2]
        zi_safe = jnp.maximum(zi, 1e-6)
        zj_safe = jnp.maximum(z, 1e-6)
        zi_inv, zj_inv = 1.0 / zi_safe, 1.0 / zj_safe

        uj = fx * x * zj_inv + K_intr[0, 2]
        vj = fy * y * zj_inv + K_intr[1, 2]
        ui = fx * Xi_t[:, 0] * zi_inv + K_intr[0, 2]
        vi = fy * Xi_t[:, 1] * zi_inv + K_intr[1, 2]

        r = jnp.stack(
            [
                sp_inv * (uj - ui),
                sp_inv * (vj - vi),
                sd_inv * (jnp.log(zj_safe) - jnp.log(zi_safe)),
            ],
            axis=1,
        )  # [E, 3, N]
        # Whitened projection rows folded into the JpAd rows:
        # dproj = [[a, 0, -a*x/zj], [0, b, -b*y/zj], [0, 0, sd_inv/zj]]
        a = (sp_inv * fx * zj_inv)[:, None, :]
        b2 = (sp_inv * fy * zj_inv)[:, None, :]
        Jrows = [
            a * JpAd0 - (a * x[:, None, :] * zj_inv[:, None, :]) * JpAd2,
            b2 * JpAd1 - (b2 * y[:, None, :] * zj_inv[:, None, :]) * JpAd2,
            (sd_inv * zj_inv)[:, None, :] * JpAd2,
        ]
        b_ = p.pixel_border
        gate = (
            (z > p.z_eps)
            & (zi > p.z_eps)
            & (uj >= b_)
            & (uj < w_img - b_)
            & (vj >= b_)
            & (vj < h - b_)
        ).astype(r.dtype)
    else:  # pragma: no cover
        raise ValueError(f"unknown GN mode {mode!r}")

    sqrt_conf = jnp.sqrt(jnp.maximum(Q, 0.0))[:, None, :]  # [E, 1, N]
    hub = robust_weight(sqrt_conf * r, p)  # [E, 3, N]
    w = hub * (Q * weight_mask * gate)[:, None, :]  # [E, 3, N]
    sw = jnp.sqrt(w)

    E, _, N = r.shape
    vset = set(variant.split("+"))
    if "bf16" in vset:
        # bf16 edge transients: the [E,7,N] Jacobian rows and weighted
        # residuals dominate the solve's HBM bytes; the 7x7 reductions
        # accumulate in f32 on the MXU (preferred_element_type), so only
        # the per-element transient storage loses precision.
        sw = sw.astype(jnp.bfloat16)
        r16 = r.astype(jnp.bfloat16)
        Jrows = [j.astype(jnp.bfloat16) for j in Jrows]
    else:
        r16 = r
    if "noconcat" in vset:
        # S = A A^T with A = [A_0 | A_1 | A_2] equals sum_k A_k A_k^T —
        # skip materializing the [E, 7, 3N] concat.
        S = b = None
        for k in range(3):
            Ak = sw[:, k : k + 1] * Jrows[k]  # [E, 7, N]
            rk = sw[:, k] * r16[:, k]  # [E, N]
            Sk = jnp.einsum(
                "ecm,edm->ecd", Ak, Ak, preferred_element_type=jnp.float32
            )
            bk = jnp.einsum(
                "ecm,em->ec", Ak, rk, preferred_element_type=jnp.float32
            )
            S = Sk if S is None else S + Sk
            b = bk if b is None else b + bk
    else:
        # Weighted Jacobian [E,7,3N] and residual [E,3N]: S = A A^T, b = A wr.
        A = jnp.concatenate(
            [sw[:, k : k + 1] * Jrows[k] for k in range(3)], axis=2
        )  # [E, 7, 3N], last axis ordered [r0 all-n | r1 all-n | r2 all-n]
        br = (sw * r16).reshape(E, 3 * N)  # [E, 3N] — same row-major ordering
        S = jnp.einsum("ecm,edm->ecd", A, A, preferred_element_type=jnp.float32)
        b = jnp.einsum("ecm,em->ec", A, br, preferred_element_type=jnp.float32)
    S = S.astype(Twc.dtype)
    b = b.astype(Twc.dtype)
    cost = 0.5 * jnp.sum(w * r * r)
    return S, b, cost


def _resolve_edge_chunk(E: int, n_pts: int, edge_chunk: int | None) -> int:
    """Pick the edge-chunk size for the graph solve's scan.

    The scan over edge chunks exists only to bound the transient working
    set, but it is EXPENSIVE — measured 44 ms per iteration of pure scan
    overhead at 32 edges x 196k pts (the unchunked edge pass runs in
    ~7 ms). So take the largest chunk whose Jacobian/residual transients
    (~260 B per edge-point in f32) fit a ~2 GB budget — scanning only
    engages for graphs that genuinely would not fit — then shrink to a
    divisor of E (edge arenas are power-of-two bucketed, so this rarely
    moves).
    """
    if edge_chunk is None:
        budget = 2 * 1024**3
        edge_chunk = max(1, min(E, budget // max(n_pts * 260, 1)))
    chunk = min(edge_chunk, E)
    while E % chunk:
        chunk -= 1
    return chunk


def _edge_blocks(
    Twc_cur, Xi_t, Xj_t, ii, jj, weight_mask, Q, chunk,
    mode, K_intr, img_size, p, variant="base",
):
    """Per-edge 7x7 blocks S [E,7,7] and gradients b [E,7], scanning over
    edge chunks when the Jacobian working set would not fit (see
    `_resolve_edge_chunk`)."""
    E = ii.shape[0]
    if chunk == E:
        S, b, _cost = _edge_system(
            Twc_cur, Xi_t, Xj_t, ii, jj, weight_mask, Q,
            mode, K_intr, img_size, p, variant,
        )
        return S, b

    def chunk_system(_, args):
        Xi_c, Xj_c, ii_c, jj_c, wm_c, Q_c = args
        S_c, b_c, cost_c = _edge_system(
            Twc_cur, Xi_c, Xj_c, ii_c, jj_c, wm_c, Q_c,
            mode, K_intr, img_size, p, variant,
        )
        return None, (S_c, b_c, cost_c)

    resh = lambda a: a.reshape(E // chunk, chunk, *a.shape[1:])
    _, (S, b, _costs) = jax.lax.scan(
        chunk_system,
        None,
        (resh(Xi_t), resh(Xj_t), resh(ii), resh(jj), resh(weight_mask),
         resh(Q)),
    )
    return S.reshape(E, 7, 7), b.reshape(E, 7)


def _assemble_Hg(K, ii, jj, S, b, dtype):
    """Scatter-add per-edge blocks into the block Hessian [K, K, 7, 7] and
    gradient [K, 7] (deterministic XLA scatter; the reference reduced on
    the CPU per iteration, gn_metal_runner.py:221-292)."""
    H = jnp.zeros((K, K, 7, 7), dtype)
    H = H.at[ii, ii].add(S)
    H = H.at[jj, jj].add(S)
    H = H.at[ii, jj].add(-S)
    H = H.at[jj, ii].add(-S)
    g = jnp.zeros((K, 7), dtype)
    g = g.at[jj].add(b)
    g = g.at[ii].add(-b)
    return H, g


@partial(
    jax.jit,
    static_argnames=(
        "mode", "img_size", "params", "edge_chunk", "mesh", "variant",
        "point_stride",
    ),
)
def gauss_newton_graph(
    Twc: jax.Array,  # [K, 8]
    Xs: jax.Array,  # [K, N, 3]
    Cs: jax.Array,  # [K, N]
    ii: jax.Array,  # [E] int32
    jj: jax.Array,  # [E] int32
    idx_ii2jj: jax.Array,  # [E, N] int32
    valid_match: jax.Array,  # [E, N] bool
    Q: jax.Array,  # [E, N]
    edge_mask: jax.Array,  # [E] bool — padded/inactive edges
    free_mask: jax.Array,  # [K] bool — poses the solver may move
    mode: str = "rays",
    K_intr: jax.Array | None = None,
    img_size: tuple[int, int] | None = None,
    params: GNParams = GNParams(),
    edge_chunk: int | None = None,
    mesh=None,
    variant: str = "base",
    point_stride: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Global Sim3 pose-graph GN over dense correspondences.

    All shapes are static (K = keyframe-arena bucket, E = edge-arena bucket,
    N = pixels); inactive slots are masked. Returns (Twc_new [K,8],
    final delta norm).

    Wires all three modes for real — the reference's rays path was a
    zero-Hessian no-op (global_opt.py:342-390 never filled H; SURVEY §2.10).

    With `mesh` (a jax.sharding.Mesh with a 'dp' axis), the EDGE axis —
    the one SLAM dimension that outgrows a chip (E x N Jacobian transients)
    — shards over devices via shard_map: each chip builds S_e/b_e for its
    E/n_dp edges, assembles a local block Hessian, and a psum over ICI
    yields the replicated [K, K, 7, 7] system; the 7K x 7K Cholesky then
    runs replicated (it is tiny next to the edge pass). Requires E
    divisible by the dp axis size (edge arenas are power-of-two bucketed).
    """
    p = params
    K = Twc.shape[0]

    if point_stride < 1:
        raise ValueError(f"point_stride must be >= 1, got {point_stride}")

    # Deployment lever (round-4 profile): the solve is 59% one-time
    # correspondence gather (E x N arbitrary rows at the chip's streaming
    # gather rate) + HBM-bound per-iteration streams — BOTH linear in the
    # j-side point count. point_stride s keeps ~every s-th j-side pixel
    # (the i-side source stays full-resolution: indices point anywhere),
    # cutting the whole solve ~s-fold. The strided problem is a subsample
    # of the same objective (spatially uniform when img_size is known —
    # see _stride_indices; a plain 1-D stride otherwise) and the Levenberg
    # floor is relative to diag(H), so stride changes constraint count,
    # not scaling. Default 1 = reference parity (every pixel).
    if point_stride > 1:
        sub = jnp.asarray(
            _stride_indices(idx_ii2jj.shape[1], point_stride, img_size)
        )
        idx_ii2jj = idx_ii2jj[:, sub]
        valid_match = valid_match[:, sub]
        Q = Q[:, sub]
    else:
        sub = None

    # Pose-independent gathers, hoisted OUT of the iteration loop and
    # PACKED into one wide-row gather (X 3 lanes + C 1 lane share
    # idx_ii2jj; TPU gathers pay per row): the solver used to re-gather
    # E x N i-side points inside every while_loop iteration.
    src = jnp.concatenate([Xs, Cs[..., None]], axis=-1)[ii]  # [E, N, 4]
    gath = jnp.take_along_axis(src, idx_ii2jj[..., None], axis=1)
    Xi_t = gath[..., :3].transpose(0, 2, 1)  # [E, 3, Ns]
    Ci = gath[..., 3]  # [E, Ns]
    Xj = Xs[jj] if sub is None else Xs[jj][:, sub]  # [E, Ns, 3]
    Xj_t = Xj.transpose(0, 2, 1)  # [E, 3, Ns]
    Cj = Cs[jj] if sub is None else Cs[jj][:, sub]
    weight_mask = (
        valid_match
        & (Q > p.Q_thresh)
        & (Ci > p.C_thresh)
        & (Cj > p.C_thresh)
        & edge_mask[:, None]
    ).astype(Twc.dtype)

    freeF = free_mask.astype(Twc.dtype)  # [K]

    E = ii.shape[0]
    if mesh is not None:
        n_dp = mesh.shape.get("dp", 1)
        if E % n_dp:
            raise ValueError(
                f"edge count {E} not divisible by dp axis {n_dp}"
            )
        chunk = _resolve_edge_chunk(E // n_dp, Xi_t.shape[2], edge_chunk)
    else:
        chunk = _resolve_edge_chunk(E, Xi_t.shape[2], edge_chunk)

    def step(Twc_cur):
        if mesh is None:
            S, b = _edge_blocks(
                Twc_cur, Xi_t, Xj_t, ii, jj, weight_mask, Q, chunk,
                mode, K_intr, img_size, p, variant,
            )
            H, g = _assemble_Hg(K, ii, jj, S, b, Twc.dtype)
        else:
            from jax.sharding import PartitionSpec as P
            try:  # moved to jax.shard_map in newer releases
                from jax import shard_map
            except ImportError:  # pragma: no cover
                from jax.experimental.shard_map import shard_map

            def local(Twc_l, Xi_l, Xj_l, ii_l, jj_l, wm_l, Q_l):
                S_l, b_l = _edge_blocks(
                    Twc_l, Xi_l, Xj_l, ii_l, jj_l, wm_l, Q_l, chunk,
                    mode, K_intr, img_size, p, variant,
                )
                H_l, g_l = _assemble_Hg(K, ii_l, jj_l, S_l, b_l, Twc.dtype)
                return (
                    jax.lax.psum(H_l, "dp"), jax.lax.psum(g_l, "dp")
                )

            H, g = shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                    P("dp"),
                ),
                out_specs=(P(), P()),
            )(Twc_cur, Xi_t, Xj_t, ii, jj, weight_mask, Q)

        # Pin: zero rows/cols of non-free poses, identity diagonal.
        H = H * freeF[:, None, None, None] * freeF[None, :, None, None]
        eye7 = jnp.eye(7, dtype=Twc.dtype)
        diag_fix = (1.0 - freeF)[:, None, None] * eye7[None]
        H = H.at[jnp.arange(K), jnp.arange(K)].add(diag_fix)
        g = g * freeF[:, None]

        H_flat = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        # Scale-aware damping: the whitened blocks reach ~sigma^-2 (1e5+),
        # so a fixed 1e-6 floor leaves f32 Cholesky numerically non-PD when
        # some free pose has no constraints. Damp relative to the largest
        # diagonal entry (Levenberg floor).
        diag_max = jnp.max(jnp.abs(jnp.diagonal(H_flat)))
        reg = p.reg * jnp.maximum(diag_max, 1.0)
        dx = cholesky_solve(H_flat, -g.reshape(-1), reg=reg).reshape(K, 7)
        dx = dx * freeF[:, None]
        # Solver guard: a failed factorization must not poison the poses
        # (reference analog: LinAlgError -> break, gauss_newton.py:257-260).
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))

        Twc_new = lie.sim3_retract(Twc_cur, dx)
        Twc_new = jnp.where(free_mask[:, None], Twc_new, Twc_cur)
        return Twc_new, jnp.linalg.norm(dx)

    def cond(carry):
        _, delta, it = carry
        return (it < p.max_iter) & (delta >= p.delta_thresh)

    def body(carry):
        Twc_cur, _, it = carry
        Twc_new, delta = step(Twc_cur)
        return Twc_new, delta, it + 1

    Twc_out, delta, _ = jax.lax.while_loop(
        cond, body, (Twc, jnp.asarray(jnp.inf, Twc.dtype), 0)
    )
    return Twc_out, delta


# ---------------------------------------------------------------------------
# Frontend: single relative-pose GN (tracker)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("params",))
def gauss_newton_pose_rays(
    T_init: jax.Array,  # [8] initial T_CkCf
    Xf: jax.Array,  # [N, 3] frame points (already gathered to kf order)
    rd_k: jax.Array,  # [N, 4] keyframe ray-dist measurements
    sqrt_info: jax.Array,  # [N, 4] whitening (includes validity & conf)
    params: GNParams = GNParams(),
) -> tuple[jax.Array, jax.Array]:
    """Uncalibrated tracker objective: ray + distance residual.

    r_n = rd_k[n] - rd(T . Xf[n]) in R^4, J chained through the analytic
    ray-dist Jacobian and the left-perturbation point Jacobian
    (parity: reference tracker.py:258-324, but the 7x7 solve happens on
    device and the iteration loop is a lax.while_loop with the reference's
    rel_error/delta_norm convergence rule). Runs in SoA layout — see
    `_pose_gn_loop_rays_soa`.
    """
    p = params

    return _pose_gn_loop_rays_soa(
        T_init, Xf.T, rd_k.T, sqrt_info.T, p
    )


def _cross_soa(a, b):
    """Cross product of [..., 3, N] component stacks (SoA layout)."""
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=-2
    )


def _pose_gn_loop_rays_soa(
    T_init, Xt, rdk_t, w_t, p: GNParams, rel_error: float = 1e-3
):
    """Ray-dist tracker GN in structure-of-arrays layout: Xt [3, N],
    rdk_t / w_t [4, N].

    TPU layout note: the generic loop materializes [N, 4, 7] Jacobian
    stacks whose trailing dims land on the (sublane, lane) tiles — lane 7
    pads to 128, an ~18x bandwidth tax. Here N stays on the lane axis
    throughout and the normal equations reduce with ONE [7, 4N] x [4N, 7]
    MXU matmul. The chain rule is also folded analytically: with P = d*r,
        drd/dX @ [I | -[P]x | P]  =  [ d^-1(I - r r^T) | -[r]x | 0 ]
                                     [       r^T       |   0   | d ]
    (the ray rows' scale column vanishes because (I - r r^T) P = 0), so no
    per-point matrix products are formed at all. Semantics are identical to
    a straightforward [N, R, 7] einsum formulation (same residuals, Huber
    weights, and rel-error/delta-norm convergence rule — cross-checked by
    the solver tests and the float64 oracle twin in benchmarks/gn_oracle.py).
    """

    def solve_step(T):
        t, q, s = T[:3], T[3:7], T[7]
        qv, qw = q[:3, None], q[3]
        uv = 2.0 * _cross_soa(jnp.broadcast_to(qv, Xt.shape), Xt)
        P = s * (Xt + qw * uv + _cross_soa(jnp.broadcast_to(qv, uv.shape), uv))
        P = P + t[:, None]  # [3, N]
        # same epsilon as geometry.point_to_dist (parity with the generic path)
        d = jnp.sqrt(jnp.sum(P * P, axis=0) + 1e-10)  # [N]
        dinv = 1.0 / d
        r0, r1, r2 = P[0] * dinv, P[1] * dinv, P[2] * dinv
        res = jnp.stack(
            [rdk_t[0] - r0, rdk_t[1] - r1, rdk_t[2] - r2, rdk_t[3] - d]
        )  # [4, N]

        wr = w_t * res
        robust = w_t * jnp.sqrt(robust_weight(wr, p))
        z = jnp.zeros_like(d)
        # J = -(drd/dX @ Jp): rows stacked as B[r][a] over a in 0..6
        jrow = [
            [dinv * (1.0 - r0 * r0), -dinv * r0 * r1, -dinv * r0 * r2,
             z, r2, -r1, z],
            [-dinv * r1 * r0, dinv * (1.0 - r1 * r1), -dinv * r1 * r2,
             -r2, z, r0, z],
            [-dinv * r2 * r0, -dinv * r2 * r1, dinv * (1.0 - r2 * r2),
             r1, -r0, z, z],
            [r0, r1, r2, z, z, z, d],
        ]
        # Weighted stack Bm [7, 4N]: row a = robust[r] * (-jrow[r][a]) over r
        Bm = jnp.stack(
            [
                jnp.concatenate([-robust[r] * jrow[r][a] for r in range(4)])
                for a in range(7)
            ]
        )
        b = (robust * res).reshape(-1)  # [4N]
        H = Bm @ Bm.T  # [7, 7] (MXU: contraction over 4N lanes)
        g = Bm @ b
        cost = 0.5 * jnp.sum(b * b)
        tau = cholesky_solve(H, -g, reg=p.reg)
        tau = jnp.where(jnp.all(jnp.isfinite(tau)), tau, jnp.zeros_like(tau))
        return lie.sim3_retract(T, tau), tau, cost

    def cond(carry):
        _, it, old_cost, new_cost, delta_norm = carry
        converged = (
            jnp.abs(old_cost - new_cost) / (old_cost + 1e-10) < rel_error
        ) | (delta_norm < p.delta_thresh)
        return (it < p.max_iter) & ~((it > 0) & converged)

    def body(carry):
        T, it, _old, new_cost, _dn = carry
        T_new, tau, cost = solve_step(T)
        return T_new, it + 1, new_cost, cost, jnp.linalg.norm(tau)

    init = (
        T_init,
        0,
        jnp.asarray(jnp.inf, T_init.dtype),
        jnp.asarray(jnp.inf, T_init.dtype),
        jnp.asarray(jnp.inf, T_init.dtype),
    )
    T_out, _, _, final_cost, _ = jax.lax.while_loop(cond, body, init)
    return T_out, final_cost


@partial(jax.jit, static_argnames=("img_size", "params"))
def gauss_newton_pose_calib(
    T_init: jax.Array,  # [8]
    Xf: jax.Array,  # [N, 3]
    meas_k: jax.Array,  # [N, 3] keyframe [u, v, log z]
    sqrt_info: jax.Array,  # [N, 3]
    valid_meas: jax.Array,  # [N, 1] bool
    K_intr: jax.Array,
    img_size: tuple[int, int],
    params: GNParams = GNParams(),
) -> tuple[jax.Array, jax.Array]:
    """Calibrated tracker objective: pixel + log-depth residual
    (parity: reference tracker.py:326-406). SoA layout like the rays loop
    (`_pose_gn_loop_rays_soa`): N stays on the lane axis, the projection
    chain rule is folded analytically (note the scale column: pixel rows
    are scale-invariant — row.P = 0 — and log-depth contributes exactly 1),
    and the normal equations reduce with one [7, 3N] x [3N, 7] matmul."""
    p = params
    h_img, w_img = img_size
    fx, fy = K_intr[0, 0], K_intr[1, 1]
    cx, cy = K_intr[0, 2], K_intr[1, 2]
    Xt = Xf.T  # [3, N]
    meas_t = meas_k.T  # [3, N]
    w_t = sqrt_info.T  # [3, N]
    vmeas = valid_meas[:, 0]  # [N]
    eps = 1e-10  # geometry._EPS

    def solve_step(T):
        t, q, s = T[:3], T[3:7], T[7]
        qv, qw = q[:3, None], q[3]
        uv = 2.0 * _cross_soa(jnp.broadcast_to(qv, Xt.shape), Xt)
        P = s * (Xt + qw * uv + _cross_soa(jnp.broadcast_to(qv, uv.shape), uv))
        P = P + t[:, None]  # [3, N]
        x, y, z = P[0], P[1], P[2]
        zi = 1.0 / (z + eps)
        u = fx * x * zi + cx
        v = fy * y * zi + cy
        valid = (
            (u > p.pixel_border)
            & (u < w_img - 1 - p.pixel_border)
            & (v > p.pixel_border)
            & (v < h_img - 1 - p.pixel_border)
            & (z > p.z_eps)
            & vmeas
        )
        gate = valid.astype(T.dtype)  # [N]
        logz = jnp.where(z > p.z_eps, jnp.log(jnp.maximum(z, eps) + eps), 0.0)
        res = jnp.stack([meas_t[0] - u, meas_t[1] - v, meas_t[2] - logz]) * gate

        wr = w_t * res
        robust = w_t * jnp.sqrt(robust_weight(wr, p)) * gate
        # Projection rows (d pz / dX, z_inv semantics of project_calib):
        rows = (
            (fx * zi, jnp.zeros_like(z), -fx * x * zi * zi),
            (jnp.zeros_like(z), fy * zi, -fy * y * zi * zi),
            (jnp.zeros_like(z), jnp.zeros_like(z), zi),
        )
        # Fold with Jp = [I | -[P]x | P]: for a row (p0, p1, p2) the w-block
        # is -(p x P-cross) and the scale entry is row.P; then J = -(...).
        jrows = []
        for p0, p1, p2 in rows:
            jrows.append(
                [
                    p0, p1, p2,
                    -(p1 * z - p2 * y),
                    -(-p0 * z + p2 * x),
                    -(p0 * y - p1 * x),
                    p0 * x + p1 * y + p2 * z,
                ]
            )
        Bm = jnp.stack(
            [
                jnp.concatenate([-robust[r] * jrows[r][a] for r in range(3)])
                for a in range(7)
            ]
        )
        b = (robust * res).reshape(-1)
        H = Bm @ Bm.T
        g = Bm @ b
        cost = 0.5 * jnp.sum(b * b)
        tau = cholesky_solve(H, -g, reg=p.reg)
        tau = jnp.where(jnp.all(jnp.isfinite(tau)), tau, jnp.zeros_like(tau))
        return lie.sim3_retract(T, tau), tau, cost

    def cond(carry):
        _, it, old_cost, new_cost, delta_norm = carry
        converged = (
            jnp.abs(old_cost - new_cost) / (old_cost + 1e-10) < 1e-3
        ) | (delta_norm < p.delta_thresh)
        return (it < p.max_iter) & ~((it > 0) & converged)

    def body(carry):
        T, it, _old, new_cost, _dn = carry
        T_new, tau, cost = solve_step(T)
        return T_new, it + 1, new_cost, cost, jnp.linalg.norm(tau)

    init = (
        T_init,
        0,
        jnp.asarray(jnp.inf, T_init.dtype),
        jnp.asarray(jnp.inf, T_init.dtype),
        jnp.asarray(jnp.inf, T_init.dtype),
    )
    T_out, _, _, final_cost, _ = jax.lax.while_loop(cond, body, init)
    return T_out, final_cost



# ---------------------------------------------------------------------------
# Generic GN solver over a user residual model
# ---------------------------------------------------------------------------


class GaussNewtonSolver:
    """Generic robust Gauss-Newton over a user residual model (the
    reference's `GaussNewtonOptimizer`, optimizer.py:229-289 — defined
    there but never instantiated by its own pipeline; live here for
    library use, e.g. custom calibration objectives).

    TPU-native shape: the whole IRLS loop is ONE `lax.while_loop` inside a
    jitted program — no per-iteration host round trips (the reference
    version runs a Python `for` with `mx.eval` per step). `residual_fn`
    must be jax-traceable: params [n] -> (r [M], J [M, n]). Robust
    weighting (huber/tukey via GNParams.robust), normal equations solved
    by regularized Cholesky, Euclidean update (pose solvers with manifold
    retractions are the dedicated entry points above).
    """

    def __init__(self, params: GNParams = GNParams(), rel_error: float = 1e-3):
        self.p = params
        self.rel_error = rel_error

    def solve(self, residual_fn, x0: jax.Array, sqrt_info: jax.Array):
        """Returns (x, final_cost, iterations). Jit-safe: call inside jit,
        or rely on the internal jit for standalone use."""
        p, rel = self.p, self.rel_error

        def step(x):
            r, J = residual_fn(x)
            wr = sqrt_info * r
            rob = sqrt_info * jnp.sqrt(robust_weight(wr, p))
            A = rob[:, None] * J  # [M, n]
            b = rob * r  # [M]
            H = A.T @ A
            g = A.T @ b
            cost = 0.5 * jnp.sum(b * b)
            dx = cholesky_solve(H, -g, reg=p.reg)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
            return x + dx, jnp.linalg.norm(dx), cost

        def cond(carry):
            _, it, old_cost, new_cost, dn = carry
            converged = (
                jnp.abs(old_cost - new_cost) / (old_cost + 1e-10) < rel
            ) | (dn < p.delta_thresh)
            return (it < p.max_iter) & ~((it > 0) & converged)

        def body(carry):
            x, it, _old, new_cost, _dn = carry
            x2, dn, cost = step(x)
            return x2, it + 1, new_cost, cost, dn

        inf = jnp.asarray(jnp.inf, x0.dtype)
        x_out, iters, _, cost, _ = jax.lax.while_loop(
            cond, body, (x0, 0, inf, inf, inf)
        )
        return x_out, cost, iters
