"""VMEM-tiled dense cost-volume matcher: the Pallas TPU kernel twin.

ON-CHIP VERDICT (v5e, 384x512, d=24, radius 6, payload+hit, chained+fetch
protocol): this kernel measures 6.47 ms/call vs the XLA twin's 3.41 —
the XLA shifted-tap formulation STAYS the default (`matching.dense_kernel:
xla`). The HBM savings the tiling buys are more than repaid in VPU work by
the f32 rotate round-trip that Mosaic's shift constraints force (below);
the kernel is kept as the documented exploration and as a working example
of the constraint envelope. Same lesson as the round-2 flash-attention
finding: hand kernels win layout problems, not fusion problems.

Why this kernel was built: the XLA formulation (`ops/dense_match.py`) is
HBM-bandwidth-bound, not compute-bound. Each of the 169 shifted-tap passes
re-streams the full bf16 descriptor/ray images from HBM because XLA cannot
keep a shifted operand resident across separately-fused tap passes:
profiled 1.83 ms/frame of `reduce_sum` tap streams at 196k points on v5e
(docs/PLAN.md round-3 addendum), ~169 x 9.4 MB ~= 1.6 GB ~= HBM peak.

This kernel tiles the image into row bands, DMAs each band plus a
`halo`-row/column slab into VMEM **once**, and runs every tap from VMEM:
HBM traffic for the tap loop drops ~169x to a single pass. The tap-loop
shape is forced by Mosaic constraints probed on this toolchain
(scripts/probe_mosaic_rotate.py):
  (a) dynamic sublane/lane offsets into VMEM refs must be provably
      tile-aligned — a tap table cannot be;
  (b) `tpu.dynamic_rotate` lowers for 32-bit element types only (bf16
      rotates, even static, fail);
  (c) DMA slice SHAPES must be sublane-tile-aligned (offsets may be
      unaligned when static);
  (d) a fully static 169-tap unroll compiles into a Mosaic program so
      large the remote compiler runs for >1 h — disqualifying for the
      probe-gated `auto` dispatch.
So: the row shift (dv) is STATIC — the tap list is partitioned into
consecutive runs of equal dv (preserving the exact global tap order,
hence strict-< argmin tie-breaking), each run a small unrolled body —
and the column shift (du) is DYNAMIC inside a rolled `fori_loop`, done
as an f32 `pltpu.roll` with an exact bf16 round-trip: bf16 -> f32 is
lossless, the rotate only moves lanes, and f32 -> bf16 of a bf16-valued
float is exact, so the bf16 arithmetic that follows is bit-identical to
the XLA twin's. The per-dv slabs are widened to f32 once and reused by
all du taps of that run.

Semantics: exact twin of `match_dense_window` (same tap order, same
strict-< argmin, same bf16 streams widened to f32 for the cost, same f32
occlusion gate, same hit-as-inverse-shift-OR factorization). Parity is
pinned by tests/test_dense_match_pallas.py in interpreter mode; residual
differences are f32 summation-order only.

Band/halo geometry (all static):
  halo  = radius * max(dilations)        # max |du|, |dv|
  ext   = halo if want_hit else 0        # winners computed for ext rows
                                         # beyond the band so the inverse-
                                         # shift hit OR stays band-local;
                                         # rounded up to a multiple of 4
  hrows = halo rounded up to 4           # slab row margin beyond RE
  RE    = band + 2*ext                   # winner rows per grid step
  SR1   = RE + 2*hrows                   # view-1 slab rows (tap reach)
The round-ups keep RE and SR1 multiples of the (8, 128) sublane tile —
Mosaic requires DMA slice SHAPES tile-aligned (offsets may be unaligned
when static).
View-1 inputs are pre-padded by (ext + halo) rows / halo cols so every DMA
slice is in-bounds with static sizes; out-of-image taps are masked to the
BIG sentinel in-kernel (matching the XLA twin's padding semantics).

Reference contrast: the reference's matcher is a Metal kernel over
per-point gathers (matching.py:339-461 + iter_proj.metal); this design
replaces point-parallel gathers with band-parallel dense shifted reads,
which is the access pattern the TPU VPU actually supports.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mast3r_slam_tpu.geometry import normalize_rays
from mast3r_slam_tpu.ops.dense_match import window_taps

BIG = 1e30
# Unmatched / margin sentinel for best_du / best_dv: never equals a real
# tap offset (|offset| <= halo <= MAX_HALO << 127).
_SENTINEL = 127
# Largest halo the kernel supports (VMEM slab growth is linear in halo;
# 16 covers radius 6 at dilations (1,) and (2, 1)).
MAX_HALO = 16


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    du_ref,
    src1,
    src2,
    x1,
    x2,
    *refs,
    H: int,
    W: int,
    band: int,
    halo: int,
    hrows: int,
    ext: int,
    runs: tuple[tuple[int, int, int], ...],
    D: int,
    P: int,
    want_hit: bool,
    desc_weight: float,
    dist_thresh: float,
    fast_sum: bool,
):
    RE = band + 2 * ext
    SR1 = RE + 2 * hrows

    def shifted(ref, rows, du, chs=None):
        """ref[(chs,) rows, du+halo : du+halo+W] — STATIC row slice,
        DYNAMIC column shift as an f32 lane rotate + static crop.

        bf16 refs take an exact f32 round-trip around the rotate (Mosaic
        lowers `dynamic_rotate` for 32-bit elements only); the caller gets
        back the original dtype, bit-identical to a direct shifted read."""
        pre = () if chs is None else (chs,)
        full = ref[(*pre, rows, slice(None))]
        dt = full.dtype
        if dt != jnp.float32:
            full = full.astype(jnp.float32)
        wp = full.shape[-1]
        amt = jax.lax.rem(wp - (du + halo), wp)
        out = pltpu.roll(full, amt, axis=full.ndim - 1)[..., :W]
        return out if dt == jnp.float32 else out.astype(dt)

    # --- unpack outputs / scratch (order mirrors the wrapper) ---
    n_out = 2 + (1 if P else 0) + (1 if want_hit else 0)
    outs, scr = refs[:n_out], refs[n_out:]
    idx_o, valid_o = outs[0], outs[1]
    pay_o = outs[2] if P else None
    hit_o = outs[-1] if want_hit else None
    s1, s2, sx1, sx2, bc, bdu, bdv, xsel, vext = scr[:9]
    psel = scr[9] if P else None
    sems = scr[-1]

    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * band

    # --- one DMA per operand: band + halo slab, HBM -> VMEM ---
    copies = [
        pltpu.make_async_copy(src1.at[b, :, pl.ds(row0, SR1), :], s1, sems.at[0]),
        pltpu.make_async_copy(src2.at[b, :, pl.ds(row0, RE), :], s2, sems.at[1]),
        pltpu.make_async_copy(x1.at[b, :, pl.ds(row0, SR1), :], sx1, sems.at[2]),
        pltpu.make_async_copy(x2.at[b, :, pl.ds(row0, RE), :], sx2, sems.at[3]),
    ]
    for c in copies:
        c.start()

    # Init accumulators while the DMAs fly. Margins (the halo columns) keep
    # the sentinel so pass-3's shifted reads never see a fake winner.
    bc[:] = jnp.full(bc.shape, BIG, jnp.float32)
    bdu[:] = jnp.full(bdu.shape, _SENTINEL, jnp.float32)
    bdv[:] = jnp.full(bdv.shape, _SENTINEL, jnp.float32)
    vext[:] = jnp.zeros(vext.shape, jnp.float32)
    xsel[:] = jnp.zeros(xsel.shape, jnp.float32)
    if P:
        psel[:] = jnp.zeros(psel.shape, jnp.bfloat16)

    for c in copies:
        c.wait()

    # Image-row of extended row e: y_e = row0 - ext + e (rows outside
    # [0, H) exist only as padding; they are masked here and sliced off by
    # the wrapper).
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (RE, W), 0)
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (RE, W), 1)
    y_img = row0 - ext + e_iota
    q_in = (y_img >= 0) & (y_img < H)

    cw = slice(halo, halo + W)  # interior columns of the Wp-wide scratches

    # --- pass 1: argmin over taps, with fused payload/X11 selection ---
    # Static dv per run body, dynamic du inside a rolled fori_loop; the
    # run partition preserves the exact global tap order, so the strict-<
    # argmin tie-breaks identically to the XLA twin.
    for dv, t0, n in runs:
        rows = slice(dv + hrows, dv + hrows + RE)
        ok_dv = q_in & (y_img + dv >= 0) & (y_img + dv < H)

        def tap_body(t, _, dv=dv, rows=rows, ok_dv=ok_dv):
            du = du_ref[0, t]
            r1 = shifted(s1, rows, du, chs=slice(0, 3))
            diff = (r1 - s2[0:3]).astype(jnp.float32)
            cost = jnp.sum(diff * diff, axis=0)
            if desc_weight > 0:
                d1 = shifted(s1, rows, du, chs=slice(3, 3 + D))
                prod = d1 * s2[3:]
                if fast_sum and D % 2 == 0:
                    # One pairwise bf16 add level before the f32 widen+sum:
                    # halves the widen/f32-add count in the kernel's hottest
                    # loop. The extra rounding is one bf16 add of two ~1/D
                    # products — the same magnitude as the bf16 product
                    # rounding both matchers already carry.
                    prod = prod[0::2] + prod[1::2]
                sim = jnp.sum(prod.astype(jnp.float32), axis=0)
                cost = cost - desc_weight * sim
            ok = ok_dv & (x_iota + du >= 0) & (x_iota + du < W)
            cost = jnp.where(ok, cost, BIG)
            cost = jnp.where(cost < BIG, cost, BIG)  # NaN cap (twin parity)
            take = cost < bc[:, cw]
            bc[:, cw] = jnp.where(take, cost, bc[:, cw])
            # Winner offsets live as f32 (exactly representable small ints)
            # so the hit pass can rotate them — dynamic_rotate is
            # 32-bit-float-only on this toolchain.
            bdu[:, cw] = jnp.where(take, du.astype(jnp.float32), bdu[:, cw])
            bdv[:, cw] = jnp.where(take, jnp.float32(dv), bdv[:, cw])
            xs = shifted(sx1, rows, du, chs=slice(None))
            xsel[:, :, cw] = jnp.where(take[None], xs, xsel[:, :, cw])
            if P:
                p1 = shifted(s1, rows, du, chs=slice(3 + D, None))
                psel[:, :, cw] = jnp.where(take[None], p1, psel[:, :, cw])
            return 0

        jax.lax.fori_loop(t0, t0 + n, tap_body, 0)

    # --- occlusion gate (f32, twin of the XLA take_along_axis gate) ---
    xd = xsel[:, :, cw] - sx2[:]
    dist2 = jnp.sum(xd * xd, axis=0)
    valid_e = (bc[:, cw] < BIG) & (dist2 < dist_thresh * dist_thresh) & q_in
    vext[:, cw] = valid_e.astype(jnp.float32)

    # --- central-band outputs ---
    cr = slice(ext, ext + band)
    yc = row0 + jax.lax.broadcasted_iota(jnp.int32, (band, W), 0)
    xc = jax.lax.broadcasted_iota(jnp.int32, (band, W), 1)
    duc = bdu[cr, cw].astype(jnp.int32)  # f32-held small ints: exact
    dvc = bdv[cr, cw].astype(jnp.int32)
    matched = bc[cr, cw] < BIG
    duc = jnp.where(matched, duc, 0)  # unmatched -> identity (twin parity)
    dvc = jnp.where(matched, dvc, 0)
    u = jnp.clip(xc + duc, 0, W - 1)
    v = jnp.clip(yc + dvc, 0, H - 1)
    idx_o[0] = v * W + u
    valid_o[0] = vext[cr, cw].astype(jnp.int32)
    if P:
        pay_o[0] = psel[:, cr, cw]

    # --- pass 3: hit = OR of inverse-shifted (win & valid) masks ---
    if want_hit:
        hit = jnp.zeros((band, W), jnp.int32)
        for dv, t0, n in runs:
            # INVERSE shift: view-2 pixel q winning tap (du, dv) claims
            # view-1 pixel q + (du, dv), so hit at view-1 (y, x) reads the
            # win mask at (y - dv, x - du) — the margins' sentinels /
            # zeroed valid make the out-of-band reads contribute nothing.
            rows = slice(ext - dv, ext - dv + band)

            def hit_body(t, hit, dv=dv, rows=rows):
                du = du_ref[0, t]
                m = (
                    (shifted(bdu, rows, -du) == du.astype(jnp.float32))
                    & (shifted(bdv, rows, -du) == jnp.float32(dv))
                    & (shifted(vext, rows, -du) > 0)
                )
                return hit | m.astype(jnp.int32)

            hit = jax.lax.fori_loop(t0, t0 + n, hit_body, hit)
        hit_o[0] = hit


_AVAILABLE: dict = {}


def pallas_matcher_available(
    radius: int = 1,
    dilations: tuple[int, ...] = (1,),
    payload_channels: int = 0,
    want_hit: bool = False,
    width: int = 128,
    desc_dim: int = 4,
) -> bool:
    """Probe-compile the kernel once per DISPATCH CONFIGURATION.

    The `auto` dispatch policy (`matching.dense_kernel`) consults this so a
    Mosaic rejection on some future toolchain degrades to the XLA matcher
    instead of crashing the SLAM pipeline at first dispatch; explicitly
    requesting "pallas" still fails loudly.

    The probe mirrors the real call — same radius/dilation lattice, the
    payload-selection and hit passes when the caller wants them, the real
    image width and descriptor depth (the VMEM slabs scale with both) —
    trimmed to two row-bands so the compile stays cheap. A probe that only
    compiled a stripped-down configuration could pass while the real
    dispatch still fails, which is exactly the crash this gate exists to
    prevent. Results are cached per configuration; the tiny output fetch
    forces any deferred runtime failure (e.g. VMEM exhaustion) to surface
    here rather than mid-pipeline."""
    key = (radius, tuple(dilations), payload_channels, want_hit, width, desc_dim)
    if key not in _AVAILABLE:
        try:
            h = 128  # two default bands
            x = jnp.zeros((1, h, width, 3), jnp.float32)
            d = jnp.zeros((1, h, width, desc_dim), jnp.float32)
            pay = (
                jnp.zeros((1, h, width, payload_channels), jnp.float32)
                if payload_channels
                else None
            )
            out = match_dense_window_pallas(
                x, x, d, d,
                radius=radius,
                dilations=tuple(dilations),
                payload=pay,
                want_hit=want_hit,
            )
            float(jnp.asarray(out[0]).ravel()[0])
            _AVAILABLE[key] = True
        except Exception:
            _AVAILABLE[key] = False
    return _AVAILABLE[key]


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius",
        "dilations",
        "desc_weight",
        "dist_thresh",
        "want_hit",
        "band",
        "interpret",
        "fast_sum",
    ),
)
def match_dense_window_pallas(
    X11: jax.Array,
    X21: jax.Array,
    D11: jax.Array,
    D21: jax.Array,
    radius: int = 6,
    dilations: tuple[int, ...] = (1,),
    desc_weight: float = 1.0,
    dist_thresh: float = 0.1,
    payload: jax.Array | None = None,
    want_hit: bool = False,
    band: int = 64,
    interpret: bool | None = None,
    fast_sum: bool = False,
):
    """Drop-in twin of `match_dense_window` backed by the Pallas kernel.

    Same signature/returns as the XLA version; `band` is the row-band tile
    height (64 keeps the hit path's extended-row overhead at 19% while the
    whole working set stays ~9 MB of VMEM), `interpret` runs the kernel in
    interpreter mode (default: automatically, whenever not on TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, _ = X11.shape
    d = D11.shape[-1]
    p = 0 if payload is None else payload.shape[-1]
    taps = window_taps(radius, dilations)
    t = len(taps)
    halo = radius * max(dilations)
    if halo > MAX_HALO:
        raise ValueError(f"halo {halo} > {MAX_HALO}: use the XLA matcher")
    # Row extents rounded to multiples of 4 so RE / SR1 are multiples of
    # the sublane tile (8) — Mosaic requires DMA slice shapes tile-aligned.
    ext = _round_up(halo, 4) if want_hit else 0
    hrows = _round_up(halo, 4)
    bh = min(band, _round_up(h, 16))
    nb = -(-h // bh)
    hp = nb * bh
    e1 = ext + hrows
    # Lane width of the view-1 slabs: padded to a multiple of 128 (lane
    # tile) — `tpu.dynamic_rotate` requires a native lane count.
    wp = _round_up(w + 2 * halo, 128)
    # Tap table: global SMEM du list + static (dv, start, count) runs of
    # consecutive equal dv, preserving the global tap order exactly.
    du_arr = jnp.array([[du for du, _ in taps]], jnp.int32)
    runs_l: list[tuple[int, int, int]] = []
    i0 = 0
    while i0 < t:
        j = i0
        while j < t and taps[j][1] == taps[i0][1]:
            j += 1
        runs_l.append((taps[i0][1], i0, j - i0))
        i0 = j
    runs = tuple(runs_l)

    # Streams: identical prep to the XLA twin (bf16 rays/desc/payload).
    rays1 = normalize_rays(X11).astype(jnp.bfloat16)
    rays2 = normalize_rays(X21).astype(jnp.bfloat16)
    parts1 = [rays1, D11.astype(jnp.bfloat16)]
    if payload is not None:
        parts1.append(payload.astype(jnp.bfloat16))
    # [B, C, H, W] channel-leading so (rows, cols) land on (sublane, lane).
    src1 = jnp.transpose(jnp.concatenate(parts1, axis=-1), (0, 3, 1, 2))
    src1 = jnp.pad(src1, ((0, 0), (0, 0), (e1, hp - h + e1), (halo, wp - w - halo)))
    src2 = jnp.transpose(
        jnp.concatenate([rays2, D21.astype(jnp.bfloat16)], axis=-1), (0, 3, 1, 2)
    )
    src2 = jnp.pad(src2, ((0, 0), (0, 0), (ext, hp - h + ext), (0, 0)))
    x1 = jnp.pad(
        jnp.transpose(X11.astype(jnp.float32), (0, 3, 1, 2)),
        ((0, 0), (0, 0), (e1, hp - h + e1), (halo, wp - w - halo)),
    )
    x2 = jnp.pad(
        jnp.transpose(X21.astype(jnp.float32), (0, 3, 1, 2)),
        ((0, 0), (0, 0), (ext, hp - h + ext), (0, 0)),
    )

    re_ = bh + 2 * ext
    sr1 = re_ + 2 * hrows
    c1 = 3 + d + p
    c2 = 3 + d

    out_shape = [
        jax.ShapeDtypeStruct((b, hp, w), jnp.int32),  # idx
        jax.ShapeDtypeStruct((b, hp, w), jnp.int32),  # valid
    ]
    out_specs = [
        pl.BlockSpec((1, bh, w), lambda bi, ii: (bi, ii, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bh, w), lambda bi, ii: (bi, ii, 0), memory_space=pltpu.VMEM),
    ]
    if p:
        out_shape.append(jax.ShapeDtypeStruct((b, p, hp, w), jnp.bfloat16))
        out_specs.append(
            pl.BlockSpec(
                (1, p, bh, w), lambda bi, ii: (bi, 0, ii, 0), memory_space=pltpu.VMEM
            )
        )
    if want_hit:
        out_shape.append(jax.ShapeDtypeStruct((b, hp, w), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, bh, w), lambda bi, ii: (bi, ii, 0), memory_space=pltpu.VMEM)
        )

    scratch = [
        pltpu.VMEM((c1, sr1, wp), jnp.bfloat16),  # s1
        pltpu.VMEM((c2, re_, w), jnp.bfloat16),  # s2
        pltpu.VMEM((3, sr1, wp), jnp.float32),  # sx1
        pltpu.VMEM((3, re_, w), jnp.float32),  # sx2
        pltpu.VMEM((re_, wp), jnp.float32),  # best cost
        pltpu.VMEM((re_, wp), jnp.float32),  # best du (f32-held ints)
        pltpu.VMEM((re_, wp), jnp.float32),  # best dv (f32-held ints)
        pltpu.VMEM((3, re_, wp), jnp.float32),  # selected X11
        pltpu.VMEM((re_, wp), jnp.float32),  # valid at ext rows
    ]
    if p:
        scratch.append(pltpu.VMEM((p, re_, wp), jnp.bfloat16))
    scratch.append(pltpu.SemaphoreType.DMA((4,)))

    kernel = functools.partial(
        _kernel,
        H=h,
        W=w,
        band=bh,
        halo=halo,
        hrows=hrows,
        ext=ext,
        runs=runs,
        D=d,
        P=p,
        want_hit=want_hit,
        desc_weight=desc_weight,
        dist_thresh=dist_thresh,
        fast_sum=fast_sum,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, t), lambda bi, ii: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(du_arr, src1, src2, x1, x2)

    idx = outs[0][:, :h, :].reshape(b, h * w)
    valid = (outs[1][:, :h, :] > 0).reshape(b, h * w, 1)
    ret = [idx, valid]
    if p:
        pay = jnp.transpose(outs[2][:, :, :h, :], (0, 2, 3, 1))
        ret.append(pay.reshape(b, h * w, p))
    if want_hit:
        ret.append((outs[-1][:, :h, :] > 0).reshape(b, h * w))
    return tuple(ret)
