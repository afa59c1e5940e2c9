"""Fused window-grads rect cost kernel: gather + cost arithmetic in VMEM.

Replaces the window_grads cost path's structure (ops/rect_cost.
_rect_pair_cost_batch_sdg) of one row_gather_affine launch per extended
window row with XLA arithmetic between launches.  The balance that made an
earlier fused kernel (pallas_rect_fused, deleted round 2) a loss has flipped: with
bf16 tap packing + window-sample gradients the gather count is down to one
word per sample, and profiling now shows the XLA cost arithmetic (weights,
truncated color+gradient terms, accumulation — all round-tripping
[K*E, C, Hr, Wr] sample arrays through HBM) costs MORE device time than the
gathers themselves (~50 ms vs ~39 ms per sweep at dino scale).  This kernel
keeps the samples in VMEM/registers and accumulates the cost in place:

per row-block grid step:

* ONE aligned DMA brings the row block + window halo of the rectified
  reference channels ([3C] f32: img, gx, gy) and the packed source tap
  words ([C] int32) into VMEM (Mosaic: HBM row offsets must be provably
  8-aligned, so halos are rounded to multiples of 8 and blocks start at
  i*BR);
* per [8, 128] tile: sample positions are computed in-kernel from the
  per-candidate affine disparity fields (as ops/pallas_rowgather.
  row_gather_affine does), samples for the T = nrow+2 extended window rows
  are gathered via the shared scratch-window take_along_axis scheme into a
  3-deep rolling VMEM buffer, and the bilateral-weighted truncated
  color+gradient cost (source gradients from neighboring window samples,
  Jacobian-corrected — the window_grads operator, see ops/rect_cost.py)
  accumulates in registers;
* the scratch-window base needs no min-reduction pre-pass: disparity is
  clamped to [lo, hi] in-kernel, so base = floor((g*128 + xs_min - hi -
  1)/128) (clipped) provably covers every sample of the tile given the
  build-time span bound (models/rect_scene.py derives `span_sample` from
  the same clamp range) — one scalar op instead of the K*E-evaluation
  minimum row_gather_affine pays.

HBM traffic per (view, K-candidate) evaluation drops from
O(T * K * E * C * Hr * Wr) sample-array round-trips to
O((K + C) * Hr * Wr) block I/O.

Cost semantics are identical to _rect_pair_cost_batch_sdg on the affine
path (the slow reference for this kernel — tests/test_sdg_fused.py checks
elementwise agreement in interpret mode); both mirror
pmCost/pmCostComputation (gipuma.cu:223-320,455-518) on the rectified grid
as documented in ops/rect_cost.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MAXCOST

LANE_PAD = 128   # one 128-lane block of horizontal ref halo per side


def _round8(v: int) -> int:
    return -(-v // 8) * 8


def _unpack_taps(vp):
    v0 = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(vp, jnp.int32(-65536)), jnp.float32)
    v1 = jax.lax.bitcast_convert_type(
        jnp.left_shift(vp, 16), jnp.float32)
    return v0, v1


def _sdg_fused_kernel(db, hwv, tm, ref_hbm, src_hbm, abc_ref, o_ref,
                      ref_win, src_win, spl, gsc, sem_r, sem_s, *,
                      C, K, BR, VR8, SE8, W, NB, SPAN, TK, G,
                      XS_EXT, YS_EXT, XS_OFF, ROWS_C, ONESIDED, INC,
                      ALPHA, INV_GAMMA, TAU_COL, TAU_GRAD, GRAD_SCALE):
    i = pl.program_id(0)
    E = len(XS_EXT)
    T = len(YS_EXT)
    NCOL = len(XS_OFF)
    NROW = len(ROWS_C)

    def _emits(t):
        """Static emission schedule: contributions computable once window
        row t is gathered, as (jrow, p_lo, p_c, p_hi, one_sided_y) plane
        indices into the rolling 3-deep sample buffer.  With the extension
        ring (ONESIDED=False) every contribution is a central difference;
        without it the first/last window row use a doubled one-sided
        difference (config.sdg_onesided_edges)."""
        out = []
        if ONESIDED:
            if T == 1 and t == 0:
                out.append((0, 0, 0, 0, False))
            if t == 1:
                out.append((0, 0, 0, 1, True))
            if t >= 2:
                out.append((t - 1, t - 2, t - 1, t, False))
            if t == T - 1 and T >= 2:
                out.append((T - 1, T - 2, T - 1, T - 1, True))
        elif t >= 2:
            out.append((t - 2, t - 2, t - 1, t, False))
        return out

    def _cols(j):
        """Static per-column sample indices (e, e_lo, e_hi, one_sided_x)
        for the horizontal gradient of contribution column j."""
        if ONESIDED:
            return j, max(j - 1, 0), min(j + 1, NCOL - 1), \
                (j == 0 or j == NCOL - 1) and NCOL >= 2
        return j + 1, j, j + 2, False

    # Per-view valid extent (hwv = [valid rows, valid cols]): views are
    # stacked/padded to a COMMON rect shape for the lax.scan over views
    # (models/rect_scene.py); pad rows/columns hold no read-back targets
    # (the return permutation tables only address each view's own valid
    # window), so whole row blocks and 128-lane column groups beyond the
    # extent are skipped — DMA and compute (measured ~16% of sweep work
    # at dino scale, where 2 of 6 views pad 47% of their rows).  Skipped
    # output blocks keep whatever was in VMEM; callers never read them.
    @pl.when(i * BR < hwv[0])
    def _valid_row_block():
        cp_r = pltpu.make_async_copy(
            ref_hbm.at[:, pl.ds(i * BR, BR + 2 * VR8), :], ref_win, sem_r)
        cp_s = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(i * BR, BR + 2 * SE8), :], src_win, sem_s)
        cp_r.start()
        cp_s.start()
        cp_r.wait()
        cp_s.wait()

    d_lo = db[0]
    d_hi = db[1]
    xg0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    yg0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    row0 = i * BR

    def sidx(tb, k, e, c):
        return ((tb * K + k) * E + e) * C + c

    for gi in range(BR // 8):
        rows = pl.ds(gi * 8, 8)
        yv0 = (yg0 + row0 + gi * 8).astype(jnp.float32)

        # Per-candidate affine fields + gradient-correction tiles for this
        # [8, 128] tile (recomputed per column group from VMEM — cheaper
        # than keeping K tile-pairs live across the g loop).
        for g in range(G):
            cols = pl.ds(g * 128, 128)
            # Footprint tile skip (tm = [8-row, 128-col]-tile target mask):
            # rect windows are the BBOX of a tilted footprint quad, and the
            # empty bbox triangles hold no read-back targets — the 2-pass
            # return permutation only ever addresses target coordinates
            # (ops/permute2d.py), so tiles without targets can skip all
            # work, same contract as the hw_valid extent skip (outputs
            # there are unspecified).  Measured 2.44x -> ~1.2x evaluated
            # px/image px on the tilted views of a ring rig.
            @pl.when((row0 + gi * 8 < hwv[0]) & (g * 128 < hwv[1])
                     & (tm[i * (BR // 8) + gi, g] > 0))
            def _valid_tile():
                av = [abc_ref[k, 0, rows, cols] for k in range(K)]
                bv = [abc_ref[k, 1, rows, cols] for k in range(K)]
                cv = [abc_ref[k, 2, rows, cols] for k in range(K)]
                s1 = [1.0 - av[k] for k in range(K)]
                inv_ax = [1.0 / jnp.where(jnp.abs(s1[k]) < 0.25,
                                          jnp.where(s1[k] < 0.0, -0.25,
                                                    0.25),
                                          s1[k]) for k in range(K)]

                # Analytic scratch-window base (see module docstring):
                # every clamped sample satisfies
                # x >= xse_min - d_hi - 1 > base.
                bidx = jnp.floor(
                    (g * 128 + XS_EXT[0] - d_hi - 1.0) * (1.0 / 128.0)
                ).astype(jnp.int32)
                base = jnp.clip(bidx, 0, NB - SPAN) * 128
                if TK < SPAN:
                    # Unaligned window: the copy stays at the 128-aligned
                    # `base` (Mosaic requires provable alignment), but a
                    # dynamic lane roll re-origins the scratch at the EXACT
                    # analytic base — the sample span then needs one fewer
                    # 128-lane take per gather (the build-time span bound's
                    # trailing +1 block existed only to absorb alignment,
                    # models/rect_scene.py).
                    bu_raw = jnp.floor(
                        g * 128 + XS_EXT[0] - d_hi - 1.0).astype(jnp.int32)
                    bu = jnp.clip(bu_raw, 0, W - TK * 128)
                    # shift == 0 (exact base already 128-aligned) must roll
                    # by 0, NOT by the full lane width SPAN*128 — full-width
                    # dynamic rolls are in the same unverified class as the
                    # negative-shift Mosaic mis-lowering below.
                    shift_raw = bu - base
                    shift = jnp.where(shift_raw > 0,
                                      SPAN * 128 - shift_raw, 0)
                else:
                    bu = base

                xse = [(xg0 + (g * 128 + int(dx))).astype(jnp.float32)
                       for dx in XS_EXT]

                ref_c = [ref_win[c, pl.ds(VR8 + gi * 8, 8),
                                 LANE_PAD + g * 128:LANE_PAD + (g + 1) * 128]
                         for c in range(C)]
                acc = [jnp.zeros((8, 128), jnp.float32) for _ in range(K)]

                for t in range(T):
                    dy = int(YS_EXT[t])
                    tb = t % 3
                    # One scratch-window copy per (row set, channel),
                    # shared by all K*E gathers; row offset is static, lane
                    # offset is the provably-128-aligned base.
                    for c in range(C):
                        gsc[:, :] = src_win[c, pl.ds(SE8 + gi * 8 + dy, 8),
                                            pl.ds(base, SPAN * 128)]
                        gv = gsc[:, :]
                        if TK < SPAN:
                            # POSITIVE shift only: Mosaic's device lowering
                            # of a dynamic NEGATIVE lane roll disagrees
                            # with jnp.roll/interpret semantics (probed
                            # 2026-08-20: roll(x, -3) landed at lane 131);
                            # `shift` above is the positive modulo
                            # equivalent (0 stays 0).
                            gv = pltpu.roll(gv, shift, 1)
                        for k in range(K):
                            byc = bv[k] * (yv0 + float(dy)) + cv[k]
                            for e in range(E):
                                disp = jnp.clip(av[k] * xse[e] + byc,
                                                d_lo, d_hi)
                                xx = jnp.clip(xse[e] - disp, 0.0,
                                              float(W - 1))
                                x0i = jnp.clip(
                                    jnp.floor(xx).astype(jnp.int32),
                                    0, W - 2)
                                fx = jnp.clip(xx - x0i.astype(jnp.float32),
                                              0.0, 1.0)
                                cl_all = x0i - bu
                                vp = jnp.zeros((8, 128), jnp.int32)
                                for b in range(TK):
                                    blk = gv[:, b * 128:(b + 1) * 128]
                                    cl = cl_all - b * 128
                                    g0 = jnp.take_along_axis(
                                        blk, jnp.clip(cl, 0, 127), axis=1)
                                    vp = jnp.where((cl >= 0) & (cl < 128),
                                                   g0, vp)
                                v0, v1 = _unpack_taps(vp)
                                spl[sidx(tb, k, e, c)] = (
                                    v0 * (1 - fx) + v1 * fx)

                    for (jrow, p0, p1, p2, osy) in _emits(t):
                        t0, t1, t2 = p0 % 3, p1 % 3, p2 % 3
                        dyc = int(ROWS_C[jrow])
                        rr = pl.ds(VR8 + gi * 8 + dyc, 8)
                        for j in range(NCOL):
                            e, elo, ehi, osx = _cols(j)
                            lane0 = LANE_PAD + g * 128 + int(XS_OFF[j])
                            rw_img = [ref_win[c, rr, lane0:lane0 + 128]
                                      for c in range(C)]
                            wsum = jnp.abs(rw_img[0] - ref_c[0])
                            for c in range(1, C):
                                wsum = wsum + jnp.abs(rw_img[c] - ref_c[c])
                            w = jnp.exp(wsum * (-INV_GAMMA / C))
                            rw_gx = [ref_win[C + c, rr, lane0:lane0 + 128]
                                     for c in range(C)]
                            rw_gy = [ref_win[2 * C + c, rr,
                                             lane0:lane0 + 128]
                                     for c in range(C)]
                            for k in range(K):
                                col = jnp.zeros((8, 128), jnp.float32)
                                grd = jnp.zeros((8, 128), jnp.float32)
                                for c in range(C):
                                    img_s = spl[sidx(t1, k, e, c)]
                                    gx_s = (spl[sidx(t1, k, ehi, c)]
                                            - spl[sidx(t1, k, elo, c)]
                                            ) * inv_ax[k]
                                    if osx:
                                        # One-sided (inc-baseline) column
                                        # difference, doubled to the
                                        # 2*inc central-operator scale.
                                        gx_s = gx_s + gx_s
                                    gy_d = (spl[sidx(t2, k, e, c)]
                                            - spl[sidx(t0, k, e, c)])
                                    if osy:
                                        gy_d = gy_d + gy_d
                                    gy_s = gy_d + bv[k] * gx_s
                                    col = col + jnp.abs(rw_img[c] - img_s)
                                    grd = grd + (jnp.abs(rw_gx[c] - gx_s)
                                                 + jnp.abs(rw_gy[c] - gy_s))
                                cost_t = w * (
                                    (1.0 - ALPHA) * jnp.minimum(
                                        col * (1.0 / C), TAU_COL)
                                    + ALPHA * jnp.minimum(
                                        grd * (GRAD_SCALE / C), TAU_GRAD))
                                acc[k] = acc[k] + cost_t

                for k in range(K):
                    o_ref[k, rows, cols] = acc[k]


@functools.partial(jax.jit, static_argnames=(
    "C", "BR", "VR8", "SE8", "SPAN", "TK", "XS_EXT", "YS_EXT", "XS_OFF",
    "ROWS_C", "ONESIDED", "INC",
    "ALPHA", "INV_GAMMA", "TAU_COL", "TAU_GRAD", "GRAD_SCALE", "interpret"))
def _sdg_fused_call(ref_pad, src_pad, abc, db, hwv, tm, *,
                    C, BR, VR8, SE8, SPAN, TK, XS_EXT, YS_EXT, XS_OFF,
                    ROWS_C, ONESIDED, INC,
                    ALPHA, INV_GAMMA, TAU_COL, TAU_GRAD, GRAD_SCALE,
                    interpret):
    CH, hr_tot, wl = ref_pad.shape
    W = src_pad.shape[-1]
    K = abc.shape[0]
    HRP = hr_tot - 2 * VR8
    NB = W // 128
    E = len(XS_EXT)
    kernel = functools.partial(
        _sdg_fused_kernel, C=C, K=K, BR=BR, VR8=VR8, SE8=SE8, W=W, NB=NB,
        SPAN=SPAN, TK=TK, G=W // 128, XS_EXT=XS_EXT, YS_EXT=YS_EXT,
        XS_OFF=XS_OFF,
        ROWS_C=ROWS_C, ONESIDED=ONESIDED,
        INC=INC, ALPHA=ALPHA, INV_GAMMA=INV_GAMMA, TAU_COL=TAU_COL,
        TAU_GRAD=TAU_GRAD, GRAD_SCALE=GRAD_SCALE)
    return pl.pallas_call(
        kernel,
        grid=(HRP // BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # db = (lo, hi)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # hwv = (rows, cols)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tm = tile target mask
            pl.BlockSpec(memory_space=pltpu.HBM),    # ref_pad
            pl.BlockSpec(memory_space=pltpu.HBM),    # src_pad
            pl.BlockSpec((K, 3, BR, W), lambda i: (0, 0, i, 0)),
        ],
        out_specs=pl.BlockSpec((K, BR, W), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((K, HRP, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((CH, BR + 2 * VR8, wl), jnp.float32),   # ref_win
            pltpu.VMEM((C, BR + 2 * SE8, W), jnp.int32),       # src_win
            pltpu.VMEM((3 * K * E * C, 8, 128), jnp.float32),  # spl
            pltpu.VMEM((8, SPAN * 128), jnp.int32),            # gsc
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(db, hwv, tm, ref_pad, src_pad, abc)


def fused_sdg_cost_batch(ref_chw: jnp.ndarray, src_packed: jnp.ndarray,
                         abc_k: jnp.ndarray, params,
                         interpret: bool = False,
                         disp_lo=None, disp_hi=None,
                         span_blocks: int | None = None,
                         hw_valid=None, tile_ok=None) -> jnp.ndarray:
    """Fused window_grads cost for K candidates of one rectified pair.

    ref_chw: [3C, Hr, Wr] rectified reference channels (img, gx, gy with
        the step-`window_increment` central-difference operators);
    src_packed: [C, Hr, Wr] int32 packed bilinear tap words (pack_taps);
    abc_k: [K, 3, Hr, Wr] per-candidate affine disparity fields;
    disp_lo / disp_hi: traced disparity clamp (REQUIRED: the analytic
        scratch-window base derives from it);
    span_blocks: build-time span bound (models/rect_scene.py);
    hw_valid: optional traced int32 [2] = (valid rows, valid cols) of this
        view's rect window inside the common padded [Hr, Wr] — row blocks
        and column groups beyond it are skipped in-kernel (their output is
        unspecified; callers' read-back tables never address them);
    tile_ok: optional traced int32 [ceil(Hr/8), Wr/128] per-[8, 128]-tile
        read-back-target mask (models/rect_scene.py builds it from the
        return-permutation target set) — tiles with no target skip all
        compute (unspecified output), cutting the empty bbox triangles of
        tilted footprint quads.

    Returns [K, Hr, Wr] window costs; at hw_valid/tile_ok-covered pixels,
    elementwise-equal to rect_cost._rect_pair_cost_batch_sdg on the
    affine path.
    """
    ch, hr, wr = ref_chw.shape
    C = ch // 3
    assert src_packed.dtype == jnp.int32 and src_packed.shape[0] == C
    assert disp_lo is not None and disp_hi is not None
    vr, hrad = params.box_vrad, params.box_hrad
    inc = params.window_increment
    assert hrad + inc <= LANE_PAD and wr % 128 == 0
    nb = wr // 128
    span = nb if span_blocks is None else min(span_blocks, nb)
    # Unaligned-base gather: the build-time span bound's trailing block
    # exists only to absorb the scratch copy's 128-lane alignment
    # (models/rect_scene.py span_sample).  A dynamic pltpu.roll re-origins
    # the scratch at the exact analytic base, so each sample needs
    # span - 1 takes — a ~1/3 cut of the kernel's dominant gather work at
    # span 3.  Only valid when the unclamped bound fits the width (a
    # clamped span covers the whole row and must keep every take).
    # OPT-IN via config.fused_roll (measured only +1.5% end-to-end on
    # v5e); interpret-mode output is bitwise equal to the aligned path
    # either way.
    use_roll = (span_blocks is not None and span_blocks <= nb
                and span >= 2
                and bool(getattr(params, "fused_roll", False)))
    tk = span - 1 if use_roll else span
    onesided = bool(getattr(params, "sdg_onesided_edges", False))
    vr8 = _round8(vr)
    se8 = _round8(vr + (0 if onesided else inc))
    xs_off = tuple(range(-hrad, hrad + 1, inc))
    rows_c = tuple(range(-vr, vr + 1, inc))
    if onesided:
        # No extension ring: edge rows/columns use doubled one-sided
        # window-sample differences (config.sdg_onesided_edges) — a 44%
        # gather cut at box 11 / increment 2.
        xs_ext, ys_ext = xs_off, rows_c
    else:
        xs_ext = tuple(range(-hrad - inc, hrad + inc + 1, inc))
        ys_ext = tuple(range(-vr - inc, vr + inc + 1, inc))
    E = len(xs_ext)
    K = abc_k.shape[0]

    # Block rows: bound VMEM (block pipeline buffers dominate) and the
    # per-step unroll — Mosaic compile time grows SUPERLINEARLY with the
    # gather-body count (BR/8) * G * T * K * E, and big unrolls don't even
    # run faster.  Measured at dino-L1 shapes (scripts/tpu_fused_br_ab.py,
    # bitwise-identical outputs): BR=32 (6144 bodies) 586 s compile /
    # 37.3 ms steady; BR=16 133 s / 36.5 ms; BR=8 70 s / 39.0 ms.
    # Cap 3500 picks BR=16 at dino scale.  config.fused_block_rows
    # overrides for experiments.
    br = int(getattr(params, "fused_block_rows", 0) or 0)
    if br <= 0:
        br = 32
        while br > 8 and (2 * (K * 3 + K) * br * wr * 4 > 6 << 20
                          or (br // 8) * nb * len(ys_ext) * K * E > 3500):
            br //= 2

    pad_r = (-hr) % br
    ref_pad = jnp.pad(ref_chw, ((0, 0), (vr8, vr8 + pad_r),
                                (LANE_PAD, LANE_PAD)), mode="edge")
    src_pad = jnp.pad(src_packed, ((0, 0), (se8, se8 + pad_r), (0, 0)),
                      mode="edge")
    abc = jnp.pad(abc_k, ((0, 0), (0, 0), (0, pad_r), (0, 0)))
    db = jnp.stack([jnp.asarray(disp_lo, jnp.float32),
                    jnp.asarray(disp_hi, jnp.float32)])
    hwv = (jnp.asarray([hr, wr], jnp.int32) if hw_valid is None
           else jnp.asarray(hw_valid, jnp.int32))
    ht = (hr + pad_r) // 8
    if tile_ok is None:
        tm = jnp.ones((ht, nb), jnp.int32)
    else:
        tm = jnp.asarray(tile_ok, jnp.int32)
        assert tm.shape[1] == nb and tm.shape[0] * 8 >= hr, tm.shape
        tm = jnp.pad(tm, ((0, ht - tm.shape[0]), (0, 0)))

    acc = _sdg_fused_call(
        ref_pad, src_pad, abc, db, hwv, tm,
        C=C, BR=br, VR8=vr8, SE8=se8, SPAN=span, TK=tk,
        XS_EXT=xs_ext, YS_EXT=ys_ext, XS_OFF=xs_off,
        ROWS_C=rows_c, ONESIDED=onesided, INC=inc,
        ALPHA=float(params.alpha), INV_GAMMA=1.0 / float(params.gamma),
        TAU_COL=float(params.tau_color),
        TAU_GRAD=float(params.tau_gradient),
        GRAD_SCALE=0.0625 / inc, interpret=interpret)
    acc = acc[:, :hr, :]
    return jnp.where(jnp.isnan(acc) | (acc >= MAXCOST), MAXCOST, acc)
