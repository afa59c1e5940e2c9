"""Rectified-frame multiview cost — the fast TPU sampling path.

Computes the bilaterally-weighted color+gradient window cost of plane
hypotheses ON per-pair rectified pixel grids, where everything is dense:

* reference-side window reads and weights are integer-grid shifts of the
  rectified reference image;
* the source read for window offset (i, j) sits on rect row ŷ+j (static
  shift) at column x̂+i − disp(x̂+i, ŷ+j), where disp is AFFINE in rect
  coordinates (geometry/rectify.py) — a row-aligned horizontal gather
  (ops/pallas_rowgather.py, 35 G samples/s measured on v5e, vs ~0.2 G for
  the general XLA sampling path the exact engine uses);
* the PatchMatch state stays on the reference grid; plane vectors m = n/d
  are carried to each pair's rect grid — and per-view costs carried back —
  by static 2-pass permutations (ops/permute2d.py) built once per pair.

Cost semantics vs the exact engine (ops/cost.py, itself mirroring
pmCost/pmCostComputation, gipuma.cu:223-320,455-518) — deviations are
deliberate and validated on the synthetic-GT suite (tests/test_rect_cost.py,
tests/test_rect_engine.py):

* the window is axis-aligned on the RECT grid (per-pair shape differs
  slightly from the reference-grid window);
* gradients are central differences in the RECT frames (a rotation of the
  image-frame gradients, consistent between the two frames of a pair);
* window centers evaluate at the rect pixel nearest the reference pixel's
  rectified position (≤0.5 px offset).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MAXCOST, AlgorithmParams, MatchingAlgorithm
from ..geometry import transforms as T
from . import checkerboard as cb
from .cost import ScenePack, _census_bits, combine_view_costs
from .pallas_rowgather import row_gather, row_gather_affine, row_gather_batch
from .permute2d import permute2d


def _shift2d(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-replicated integer shift: out[y, x] = a[y + dy, x + dx]."""
    h, w = a.shape[:2]
    pb_y, pa_y = max(-dy, 0), max(dy, 0)
    pb_x, pa_x = max(-dx, 0), max(dx, 0)
    cfg = ((pb_y, pa_y), (pb_x, pa_x)) + ((0, 0),) * (a.ndim - 2)
    ap = jnp.pad(a, cfg, mode="edge")
    return ap[pb_y + dy:pb_y + dy + h, pb_x + dx:pb_x + dx + w]


def rect_window_cost(ref_rect: jnp.ndarray, ref_gx: jnp.ndarray,
                     src_rect_chw: jnp.ndarray,
                     abc: jnp.ndarray, params: AlgorithmParams,
                     interpret: bool = False) -> jnp.ndarray:
    """Per-pixel window cost on the rectified grid.

    ref_rect: [Hr, Wr] rectified reference intensities;
    ref_gx:   [Hr, Wr] its horizontal central-difference gradient;
    src_rect_chw: [2, Hr, Ws] rectified source (intensity, x-gradient),
        Ws % 128 == 0;
    abc: [Hr, Wr, 3] per-pixel affine disparity coefficients of the plane
        hypothesis (disp = a*x̂ + b*ŷ + c).

    Returns [Hr, Wr] costs.  In rectified frames the photoconsistency
    gradient term uses the x-gradient (the epipolar direction); this is the
    documented deviation from the unrectified cost's |Δgx|+|Δgy| — quality
    is cross-validated against the exact engine on synthetic scenes.
    """
    hr, wr = ref_rect.shape
    xg = jax.lax.broadcasted_iota(jnp.float32, (hr, wr), 1)
    yg = jax.lax.broadcasted_iota(jnp.float32, (hr, wr), 0)
    inv_gamma = 1.0 / params.gamma
    alpha = params.alpha

    acc = jnp.zeros((hr, wr), jnp.float32)
    for (dx, dy) in params.window_offsets():
        ref_i = _shift2d(ref_rect, dy, dx)
        ref_g = _shift2d(ref_gx, dy, dx)
        # Disparity of the CENTER pixel's plane evaluated at the sample
        # position (the slanted-window semantics of PatchMatch stereo).
        xs = xg + dx
        ys = yg + dy
        disp = abc[..., 0] * xs + abc[..., 1] * ys + abc[..., 2]
        xsrc = xs - disp
        # Row-aligned source read on row ŷ + dy: shift the source rows by
        # dy once, then gather horizontally.
        src_sh = jnp.stack([_shift2d(src_rect_chw[0], dy, 0),
                            _shift2d(src_rect_chw[1], dy, 0)])
        smp = row_gather(src_sh, xsrc, interpret=interpret)  # [2, Hr, Wr]
        src_i, src_g = smp[0], smp[1]

        w = jnp.exp(-jnp.abs(ref_i - ref_rect) * inv_gamma)
        col = jnp.minimum(jnp.abs(ref_i - src_i), params.tau_color)
        grad = jnp.minimum(jnp.abs(ref_g - src_g) * 0.125,
                           params.tau_gradient)
        acc = acc + w * ((1.0 - alpha) * col + alpha * grad)

    return jnp.where(jnp.isnan(acc) | (acc >= MAXCOST), MAXCOST, acc)


def rect_pair_cost(ref_chw: jnp.ndarray, src_chw: jnp.ndarray,
                   abc: jnp.ndarray, params: AlgorithmParams,
                   interpret: bool = False,
                   disp_lo=None, disp_hi=None,
                   span_blocks: int | None = None) -> jnp.ndarray:
    """Window cost of one (reference, source) rectified pair, all pixels.

    ref_chw, src_chw: [3C, Hr, Wr] rectified channels (C image channels,
        then C x-gradients, then C y-gradients), Wr % 128 == 0;
    abc: [3, Hr, Wr] per-pixel affine disparity coefficients in LOCAL rect
        coordinates: disp = abc[0]*x̂ + abc[1]*ŷ + abc[2].
    disp_lo/disp_hi: optional (traced) clamp for the evaluated disparity —
        bounds the warp of wild hypotheses so `span_blocks` (static bound
        on the per-tile source span, see row_gather) holds by construction.

    The window-offset loop is a lax.scan (dynamic slices of once-padded
    inputs), so the compiled program holds ONE row_gather kernel instance
    regardless of window size.
    """
    ch, hr, wr = ref_chw.shape
    C = ch // 3
    if params.algorithm == MatchingAlgorithm.CENSUS:
        return _rect_pair_cost_batch_census(
            ref_chw, src_chw, abc[None], params, interpret=interpret,
            disp_lo=disp_lo, disp_hi=disp_hi, span_blocks=span_blocks)[0]
    sch = src_chw.shape[0]
    if sch == C:
        # Packed image words only: the window_grads path (batch impl).
        return _rect_pair_cost_batch_sdg(
            ref_chw, src_chw, abc[None], params, interpret=interpret,
            disp_lo=disp_lo, disp_hi=disp_hi, span_blocks=span_blocks)[0]
    # 2C-channel int32 source = grad_fwd packing ([img-taps, gy-taps],
    # gx derived in-kernel; see pallas_rowgather).
    grad_fwd = sch == 2 * C
    vr, hrad = params.box_vrad, params.box_hrad
    ref_pad = jnp.pad(ref_chw, ((0, 0), (vr, vr), (hrad, hrad)), mode="edge")
    src_pad = jnp.pad(src_chw, ((0, 0), (vr, vr), (0, 0)), mode="edge")
    xg = jax.lax.broadcasted_iota(jnp.float32, (hr, wr), 1)
    yg = jax.lax.broadcasted_iota(jnp.float32, (hr, wr), 0)
    ref_center = ref_chw[:C]
    inv_gamma = 1.0 / params.gamma
    alpha = params.alpha
    offs = jnp.asarray(np.asarray(params.window_offsets(), np.int32))

    def _l1(x):
        return jnp.mean(jnp.abs(x), axis=0)

    def step(acc, off):
        dx, dy = off[0], off[1]
        dxf = dx.astype(jnp.float32)
        dyf = dy.astype(jnp.float32)
        ref_w = jax.lax.dynamic_slice(ref_pad, (0, vr + dy, hrad + dx),
                                      (ch, hr, wr))
        # Disparity of the CENTER pixel's plane evaluated at the sample
        # position (slanted-window PatchMatch semantics).
        disp = abc[0] * (xg + dxf) + abc[1] * (yg + dyf) + abc[2]
        if disp_lo is not None:
            disp = jnp.clip(disp, disp_lo, disp_hi)
        xsrc = xg + dxf - disp
        src_rows = jax.lax.dynamic_slice(src_pad, (0, vr + dy, 0),
                                         (sch, hr, wr))
        smp = row_gather(src_rows, xsrc, interpret=interpret,
                         max_span_blocks=span_blocks, grad_fwd=grad_fwd)
        w = jnp.exp(-_l1(ref_w[:C] - ref_center) * inv_gamma)
        col = jnp.minimum(_l1(ref_w[:C] - smp[:C]), params.tau_color)
        grad = jnp.minimum(
            (_l1(ref_w[C:2 * C] - smp[C:2 * C])
             + _l1(ref_w[2 * C:] - smp[2 * C:])) * 0.0625,
            params.tau_gradient)
        return acc + w * ((1.0 - alpha) * col + alpha * grad), None

    acc, _ = jax.lax.scan(step, jnp.zeros((hr, wr), jnp.float32), offs)
    return jnp.where(jnp.isnan(acc) | (acc >= MAXCOST), MAXCOST, acc)


def _rect_pair_cost_batch_sdg(ref_chw: jnp.ndarray, src_chw: jnp.ndarray,
                              abc_k: jnp.ndarray, params: AlgorithmParams,
                              interpret: bool = False,
                              disp_lo=None, disp_hi=None,
                              span_blocks: int | None = None,
                              hw_valid=None, tile_ok=None) -> jnp.ndarray:
    """window_grads cost path: src_chw holds ONLY the packed image tap
    words [C, Hr, Wr]; both source gradients are derived from neighboring
    WINDOW SAMPLES instead of gathered gradient channels.

    Why this is exact: the window columns of one pixel's cost window sample
    the source at uniform spacing — disparity is affine on the rect grid
    (disp = a*x̂ + b*ŷ + c), so sample positions u(dx) = x̂+dx−disp obey
    u(dx+inc) − u(dx−inc) = 2·inc·(1−a) exactly.  Central differences of
    the gathered samples, Jacobian-corrected by the plane's slopes (÷(1−a)
    for gx; +b·gx for the −b·gx chain-rule term in the row difference for
    gy), therefore estimate the source gradients AT the sample positions —
    no phase error, unlike the grad_fwd in-cell operator whose half-pixel
    phase error causes salt-noise depth failures at native sampling
    density.  The matching reference-side operator is the step-`inc`
    central difference (built by models/rect_scene._np_warp_channels).

    One dynamic_gather word per sample (the measured engine bottleneck;
    3 for full channels, 2 for grad_fwd), at the price of sampling one
    extra window ring: (ncol+2)·(nrow+2) vs ncol·nrow samples — a net
    gather saving for every window size ≥ 5.  The scan goes over the
    nrow+2 extended window rows (one batched gather per row serves all K
    candidates × ncol+2 columns), carrying the previous two rows' samples
    for the vertical differences.
    """
    ch, hr, wr = ref_chw.shape
    C = ch // 3
    K = abc_k.shape[0]
    vr, hrad = params.box_vrad, params.box_hrad
    inc = params.window_increment
    ref_pad = jnp.pad(ref_chw, ((0, 0), (vr, vr), (hrad, hrad)), mode="edge")
    src_pad = jnp.pad(src_chw, ((0, 0), (vr + inc, vr + inc), (0, 0)),
                      mode="edge")
    xg = jax.lax.broadcasted_iota(jnp.float32, (hr, wr), 1)
    yg = jax.lax.broadcasted_iota(jnp.float32, (hr, wr), 0)
    ref_center = ref_chw[:C]
    inv_gamma = 1.0 / params.gamma
    alpha = params.alpha
    # Window grad operators span 2*inc px (vs the reference's 2): the /16
    # of gipuma.cu:311 becomes /(16*inc) to keep tau_gradient comparable.
    grad_scale = 0.0625 / inc

    onesided = params.sdg_onesided_edges
    xs_off = np.arange(-hrad, hrad + 1, inc)
    if onesided:
        # No extension ring: edge rows/columns use one-sided differences
        # of the window samples (doubled to match the 2*inc-baseline
        # central operator; see config.sdg_onesided_edges).
        xs_ext = xs_off
        ys_ext = np.arange(-vr, vr + 1, inc)
    else:
        xs_ext = np.arange(-hrad - inc, hrad + inc + 1, inc)
        ys_ext = np.arange(-vr - inc, vr + inc + 1, inc)
    ncol, E = len(xs_off), len(xs_ext)

    a = abc_k[:, 0]
    b = abc_k[:, 1]
    c = abc_k[:, 2]
    s1 = 1.0 - a
    # Sign-preserving clamp: |1-a| >= 0.25 (planes steeper than that along
    # the epipolar direction have degenerate windows and garbage costs
    # regardless of the gradient estimate).
    inv_ax = 1.0 / jnp.where(jnp.abs(s1) < 0.25,
                             jnp.where(s1 < 0.0, -0.25, 0.25), s1)
    dx_e = jnp.asarray(xs_ext, jnp.float32)

    def _l1(x):
        return jnp.mean(jnp.abs(x), axis=-3)

    affine_kernel = src_chw.dtype == jnp.int32
    d_lo = disp_lo if disp_lo is not None else jnp.float32(-1e9)
    d_hi = disp_hi if disp_hi is not None else jnp.float32(1e9)

    if affine_kernel and params.fused_window_cost and not interpret:
        # Fully-fused kernel: gathers AND the cost arithmetic below in one
        # Pallas program (ops/pallas_sdg_fused.py) — the XLA glue between
        # gather launches (sample-array HBM round-trips + small fusions)
        # measured ~50 ms of a 102 ms sweep; fused sweeps are 88.7 ms with
        # the kernel at 69.6 (tpu_trace_sweep, dino full-res).  interpret
        # (CPU) keeps the unfused path: equivalence is covered by
        # tests/test_sdg_fused.py and interpret-mode fused is ~3x slower.
        from .pallas_sdg_fused import fused_sdg_cost_batch
        return fused_sdg_cost_batch(ref_chw, src_chw, abc_k, params,
                                    interpret=interpret,
                                    disp_lo=d_lo, disp_hi=d_hi,
                                    span_blocks=span_blocks,
                                    hw_valid=hw_valid, tile_ok=tile_ok)

    def gather_row(dy: int):
        src_rows = src_pad[:, vr + inc + dy:vr + inc + dy + hr, :]
        if affine_kernel:
            # Sample positions computed in-kernel from abc (row_gather_
            # affine): kills the [K*E, hr, wr] xsrc materialization and
            # its disp/clip/pad XLA glue (~25% of sweep device time).
            smp = row_gather_affine(src_rows, abc_k, tuple(xs_ext),
                                    jnp.float32(dy), d_lo, d_hi,
                                    interpret=interpret,
                                    max_span_blocks=span_blocks)
            return smp.reshape(K, E, C, hr, wr)
        xse = xg[None, None] + dx_e[None, :, None, None]    # [1, E, hr, wr]
        disp = a[:, None] * xse + (b * (yg + float(dy)) + c)[:, None]
        if disp_lo is not None:
            disp = jnp.clip(disp, disp_lo, disp_hi)
        xsrc = (xse - disp).reshape(K * E, hr, wr)
        smp = row_gather_batch(src_rows, xsrc, interpret=interpret,
                               max_span_blocks=span_blocks)
        return smp.reshape(K, E, C, hr, wr)

    # Static Python loop over the gathered window rows (NOT a lax.scan: the
    # sample carries are [K, E, C, hr, wr] and a rolled scan materializes
    # two rotation COPIES of them per step — ~14% of the sweep device time
    # in traces; static slices also lower better than dynamic_slice).  The
    # row_gather call-site count stays bounded (nrow+2 <= ~15, well under
    # the ~50-site executable limit).
    smps = [gather_row(int(dy)) for dy in ys_ext]
    nrow = len(ys_ext) - (0 if onesided else 2)
    rows_c = range(-vr, vr + 1, inc)
    acc = jnp.zeros((K, hr, wr), jnp.float32)
    for jr, dyc in enumerate(rows_c):
        # Plane triple for the vertical difference of contribution row jr
        # (one-sided at the window's first/last row when no ring exists;
        # a doubled short-baseline difference matches the 2*inc central
        # operator's scale).
        if onesided:
            tlo, thi = max(jr - 1, 0), min(jr + 1, nrow - 1)
        else:
            tlo, thi = jr, jr + 2
        scy = 2.0 if thi - tlo == 1 else 1.0
        smp0, smp1, smp2 = smps[tlo], smps[jr + (0 if onesided else 1)], \
            smps[thi]
        for j in range(ncol):
            if onesided:
                e, elo, ehi = j, max(j - 1, 0), min(j + 1, ncol - 1)
            else:
                e, elo, ehi = j + 1, j, j + 2
            scx = 2.0 if ehi - elo == 1 else 1.0
            dxj = int(xs_off[j])
            ref_w = ref_pad[:, vr + dyc:vr + dyc + hr,
                            hrad + dxj:hrad + dxj + wr]
            img_s = smp1[:, e]                              # [K, C, hr, wr]
            gx_s = (smp1[:, ehi] - smp1[:, elo]) * (scx * inv_ax[:, None])
            gy_s = (smp2[:, e] - smp0[:, e]) * scy + b[:, None] * gx_s
            w = jnp.exp(-_l1(ref_w[:C] - ref_center) * inv_gamma)
            col = jnp.minimum(_l1(ref_w[None, :C] - img_s),
                              params.tau_color)
            grad = jnp.minimum(
                (_l1(ref_w[None, C:2 * C] - gx_s)
                 + _l1(ref_w[None, 2 * C:] - gy_s)) * grad_scale,
                params.tau_gradient)
            acc = acc + w[None] * ((1.0 - alpha) * col + alpha * grad)
    return jnp.where(jnp.isnan(acc) | (acc >= MAXCOST), MAXCOST, acc)


def _rect_pair_cost_batch_census(ref_chw: jnp.ndarray, src_chw: jnp.ndarray,
                                 abc_k: jnp.ndarray, params: AlgorithmParams,
                                 interpret: bool = False,
                                 disp_lo=None, disp_hi=None,
                                 span_blocks: int | None = None
                                 ) -> jnp.ndarray:
    """Census-transform window cost on the rectified grid — the rect-path
    `-a ct` equivalent of the exact engine's census (censusTransform_Arma_cu,
    gipuma.cu:362-450): full window at increment 1, center excluded, cost =
    number of differing 3-way sign-class bits between the reference window
    (vs its center) and the warped source samples (vs the warped center).

    Uses the same row-aligned gather machinery as the PM cost (one
    row_gather launch per window row serves all K candidates x box_hsize
    columns); channel means mirror the exact path's mean-intensity census.
    """
    ch, hr, wr = ref_chw.shape
    K = abc_k.shape[0]
    vr, hrad = params.box_vrad, params.box_hrad
    eps = params.census_epsilon
    packed = src_chw.dtype == jnp.int32
    # Image channels only: [C] packed words (window_grads), the first C of
    # [2C] packed (grad_fwd) or [3C] f32 channel layouts.
    C = ch // 3
    src_img = src_chw[:C]
    ref_mean = jnp.mean(ref_chw[:C], axis=0)                   # [Hr, Wr]
    ref_pad = jnp.pad(ref_mean, ((vr, vr), (hrad, hrad)), mode="edge")
    src_pad = jnp.pad(src_img, ((0, 0), (vr, vr), (0, 0)), mode="edge")
    d_lo = disp_lo if disp_lo is not None else jnp.float32(-1e9)
    d_hi = disp_hi if disp_hi is not None else jnp.float32(1e9)
    xg = jax.lax.broadcasted_iota(jnp.float32, (hr, wr), 1)
    yg = jax.lax.broadcasted_iota(jnp.float32, (hr, wr), 0)
    xs_all = tuple(range(-hrad, hrad + 1))

    def gather_row(dy: int, dxs: tuple):
        src_rows = src_pad[:, vr + dy:vr + dy + hr, :]
        if packed:
            smp = row_gather_affine(src_rows, abc_k, dxs, jnp.float32(dy),
                                    d_lo, d_hi, interpret=interpret,
                                    max_span_blocks=span_blocks)
            return jnp.mean(smp.reshape(K, len(dxs), C, hr, wr), axis=2)
        dx_e = jnp.asarray(np.asarray(dxs, np.float32))
        xse = xg[None, None] + dx_e[None, :, None, None]
        disp = (abc_k[:, 0][:, None] * xse
                + (abc_k[:, 1] * (yg + float(dy)) + abc_k[:, 2])[:, None])
        disp = jnp.clip(disp, d_lo, d_hi)
        xsrc = (xse - disp).reshape(K * len(dxs), hr, wr)
        smp = row_gather_batch(src_rows, xsrc, interpret=interpret,
                               max_span_blocks=span_blocks)
        return jnp.mean(smp.reshape(K, len(dxs), C, hr, wr), axis=2)

    # Warped center intensity (censusTransform_Arma_cu:429-430).
    src_center = gather_row(0, (0,))[:, 0]                     # [K, Hr, Wr]
    acc = jnp.zeros((K, hr, wr), jnp.float32)
    for dy in range(-vr, vr + 1):
        smp = gather_row(dy, xs_all)                           # [K, E, Hr, Wr]
        for j, dx in enumerate(xs_all):
            if dx == 0 and dy == 0:
                continue   # center excluded (gipuma.cu:435-439)
            ref_w = ref_pad[vr + dy:vr + dy + hr, hrad + dx:hrad + dx + wr]
            bit_l = _census_bits(ref_mean, ref_w, eps)         # [Hr, Wr]
            bit_r = _census_bits(src_center, smp[:, j], eps)   # [K, Hr, Wr]
            acc = acc + (bit_l[None] != bit_r).astype(jnp.float32)
    return jnp.where(jnp.isnan(acc) | (acc >= MAXCOST), MAXCOST, acc)


def rect_pair_cost_batch(ref_chw: jnp.ndarray, src_chw: jnp.ndarray,
                         abc_k: jnp.ndarray, params: AlgorithmParams,
                         interpret: bool = False,
                         disp_lo=None, disp_hi=None,
                         span_blocks: int | None = None,
                         hw_valid=None, tile_ok=None) -> jnp.ndarray:
    """rect_pair_cost for K candidate plane fields at once: abc_k
    [K, 3, Hr, Wr] -> [K, Hr, Wr].  One gather-kernel launch per window
    offset serves every candidate (row_gather_batch), and the reference
    window/weight work is shared across candidates.

    hw_valid: optional traced int32 [2] per-view valid (rows, cols) extent
    inside a common padded shape (fused-kernel work skipping; values
    outside the extent are unspecified)."""
    ch, hr, wr = ref_chw.shape
    K = abc_k.shape[0]
    C = ch // 3
    if params.algorithm == MatchingAlgorithm.CENSUS:
        return _rect_pair_cost_batch_census(
            ref_chw, src_chw, abc_k, params, interpret=interpret,
            disp_lo=disp_lo, disp_hi=disp_hi, span_blocks=span_blocks)
    sch = src_chw.shape[0]
    if sch == C:
        # Packed image words only: the window_grads path.
        return _rect_pair_cost_batch_sdg(
            ref_chw, src_chw, abc_k, params, interpret=interpret,
            disp_lo=disp_lo, disp_hi=disp_hi, span_blocks=span_blocks,
            hw_valid=hw_valid, tile_ok=tile_ok)
    grad_fwd = sch == 2 * C
    vr, hrad = params.box_vrad, params.box_hrad
    ref_pad = jnp.pad(ref_chw, ((0, 0), (vr, vr), (hrad, hrad)), mode="edge")
    src_pad = jnp.pad(src_chw, ((0, 0), (vr, vr), (0, 0)), mode="edge")
    xg = jax.lax.broadcasted_iota(jnp.float32, (hr, wr), 1)
    yg = jax.lax.broadcasted_iota(jnp.float32, (hr, wr), 0)
    ref_center = ref_chw[:C]
    inv_gamma = 1.0 / params.gamma
    alpha = params.alpha
    offs = jnp.asarray(np.asarray(params.window_offsets(), np.int32))

    def _l1(x):
        return jnp.mean(jnp.abs(x), axis=-3)

    def step(acc, off):
        dx, dy = off[0], off[1]
        dxf = dx.astype(jnp.float32)
        dyf = dy.astype(jnp.float32)
        ref_w = jax.lax.dynamic_slice(ref_pad, (0, vr + dy, hrad + dx),
                                      (ch, hr, wr))
        disp = (abc_k[:, 0] * (xg + dxf) + abc_k[:, 1] * (yg + dyf)
                + abc_k[:, 2])                              # [K, Hr, Wr]
        if disp_lo is not None:
            disp = jnp.clip(disp, disp_lo, disp_hi)
        xsrc = (xg + dxf) - disp
        src_rows = jax.lax.dynamic_slice(src_pad, (0, vr + dy, 0),
                                         (sch, hr, wr))
        smp = row_gather_batch(src_rows, xsrc, interpret=interpret,
                               max_span_blocks=span_blocks,
                               grad_fwd=grad_fwd)            # [K,CH,Hr,Wr]
        w = jnp.exp(-_l1(ref_w[:C] - ref_center) * inv_gamma)
        col = jnp.minimum(_l1(ref_w[None, :C] - smp[:, :C]),
                          params.tau_color)
        grad = jnp.minimum(
            (_l1(ref_w[None, C:2 * C] - smp[:, C:2 * C])
             + _l1(ref_w[None, 2 * C:] - smp[:, 2 * C:])) * 0.0625,
            params.tau_gradient)
        return acc + w[None] * ((1.0 - alpha) * col + alpha * grad), None

    acc, _ = jax.lax.scan(step, jnp.zeros((K, hr, wr), jnp.float32), offs)
    return jnp.where(jnp.isnan(acc) | (acc >= MAXCOST), MAXCOST, acc)


class RectScene(NamedTuple):
    """ScenePack + per-pair rectified data: the fast-path device state.

    Exposes (via properties) every base-scene attribute the PatchMatch
    engine reads, so it can be passed to the engine unchanged with
    cost_fn = rect_multiview_cost.  All per-pair arrays are stacked over
    the view axis, padded to a common rect shape [Hrp, Wrp] (Wrp % 128 == 0)
    — garbage in the padding is never referenced by the tables.

    rot_k: per-pair pre-rotation count.  Rectification of a pair whose
    baseline is far from the reference x-axis contains a large in-plane
    rotation, which a row/column 2-pass permutation cannot represent;
    rotating the reference grid by k*90 deg first (an exact jnp.rot90, no
    resampling) keeps the residual rotation within +-45 deg where the
    table decomposition is clean.  S below = max(H, W): the rotated
    reference grid is padded to a square so all four orientations share
    one shape, one lax.scan, and (rot_k being a traced [V] array, the
    un-rotation a lax.switch) one SPMD executable under view sharding.
    """

    base: ScenePack
    ref_rect: jnp.ndarray   # [V, 3C, Hrp, Wrp] rect-ref channels
    src_rect: jnp.ndarray   # [V, 3C, Hrp, Wrp] rect-src channels
    L: jnp.ndarray          # [V, 3, 3]: abc_local = L @ m
    # rotated-state -> rect permutation:
    fwd_c1: jnp.ndarray     # [V, S, Wrp]
    fwd_r: jnp.ndarray      # [V, Hrp, Wrp]
    # rect -> rotated-reference-grid return permutation:
    ret_c1: jnp.ndarray     # [V, Hrp, S]
    ret_r: jnp.ndarray      # [V, S, S]
    rot_k: jnp.ndarray      # [V] int32
    # Disparity clamp for cost evaluation, per pair (rect pixels):
    disp_bounds: jnp.ndarray  # [V, 2] = (lo, hi)
    # Static payload carried in the SHAPE (shard-safe, jit-static):
    # spans.shape = (sample_span_blocks, permute_span_blocks) — the
    # row_gather scratch-window bounds verified at build time.
    spans: jnp.ndarray
    # Per-view valid rect extent (rows, cols) inside the common padded
    # [Hrp, Wrp]: the fused cost kernel skips row blocks / column groups
    # beyond it (pad-to-max is pure waste — no read-back targets there).
    # None disables skipping (legacy scenes).
    hw_valid: jnp.ndarray = None  # [V, 2] int32
    # Per-view [8, 128]-tile read-back-target mask [V, Hrp/8, Wrp/128]
    # int32: the rect window is the BBOX of the (tilted) footprint quad,
    # and tiles holding no return-permutation target — the empty bbox
    # triangles plus the source-footprint column margin — skip all fused-
    # kernel work (measured 2.44x -> ~1.2x evaluated px/image px on the
    # tilted views of a ring rig).  None disables the skip.
    tile_ok: jnp.ndarray = None
    # Permutation-pass tile masks (ops/permute2d mask contract), derived
    # from the same read-back-target set (models/rect_scene.py):
    # fwd2_ok [V, Wrp/8, ceil(Hrp/128)] masks pass 2 of the forward
    # (state->rect) permutation in its transposed output space; ret1_ok
    # [V, ceil(Hrp/8), ceil(S/128)] masks pass 1 of the return
    # (rect->state) permutation.  None disables the permute skip.
    fwd2_ok: jnp.ndarray = None
    ret1_ok: jnp.ndarray = None
    # Round-5 additions covering the remaining two (previously unmasked)
    # permute passes: fwd1_ok [V, ceil(S/8), Wrp/128] masks pass 1 of the
    # forward permutation; ret2_ok [V, ceil(S/8), ceil(S/128)] masks
    # pass 2 of the return permutation (the S x S square pad beyond the
    # un-rotated [hk, wk] consumed rectangle — ~25% of that pass at 4:3).
    fwd1_ok: jnp.ndarray = None
    ret2_ok: jnp.ndarray = None
    # Optional nested screening scene (config.cull_downscale, round 5):
    # downscaled rect grids over the cull_view_stride view subset, built
    # by models/rect_scene.build_rect_scene with the cull window
    # geometry.  rect_multiview_cost_batch's sparse pass uses it when
    # present; None falls back to _slice_views on this scene.  Sharded
    # paths strip it (parallel/sharded.py) — its strided view axis does
    # not match the view mesh.
    cull: "RectScene" = None

    # --- engine-facing delegation (models/patchmatch.py reads these) ---
    @property
    def rays(self):
        return self.base.rays

    @property
    def view_vec(self):
        return self.base.view_vec

    @property
    def f(self):
        return self.base.f

    @property
    def baseline(self):
        return self.base.baseline

    @property
    def fx(self):
        return self.base.fx

    @property
    def cx(self):
        return self.base.cx

    @property
    def cy(self):
        return self.base.cy

    @property
    def alpha_focal(self):
        return self.base.alpha_focal

    @property
    def M_inv(self):
        return self.base.M_inv

    @property
    def P_col4(self):
        return self.base.P_col4

    @property
    def R_orig_inv(self):
        return self.base.R_orig_inv

    @property
    def depth_min(self):
        return self.base.depth_min

    @property
    def depth_max(self):
        return self.base.depth_max

    @property
    def texture_ok(self):
        return self.base.texture_ok

    @property
    def row_offset(self):
        return self.base.row_offset

    @property
    def global_h(self):
        return self.base.global_h

    @property
    def view_valid(self):
        return self.base.view_valid

    @property
    def num_views(self) -> int:
        return self.ref_rect.shape[0]


def _slice_views(scene: RectScene, stride: int) -> RectScene:
    """Strided view subset of a RectScene (the two-stage cull's sparse
    screening pass, config.cull_view_stride).  Slices every per-view leaf
    plus base.view_valid; other base leaves are view-independent or
    unused by the rect scan."""
    def sl(a):
        return None if a is None else a[::stride]

    base = scene.base._replace(view_valid=scene.base.view_valid[::stride])
    return scene._replace(
        base=base, ref_rect=sl(scene.ref_rect), src_rect=sl(scene.src_rect),
        L=sl(scene.L), fwd_c1=sl(scene.fwd_c1), fwd_r=sl(scene.fwd_r),
        ret_c1=sl(scene.ret_c1), ret_r=sl(scene.ret_r),
        rot_k=sl(scene.rot_k), disp_bounds=sl(scene.disp_bounds),
        hw_valid=sl(scene.hw_valid), tile_ok=sl(scene.tile_ok),
        fwd2_ok=sl(scene.fwd2_ok), ret1_ok=sl(scene.ret1_ok),
        fwd1_ok=sl(scene.fwd1_ok), ret2_ok=sl(scene.ret2_ok))


def _pack_m(m_chw: jnp.ndarray) -> jnp.ndarray:
    """Pack per-candidate plane vectors m = n/d for the forward permute:
    [K, 3, H, W] f32 -> [K, 2, H, W] int32 with channel 0 =
    (f16(m0) << 16) | f16(m1) and channel 1 = bitcast(m2).  The permute is
    pure nearest-neighbor selection (ops/permute2d), so the words pass
    through bit-exactly; 2 words instead of 3 f32 channels is a 1/3 cut
    of the forward permute's gather work — the co-dominant device cost
    after round 4 (ROADMAP.md: permutes ~35%).  f16 carries ~5e-4
    relative error on the two smaller components => ~0.01 px on typical
    disparity fields, far below the 1/32 px warp quantization the build
    already accepts (config.rect_pack_m gates it)."""
    h0 = jax.lax.bitcast_convert_type(
        m_chw[:, 0].astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    h1 = jax.lax.bitcast_convert_type(
        m_chw[:, 1].astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    w01 = jax.lax.bitcast_convert_type(
        jnp.left_shift(h0, 16) | h1, jnp.int32)
    w2 = jax.lax.bitcast_convert_type(m_chw[:, 2], jnp.int32)
    return jnp.stack([w01, w2], axis=1)


def _unpack_m(mp: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _pack_m on the rect grid: [K, 2, Hr, Wr] int32 ->
    [K, 3, Hr, Wr] f32."""
    w01 = jax.lax.bitcast_convert_type(mp[:, 0], jnp.uint32)
    m0 = jax.lax.bitcast_convert_type(
        jnp.right_shift(w01, 16).astype(jnp.uint16),
        jnp.float16).astype(jnp.float32)
    m1 = jax.lax.bitcast_convert_type(
        w01.astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    m2 = jax.lax.bitcast_convert_type(mp[:, 1], jnp.float32)
    return jnp.stack([m0, m1, m2], axis=1)


def _pack_f16_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """Pack consecutive leading-axis channels as f16 pairs: [N, ...] f32 ->
    [ceil(N/2), ...] int32 with element 2j in the high half-word and 2j+1
    in the low (odd N zero-padded).  The nearest row gather passes int32
    words through bit-exactly, so this halves a permutation's channel
    count at f16 (~5e-4 relative) precision — used by the two-stage
    cull's SPARSE pass only, whose output is a per-pixel candidate
    RANKING (config.cull_pack); the accepted cost is always re-evaluated
    by the full pass at f32."""
    if x.shape[0] % 2:
        x = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
    hi = jax.lax.bitcast_convert_type(
        x[0::2].astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        x[1::2].astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(
        jnp.left_shift(hi, 16) | lo, jnp.int32)


def _unpack_f16_pairs(w: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse of _pack_f16_pairs: [ceil(n/2), ...] int32 -> [n, ...] f32."""
    u = jax.lax.bitcast_convert_type(w, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        jnp.right_shift(u, 16).astype(jnp.uint16),
        jnp.float16).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        u.astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    return jnp.stack([hi, lo], axis=1).reshape(-1, *w.shape[1:])[:n]


def _pack_m_tri(m_chw: jnp.ndarray) -> jnp.ndarray:
    """All-f16 plane packing across candidates: [K, 3, H, W] f32 ->
    [ceil(3K/2), H, W] int32 (f16 pairs of the flattened K*3 channel
    sequence).  vs _pack_m's (f16, f16 | f32) layout this carries m2 at
    f16 too — ~5e-4 relative, ~0.015 px on typical disparity fields,
    under the 1/32 px warp quantization — and cuts the forward permute
    from 2K to ceil(3K/2) channels.  Sparse-cull-pass only
    (config.cull_pack)."""
    K = m_chw.shape[0]
    return _pack_f16_pairs(m_chw.reshape(K * 3, *m_chw.shape[2:]))


def _unpack_m_tri(mp: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse of _pack_m_tri: [ceil(3k/2), Hr, Wr] int32 ->
    [k, 3, Hr, Wr] f32."""
    flat = _unpack_f16_pairs(mp, 3 * k)
    return flat.reshape(k, 3, *mp.shape[1:])


def rect_per_view_costs(scene: RectScene, params: AlgorithmParams,
                        parity: int, n: jnp.ndarray, d: jnp.ndarray
                        ) -> jnp.ndarray:
    """Per-view costs on the rectified fast path: [V, H, W2].

    n: [H, W2, 3], d: [H, W2] on the parity's active half-grid.  The view
    axis is this function's sharding axis (parallel/sharded.py gathers the
    per-view results over ICI before combination).  Delegates to the
    K-candidate batch implementation with K = 1."""
    return rect_per_view_costs_batch(scene, params, parity,
                                     n[None], d[None])[:, 0]


def rect_per_view_costs_batch(scene: RectScene, params: AlgorithmParams,
                              parity: int, n: jnp.ndarray, d: jnp.ndarray,
                              m_pack: str | None = None,
                              cost_pack: bool = False,
                              extra_mask: jnp.ndarray | None = None
                              ) -> jnp.ndarray:
    """Per-view costs for K candidates at once: n [K, H, W2, 3],
    d [K, H, W2] -> [V, K, H, W2].

    One permute / gather-kernel launch serves all candidates (channel and
    batch stacking) — candidate-by-candidate evaluation pays the kernel
    launch latency ~K times over (dominant on the remote TPU runtime).

    m_pack: forward-permute plane packing — None derives "pair"
    (config.rect_pack_m) or "none"; "tri" = all-f16 candidate-pair
    packing (_pack_m_tri, sparse cull pass).  cost_pack: pack the
    returned per-view costs as f16 pairs for the return permute
    (ranking-precision only — sparse cull pass).

    extra_mask ([H, W2] bool, config.cull_early_term): pixels that do NOT
    need evaluation — the flag rides the forward permute as one extra
    channel, rect tiles holding no flagged read-back target skip the
    fused kernel DYNAMICALLY (same pl.when mechanism as the static
    footprint mask), and masked-off pixels report MAXCOST.  Routing-
    contended flag slots (<= the build's 0.5%% routing budget) can only
    mis-skip a pixel, never corrupt an evaluated one."""
    interpret = jax.default_backend() == "cpu"
    K = n.shape[0]
    if m_pack is None:
        m_pack = "pair" if getattr(params, "rect_pack_m", True) else "none"
    m = n / d[..., None]                                   # [K, H, W2, 3]
    m_full = jnp.repeat(m, 2, axis=2)                      # [K, H, W, 3]
    m_chw = jnp.moveaxis(m_full, -1, 1)                    # [K, 3, H, W]
    if m_pack == "pair":
        m_ch = _pack_m(m_chw).reshape(2 * K, *m_chw.shape[2:])
    elif m_pack == "tri":
        m_ch = _pack_m_tri(m_chw)                          # [~3K/2, H, W]
    else:
        m_ch = m_chw.reshape(3 * K, *m_chw.shape[2:])
    CH = m_ch.shape[0]
    if extra_mask is not None:
        em = jnp.repeat(extra_mask.astype(m_ch.dtype), 2, axis=1)  # [H, W]
        m_ch = jnp.concatenate([m_ch, em[None]], axis=0)
    h, w = m_full.shape[1:3]
    s = scene.fwd_c1.shape[-2]
    span_sample = scene.spans.shape[-2]
    span_perm = scene.spans.shape[-1]

    def rot_pad(k):
        rk = jnp.rot90(m_ch, k=k, axes=(-2, -1))
        return jnp.pad(rk, ((0, 0), (0, s - rk.shape[-2]),
                            (0, s - rk.shape[-1])))
    m_rots = jnp.stack([rot_pad(k) for k in range(4)])     # [4, CH, S, S]

    def unrot_branch(k):
        def f(c_sq):                                       # [Kc, S, S]
            hk, wk = (w, h) if k % 2 else (h, w)
            return jnp.rot90(c_sq[:, :hk, :wk], k=(-k) % 4, axes=(1, 2))
        return f
    unrot_branches = [unrot_branch(k) for k in range(4)]
    rp = cb.row_parity(h, parity)[None]                    # [1, H, 1]

    hwv_all = scene.hw_valid
    hrp, wrp = scene.ref_rect.shape[-2:]
    if hwv_all is None:
        hwv_all = jnp.full((scene.num_views, 2), jnp.int32(max(hrp, wrp)))
    tm_all = scene.tile_ok
    if tm_all is None or not getattr(params, "rect_footprint_skip", True):
        tm_all = jnp.ones((scene.num_views, hrp // 8, wrp // 128), jnp.int32)

    # Permute-pass tile skip (ops/permute2d mask contract): only under the
    # footprint skip (the masks assume the fused kernel reads the permuted
    # plane field on tile_ok tiles only) on the window_grads production
    # path — every sampling path clamps disparity in-kernel, so garbage
    # plane values on skipped tiles cannot break the gather span bound.
    pskip = (getattr(params, "rect_permute_skip", True)
             and getattr(params, "rect_footprint_skip", True)
             and params.pack_taps and params.window_grads
             and scene.tile_ok is not None
             and scene.fwd2_ok is not None and scene.ret1_ok is not None)
    if pskip:
        f2_all, r1_all = scene.fwd2_ok, scene.ret1_ok
    else:
        f2_all = jnp.zeros((scene.num_views, 0, 0), jnp.int32)
        r1_all = jnp.zeros((scene.num_views, 0, 0), jnp.int32)
    # The other two passes' masks (round 5; older scenes may lack them).
    pskip2 = (pskip and scene.fwd1_ok is not None
              and scene.ret2_ok is not None)
    if pskip2:
        f1_all, r2_all = scene.fwd1_ok, scene.ret2_ok
    else:
        f1_all = jnp.zeros((scene.num_views, 0, 0), jnp.int32)
        r2_all = jnp.zeros((scene.num_views, 0, 0), jnp.int32)

    def view_body(_, vin):
        (ref_r, src_r, Lv, fc1, fr, rc1, rr, kv, dbv, validv, hwv, tmv,
         f2v, r1v, f1v, r2v) = vin
        m_sel = jax.lax.dynamic_index_in_dim(m_rots, kv, axis=0,
                                             keepdims=False)
        m_rect = permute2d(m_sel, fc1, fr, interpret=interpret,
                           max_span_blocks=span_perm,
                           mask1=f1v if pskip2 else None,
                           mask2=f2v if pskip else None)   # [CH(+1), Hrp, Wrp]
        if extra_mask is not None:
            # Dynamic kernel-tile mask: a tile runs iff any of its slots
            # carries a flagged pixel (conservative — smooth-fill slots
            # can only over-enable).  AND'd with the static footprint
            # mask; the kernel input mask is a traced array, so this
            # costs no recompile.
            flag = m_rect[CH]
            fr8 = flag.reshape(m_rect.shape[1] // 8, 8,
                               m_rect.shape[2] // 128, 128)
            dyn = (jnp.max(fr8, axis=(1, 3)) > 0).astype(jnp.int32)
            tmv = tmv * dyn
            m_rect = m_rect[:CH]
        if m_pack == "pair":
            m_rect = _unpack_m(m_rect.reshape(K, 2, *m_rect.shape[1:]))
        elif m_pack == "tri":
            m_rect = _unpack_m_tri(m_rect, K)              # [K, 3, Hrp, Wrp]
        else:
            m_rect = m_rect.reshape(K, 3, *m_rect.shape[1:])
        abc = jnp.einsum("ij,kjhw->kihw", Lv, m_rect)      # [K, 3, Hrp, Wrp]
        # NOTE: on the window_grads default this dispatches into the fused
        # window-cost kernel (ops/pallas_sdg_fused.py).  An earlier
        # whole-cost fused kernel for the 3-channel layout measured SLOWER
        # than unfused (89 vs 41 ms/view-eval; deleted round 2) — fusion
        # only started winning once tap packing + window-sample gradients
        # cut the gather count below the XLA glue cost.
        cost_rect = rect_pair_cost_batch(ref_r, src_r, abc, params,
                                         interpret=interpret,
                                         disp_lo=dbv[0], disp_hi=dbv[1],
                                         span_blocks=span_sample,
                                         hw_valid=hwv, tile_ok=tmv)
        if cost_pack:
            cost_rect = _pack_f16_pairs(cost_rect)         # [~K/2] int32
        cost_sq = permute2d(cost_rect, rc1, rr, interpret=interpret,
                            max_span_blocks=span_perm,
                            mask1=r1v if pskip else None,
                            mask2=r2v if pskip2 else None)  # [Kc, S, S]
        cost_full = jax.lax.switch(kv, unrot_branches, cost_sq)
        cost_act = jnp.where(rp == 0, cost_full[:, :, 0::2],
                             cost_full[:, :, 1::2])        # [Kc, H, W2]
        if cost_pack:
            cost_act = _unpack_f16_pairs(cost_act, K)      # [K, H, W2] f32
        if extra_mask is not None:
            # Skipped kernel tiles hold stale VMEM; anything read back
            # from them is masked here (flagged pixels always land on
            # evaluated tiles — exact routing of the flag channel).
            cost_act = jnp.where(extra_mask[None], cost_act,
                                 jnp.float32(MAXCOST))
        cost_act = jnp.where(jnp.isnan(cost_act) | (cost_act >= MAXCOST)
                             | (validv == 0.0), MAXCOST, cost_act)
        return None, cost_act

    _, costs = jax.lax.scan(
        view_body, None,
        (scene.ref_rect, scene.src_rect, scene.L,
         scene.fwd_c1, scene.fwd_r, scene.ret_c1, scene.ret_r,
         scene.rot_k, scene.disp_bounds, scene.view_valid, hwv_all,
         tm_all, f2_all, r1_all, f1_all, r2_all))
    return costs                                           # [V, K, H, W2]


def rect_multiview_cost(scene: RectScene, params: AlgorithmParams,
                        parity: int, n: jnp.ndarray, d: jnp.ndarray
                        ) -> jnp.ndarray:
    """pmCostMultiview on the rectified fast path — engine cost_fn."""
    return combine_view_costs(
        rect_per_view_costs(scene, params, parity, n, d), params,
        view_valid=scene.view_valid)


def rect_multiview_cost_batch(scene: RectScene, params: AlgorithmParams,
                              parity: int, n: jnp.ndarray, d: jnp.ndarray,
                              cand_ok: jnp.ndarray | None = None,
                              cur: tuple | None = None) -> jnp.ndarray:
    """Combined multiview cost for K stacked candidates: [K, H, W2].

    With config.rect_two_stage_cull (and K > 1): two-stage evaluation —
    a sparse-window screening pass ranks the K candidates per pixel, the
    full window is evaluated only for each pixel's sparse winner, and the
    losers report MAXCOST (so the engine's accept fold, which argmins and
    compares against the carried cost, composes unchanged).  This cuts
    the per-stage kernel work from K full windows to K sparse + 1 full —
    the per-candidate SAMPLE COUNT lever the SoL analysis calls the only
    single-chip one left (ROADMAP.md).  Deviation from the reference's
    all-candidates-full loop (gipuma.cu:832-874) documented in config.py.

    cur (config.cull_early_term): the engine's CURRENT plane (n_now,
    d_now).  It joins the sparse pass as candidate K+1; pixels whose best
    sparse candidate does not beat the current plane's sparse cost (plus
    cull_early_slack — a same-operator comparison, so no cross-operator
    bias) skip the full-window pass entirely via the dynamic tile mask.
    On a converged field most pixels reject every candidate, so the full
    pass collapses to the still-improving regions.  Mispredictions lose
    an acceptance (the candidate stays available next iteration) — same
    noise class as the sparse ranking itself, gated at 5e-3.
    """
    K = n.shape[0]
    if (K > 1 and getattr(params, "rect_two_stage_cull", False)
            and params.pack_taps and params.window_grads):
        cull = int(getattr(params, "cull_box", 9))
        sp = params.replace(
            box_hsize=cull, box_vsize=cull,
            window_increment=int(getattr(params, "cull_increment", 4)))
        stride = max(1, int(getattr(params, "cull_view_stride", 1)))
        cull_scene = getattr(scene, "cull", None)
        if cull_scene is not None:
            # Dedicated downscaled screening scene (config.cull_downscale)
            # — already view-strided and built with the cull window
            # geometry, so sp's box/increment match its gradient channels
            # and gather spans.
            sc_s = cull_scene
        else:
            sc_s = scene if stride == 1 else _slice_views(scene, stride)
        # cull_pack: the screening pass's permutes at f16 — forward plane
        # words 2K -> ceil(3K/2) channels (_pack_m_tri), returned costs
        # K -> ceil(K/2) (_pack_f16_pairs).  Ranking-only precision; the
        # winner's accepted cost comes from the f32 full pass below.
        cpk = bool(getattr(params, "cull_pack", True))
        early = (cur is not None
                 and getattr(params, "cull_early_term", False))
        n_s, d_s = n, d
        if early:
            n_s = jnp.concatenate([n, cur[0][None]], axis=0)
            d_s = jnp.concatenate([d, cur[1][None]], axis=0)
        c_all = combine_view_costs(
            rect_per_view_costs_batch(sc_s, sp, parity, n_s, d_s,
                                      m_pack="tri" if cpk else None,
                                      cost_pack=cpk), sp,
            view_valid=sc_s.view_valid)                     # [K(+1), H, W2]
        c_s = c_all[:K]
        # Exclude depth-range-invalid candidates from the ranking so a
        # soon-to-be-rejected winner cannot shadow a valid runner-up
        # (the accept fold re-checks the range on the winner anyway).
        h = scene.rays.shape[0]
        w2 = scene.rays.shape[1] // 2
        x = cb.active_x(h, w2, parity)
        y = cb.active_y(h, w2) + scene.row_offset.astype(jnp.float32)
        depth_all = T.depth_from_plane(n, d, x, y, scene.fx, scene.cx,
                                       scene.cy, scene.alpha_focal)
        in_range = ((depth_all >= scene.depth_min)
                    & (depth_all <= scene.depth_max))
        if cand_ok is not None:
            # Engine-invalid candidates (cand_ok=False in _fold_better,
            # e.g. border propagation sources) can never be accepted;
            # letting one win the sparse screen would waste the full
            # evaluation on it and MAXCOST-mask the valid runners-up.
            in_range = in_range & cand_ok
        c_msk = jnp.where(in_range, c_s, MAXCOST + 1.0)
        kb = jnp.argmin(c_msk, axis=0)                      # [H, W2]
        need_full = None
        if early:
            # Same-operator comparison: best candidate's sparse cost vs
            # the CURRENT plane's sparse cost (candidate K+1 above).
            slack = jnp.float32(getattr(params, "cull_early_slack", 0.05))
            need_full = jnp.min(c_msk, axis=0) <= c_all[K] + slack
        n_sel = jnp.take_along_axis(n, kb[None, :, :, None],
                                    axis=0)                 # [1, H, W2, 3]
        d_sel = jnp.take_along_axis(d, kb[None], axis=0)    # [1, H, W2]
        c_f = combine_view_costs(
            rect_per_view_costs_batch(scene, params, parity, n_sel, d_sel,
                                      extra_mask=need_full),
            params, view_valid=scene.view_valid)            # [1, H, W2]
        return jnp.where(jnp.arange(K)[:, None, None] == kb[None], c_f,
                         jnp.float32(MAXCOST))
    return combine_view_costs(
        rect_per_view_costs_batch(scene, params, parity, n, d), params,
        view_valid=scene.view_valid)


# The engine (models/patchmatch._fold_better) uses the `batch` attribute to
# evaluate all propagation candidates in one pass.
rect_multiview_cost.batch = rect_multiview_cost_batch
