"""Fused rectified window-cost kernel: gather + cost arithmetic in VMEM.

Replaces ops/rect_cost.rect_pair_cost_batch's structure of one row_gather
launch per window offset with XLA arithmetic between launches — which
round-trips [K, 3C, Hr, Wr] sample arrays (and several temporaries) through
HBM for every one of the ~36 window offsets — by a single Pallas kernel.

Per (row-block, candidate) grid step:

* ONE aligned DMA brings the row block + window halo of the rectified
  reference and source channel stacks into VMEM (shared across the K
  candidate steps; Mosaic requires HBM DMA row offsets provably 8-aligned,
  so the halo is padded to a multiple of 8 and blocks start at i*BR);
* window offsets run in a fori_loop (offset table in SMEM).  The (dy, dx)
  shifts are dynamic VALUES, and Mosaic rejects dynamic unaligned sublane
  slicing of VMEM refs — so shifted windows are produced with
  pltpu.roll (tpu.dynamic_rotate, probed to work for dynamic sublane
  shifts) followed by static slices;
* the row-aligned bilinear source gather uses the scratch-window
  take_along_axis scheme of ops/pallas_rowgather on [8, 128] tiles (the
  rolled source slab is stored to scratch first: dynamic_gather operands
  need natural layout);
* bilateral weight, affine per-pixel disparity, and the truncated
  color+gradient cost accumulate into the output block in VMEM.

HBM traffic per (view, candidate-batch) evaluation drops from
O(offsets * K * C * Hr * Wr) array round-trips to O((K + C) * Hr * Wr).

Cost semantics are identical to rect_pair_cost_batch (the slow reference
for this kernel — tests/test_rect_fused.py checks elementwise equality in
interpret mode); both mirror pmCost/pmCostComputation (gipuma.cu:223-320,
455-518) on the rectified grid as documented in ops/rect_cost.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MAXCOST

BLOCK_ROWS = 32
LANE_PAD = 128   # one 128-lane block of horizontal halo on each ref side


def _round8(v: int) -> int:
    return -(-v // 8) * 8


def _fused_kernel(offs_i, offs_f, db, ref_hbm, src_hbm, abc_ref, o_ref,
                  ref_win, src_win, ssc, gsc, sem_r, sem_s, *,
                  C, BR, VR8, W, WL, NB, SPAN, N_OFF, ALPHA, INV_GAMMA,
                  TAU_COL, TAU_GRAD):
    i = pl.program_id(0)
    CH = 3 * C

    # One halo'd row-block DMA serves all K candidate grid steps (scratch
    # persists across the sequential grid).  Block start i*BR is 8-aligned
    # by construction (BR % 8 == 0), as Mosaic requires for HBM row slices.
    @pl.when(pl.program_id(1) == 0)
    def _load():
        cp_r = pltpu.make_async_copy(
            ref_hbm.at[:, pl.ds(i * BR, BR + 2 * VR8), :], ref_win, sem_r)
        cp_s = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(i * BR, BR + 2 * VR8), :], src_win, sem_s)
        cp_r.start()
        cp_s.start()
        cp_r.wait()
        cp_s.wait()

    # Mosaic iota is integer-only; cast to f32 after.
    xg = jax.lax.broadcasted_iota(jnp.int32, (BR, W), 1).astype(jnp.float32)
    yg = (jax.lax.broadcasted_iota(jnp.int32, (BR, W), 0).astype(jnp.float32)
          + (i * BR).astype(jnp.float32))
    a0 = abc_ref[0, 0]
    a1 = abc_ref[0, 1]
    a2 = abc_ref[0, 2]
    d_lo = db[0]
    d_hi = db[1]

    ref_c = [ref_win[c, VR8:VR8 + BR, LANE_PAD:LANE_PAD + W]
             for c in range(C)]

    o_ref[0] = jnp.zeros((BR, W), jnp.float32)

    def body(o, _):
        dxi = offs_i[o, 0]
        dyi = offs_i[o, 1]
        dxf = offs_f[o, 0]
        dyf = offs_f[o, 1]

        # Shifted windows via dynamic roll + static slice (dynamic sublane
        # slicing is rejected by Mosaic; rolls are probed-good).  Slices
        # never wrap: VR8 + dyi + BR <= BR + 2*VR8 and the lane halo covers
        # LANE_PAD + dxi + W.
        rw = []
        for c in range(CH):
            r0 = pltpu.roll(ref_win[c], -(VR8 + dyi), 0)
            r1 = pltpu.roll(r0, -(LANE_PAD + dxi), 1)
            rw.append(r1[:BR, :W])
            s0 = pltpu.roll(src_win[c], -(VR8 + dyi), 0)
            ssc[c] = s0[:BR, :W]

        wdiff = jnp.abs(rw[0] - ref_c[0])
        for c in range(1, C):
            wdiff = wdiff + jnp.abs(rw[c] - ref_c[c])
        wgt = jnp.exp(-(wdiff * (1.0 / C)) * INV_GAMMA)

        disp = jnp.clip(a0 * (xg + dxf) + a1 * (yg + dyf) + a2, d_lo, d_hi)
        xs = jnp.clip(xg + dxf - disp, 0.0, float(W - 1))

        for gi in range(BR // 8):
            rsl = slice(gi * 8, gi * 8 + 8)
            for g in range(W // 128):
                colr = slice(g * 128, (g + 1) * 128)
                xt = xs[rsl, colr]
                x0 = jnp.clip(jnp.floor(xt).astype(jnp.int32), 0, W - 2)
                fx = jnp.clip(xt - x0.astype(jnp.float32), 0.0, 1.0)
                base = jnp.clip(jnp.min(x0) // 128, 0, NB - SPAN) * 128
                cl_all = x0 - base
                col = jnp.zeros((8, 128), jnp.float32)
                grd = jnp.zeros((8, 128), jnp.float32)
                for c in range(CH):
                    # Scratch-window gather (ops/pallas_rowgather scheme).
                    gsc[:, :] = ssc[c, rsl, pl.ds(base, SPAN * 128)]
                    v0 = jnp.zeros((8, 128), jnp.float32)
                    v1 = jnp.zeros((8, 128), jnp.float32)
                    for b in range(SPAN):
                        blk = gsc[:, b * 128:(b + 1) * 128]
                        cl = cl_all - b * 128
                        g0 = jnp.take_along_axis(blk, jnp.clip(cl, 0, 127),
                                                 axis=1)
                        g1 = jnp.take_along_axis(blk,
                                                 jnp.clip(cl + 1, 0, 127),
                                                 axis=1)
                        v0 = jnp.where((cl >= 0) & (cl < 128), g0, v0)
                        v1 = jnp.where((cl + 1 >= 0) & (cl + 1 < 128),
                                       g1, v1)
                    smp = v0 * (1.0 - fx) + v1 * fx
                    diff = jnp.abs(rw[c][rsl, colr] - smp)
                    if c < C:
                        col = col + diff
                    else:
                        grd = grd + diff
                cost_t = wgt[rsl, colr] * (
                    (1.0 - ALPHA) * jnp.minimum(col * (1.0 / C), TAU_COL)
                    + ALPHA * jnp.minimum(grd * (0.0625 / C), TAU_GRAD))
                o_ref[0, rsl, colr] = o_ref[0, rsl, colr] + cost_t
        return 0

    jax.lax.fori_loop(0, N_OFF, body, 0)


@functools.partial(jax.jit, static_argnames=(
    "C", "BR", "VR8", "SPAN", "ALPHA", "INV_GAMMA", "TAU_COL", "TAU_GRAD",
    "interpret"))
def _fused_call(ref_pad, src_pad, abc, offs_i, offs_f, db, *,
                C, BR, VR8, SPAN, ALPHA, INV_GAMMA, TAU_COL, TAU_GRAD,
                interpret):
    CH, hr_tot, wl = ref_pad.shape
    W = src_pad.shape[-1]
    K = abc.shape[0]
    HRP = hr_tot - 2 * VR8
    NB = W // 128
    n_off = offs_i.shape[0]
    kernel = functools.partial(
        _fused_kernel, C=C, BR=BR, VR8=VR8, W=W, WL=wl, NB=NB, SPAN=SPAN,
        N_OFF=n_off, ALPHA=ALPHA, INV_GAMMA=INV_GAMMA, TAU_COL=TAU_COL,
        TAU_GRAD=TAU_GRAD)
    grid = (HRP // BR, K)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # offs_i
            pl.BlockSpec(memory_space=pltpu.SMEM),   # offs_f
            pl.BlockSpec(memory_space=pltpu.SMEM),   # db
            pl.BlockSpec(memory_space=pltpu.HBM),    # ref_pad
            pl.BlockSpec(memory_space=pltpu.HBM),    # src_pad
            pl.BlockSpec((1, 3, BR, W), lambda i, k: (k, 0, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, BR, W), lambda i, k: (k, i, 0)),
        out_shape=jax.ShapeDtypeStruct((K, HRP, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((CH, BR + 2 * VR8, wl), jnp.float32),  # ref_win
            pltpu.VMEM((CH, BR + 2 * VR8, W), jnp.float32),   # src_win
            pltpu.VMEM((CH, BR, W), jnp.float32),             # ssc
            pltpu.VMEM((8, SPAN * 128), jnp.float32),         # gsc
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(offs_i, offs_f, db, ref_pad, src_pad, abc)


def fused_pair_cost_batch(ref_chw: jnp.ndarray, src_chw: jnp.ndarray,
                          abc_k: jnp.ndarray, params,
                          interpret: bool = False,
                          disp_lo=None, disp_hi=None,
                          span_blocks: int | None = None) -> jnp.ndarray:
    """Drop-in replacement for rect_cost.rect_pair_cost_batch.

    ref_chw, src_chw: [3C, Hr, Wr] rectified channel stacks (Wr % 128 == 0);
    abc_k: [K, 3, Hr, Wr] per-pixel affine disparity coefficients;
    returns [K, Hr, Wr] window costs.
    """
    ch, hr, wr = ref_chw.shape
    C = ch // 3
    K = abc_k.shape[0]
    vr, hrad = params.box_vrad, params.box_hrad
    assert hrad < LANE_PAD and wr % 128 == 0
    nb = wr // 128
    span = nb if span_blocks is None else min(span_blocks, nb)
    vr8 = _round8(vr)

    pad_r = (-hr) % BLOCK_ROWS
    # Rows: vr8-aligned halo (DMA block starts must be 8-aligned); the
    # roll-based window shift needs vr8 - vr extra top rows of real edge
    # padding, which jnp.pad supplies.
    ref_pad = jnp.pad(ref_chw, ((0, 0), (vr8, vr8 + pad_r),
                                (LANE_PAD, LANE_PAD)), mode="edge")
    src_pad = jnp.pad(src_chw, ((0, 0), (vr8, vr8 + pad_r), (0, 0)),
                      mode="edge")
    abc = jnp.pad(abc_k, ((0, 0), (0, 0), (0, pad_r), (0, 0)))

    offs = np.asarray(params.window_offsets(), np.int32)     # [(dx, dy)]
    offs_i = jnp.asarray(offs, jnp.int32)
    offs_f = jnp.asarray(offs, jnp.float32)
    if disp_lo is None:
        db = jnp.asarray([-jnp.inf, jnp.inf], jnp.float32)
    else:
        db = jnp.stack([jnp.asarray(disp_lo, jnp.float32),
                        jnp.asarray(disp_hi, jnp.float32)])

    acc = _fused_call(ref_pad, src_pad, abc, offs_i, offs_f, db,
                      C=C, BR=BLOCK_ROWS, VR8=vr8, SPAN=span,
                      ALPHA=float(params.alpha),
                      INV_GAMMA=1.0 / float(params.gamma),
                      TAU_COL=float(params.tau_color),
                      TAU_GRAD=float(params.tau_gradient),
                      interpret=interpret)
    acc = acc[:, :hr, :]
    return jnp.where(jnp.isnan(acc) | (acc >= MAXCOST), MAXCOST, acc)
