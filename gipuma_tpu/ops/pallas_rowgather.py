"""Row-aligned horizontal gather — the rectified-sampling fast path.

After per-pair epipolar rectification (geometry/rectify.py) every sample
reads from its OWN image row: out[i, j] = lerp of src[i, x[i, j]] along x.
That layout maps directly onto Mosaic's ``tpu.dynamic_gather`` with a
natural-layout operand (the [8, 128] source block whose rows ARE the sample
rows) — no broadcast materialization at all, unlike the general sampler in
pallas_sampling.py.  Measured primitive rate ~59 Gelem/s on v5e.

This op underpins the round-2 rectified cost path (ROADMAP.md); it is
integration-tested here in interpret mode and benchmarked on hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Rows per grid step: bounds VMEM (the whole-array variant ran out of the
# 16 MB scoped VMEM at DTU-rect shapes) and lets the pipeline overlap the
# source-row DMA with compute.
BLOCK_ROWS = 32


def _unpack_taps(vp):
    """Unpack a bf16 tap pair (v0 in the high half-word, v1 in the low) from
    an int32 word into two f32 values."""
    v0 = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(vp, jnp.int32(-65536)), jnp.float32)
    v1 = jax.lax.bitcast_convert_type(
        jnp.left_shift(vp, 16), jnp.float32)
    return v0, v1


def _row_gather_kernel(src_ref, x_ref, o_ref, scratch_ref, *, W, NB, C, G,
                       SPAN, B, PACKED, GFWD, NEAREST, TM=None):
    # Per [8, 128] tile of samples: the needed source rows are exactly the
    # tile's own rows; only the x-block range is dynamic.  When SPAN < NB,
    # the tile's x values are known (guaranteed by the caller) to span at
    # most SPAN 128-column blocks: copy that window into scratch once and
    # gather inside it — ~NB/SPAN fewer dynamic_gather+select chains than
    # the predicated full scan.  x values outside the copied window (wild
    # hypotheses whose warp left the guaranteed range) read 0.0.
    # The x batch axis (B sample grids sharing one source) amortizes the
    # source DMA and the kernel launch across candidates.
    #
    # Block loops stay REGISTER-resident and unconditional: a dynamic-span
    # variant (skip blocks past the tile's max index with pl.when + VMEM
    # accumulators) was built and measured ~2x SLOWER on v5e — the
    # accumulator scratch round-trips and predication overhead cost more
    # than the skipped 16-cycle gathers (scripts/tpu_dynspan_ab.py).
    #
    # PACKED: int32 source where each word packs BOTH bilinear taps
    # (bf16(src[x]) << 16 | bf16(src[x+1])) — built by pack_taps().  One
    # dynamic_gather then serves both taps; gathers are the measured
    # bottleneck of the whole engine (~16 cycles each on v5e), so this is a
    # ~1.8x kernel speedup for ~0.2% tap quantization (|err| <= 0.5/128 of
    # the value, well under the photometric noise MVS costs tolerate).
    #
    # GFWD (requires PACKED): the source holds 2C' words per pixel —
    # [C' image tap-pairs][C' y-gradient tap-pairs] — and the kernel emits
    # 3C' channels [img, gx, gy]: the x-gradient is the DERIVATIVE OF THE
    # BILINEAR INTERPOLANT, gx = 2*(v1 - v0), free from the image tap pair
    # (the matching ref-side operator is 2*(I[x+1] - I[x]); the factor 2
    # keeps the reference's un-normalized central-difference scale,
    # gipuma.cu:270-276).  Cuts the gather count from 3 to 2 words/sample
    # with no sampling approximation for img/gy.
    def load_x(bi, rows, g):
        xx = x_ref[bi, rows, g * 128:(g + 1) * 128]
        if NEAREST:
            # Tables hold exact integer positions (ops/permute2d); round
            # and take one tap — half the dynamic_gather count of lerp.
            x0i = jnp.clip((xx + 0.5).astype(jnp.int32), 0, W - 1)
            return x0i, None
        x0i = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, W - 2)
        fx = jnp.clip(xx - x0i.astype(jnp.float32), 0.0, 1.0)
        return x0i, fx

    def tile(gi, g):
        rows = pl.ds(gi * 8, 8)
        windowed = SPAN < NB
        if windowed:
            # ONE scratch window per (row group, col group, channel),
            # shared by ALL batch items: the caller's span bound is
            # derived from the global clamped-disparity range, so it
            # covers the union of every batch item's samples for this
            # tile.  (A per-item window was measured copy-bound at
            # large B; sharing amortizes one copy over B*SPAN gathers.)
            # x0i/fx are recomputed per use from VMEM rather than kept
            # live across the c/bi loops — B pairs of live vregs would
            # spill.
            mn = load_x(0, rows, g)[0]
            for bi in range(1, B):
                mn = jnp.minimum(mn, load_x(bi, rows, g)[0])
            base = jnp.clip(jnp.min(mn) // 128, 0, NB - SPAN) * 128
            nblk = SPAN
        else:
            nblk = NB
        for c in range(C):
            if windowed:
                scratch_ref[:, :] = src_ref[c, rows,
                                            pl.ds(base, SPAN * 128)]
                blk_at = (lambda b:
                          scratch_ref[:, b * 128:(b + 1) * 128])
            for bi in range(B):
                x0i, fx = load_x(bi, rows, g)
                if windowed:
                    cl_all = x0i - base
                    pred_at = lambda b: True
                else:
                    bxmin = jnp.min(x0i) // 128
                    bxmax = (jnp.max(x0i) + 1) // 128
                    cl_all = x0i
                    blk_at = (lambda b:
                              src_ref[c, rows, b * 128:(b + 1) * 128])
                    pred_at = lambda b: (b >= bxmin) & (b <= bxmax)
                if PACKED:
                    vp = jnp.zeros((8, 128), jnp.int32)
                    for b in range(nblk):
                        blk = blk_at(b)
                        cl = cl_all - b * 128
                        g0 = jnp.take_along_axis(
                            blk, jnp.clip(cl, 0, 127), axis=1)
                        vp = jnp.where((cl >= 0) & (cl < 128)
                                       & pred_at(b), g0, vp)
                    v0, v1 = _unpack_taps(vp)
                    if GFWD:
                        half = C // 2
                        if c < half:        # image word: img + gx
                            o_ref[bi, c, rows,
                                  g * 128:(g + 1) * 128] = (
                                v0 * (1 - fx) + v1 * fx)
                            o_ref[bi, half + c, rows,
                                  g * 128:(g + 1) * 128] = (
                                2.0 * (v1 - v0))
                        else:               # y-gradient word
                            o_ref[bi, half + c, rows,
                                  g * 128:(g + 1) * 128] = (
                                v0 * (1 - fx) + v1 * fx)
                        continue
                    out = v0 * (1 - fx) + v1 * fx
                elif NEAREST:
                    # Pure selection — dtype-agnostic: int32 sources (e.g.
                    # the f16-pair-packed plane words of ops/rect_cost.
                    # _pack_m) pass through bit-exactly.
                    v0 = jnp.zeros((8, 128), src_ref.dtype)
                    for b in range(nblk):
                        blk = blk_at(b)
                        cl = cl_all - b * 128
                        g0 = jnp.take_along_axis(
                            blk, jnp.clip(cl, 0, 127), axis=1)
                        v0 = jnp.where((cl >= 0) & (cl < 128)
                                       & pred_at(b), g0, v0)
                    out = v0
                else:
                    v0 = jnp.zeros((8, 128), jnp.float32)
                    v1 = jnp.zeros((8, 128), jnp.float32)
                    for b in range(nblk):
                        blk = blk_at(b)
                        cl = cl_all - b * 128
                        g0 = jnp.take_along_axis(
                            blk, jnp.clip(cl, 0, 127), axis=1)
                        g1 = jnp.take_along_axis(
                            blk, jnp.clip(cl + 1, 0, 127), axis=1)
                        v0 = jnp.where((cl >= 0) & (cl < 128)
                                       & pred_at(b), g0, v0)
                        v1 = jnp.where((cl + 1 >= 0) & (cl + 1 < 128)
                                       & pred_at(b), g1, v1)
                    out = v0 * (1 - fx) + v1 * fx
                o_ref[bi, c, rows, g * 128:(g + 1) * 128] = out

    nrowg = x_ref.shape[1] // 8
    for gi in range(nrowg):
        for g in range(G):
            if TM is None:
                tile(gi, g)
            else:
                # Output-tile skip (TM = [M/8, Ws/128] int32 target mask
                # in SMEM): tiles whose [8, 128] output block holds no
                # consumed coordinate skip ALL work — scratch-window
                # copies included — exactly like the fused cost kernel's
                # footprint skip (pallas_sdg_fused.py).  Skipped output
                # tiles keep stale VMEM contents; callers must never
                # read them (ops/permute2d mask contract).
                @pl.when(TM[pl.program_id(0) * nrowg + gi, g] > 0)
                def _masked_tile(gi=gi, g=g):
                    tile(gi, g)


def _row_gather_kernel_masked(tm_ref, src_ref, x_ref, o_ref, scratch_ref,
                              **kw):
    _row_gather_kernel(src_ref, x_ref, o_ref, scratch_ref, TM=tm_ref, **kw)


@functools.partial(jax.jit, static_argnames=("interpret", "max_span_blocks",
                                              "grad_fwd", "nearest"))
def _row_gather_call(src_chw, x, tm=None, interpret=False,
                     max_span_blocks=None, grad_fwd=False, nearest=False):
    C, H, W = src_chw.shape
    B, M, WS = x.shape
    packed = src_chw.dtype == jnp.int32
    assert not grad_fwd or (packed and C % 2 == 0), \
        "grad_fwd needs a packed [img-taps, gy-taps] source"
    co = C + C // 2 if grad_fwd else C
    nb = W // 128
    span = nb if max_span_blocks is None else min(max_span_blocks, nb)
    # NEAREST wins over PACKED: an int32 source under nearest selection is
    # passed through as opaque words (no bf16 tap unpacking).
    statics = dict(W=W, NB=nb, C=C, G=WS // 128, SPAN=span, B=B,
                   PACKED=packed and not nearest, GFWD=grad_fwd,
                   NEAREST=nearest)
    kernel = (functools.partial(_row_gather_kernel, **statics)
              if tm is None else
              functools.partial(_row_gather_kernel_masked, **statics))
    # Scale the row block down for large batches: x + out blocks are
    # B*(1+co)*br*WS*4 bytes and are double-buffered by the pipeline — at
    # the 16 MB scoped-VMEM edge Mosaic stops overlapping DMA with compute
    # (measured 1.75x per-gather slowdown at B=32, br=32, WS=768 before
    # this clamp; the window_grads path batches K*(ncol+2) sample grids).
    br = BLOCK_ROWS
    while br > 8 and B * (1 + co) * br * WS * 4 > 4 << 20:
        br //= 2
    in_specs = [pl.BlockSpec((C, br, W), lambda i: (0, i, 0)),
                pl.BlockSpec((B, br, WS), lambda i: (0, i, 0))]
    args = (src_chw, x)
    if tm is not None:
        assert tm.shape == (M // 8, WS // 128), (tm.shape, M, WS)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (tm, src_chw, x)
    # NEAREST is pure selection, so the output keeps the source dtype
    # (int32 packed words pass through bit-exactly); the lerp paths emit
    # f32 (packed taps are unpacked in-kernel).
    out_dtype = src_chw.dtype if nearest else jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(M // br,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, co, br, WS), lambda i: (0, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, co, M, WS), out_dtype),
        scratch_shapes=[pltpu.VMEM((8, span * 128), src_chw.dtype)],
        interpret=interpret,
    )(*args)


def pack_taps(src: np.ndarray) -> np.ndarray:
    """Pack both bilinear taps into one int32 word per pixel:
    (bf16(src[..., x]) << 16) | bf16(src[..., x+1]), x+1 edge-clamped.
    Rounds to nearest bf16.  numpy in / numpy out (one-time host setup)."""
    v0 = np.ascontiguousarray(src, np.float32)
    v1 = np.concatenate([v0[..., 1:], v0[..., -1:]], axis=-1)

    def bf16_hi(f):
        b = f.view(np.uint32)
        rounded = (b + 0x7FFF + ((b >> 16) & 1)) >> 16   # round-half-even
        return rounded.astype(np.uint32)

    packed = (bf16_hi(v0) << np.uint32(16)) | bf16_hi(v1)
    return packed.view(np.int32)


def row_gather(src_chw: jnp.ndarray, x: jnp.ndarray,
               interpret: bool = False,
               max_span_blocks: int | None = None,
               grad_fwd: bool = False,
               nearest: bool = False,
               tile_ok: jnp.ndarray | None = None) -> jnp.ndarray:
    """Linear interpolation along rows: out[c, i, j] = lerp(src[c, i, :], x[i, j]).

    src_chw: [C, H, W] with H == x.shape[0] (padded by callers) and
    W % 128 == 0; x: [H, Ws] horizontal sample positions (clamped to edge).
    Returns [C, H, Ws].

    max_span_blocks: caller-guaranteed bound on the number of 128-column
    source blocks any [8, 128] tile of x touches — enables the fast
    scratch-window path (values violating the bound read 0.0, they do not
    fault).  None = no guarantee (full predicated block scan).

    grad_fwd: src_chw is packed [C' img tap-pairs, C' gy tap-pairs] and the
    result has 3C' channels [img, gx, gy] with gx = 2*(v1 - v0) (see the
    kernel docstring).

    tile_ok: optional int32 [ceil(H/8), ceil(Ws/128)] OUTPUT-tile mask —
    [8, 128] output tiles with 0 skip all work (gathers AND scratch-window
    copies) and hold unspecified values; callers must consume only masked-
    on coordinates (ops/permute2d mask contract)."""
    out = row_gather_batch(src_chw, x[None], interpret=interpret,
                           max_span_blocks=max_span_blocks,
                           grad_fwd=grad_fwd, nearest=nearest,
                           tile_ok=tile_ok)
    return out[0]


def row_gather_batch(src_chw: jnp.ndarray, x: jnp.ndarray,
                     interpret: bool = False,
                     max_span_blocks: int | None = None,
                     grad_fwd: bool = False,
                     nearest: bool = False,
                     tile_ok: jnp.ndarray | None = None) -> jnp.ndarray:
    """row_gather for B sample grids sharing one source: x [B, H, Ws] ->
    [B, C, H, Ws] in ONE kernel launch (candidate batching)."""
    C, H, W = src_chw.shape
    B, M, Ws = x.shape
    assert M == H, "sample rows must align with source rows"
    assert W % 128 == 0
    x = jnp.clip(x, 0.0, float(W - 1))
    pad_c = (-Ws) % 128
    pad_r = (-M) % BLOCK_ROWS
    if pad_c or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_r), (0, pad_c)))
        src_chw = jnp.pad(src_chw, ((0, 0), (0, pad_r), (0, 0)))
    if tile_ok is not None:
        th, tw = (M + pad_r) // 8, (Ws + pad_c) // 128
        tm = jnp.zeros((th, tw), jnp.int32)
        tm = tm.at[:tile_ok.shape[0], :tile_ok.shape[1]].set(
            tile_ok.astype(jnp.int32)[:th, :tw])
    else:
        tm = None
    out = _row_gather_call(src_chw, x, tm, interpret=interpret,
                           max_span_blocks=max_span_blocks,
                           grad_fwd=grad_fwd, nearest=nearest)
    if pad_c or pad_r:
        out = out[:, :, :M, :Ws]
    return out


def _row_gather_affine_kernel(sc_ref, src_ref, abc_ref, o_ref, scratch_ref,
                              *, W, NB, C, G, SPAN, K, E, BR, DXS):
    # row_gather with the sample positions computed IN-KERNEL from the
    # per-candidate affine disparity fields: for candidate k, column offset
    # dx = DXS[e], absolute rect row y (+ the window row offset dy carried
    # in SMEM) and rect column x:
    #   xsrc = (x + dx) - clip(a*(x + dx) + b*(y + dy) + c, lo, hi)
    # with (a, b, c) = abc[k, :, y, x].  Replaces the [K*E, Hr, Wr] xsrc
    # materialization (disp/clip fusions, pads, broadcasts — measured ~25%
    # of sweep device time as XLA glue) with a few VPU ops per tile, and
    # shrinks the per-block input DMA E/3-fold (abc is [K, 3, ...] vs
    # [K*E, ...] x).  dy/lo/hi ride in SMEM so all call sites share ONE
    # kernel binary (a static dy would compile nrow+2 variants at 30-60 s
    # each through the remote compile helper).
    dy = sc_ref[0]
    lo = sc_ref[1]
    hi = sc_ref[2]
    xg0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    yg0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    row0 = pl.program_id(0) * BR

    def sample_x(k, e, gi, g, rows):
        av = abc_ref[k, 0, rows, g * 128:(g + 1) * 128]
        bv = abc_ref[k, 1, rows, g * 128:(g + 1) * 128]
        cv = abc_ref[k, 2, rows, g * 128:(g + 1) * 128]
        xse = (xg0 + g * 128 + DXS[e]).astype(jnp.float32)
        yv = (yg0 + row0 + gi * 8).astype(jnp.float32) + dy
        disp = jnp.clip(av * xse + bv * yv + cv, lo, hi)
        xx = jnp.clip(xse - disp, 0.0, float(W - 1))
        x0i = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, W - 2)
        fx = jnp.clip(xx - x0i.astype(jnp.float32), 0.0, 1.0)
        return x0i, fx

    for gi in range(BR // 8):
        rows = pl.ds(gi * 8, 8)
        for g in range(G):
            windowed = SPAN < NB
            if windowed:
                mn = None
                for k in range(K):
                    for e in range(E):
                        x0i, _ = sample_x(k, e, gi, g, rows)
                        mn = x0i if mn is None else jnp.minimum(mn, x0i)
                base = jnp.clip(jnp.min(mn) // 128, 0, NB - SPAN) * 128
                nblk = SPAN
            else:
                nblk = NB
            for c in range(C):
                if windowed:
                    scratch_ref[:, :] = src_ref[c, rows,
                                                pl.ds(base, SPAN * 128)]
                    blk_at = (lambda b:
                              scratch_ref[:, b * 128:(b + 1) * 128])
                for k in range(K):
                    for e in range(E):
                        x0i, fx = sample_x(k, e, gi, g, rows)
                        if windowed:
                            cl_all = x0i - base
                            pred_at = lambda b: True
                        else:
                            bxmin = jnp.min(x0i) // 128
                            bxmax = (jnp.max(x0i) + 1) // 128
                            cl_all = x0i
                            blk_at = (lambda b:
                                      src_ref[c, rows,
                                              b * 128:(b + 1) * 128])
                            pred_at = lambda b: (b >= bxmin) & (b <= bxmax)
                        vp = jnp.zeros((8, 128), jnp.int32)
                        for b in range(nblk):
                            blk = blk_at(b)
                            cl = cl_all - b * 128
                            g0 = jnp.take_along_axis(
                                blk, jnp.clip(cl, 0, 127), axis=1)
                            vp = jnp.where((cl >= 0) & (cl < 128)
                                           & pred_at(b), g0, vp)
                        v0, v1 = _unpack_taps(vp)
                        o_ref[k * E + e, c, rows, g * 128:(g + 1) * 128] = (
                            v0 * (1 - fx) + v1 * fx)


@functools.partial(jax.jit, static_argnames=("dxs", "interpret",
                                              "max_span_blocks"))
def _row_gather_affine_call(src_chw, abc, scalars, dxs, interpret=False,
                            max_span_blocks=None):
    C, H, W = src_chw.shape
    K, three, M, WS = abc.shape
    assert three == 3 and src_chw.dtype == jnp.int32
    E = len(dxs)
    nb = W // 128
    span = nb if max_span_blocks is None else min(max_span_blocks, nb)
    br = BLOCK_ROWS
    while br > 8 and (K * E + K * 3) * br * WS * 4 > 4 << 20:
        br //= 2
    kernel = functools.partial(_row_gather_affine_kernel, W=W, NB=nb, C=C,
                               G=WS // 128, SPAN=span, K=K, E=E, BR=br,
                               DXS=dxs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // br,),
        in_specs=[pl.BlockSpec((C, br, W), lambda i, sc: (0, i, 0)),
                  pl.BlockSpec((K, 3, br, WS), lambda i, sc: (0, 0, i, 0))],
        out_specs=pl.BlockSpec((K * E, C, br, WS),
                               lambda i, sc: (0, 0, i, 0)),
        scratch_shapes=[pltpu.VMEM((8, span * 128), src_chw.dtype)],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K * E, C, M, WS), jnp.float32),
        interpret=interpret,
    )(scalars, src_chw, abc)


def row_gather_affine(src_chw: jnp.ndarray, abc: jnp.ndarray,
                      dxs: tuple, dy, disp_lo, disp_hi,
                      interpret: bool = False,
                      max_span_blocks: int | None = None) -> jnp.ndarray:
    """Packed row gather with in-kernel affine sample positions.

    src_chw: [C, H, W] int32 packed tap words (pack_taps), W % 128 == 0;
    abc: [K, 3, H, Ws] per-candidate affine disparity fields;
    dxs: static tuple of E window column offsets;
    dy / disp_lo / disp_hi: traced scalars (window row offset, disparity
    clamp).  Returns [K*E, C, H, Ws] f32 samples at
    x = (x̂+dx) − clip(a*(x̂+dx) + b*(ŷ+dy) + c, lo, hi), edge-clamped.
    """
    C, H, W = src_chw.shape
    K, _, M, Ws = abc.shape
    assert M == H
    pad_c = (-Ws) % 128
    pad_r = (-M) % BLOCK_ROWS
    if pad_c or pad_r:
        abc = jnp.pad(abc, ((0, 0), (0, 0), (0, pad_r), (0, pad_c)))
        src_chw = jnp.pad(src_chw, ((0, 0), (0, pad_r), (0, 0)))
    scalars = jnp.stack([jnp.float32(dy), jnp.float32(disp_lo),
                         jnp.float32(disp_hi)])
    out = _row_gather_affine_call(src_chw, abc, scalars, tuple(dxs),
                                  interpret=interpret,
                                  max_span_blocks=max_span_blocks)
    if pad_c or pad_r:
        out = out[:, :, :M, :Ws]
    return out
