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
                       SPAN, B, PACKED):
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
    # PACKED: int32 source where each word packs BOTH bilinear taps
    # (bf16(src[x]) << 16 | bf16(src[x+1])) — built by pack_taps().  One
    # dynamic_gather then serves both taps; gathers are the measured
    # bottleneck of the whole engine (~16 cycles each on v5e), so this is a
    # ~1.8x kernel speedup for ~0.2% tap quantization (|err| <= 0.5/128 of
    # the value, well under the photometric noise MVS costs tolerate).
    def lerp_packed(vp, fx):
        v0, v1 = _unpack_taps(vp)
        return v0 * (1 - fx) + v1 * fx

    def group(bi, gi):
        rows = pl.ds(gi * 8, 8)
        for g in range(G):                 # static sample column groups
            xx = x_ref[bi, rows, g * 128:(g + 1) * 128]
            x0i = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, W - 2)
            fx = jnp.clip(xx - x0i.astype(jnp.float32), 0.0, 1.0)
            if SPAN < NB:
                base = jnp.clip(jnp.min(x0i) // 128, 0, NB - SPAN) * 128
                cl_all = x0i - base
                for c in range(C):
                    scratch_ref[:, :] = src_ref[c, rows,
                                                pl.ds(base, SPAN * 128)]
                    if PACKED:
                        vp = jnp.zeros((8, 128), jnp.int32)
                        for b in range(SPAN):
                            blk = scratch_ref[:, b * 128:(b + 1) * 128]
                            cl = cl_all - b * 128
                            g0 = jnp.take_along_axis(
                                blk, jnp.clip(cl, 0, 127), axis=1)
                            vp = jnp.where((cl >= 0) & (cl < 128), g0, vp)
                        out = lerp_packed(vp, fx)
                    else:
                        v0 = jnp.zeros((8, 128), jnp.float32)
                        v1 = jnp.zeros((8, 128), jnp.float32)
                        for b in range(SPAN):
                            blk = scratch_ref[:, b * 128:(b + 1) * 128]
                            cl = cl_all - b * 128
                            g0 = jnp.take_along_axis(
                                blk, jnp.clip(cl, 0, 127), axis=1)
                            g1 = jnp.take_along_axis(
                                blk, jnp.clip(cl + 1, 0, 127), axis=1)
                            v0 = jnp.where((cl >= 0) & (cl < 128), g0, v0)
                            v1 = jnp.where((cl + 1 >= 0) & (cl + 1 < 128),
                                           g1, v1)
                        out = v0 * (1 - fx) + v1 * fx
                    o_ref[bi, c, rows, g * 128:(g + 1) * 128] = out
            else:
                bxmin = jnp.min(x0i) // 128
                bxmax = (jnp.max(x0i) + 1) // 128
                for c in range(C):
                    if PACKED:
                        vp = jnp.zeros((8, 128), jnp.int32)
                        for b in range(NB):    # static, scalar-predicated
                            pred = (b >= bxmin) & (b <= bxmax)
                            blk = src_ref[c, rows, b * 128:(b + 1) * 128]
                            cl = x0i - b * 128
                            g0 = jnp.take_along_axis(
                                blk, jnp.clip(cl, 0, 127), axis=1)
                            vp = jnp.where((cl >= 0) & (cl < 128) & pred,
                                           g0, vp)
                        out = lerp_packed(vp, fx)
                    else:
                        v0 = jnp.zeros((8, 128), jnp.float32)
                        v1 = jnp.zeros((8, 128), jnp.float32)
                        for b in range(NB):    # static, scalar-predicated
                            pred = (b >= bxmin) & (b <= bxmax)
                            blk = src_ref[c, rows, b * 128:(b + 1) * 128]
                            cl = x0i - b * 128
                            g0 = jnp.take_along_axis(
                                blk, jnp.clip(cl, 0, 127), axis=1)
                            g1 = jnp.take_along_axis(
                                blk, jnp.clip(cl + 1, 0, 127), axis=1)
                            v0 = jnp.where((cl >= 0) & (cl < 128) & pred,
                                           g0, v0)
                            v1 = jnp.where((cl + 1 >= 0) & (cl + 1 < 128)
                                           & pred, g1, v1)
                        out = v0 * (1 - fx) + v1 * fx
                    o_ref[bi, c, rows, g * 128:(g + 1) * 128] = out

    for bi in range(B):
        for gi in range(x_ref.shape[1] // 8):
            group(bi, gi)


@functools.partial(jax.jit, static_argnames=("interpret", "max_span_blocks"))
def _row_gather_call(src_chw, x, interpret=False, max_span_blocks=None):
    C, H, W = src_chw.shape
    B, M, WS = x.shape
    packed = src_chw.dtype == jnp.int32
    nb = W // 128
    span = nb if max_span_blocks is None else min(max_span_blocks, nb)
    kernel = functools.partial(_row_gather_kernel, W=W, NB=nb,
                               C=C, G=WS // 128, SPAN=span, B=B,
                               PACKED=packed)
    br = BLOCK_ROWS
    return pl.pallas_call(
        kernel,
        grid=(M // br,),
        in_specs=[pl.BlockSpec((C, br, W), lambda i: (0, i, 0)),
                  pl.BlockSpec((B, br, WS), lambda i: (0, i, 0))],
        out_specs=pl.BlockSpec((B, C, br, WS), lambda i: (0, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, M, WS), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, span * 128), src_chw.dtype)],
        interpret=interpret,
    )(src_chw, x)


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
               max_span_blocks: int | None = None) -> jnp.ndarray:
    """Linear interpolation along rows: out[c, i, j] = lerp(src[c, i, :], x[i, j]).

    src_chw: [C, H, W] with H == x.shape[0] (padded by callers) and
    W % 128 == 0; x: [H, Ws] horizontal sample positions (clamped to edge).
    Returns [C, H, Ws].

    max_span_blocks: caller-guaranteed bound on the number of 128-column
    source blocks any [8, 128] tile of x touches — enables the fast
    scratch-window path (values violating the bound read 0.0, they do not
    fault).  None = no guarantee (full predicated block scan)."""
    out = row_gather_batch(src_chw, x[None], interpret=interpret,
                           max_span_blocks=max_span_blocks)
    return out[0]


def row_gather_batch(src_chw: jnp.ndarray, x: jnp.ndarray,
                     interpret: bool = False,
                     max_span_blocks: int | None = None) -> jnp.ndarray:
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
    out = _row_gather_call(src_chw, x, interpret=interpret,
                           max_span_blocks=max_span_blocks)
    if pad_c or pad_r:
        out = out[:, :, :M, :Ws]
    return out
