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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Rows per grid step: bounds VMEM (the whole-array variant ran out of the
# 16 MB scoped VMEM at DTU-rect shapes) and lets the pipeline overlap the
# source-row DMA with compute.
BLOCK_ROWS = 32


def _row_gather_kernel(src_ref, x_ref, o_ref, *, W, NB, C, G):
    # Per [8, 128] tile of samples: the needed source rows are exactly the
    # tile's own rows; only the x-block range is dynamic (scalar-predicated).
    def group(gi, _):
        rows = pl.ds(gi * 8, 8)
        for g in range(G):                 # static sample column groups
            xx = x_ref[rows, g * 128:(g + 1) * 128]
            x0i = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, W - 2)
            fx = jnp.clip(xx - x0i.astype(jnp.float32), 0.0, 1.0)
            bxmin = jnp.min(x0i) // 128
            bxmax = (jnp.max(x0i) + 1) // 128
            for c in range(C):
                v0 = jnp.zeros((8, 128), jnp.float32)
                v1 = jnp.zeros((8, 128), jnp.float32)
                for b in range(NB):        # static, scalar-predicated
                    pred = (b >= bxmin) & (b <= bxmax)
                    blk = src_ref[c, rows, b * 128:(b + 1) * 128]  # [8,128]
                    cl = x0i - b * 128
                    g0 = jnp.take_along_axis(blk, jnp.clip(cl, 0, 127),
                                             axis=1)
                    g1 = jnp.take_along_axis(blk, jnp.clip(cl + 1, 0, 127),
                                             axis=1)
                    v0 = jnp.where((cl >= 0) & (cl < 128) & pred, g0, v0)
                    v1 = jnp.where((cl + 1 >= 0) & (cl + 1 < 128) & pred,
                                   g1, v1)
                o_ref[c, rows, g * 128:(g + 1) * 128] = \
                    v0 * (1 - fx) + v1 * fx
        return 0

    jax.lax.fori_loop(0, x_ref.shape[0] // 8, group, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _row_gather_call(src_chw, x, interpret=False):
    C, H, W = src_chw.shape
    M, WS = x.shape
    kernel = functools.partial(_row_gather_kernel, W=W, NB=W // 128,
                               C=C, G=WS // 128)
    br = BLOCK_ROWS
    return pl.pallas_call(
        kernel,
        grid=(M // br,),
        in_specs=[pl.BlockSpec((C, br, W), lambda i: (0, i, 0)),
                  pl.BlockSpec((br, WS), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((C, br, WS), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((C, M, WS), jnp.float32),
        interpret=interpret,
    )(src_chw, x)


def row_gather(src_chw: jnp.ndarray, x: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """Linear interpolation along rows: out[c, i, j] = lerp(src[c, i, :], x[i, j]).

    src_chw: [C, H, W] with H == x.shape[0] (padded by callers) and
    W % 128 == 0; x: [H, Ws] horizontal sample positions (clamped to edge).
    Returns [C, H, Ws]."""
    C, H, W = src_chw.shape
    M, Ws = x.shape
    assert M == H, "sample rows must align with source rows"
    assert W % 128 == 0
    x = jnp.clip(x, 0.0, float(W - 1))
    pad_c = (-Ws) % 128
    pad_r = (-M) % BLOCK_ROWS
    if pad_c or pad_r:
        x = jnp.pad(x, ((0, pad_r), (0, pad_c)))
        src_chw = jnp.pad(src_chw, ((0, 0), (0, pad_r), (0, 0)))
    out = _row_gather_call(src_chw, x, interpret=interpret)
    if pad_c or pad_r:
        out = out[:, :M, :Ws]
    return out
