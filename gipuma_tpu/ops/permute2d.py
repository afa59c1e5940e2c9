"""Exact 2-D nearest-neighbor permutation as two row-aligned gather passes.

The rectified cost path (ROADMAP.md, ops/rect_cost.py) needs two per-pair
static permutations every candidate evaluation:

* state -> rect grid: plane vectors m at the active reference pixel nearest
  to each rectified pixel;
* rect grid -> state: the per-view cost back at each active pixel's
  rectified position.

XLA's gather costs ~140 M indices/s on v5e (per-index, CLAUDE.md) — far too
slow to run per candidate.  This module decomposes an arbitrary *smooth*
nearest-neighbor map out[s, l] = in[R[s, l], C[s, l]] into two passes that
each are a row-aligned horizontal gather (ops/pallas_rowgather.row_gather,
~35 G samples/s measured):

    pass 1 (horizontal):  A[r, l] = in[r, C1[r, l]]      r in [0, in_h)
    pass 2 (vertical):    out[s, l] = A[R[s, l], l]       (row_gather on
                                                           transposed data)

Exactness requires a consistent pass-1 table: C1[R[s, l], l] == C[s, l] for
every (s, l).  This holds whenever, per output column l, no two output rows
need the same input row at different input columns — true for rectification
homographies (vertically monotonic, mild shear), and *verified at table
build time*: `build_tables` reports the residual, and callers fall back to
XLA take when it is nonzero.  Both index tables are plain static arrays
computed once per (pair, parity) with numpy.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .pallas_rowgather import row_gather


class PermuteTables(NamedTuple):
    """Static index tables of one smooth-map permutation (a pytree).

    c1: [in_h, out_w] float32 — pass-1 horizontal gather positions;
    r:  [out_h, out_w] float32 — pass-2 row indices (the map's R);
    in_h, in_w: source shape (python ints, static);
    conflicts: number of (s, l) pairs whose exact value is unreachable
        (C1 slot contention; 0 for all rectification maps in practice —
        affected outputs read a horizontal neighbor of the wanted pixel).
    """

    c1: np.ndarray
    r: np.ndarray
    in_h: int
    in_w: int
    conflicts: int
    # [out_h, out_w] bool: outputs whose slot lost the contention and will
    # read a horizontally adjacent input pixel instead of the exact one.
    affected: np.ndarray


def _smooth_fill(R: np.ndarray, C: np.ndarray, valid: np.ndarray,
                 in_h: int, in_w: int) -> np.ndarray:
    """Per-column inverse-map interpolation: the ideal pass-1 table
    C1[r, l] = C at the output row s where R(s, l) == r.  Used as the fill
    for unwritten/contended slots so the table stays SMOOTH — junk fills
    would blow up the per-tile span the scratch-window gather relies on.

    Fully vectorized (one argsort + one searchsorted over all columns via
    the per-column-offset-key trick): the previous per-column
    np.interp loop dominated rect-scene build time at image scale."""
    out_h, out_w = R.shape
    rows = np.arange(in_h, dtype=np.float64)

    # Sort each column's valid (R, C) pairs by R; invalids sort to the end.
    big = float(in_h + 2)
    xp = np.where(valid, R.astype(np.float64), big)
    order = np.argsort(xp, axis=0, kind="stable")
    xs = np.take_along_axis(xp, order, axis=0).T            # [out_w, out_h]
    fs = np.take_along_axis(C.astype(np.float64), order, axis=0).T
    cnt = valid.sum(axis=0)                                 # [out_w]
    good = cnt >= 2

    # Per-column searchsorted of the row grid, batched with offset keys:
    # column l's sorted xs live in [l*stride, (l+1)*stride) of the flat key
    # space, so one global searchsorted answers every (column, row) query.
    stride = big + 1.0
    colkey = np.arange(out_w, dtype=np.float64) * stride
    flat_xs = (xs + colkey[:, None]).ravel()
    flat_q = (rows[None, :] + colkey[:, None]).ravel()
    pos = np.searchsorted(flat_xs, flat_q, side="right")
    pos = pos.reshape(out_w, in_h) - np.arange(out_w)[:, None] * out_h
    hi = np.clip(pos, 1, np.maximum(cnt, 2)[:, None] - 1)
    lo = hi - 1
    x0 = np.take_along_axis(xs, lo, axis=1)
    x1 = np.take_along_axis(xs, hi, axis=1)
    f0 = np.take_along_axis(fs, lo, axis=1)
    f1 = np.take_along_axis(fs, hi, axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        t = (rows[None, :] - x0) / (x1 - x0)
    t = np.clip(np.where(np.isfinite(t), t, 0.0), 0.0, 1.0)
    fill_t = f0 + t * (f1 - f0)                             # [out_w, in_h]

    if good.any() and not good.all():
        # Columns with no valid writers copy the nearest filled column —
        # a 0-fill next to real values would blow up the per-tile span.
        good_idx = np.nonzero(good)[0]
        p = np.clip(np.searchsorted(good_idx, np.arange(out_w)),
                    1, len(good_idx) - 1) if len(good_idx) > 1 else \
            np.zeros(out_w, np.int64)
        left = good_idx[np.maximum(p - 1, 0)]
        right = good_idx[np.minimum(p, len(good_idx) - 1)]
        nearest = np.where(np.abs(left - np.arange(out_w))
                           <= np.abs(right - np.arange(out_w)), left, right)
        bad = ~good
        fill_t[bad] = fill_t[nearest[bad]]
    elif not good.any():
        fill_t[:] = 0.0

    return np.clip(np.round(fill_t.T), 0, in_w - 1).astype(np.int64)


def build_tables(R: np.ndarray, C: np.ndarray, in_h: int, in_w: int,
                 valid: np.ndarray | None = None) -> PermuteTables:
    """Build 2-pass tables for out[s, l] = in[R[s, l], C[s, l]].

    R, C: integer arrays [out_h, out_w]; values are clipped into range.
    valid: optional [out_h, out_w] bool — outputs whose exact value does
        not matter (e.g. the map left the source image and was clamped).
        They are excluded from table construction so they cannot steal
        slots from real outputs, and read whatever their slot holds.
    """
    R = np.clip(np.asarray(R, np.int64), 0, in_h - 1)
    C = np.clip(np.asarray(C, np.int64), 0, in_w - 1)
    out_h, out_w = R.shape
    if valid is None:
        valid = np.ones(R.shape, bool)
    l = np.broadcast_to(np.arange(out_w), R.shape)
    flat = (R * out_w + l)[valid]

    # Scatter C into the pass-1 table; detect slot contention by comparing
    # min- and max-scatters (same-value collisions are harmless).
    cmin = np.full(in_h * out_w, np.iinfo(np.int64).max, np.int64)
    cmax = np.full(in_h * out_w, -1, np.int64)
    np.minimum.at(cmin, flat, C[valid])
    np.maximum.at(cmax, flat, C[valid])
    written = cmax >= 0
    conflicts = int(np.sum((cmax - cmin)[written] > 0))

    fill = _smooth_fill(R, C, valid, in_h, in_w).ravel()
    c1 = np.where(written, np.clip(cmin, 0, in_w - 1), fill)
    affected = (c1[R * out_w + l] != C) & valid
    c1 = c1.reshape(in_h, out_w).astype(np.float32)
    return PermuteTables(c1=c1, r=R.astype(np.float32), in_h=in_h,
                         in_w=in_w, conflicts=conflicts, affected=affected)


def _pad128(a: jnp.ndarray) -> jnp.ndarray:
    pad = (-a.shape[-1]) % 128
    if pad:
        a = jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, pad),))
    return a


def permute2d(x: jnp.ndarray, c1: jnp.ndarray, r: jnp.ndarray,
              interpret: bool = False,
              max_span_blocks: int | None = None,
              mask1: jnp.ndarray | None = None,
              mask2: jnp.ndarray | None = None) -> jnp.ndarray:
    """Apply a 2-pass permutation built by `build_tables`.

    x: [in_h, in_w] or [C, in_h, in_w]; c1: [in_h, out_w]; r: [out_h, out_w].
    Returns [out_h, out_w] / [C, out_h, out_w].  The tables are traced
    arguments (pass the same python object to stay cache-friendly), so
    jitted callers don't bake multi-megabyte constants into the executable
    (TPU remote-compile request limits — CLAUDE.md).

    max_span_blocks: static bound on both passes' per-tile index span
    (measure with `tile_span_blocks` at build time) — enables the gather
    kernel's fast scratch-window path.

    mask1 / mask2: optional int32 output-tile masks for the two gather
    passes (see models/rect_scene.build_permute_masks): mask1 is
    [ceil(in_h/8), ceil(out_w/128)] over pass 1's [in_h, out_w] output,
    mask2 is [ceil(out_w/8), ceil(out_h/128)] over pass 2's TRANSPOSED
    [out_w, out_h] output.  Masked-off [8, 128] tiles do no work and hold
    unspecified values; the caller guarantees it only consumes final
    coordinates whose whole 2-pass chain is masked on.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    out_h, out_w = r.shape

    a = row_gather(_pad128(x), c1, interpret=interpret,
                   max_span_blocks=max_span_blocks,
                   nearest=True, tile_ok=mask1)               # [C, in_h, out_w]
    a_t = jnp.swapaxes(a, 1, 2)                               # [C, out_w, in_h]
    r_t = jnp.swapaxes(r, 0, 1)                               # [out_w, out_h]
    o_t = row_gather(_pad128(a_t), r_t, interpret=interpret,
                     max_span_blocks=max_span_blocks,
                     nearest=True, tile_ok=mask2)             # [C, out_w, out_h]
    out = jnp.swapaxes(o_t, 1, 2)
    return out[0] if squeeze else out


def tile_span_blocks(x: np.ndarray) -> int:
    """Worst-case number of 128-column source blocks any [8, 128] tile of
    gather positions `x` touches (the row_gather scratch-window bound),
    accounting for arbitrary 128-block alignment of the window base."""
    h, w = x.shape
    hp, wp = -(-h // 8) * 8, -(-w // 128) * 128
    xp = np.pad(x, ((0, hp - h), (0, wp - w)), mode="edge")
    tiles = xp.reshape(hp // 8, 8, wp // 128, 128)
    x0 = np.floor(tiles).astype(np.int64)
    mn = x0.min(axis=(1, 3))
    mx = x0.max(axis=(1, 3)) + 1
    return int(((mx - (mn // 128) * 128) // 128 + 1).max())


def permute2d_take(x: jnp.ndarray, R: jnp.ndarray, C: jnp.ndarray
                   ) -> jnp.ndarray:
    """XLA-gather fallback (slow, exact for any map): same contract with
    integer index arrays R, C of shape [out_h, out_w]."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    ch, in_h, in_w = x.shape
    flat = (R.astype(jnp.int32) * in_w + C.astype(jnp.int32)).ravel()
    out = jnp.take(x.reshape(ch, in_h * in_w), flat, axis=1)
    out = out.reshape(ch, *R.shape)
    return out[0] if squeeze else out
