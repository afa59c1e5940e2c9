"""Rectified-frame window cost — prototype of the round-2 fast path.

Computes the bilaterally-weighted color+gradient window cost of plane
hypotheses ON a rectified pair's pixel grid, where everything is dense:

* reference-side window reads and weights are static SHIFTS of the
  rectified reference image (integer grid offsets);
* the source read for window offset (i, j) sits on rect row ŷ+j (static
  shift) at column x̂+i − disp(x̂+i, ŷ+j), where disp is AFFINE in rect
  coordinates (geometry/rectify.py) — a row-aligned horizontal gather
  (ops/pallas_rowgather.py, 35 G samples/s measured on v5e).

The caller supplies the plane field already expressed on the rect grid as
disparity coefficients (a, b, c) per pixel — see
geometry.rectify.plane_disparity_coeffs; mapping PatchMatch's reference-grid
state to/from rect grids is the round-2 integration work (ROADMAP.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MAXCOST, AlgorithmParams
from .pallas_rowgather import row_gather


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
