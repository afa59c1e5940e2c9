"""Multiview PatchMatch photoconsistency cost — exact-formula jnp engine.

Implements the reference's bilaterally-weighted truncated color+gradient
cost (pmCost / pmCostComputation, gipuma.cu:223-320,455-518) and the
multi-view best-n aggregation (pmCostMultiview_cu, gipuma.cu:720-806),
re-shaped for TPU:

* fully vectorized over the dense checkerboard half-grid [H, W/2] — no
  per-pixel scalar threads;
* the per-(pixel, hypothesis, view) 3x3 homography of getHomography_cu
  (gipuma.cu:339-356) is replaced by its rank-1 form (see
  geometry/transforms.py) and by the observation that the warp is *affine*
  in the window offsets: warp(p + (i, j)) = u + i*ax + j*ay before
  dehomogenization, so per window sample only 2 fused multiply-adds of
  3-vectors are needed;
* reference-image window reads and bilateral weights are static strided
  slices (ops/checkerboard.py), not gathers;
* source-view reads are bilinear gathers of packed (img, gx, gy) channels
  (ops/sampling.py).

The insertion sort + best-n combination (sort_small, gipuma.cu:684-693,
779-805) becomes a vectorized jnp.sort over the (tiny) view axis.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import numpy as np
import jax.numpy as jnp

from ..config import MAXCOST, AlgorithmParams, CostCombination
from . import checkerboard as cb
from .sampling import bilinear_sample


class ScenePack(NamedTuple):
    """All per-run device state the cost evaluation needs (a pytree).

    TPU analog of GlobalState + texture objects (globalstate.h:24-45,
    main.cpp:509-656): images and derived channels live as dense arrays.
    """

    # Reference image, padded + even/odd split for window access: each a
    # PaddedEO of [H + 2pr, .., C].
    ref_img: cb.PaddedEO
    ref_gx: cb.PaddedEO
    ref_gy: cb.PaddedEO
    # Source views packed (img, gx, gy) channel-last: [V, H, W, 3*C].
    src: jnp.ndarray
    # Warp constants per source view: H p = A r - b (m . r), r = K1inv p.
    A: jnp.ndarray          # [V, 3, 3]
    b: jnp.ndarray          # [V, 3]
    k1inv_c0: jnp.ndarray   # [3] first column of reference K^-1
    k1inv_c1: jnp.ndarray   # [3]
    rays: jnp.ndarray       # [H, W, 3] K1inv (x, y, 1)
    view_vec: jnp.ndarray   # [H, W, 3] unit rays camera->pixel (gipuma.cu:122)
    # Reference-camera scalars (reference shared-K semantics, see
    # cameraGeometryUtils.h:314-323).
    fx: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    alpha_focal: jnp.ndarray    # fx / fy
    f: jnp.ndarray              # disparity-conversion focal (= fx)
    baseline: jnp.ndarray       # fake baseline 0.54
    M_inv: jnp.ndarray          # [3, 3] reference camera
    P_col4: jnp.ndarray         # [3]
    R_orig_inv: jnp.ndarray     # [3, 3] reference camera world rotation
    depth_min: jnp.ndarray
    depth_max: jnp.ndarray
    # [V] 1.0 for real views, 0.0 for padding (views are padded to a
    # multiple of the view-mesh axis; padded views cost MAXCOST = invalid).
    view_valid: jnp.ndarray

    @property
    def num_views(self) -> int:
        return self.src.shape[0]

    @property
    def channels(self) -> int:
        return self.src.shape[-1] // 3


def _l1(x: jnp.ndarray) -> jnp.ndarray:
    """Channel-mean absolute value: l1_norm for float and float4
    (gipuma.cu:171-179 — the *0.3333f three-channel mean)."""
    return jnp.mean(jnp.abs(x), axis=-1)


def per_view_costs(scene: ScenePack, params: AlgorithmParams, parity: int,
                   n: jnp.ndarray, d: jnp.ndarray,
                   view_indices: Sequence[int] | None = None) -> jnp.ndarray:
    """Costs of plane hypothesis (n, d) against each source view.

    n: [H, W2, 3], d: [H, W2] on the parity's active half-grid.
    Returns [V, H, W2] with invalid (NaN/overflow) entries set to MAXCOST
    (gipuma.cu:770-775).
    """
    C = scene.channels
    rays = cb.extract(scene.rays, parity)                  # [H, W2, 3]
    m = n / d[..., None]                                    # plane vector n/d
    mr = jnp.sum(m * rays, axis=-1)                         # (m . r) [H, W2]
    mc0 = jnp.sum(m * scene.k1inv_c0, axis=-1)
    mc1 = jnp.sum(m * scene.k1inv_c1, axis=-1)

    ref_center = scene.ref_img.shifted(0, 0, parity)        # [H, W2, C]
    offsets = params.window_offsets()
    inv_gamma = 1.0 / params.gamma
    a = params.alpha

    # Window offsets grouped by dx parity so the per-group scan can use
    # static even/odd plane selection (PaddedEO.shifted_dyn).  Scanning
    # instead of unrolling keeps the compiled graph independent of the
    # window area (a box-25 window has 169 sampled offsets).
    groups = {0: [], 1: []}
    for (dx, dy) in offsets:
        groups[dx % 2].append((dx, dy))

    views = range(scene.num_views) if view_indices is None else view_indices
    out = []
    for v in views:
        Av, bv = scene.A[v], scene.b[v]
        u = jnp.einsum("ij,hwj->hwi", Av, rays) - bv * mr[..., None]
        Ac0 = Av @ scene.k1inv_c0
        Ac1 = Av @ scene.k1inv_c1
        ax = Ac0 - bv * mc0[..., None]                      # [H, W2, 3]
        ay = Ac1 - bv * mc1[..., None]
        acc = jnp.zeros(d.shape, dtype=d.dtype)
        for dx_parity, offs in groups.items():
            if not offs:
                continue
            offs_arr = jnp.asarray(np.asarray(offs, dtype=np.int32))

            def step(acc, off, *, _ax=ax, _ay=ay, _u=u, _v=v,
                     _dx_parity=dx_parity):
                dxi, dyi = off[0], off[1]
                dxf = dxi.astype(d.dtype)
                dyf = dyi.astype(d.dtype)
                pos = _u + dxf * _ax[..., :] + dyf * _ay[..., :]
                xw = pos[..., 0] / pos[..., 2]
                yw = pos[..., 1] / pos[..., 2]
                smp = bilinear_sample(scene.src[_v], xw, yw)  # [H, W2, 3C]
                src_i = smp[..., :C]
                src_gx = smp[..., C:2 * C]
                src_gy = smp[..., 2 * C:]
                ref_i = scene.ref_img.shifted_dyn(dyi, dxi, parity, _dx_parity)
                ref_gx = scene.ref_gx.shifted_dyn(dyi, dxi, parity, _dx_parity)
                ref_gy = scene.ref_gy.shifted_dyn(dyi, dxi, parity, _dx_parity)
                # Bilateral weight (weight_cu, gipuma.cu:186-193).
                w = jnp.exp(-_l1(ref_i - ref_center) * inv_gamma)
                col = jnp.minimum(_l1(ref_i - src_i), params.tau_color)
                grad = jnp.minimum(
                    (_l1(ref_gx - src_gx) + _l1(ref_gy - src_gy)) * 0.0625,
                    params.tau_gradient)
                return acc + w * ((1.0 - a) * col + a * grad), None

            acc, _ = jax.lax.scan(step, acc, offs_arr)
        # Invalid-view guard (gipuma.cu:770-775): NaN or >= MAXCOST; padded
        # views are always invalid.
        acc = jnp.where(jnp.isnan(acc) | (acc >= MAXCOST)
                        | (scene.view_valid[v] == 0.0), MAXCOST, acc)
        out.append(acc)
    return jnp.stack(out, axis=0)


def combine_view_costs(costs: jnp.ndarray, params: AlgorithmParams) -> jnp.ndarray:
    """Best-n / good / all combination over the view axis.

    costs: [V, ...] with invalid views already at MAXCOST.  Vectorized
    replacement for sort_small + the combination loop
    (gipuma.cu:779-805).
    """
    V = costs.shape[0]
    num_valid = jnp.sum((costs < MAXCOST).astype(jnp.int32), axis=0)
    csort = jnp.sort(costs, axis=0)

    if params.cost_comb == CostCombination.BEST_N:
        num_best = jnp.minimum(num_valid, params.n_best)
    elif params.cost_comb == CostCombination.ALL:
        num_best = num_valid
    elif params.cost_comb == CostCombination.GOOD:
        num_best = jnp.full_like(num_valid, V)
        thresh = csort[0] * params.good_factor
        csort = jnp.minimum(csort, thresh)
    else:
        raise NotImplementedError(f"cost_comb={params.cost_comb}")

    rank = jax.lax.broadcasted_iota(jnp.int32, csort.shape, 0)
    take = rank < num_best
    total = jnp.sum(jnp.where(take, csort, 0.0), axis=0)
    denom = jnp.maximum(num_best, 1).astype(costs.dtype)
    cost = total / denom
    cost = jnp.where(num_best < 1, MAXCOST, cost)
    # Final guard (gipuma.cu:802-803).
    bad = jnp.isnan(cost) | (cost > MAXCOST) | (cost < 0.0)
    return jnp.where(bad, MAXCOST, cost)


def multiview_cost(scene: ScenePack, params: AlgorithmParams, parity: int,
                   n: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Full pmCostMultiview: per-view costs then combination. [H, W2]."""
    return combine_view_costs(per_view_costs(scene, params, parity, n, d), params)
