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

from ..config import (MAXCOST, AlgorithmParams, CostCombination,
                      MatchingAlgorithm)
from . import checkerboard as cb
from .pallas_sampling import bilinear_sample_blocks
from .sampling import bilinear_sample, bilinear_sample_packed


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
    # Source views: flattened 2x2-bilinear-tap table per pixel,
    # [V, H*W, 4*3C] (ops/sampling.pack_bilinear_taps) — one XLA `take`
    # per sample instead of four.
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
    # Block-split source copy [V, NB, 3C, H, 128] for the Pallas sampler.
    src_blocks: jnp.ndarray
    # [H, W] bool: False where the reference window is textureless and the
    # pixel is excluded (NOTEXTURE_CHECK, gipuma.cu:520-584,1209-1234).
    # All-True when the check is disabled.
    texture_ok: jnp.ndarray
    # Spatial (tile) sharding support: this shard's first image row in
    # global coordinates, and the global image height.  0 / H when the
    # scene is unsharded.  Pixel y-coordinates are always global.
    row_offset: jnp.ndarray
    global_h: jnp.ndarray

    @property
    def num_views(self) -> int:
        return self.src.shape[0]

    @property
    def channels(self) -> int:
        return self.src.shape[-1] // 12   # 4 taps x (img, gx, gy) x C


def _l1(x: jnp.ndarray) -> jnp.ndarray:
    """Channel-mean absolute value: l1_norm for float and float4
    (gipuma.cu:171-179 — the *0.3333f three-channel mean)."""
    return jnp.mean(jnp.abs(x), axis=-1)


def _census_bits(center, value, eps):
    """3-way intensity classification (getCTbit_cu, gipuma.cu:362-369):
    0 if center - value > eps, 2 if value - center > eps, else 1."""
    return jnp.where(center - value > eps, 0,
                     jnp.where(value - center > eps, 2, 1))


def per_view_costs(scene: ScenePack, params: AlgorithmParams, parity: int,
                   n: jnp.ndarray, d: jnp.ndarray,
                   view_indices: Sequence[int] | None = None) -> jnp.ndarray:
    """Costs of plane hypothesis (n, d) against each source view.

    n: [H, W2, 3], d: [H, W2] on the parity's active half-grid.
    Returns [V, H, W2] with invalid (NaN/overflow) entries set to MAXCOST
    (gipuma.cu:770-775).

    algorithm == PM: bilaterally-weighted truncated color+gradient cost.
    algorithm == CENSUS: census-transform bit-comparison cost
    (censusTransform_Arma_cu, gipuma.cu:370-450): full window (increment 1,
    center excluded), cost += 1 per differing sign-class bit.
    """
    C = scene.channels
    rays = cb.extract(scene.rays, parity)                  # [H, W2, 3]
    m = n / d[..., None]                                    # plane vector n/d
    mr = jnp.sum(m * rays, axis=-1)                         # (m . r) [H, W2]
    mc0 = jnp.sum(m * scene.k1inv_c0, axis=-1)
    mc1 = jnp.sum(m * scene.k1inv_c1, axis=-1)

    ref_center = scene.ref_img.shifted(0, 0, parity)        # [H, W2, C]
    inv_gamma = 1.0 / params.gamma
    a = params.alpha
    census = params.algorithm == MatchingAlgorithm.CENSUS
    if census:
        # Full window, increment 1, center pixel excluded (gipuma.cu:435-439).
        offsets = [(dx, dy)
                   for dx in range(-params.box_hrad, params.box_hrad + 1)
                   for dy in range(-params.box_vrad, params.box_vrad + 1)
                   if not (dx == 0 and dy == 0)]
    else:
        offsets = params.window_offsets()

    # Window offsets grouped by dx parity so the per-group scan can use
    # static even/odd plane selection (PaddedEO.shifted_dyn).  Scanning
    # instead of unrolling keeps the compiled graph independent of the
    # window area (a box-25 window has 169 sampled offsets).
    groups = {0: [], 1: []}
    for (dx, dy) in offsets:
        groups[dx % 2].append((dx, dy))

    # The view loop is a lax.scan over stacked per-view inputs, NOT a python
    # loop: every view shares one trace, so the compiled program contains a
    # single instance of the (Pallas) sampling kernel per offset group.
    # (With python loops the per-iteration executable held hundreds of
    # embedded kernel copies and overflowed the executable serializer.)
    def view_body(_, view_in):
        Av, bv, srcv, src_blocksv, validv = view_in
        u = jnp.einsum("ij,hwj->hwi", Av, rays) - bv * mr[..., None]
        Ac0 = Av @ scene.k1inv_c0
        Ac1 = Av @ scene.k1inv_c1
        ax = Ac0 - bv * mc0[..., None]                      # [H, W2, 3]
        ay = Ac1 - bv * mc1[..., None]

        # Source images are GLOBAL even when the reference rows are tile-
        # sharded: height from global_h (traced), width from the (full-
        # width) rays array.
        h_img = scene.global_h
        w_img = scene.rays.shape[1]

        def sample(xw, yw):
            if params.use_pallas_sampler:
                return bilinear_sample_blocks(
                    src_blocksv, xw, yw,
                    interpret=jax.default_backend() == "cpu")
            return bilinear_sample_packed(srcv, xw, yw, h_img, w_img)

        if census:
            # Warped center intensity (censusTransform_Arma_cu:429-430).
            xw0 = u[..., 0] / u[..., 2]
            yw0 = u[..., 1] / u[..., 2]
            src_center = jnp.mean(sample(xw0, yw0)[..., :C], axis=-1)
            ref_center_m = jnp.mean(ref_center, axis=-1)

        acc = jnp.zeros(d.shape, dtype=d.dtype)
        for dx_parity, offs in groups.items():
            if not offs:
                continue
            offs_arr = jnp.asarray(np.asarray(offs, dtype=np.int32))

            def step(acc, off, *, _ax=ax, _ay=ay, _u=u,
                     _dx_parity=dx_parity):
                dxi, dyi = off[0], off[1]
                dxf = dxi.astype(d.dtype)
                dyf = dyi.astype(d.dtype)
                pos = _u + dxf * _ax[..., :] + dyf * _ay[..., :]
                xw = pos[..., 0] / pos[..., 2]
                yw = pos[..., 1] / pos[..., 2]
                smp = sample(xw, yw)
                src_i = smp[..., :C]
                ref_i = scene.ref_img.shifted_dyn(dyi, dxi, parity, _dx_parity)
                if census:
                    bit_l = _census_bits(ref_center_m, jnp.mean(ref_i, -1),
                                         params.census_epsilon)
                    bit_r = _census_bits(src_center, jnp.mean(src_i, -1),
                                         params.census_epsilon)
                    return acc + (bit_l != bit_r).astype(acc.dtype), None
                src_gx = smp[..., C:2 * C]
                src_gy = smp[..., 2 * C:]
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
                        | (validv == 0.0), MAXCOST, acc)
        return None, acc

    del view_indices  # views are always all (stacked) views now
    _, out = jax.lax.scan(
        view_body, None,
        (scene.A, scene.b, scene.src, scene.src_blocks, scene.view_valid))
    return out


def combine_view_costs(costs: jnp.ndarray, params: AlgorithmParams,
                       view_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Best-n / good / all combination over the view axis.

    costs: [V, ...] with invalid views already at MAXCOST.  Vectorized
    replacement for sort_small + the combination loop
    (gipuma.cu:779-805).

    view_valid: optional [V] mask (1.0 real view / 0.0 view-sharding pad,
    ScenePack.view_valid).  GOOD divides by the REAL subset size
    (numBest = viewSelectionSubsetNumber, gipuma.cu:785-786), so padded
    slots must not count; with costs the only input, a padded slot's
    MAXCOST is indistinguishable from a real view's invalid MAXCOST.
    BEST_N/ALL count only sub-MAXCOST entries and need no mask.
    """
    V = costs.shape[0]
    num_valid = jnp.sum((costs < MAXCOST).astype(jnp.int32), axis=0)
    csort = jnp.sort(costs, axis=0)

    if params.cost_comb == CostCombination.BEST_N:
        num_best = jnp.minimum(num_valid, params.n_best)
    elif params.cost_comb == CostCombination.ALL:
        num_best = num_valid
    elif params.cost_comb == CostCombination.GOOD:
        if view_valid is None:
            n_real = V
        else:
            n_real = jnp.sum(view_valid.astype(jnp.int32))
        num_best = jnp.full_like(num_valid, n_real)
        thresh = csort[0] * params.good_factor
        # Padded slots sort to the tail (MAXCOST); taking the n_real
        # smallest clamped entries reproduces the reference's sum over
        # its n_real-entry cost vector exactly.
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
    return combine_view_costs(per_view_costs(scene, params, parity, n, d),
                              params, view_valid=scene.view_valid)
