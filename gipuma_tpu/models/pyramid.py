"""Coarse-to-fine (pyramid) PatchMatch — an acceleration the reference
does not have (it always runs all iterations at full resolution,
gipuma.cu:1911-1941).

Most PatchMatch iterations exist to PROPAGATE good hypotheses across the
image; propagation distance per iteration is resolution-independent in
pixels, so running the early iterations on a 2x-downsampled image covers
the same physical distance at 1/4 the sampling cost.  The final level(s)
run at full resolution warm-started from the upsampled coarse plane field
(utils/checkpoint.warm_start — plane normals and distances are
resolution-independent world quantities, so they transfer exactly).

Quality is validated against the single-level engine on the synthetic-GT
suite (tests/test_pyramid.py): the refinement floor is identical because
the final level runs the same full-resolution refinement schedule.
"""
from __future__ import annotations

import functools as _ft
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AlgorithmParams
from ..geometry.camera import FAKE_BASELINE, Rig, build_rig
from ..ops.cost import multiview_cost
from .patchmatch import finalize, run_patchmatch_host_loop
from .scene import build_scene, ensure_even_width

# Module-level jit (one cache for all runs): an eager finalize — or a jit
# wrapper recreated per call — would dispatch/retrace per depth-map job.
_jfin = jax.jit(finalize)


def _up2_jnp(a: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Device-side upsample2_to: nearest 2x, cropped/edge-padded to
    exactly [h, w, ...] (h, w static under jit)."""
    up = jnp.repeat(jnp.repeat(a, 2, axis=0), 2, axis=1)
    up = up[:h, :w]
    pad = [(0, h - up.shape[0]), (0, w - up.shape[1])]
    pad += [(0, 0)] * (up.ndim - 2)
    return jnp.pad(up, pad, mode="edge")


@_ft.lru_cache(maxsize=None)
def _handoff_jit(cost_fn):
    """Device-side level hand-off: finalize the coarse level, 2x-upsample
    depth + world normals, and warm-start the fine level — ONE dispatch,
    no host round-trip.  The previous host path (np.asarray the coarse
    result, numpy upsample, re-upload for warm_start) moved ~8 MB through
    the TPU relay per dino-scale run and serialized on the fetch.

    Cache key: cost_fn must be a MODULE-LEVEL function (multiview_cost /
    rect_multiview_cost — what _level_scene returns).  A per-run closure
    (e.g. the parallel layer's view-sharded cost_fn) would leak one
    compiled executable per run; the parallel runners don't go through
    the pyramid hand-off, so this is an invariant, not a live risk."""
    from ..utils.checkpoint import _warm_start_impl

    def impl(state_c, scene_c, scene_f, params_f, key):
        depth_c, n_world_c, cost_c = finalize(state_c, scene_c)
        h, w = scene_f.rays.shape[:2]
        depth_up = _up2_jnp(depth_c, h, w)
        normals_up = _up2_jnp(n_world_c, h, w)
        # pyramid_carry_cost: reuse the (approximately scale-invariant)
        # coarse window cost instead of re-evaluating the warm-start field
        # — skips two K=1 multiview evaluations per fine level.
        cost_up = (_up2_jnp(cost_c, h, w) if params_f.pyramid_carry_cost
                   else None)
        return _warm_start_impl(scene_f, params_f, key, depth_up,
                                normals_up, cost_fn=cost_fn,
                                cost_init=cost_up)

    return jax.jit(impl, static_argnames=("params_f",))


def downscale2(img: np.ndarray) -> np.ndarray:
    """2x box-filter downscale ([H, W] or [H, W, C]); odd tails cropped."""
    img = np.asarray(img, np.float32)
    h2 = (img.shape[0] // 2) * 2
    w2 = (img.shape[1] // 2) * 2
    im = img[:h2, :w2]
    return 0.25 * (im[0::2, 0::2] + im[1::2, 0::2]
                   + im[0::2, 1::2] + im[1::2, 1::2])


def upsample2_to(a: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest 2x upsample, cropped/edge-padded to exactly [h, w, ...]."""
    up = np.repeat(np.repeat(a, 2, axis=0), 2, axis=1)
    up = up[:h, :w]
    pad = [(0, h - up.shape[0]), (0, w - up.shape[1])]
    pad += [(0, 0)] * (up.ndim - 2)
    return np.pad(up, pad, mode="edge")


def _level_scene(images_l, rig_l, subset, params_l, depth_min, depth_max,
                 ledger=None):
    cost_fn = multiview_cost
    if params_l.cost_path == "rect":
        from ..ops.rect_cost import rect_multiview_cost
        from .rect_scene import RectifyUnsupported, build_rect_scene
        # The rect path reads only the geometry fields of the base scene —
        # build it lite (skips the exact path's sampling tables, the
        # dominant scene-build cost); rebuild full only on fallback.
        base = build_scene(images_l, rig_l, subset, params_l,
                           depth_min, depth_max, lite=True)
        try:
            scene, _ = build_rect_scene(images_l, rig_l, subset, params_l,
                                        depth_min, depth_max, base=base,
                                        ledger=ledger)
            return scene, rect_multiview_cost
        except RectifyUnsupported as e:
            print(f"[gipuma_tpu] rect path unavailable at pyramid level "
                  f"({e}); exact cost path")
    scene = build_scene(images_l, rig_l, subset, params_l,
                        depth_min, depth_max)
    return scene, cost_fn


def prepare_pyramid(images: Sequence[np.ndarray],
                    P_matrices: Sequence[np.ndarray],
                    names: Sequence[str],
                    subset: Sequence[int],
                    params: AlgorithmParams,
                    depth_min: float, depth_max: float,
                    lazy: bool = False, ledger=None):
    """Build all level scenes (coarsest first).  Returns a list of
    (scene, cost_fn, params_l, (h_l, w_l)).

    Scene builds are independent of the runs, so they all start on
    background threads immediately; the per-level arrays land on device
    once built.  lazy=True returns futures instead of resolved tuples
    (run_pyramid accepts either), so the large fine-level build overlaps
    the coarse-level device compute."""
    from concurrent.futures import ThreadPoolExecutor

    levels = max(1, params.pyramid_levels)
    prep_in = []
    by_level = {0: [np.asarray(im, np.float32) for im in images]}
    for l in range(1, levels):
        by_level[l] = [downscale2(im) for im in by_level[l - 1]]
    for lvl in range(levels - 1, -1, -1):
        il = [ensure_even_width(im) for im in by_level[lvl]]
        rig_l = build_rig(P_matrices, names,
                          cam_scale=params.cam_scale * (2 ** lvl))
        if lvl == levels - 1:
            # Coarsest level starts from RANDOM planes: the downscaled
            # screening scene ranks 2x2 blocks on one representative
            # pixel's candidates, which is only a valid proxy once the
            # plane field is smooth — warm-started levels only
            # (measured: flat-from-random with cull_downscale=2 degrades
            # median ~4x; warm-gated it holds the 5e-3 class).
            params_l = params.replace(iterations=params.iterations,
                                      cull_downscale=1)
        else:
            # Warm-started fine level: apply the (quality-gated) schedule
            # trims — see config.pyramid_fine_*.
            params_l = params.replace(
                iterations=params.pyramid_fine_iterations,
                far_propagation=(params.far_propagation
                                 and params.pyramid_fine_far),
                refine_rounds_cap=params.pyramid_fine_refine_rounds)
        if lvl > 0 and params.pyramid_coarse_box > 0:
            # Downsampled levels: a smaller pixel window still covers a
            # larger physical footprint (config.pyramid_coarse_box).
            params_l = params_l.replace(
                box_hsize=min(params.pyramid_coarse_box, params.box_hsize),
                box_vsize=min(params.pyramid_coarse_box, params.box_vsize))
        params_l = params_l.with_depth_range(
            depth_min, depth_max, rig_l.f, FAKE_BASELINE)
        prep_in.append((il, rig_l, params_l))

    ex = ThreadPoolExecutor(max_workers=2)

    def level_item(il, rig_l, params_l):
        scene, cost_fn = _level_scene(il, rig_l, subset, params_l,
                                      depth_min, depth_max, ledger=ledger)
        return scene, cost_fn, params_l, il[0].shape[:2]

    futures = [ex.submit(level_item, il, rig_l, params_l)
               for il, rig_l, params_l in prep_in]
    ex.shutdown(wait=not lazy)
    if lazy:
        return futures
    return [f.result() for f in futures]


def run_pyramid(prep, key, as_numpy: bool = True
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run the prepared levels (coarsest first, resolved tuples or
    futures); returns (depth, normals_world, cost) at full resolution.

    as_numpy=False returns the jax device arrays instead — callers that
    need only one output (or feed fusion on-device) skip fetching ~6 MB
    per dino-scale view through the TPU relay."""
    if not prep:
        raise ValueError("run_pyramid: empty prep (no pyramid levels)")
    state = None
    prev_scene = None
    scene = None
    for item in prep:
        scene, cost_fn, params_l, (h_l, w_l) = (
            item.result() if hasattr(item, "result") else item)
        key, k_lvl = jax.random.split(key)
        if state is None:
            state = run_patchmatch_host_loop(scene, params_l, k_lvl,
                                             cost_fn=cost_fn)
        else:
            state = _handoff_jit(cost_fn)(state, prev_scene, scene,
                                          params_f=params_l, key=k_lvl)
            state = run_patchmatch_host_loop(scene, params_l, k_lvl,
                                             cost_fn=cost_fn, state=state)
        prev_scene = scene
    depth, normals, cost = _jfin(state, scene)
    if not as_numpy:
        return depth, normals, cost
    return (np.asarray(depth), np.asarray(normals), np.asarray(cost))


def run_patchmatch_pyramid(images: Sequence[np.ndarray],
                           P_matrices: Sequence[np.ndarray],
                           names: Sequence[str],
                           subset: Sequence[int],
                           params: AlgorithmParams,
                           depth_min: float, depth_max: float,
                           key) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full coarse-to-fine run; returns (depth, normals_world, cost) numpy.

    images: full-resolution images for ALL cameras (reference first);
    the view subset and depth range come from full-resolution selection.
    `params.pyramid_levels` levels; the coarsest runs `params.iterations`
    random-init iterations, each finer level runs
    `params.pyramid_fine_iterations` warm-started ones.
    """
    return run_pyramid(
        prepare_pyramid(images, P_matrices, names, subset, params,
                        depth_min, depth_max, lazy=True),
        key)
