"""Tile x view composition on the rectified fast path.

Shards ONE depth-map job two ways at once (BASELINE config 5, the 4K+/
highres requirement the reference has no analog for — it is bounded by one
GPU's memory, SURVEY.md §5):

* ``tile`` axis — horizontal row bands of the reference image.  Each band
  is an independent rectified sub-scene (its own per-pair tables, built
  from a row-cropped reference camera), so the per-chip rect imagery,
  permutation tables, AND the per-band slice of every source view's
  rectified storage shrink by the tile count — unlike parallel/tiled.py's
  exact-path runner, nothing about the source views is replicated across
  the tile axis.
* ``view`` axis — the source-view axis of the multiview cost inside each
  band (parallel/sharded.view_sharded_cost_fn), combined with one
  all-gather over ICI.

Band semantics: every band carries ``margin`` extra rows on each side (the
propagation reach, >= 5).  Before every propagation sub-sweep the overlap
rows are overwritten with the neighbouring band's OWNED boundary rows via
`jax.lax.ppermute` over the tile axis, so owned-row updates read exactly
the planes a single-device sweep would (the overlap rows themselves evolve
with stale edge context and are re-overwritten at the next exchange; the
final stitch drops them).  Geometry stays GLOBAL: band ScenePacks keep the
full-rig cameras and address pixels by global y via ScenePack.row_offset
(negative for band 0's top margin — those rows sit above the image and
every propagation ok-check rejects them, matching the single-device edge
behaviour).  Only the rect TABLES see the cropped camera; the plane vector
m = n/d that crosses the state->rect boundary is frame-level geometry,
independent of pixel indexing.

Deviations from a single-device run (documented, tested end-to-end for
depth quality in tests/test_tiled_rect.py): per-band rectification windows
(density normalization measured on the band footprint) and per-band PRNG
folds for init/refinement draws.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import AlgorithmParams
from ..geometry.camera import Rig
from ..models.patchmatch import (CLOSE_OFFSETS, FAR_OFFSETS, PMState,
                                 finalize, init_state, propagation_sweep,
                                 refinement_sweep)
from ..models.rect_scene import build_rect_scene
from ..models.scene import build_scene
from ..ops.cost import ScenePack
from ..ops.rect_cost import RectScene
from .sharded import (_scene_cache_key, _SHARDED_CACHE,
                      pad_rect_scene_views, view_sharded_cost_fn)


def _crop_ref_rig(rig: Rig, r0: int) -> Rig:
    """Rig whose REFERENCE camera sees rows shifted by -r0 (a pure row
    crop: K' = S K with S = [[1,0,0],[0,1,-r0],[0,0,1]]).  Source cameras
    keep their intrinsics — only the reference K enters the rectification
    homography T_ref (geometry/rectify.rectify_pair)."""
    S = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, -float(r0)], [0.0, 0.0, 1.0]])
    ref = rig.cameras[0]
    Kc = S @ ref.K
    ref_c = dataclasses.replace(ref, K=Kc, K_inv=np.linalg.inv(Kc))
    return dataclasses.replace(rig, cameras=[ref_c] + list(rig.cameras[1:]),
                               K_ref=S @ rig.K_ref,
                               K_ref_inv=np.linalg.inv(S @ rig.K_ref))


def _slice_pack_rows(pack: ScenePack, idx: np.ndarray, r0: int) -> ScenePack:
    """Band view of a lite ScenePack: per-pixel rows gathered by (clamped)
    global index, row_offset set so _active_coords yields GLOBAL y."""
    return pack._replace(
        rays=pack.rays[idx], view_vec=pack.view_vec[idx],
        texture_ok=pack.texture_ok[idx],
        row_offset=jnp.asarray(r0, jnp.int32))


def _repad_rect(scene: RectScene, hrp: int, wrp: int) -> RectScene:
    """Pad a band RectScene's rect-shaped arrays to a common [hrp, wrp].

    Permutation tables pad with EDGE replication (they are gathered at
    every padded slot and must stay smooth for the scratch-window span
    bound); imagery pads with zeros (the fused kernel's hw_valid extent
    skip never reads it)."""
    h0, w0 = scene.ref_rect.shape[-2:]
    if (h0, w0) == (hrp, wrp):
        return scene
    dh, dw = hrp - h0, wrp - w0

    def zpad(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, dh), (0, dw)))

    tile_ok = scene.tile_ok
    if tile_ok is not None:
        tile_ok = jnp.pad(tile_ok, ((0, 0), (0, (hrp - h0) // 8),
                                    (0, (wrp - w0) // 128)))
    fwd2_ok = scene.fwd2_ok
    if fwd2_ok is not None:
        fwd2_ok = jnp.pad(fwd2_ok,
                          ((0, 0), (0, dw // 8),
                           (0, -(-hrp // 128) - fwd2_ok.shape[-1])))
    ret1_ok = scene.ret1_ok
    if ret1_ok is not None:
        ret1_ok = jnp.pad(ret1_ok, ((0, 0), (0, dh // 8), (0, 0)))
    fwd1_ok = scene.fwd1_ok
    if fwd1_ok is not None:
        # Pass-1 output is [S, wrp]: S is band-invariant, pad columns.
        fwd1_ok = jnp.pad(fwd1_ok, ((0, 0), (0, 0), (0, dw // 128)))
    return scene._replace(
        ref_rect=zpad(scene.ref_rect), src_rect=zpad(scene.src_rect),
        fwd_c1=jnp.pad(scene.fwd_c1, ((0, 0), (0, 0), (0, dw)), mode="edge"),
        fwd_r=jnp.pad(scene.fwd_r, ((0, 0), (0, dh), (0, dw)), mode="edge"),
        ret_c1=jnp.pad(scene.ret_c1, ((0, 0), (0, dh), (0, 0)), mode="edge"),
        tile_ok=tile_ok, fwd2_ok=fwd2_ok, ret1_ok=ret1_ok,
        fwd1_ok=fwd1_ok)


class TiledRectPrep(NamedTuple):
    """Host-built state for a tile(x view)-sharded rect run."""

    scenes: RectScene        # stacked: every leaf has a leading [T] axis
    full_base: ScenePack     # unsharded lite pack (for finalize)
    params: AlgorithmParams
    n_tiles: int
    margin: int
    h: int                   # original image height (pre-banding pad)
    h_pad: int
    w: int
    info: list


def required_band_margin(params: AlgorithmParams) -> int:
    """Minimum legal band overlap (rows per side), even: covers the far
    propagation reach (5 px + 1) AND the rect cost window's vertical read
    reach across the band seam — box_vrad plus the window_grads extension
    ring (window_increment) — so seam-pixel windows never read band-edge-
    replicated rect imagery (dtu_accurate box 25 needs 14, not 6)."""
    reach = params.box_vrad + (params.window_increment
                               if params.window_grads else 0)
    m = max(6, reach)
    return m + (m % 2)


def choose_banding(h: int, w: int, n_tiles: int,
                   params: AlgorithmParams) -> tuple[int, int]:
    """Legal (n_tiles, margin) for an [h, w] reference image: the band
    margin from `required_band_margin`, and the requested tile count
    (bands taller than wide are supported — the square permute grid side
    is max(band_h, w); portrait 4K inputs at small tile counts just pay a
    larger grid, they no longer hit an assert)."""
    return n_tiles, required_band_margin(params)


def prepare_tiled_rect(images: Sequence[np.ndarray], rig: Rig,
                       view_subset: Sequence[int], params: AlgorithmParams,
                       depth_min: float, depth_max: float, n_tiles: int,
                       margin: int | None = None) -> TiledRectPrep:
    """Build per-band rectified scenes for `n_tiles` row bands.

    The image height is padded (edge rows) to a band multiple — no
    H % n == 0 requirement; the stitched output is cropped back.
    margin=None derives the band overlap from the params (propagation +
    cost-window reach, `required_band_margin`)."""
    req = required_band_margin(params)
    if margin is None:
        margin = req
    assert margin % 2 == 0 and margin >= req, \
        (f"margin {margin} must be even (checkerboard parity) and >= {req} "
         f"(max of far-propagation reach 6 and the rect cost window's "
         f"vertical read reach box_vrad+window_increment across the seam)")
    ref = np.asarray(images[0], np.float32)
    h, w = ref.shape[:2]
    h_loc = -(-h // n_tiles)
    h_loc += h_loc % 2
    h_pad = h_loc * n_tiles
    if h_pad != h:
        ref = np.concatenate(
            [ref, np.repeat(ref[-1:], h_pad - h, axis=0)], axis=0)
    imgs = [ref] + [np.asarray(im) for im in images[1:]]

    full_base = build_scene(imgs, rig, list(view_subset), params,
                            depth_min, depth_max, lite=True)
    # global_h stays the ORIGINAL h: when H % n_tiles != 0, candidates in
    # the replicated banding-pad rows (y in [h, h_pad)) must fail the
    # propagation y <= global_h - 1 check exactly like single-device
    # bottom-edge candidates (the pack was built on the padded image, so
    # build_scene recorded h_pad).
    full_base = full_base._replace(global_h=jnp.asarray(h, jnp.int32))

    bands, infos = [], []
    for b in range(n_tiles):
        r0 = b * h_loc - margin
        idx = np.clip(np.arange(r0, (b + 1) * h_loc + margin), 0, h_pad - 1)
        band_imgs = [ref[idx]] + imgs[1:]
        band_base = _slice_pack_rows(full_base, idx, r0)
        # cull_downscale=1: the band stacking + tile×view specs don't
        # carry the nested screening scene; the sparse pass falls back to
        # _slice_views, so skip building per-band cull scenes entirely.
        scene_b, info_b = build_rect_scene(
            band_imgs, _crop_ref_rig(rig, r0), list(view_subset),
            params.replace(cull_downscale=1),
            depth_min, depth_max, base=band_base)
        bands.append(scene_b)
        infos.append(info_b)

    hrp = max(s.ref_rect.shape[-2] for s in bands)
    wrp = max(s.ref_rect.shape[-1] for s in bands)
    ss = max(s.spans.shape[0] for s in bands)
    sp = max(s.spans.shape[1] for s in bands)
    spans = jnp.zeros((ss, sp), jnp.int8)
    bands = [_repad_rect(s, hrp, wrp)._replace(spans=spans) for s in bands]
    scenes = jax.tree.map(lambda *xs: jnp.stack(xs), *bands)
    return TiledRectPrep(scenes=scenes, full_base=full_base, params=params,
                         n_tiles=n_tiles, margin=margin, h=h, h_pad=h_pad,
                         w=w, info=infos)


def _pad_rect_views_stacked(scenes: RectScene, multiple: int) -> RectScene:
    """pad_rect_scene_views for tile-stacked scenes (view axis is axis 1):
    round the view count up to the view-mesh multiple on every band."""
    V = scenes.ref_rect.shape[1]
    if V % multiple == 0:
        return scenes
    n_t = scenes.ref_rect.shape[0]
    bands = [jax.tree.map(lambda a: a[t], scenes) for t in range(n_t)]
    bands = [pad_rect_scene_views(b, multiple) for b in bands]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *bands)


def _exchange_overlap(planes: jnp.ndarray, m: int, axis: str,
                      n: int) -> jnp.ndarray:
    """Overwrite each band's `m` overlap rows (top and bottom) with the
    neighbouring band's adjacent OWNED rows; global-edge bands keep their
    local values (those rows are rejected by the global ok-checks)."""
    if n == 1:
        return planes
    he = planes.shape[0]
    own_top = planes[m:2 * m]
    own_bot = planes[he - 2 * m:he - m]
    from_up = jax.lax.ppermute(own_bot, axis,
                               [(i, i + 1) for i in range(n - 1)])
    from_dn = jax.lax.ppermute(own_top, axis,
                               [(i, i - 1) for i in range(1, n)])
    idx = jax.lax.axis_index(axis)
    top = jnp.where(idx == 0, planes[:m], from_up)
    bot = jnp.where(idx == n - 1, planes[-m:], from_dn)
    return jnp.concatenate([top, planes[m:-m], bot], axis=0)


def _tiled_specs(scene: RectScene, tile_axis: str, view_axis: str):
    base = P(tile_axis)
    view = P(tile_axis, view_axis)
    pack = jax.tree.map(lambda _: base, scene.base,
                        is_leaf=lambda x: not hasattr(x, "tree_flatten")
                        and not isinstance(x, ScenePack))
    pack = pack._replace(src=view, A=view, b=view, view_valid=view,
                         src_blocks=view)
    return RectScene(base=pack, ref_rect=view, src_rect=view, L=view,
                     fwd_c1=view, fwd_r=view, ret_c1=view, ret_r=view,
                     rot_k=view, disp_bounds=view, spans=base,
                     hw_valid=view,
                     tile_ok=None if scene.tile_ok is None else view,
                     fwd2_ok=None if scene.fwd2_ok is None else view,
                     ret1_ok=None if scene.ret1_ok is None else view,
                     fwd1_ok=None if scene.fwd1_ok is None else view,
                     ret2_ok=None if scene.ret2_ok is None else view)


def run_patchmatch_tiled_rect(prep: TiledRectPrep, key, mesh: Mesh,
                              tile_axis: str = "tile",
                              view_axis: str = "view") -> PMState:
    """Run PatchMatch with bands over `tile` and source views over `view`.

    Returns the stitched global PMState ([h, w] arrays, overlap rows
    dropped, banding pad cropped)."""
    n_t = mesh.shape[tile_axis]
    n_v = mesh.shape[view_axis]
    assert n_t == prep.n_tiles, \
        f"prep built {prep.n_tiles} bands but mesh has {n_t} tile shards"
    params, m = prep.params, prep.margin
    scenes = _pad_rect_views_stacked(prep.scenes, n_v)

    ck = _scene_cache_key(mesh, params, scenes,
                          ("tiled_rect", tile_axis, view_axis, m))
    fn = _SHARDED_CACHE.get(ck)
    if fn is None:
        specs = _tiled_specs(scenes, tile_axis, view_axis)
        out_spec = PMState(planes=P(tile_axis), cost=P(tile_axis),
                           key=P(tile_axis))
        cost_fn = view_sharded_cost_fn(axis_name=view_axis, rect=True)

        @jax.jit
        @functools.partial(shard_map, mesh=mesh, in_specs=(specs, P()),
                           out_specs=out_spec, check_vma=False)
        def fn(scenes_stk, key):
            scene = jax.tree.map(lambda a: a[0], scenes_stk)
            key = jax.random.fold_in(key, jax.lax.axis_index(tile_axis))
            st = init_state(scene, params, key, cost_fn=cost_fn)
            for _ in range(params.iterations):
                for parity in (0, 1):
                    sweeps = [CLOSE_OFFSETS]
                    if params.far_propagation:
                        sweeps.append(FAR_OFFSETS)
                    for offsets in sweeps:
                        st = st._replace(planes=_exchange_overlap(
                            st.planes, m, tile_axis, n_t))
                        st = propagation_sweep(st, scene, params, parity,
                                               offsets, cost_fn=cost_fn)
                    if params.refine:
                        st = refinement_sweep(st, scene, params, parity,
                                              cost_fn=cost_fn)
            return PMState(planes=st.planes[None], cost=st.cost[None],
                           key=st.key[None])

        _SHARDED_CACHE[ck] = fn

    out = fn(scenes, key)
    planes = jnp.concatenate(
        [out.planes[t, m:-m] for t in range(n_t)], axis=0)[:prep.h]
    cost = jnp.concatenate(
        [out.cost[t, m:-m] for t in range(n_t)], axis=0)[:prep.h]
    return PMState(planes=planes, cost=cost, key=out.key[0])


def finalize_tiled(prep: TiledRectPrep, state: PMState):
    """Depth / world normals / cost for the stitched state (models.
    patchmatch.finalize with the unsharded full base pack)."""
    base = prep.full_base
    if prep.h_pad != prep.h:
        base = _slice_pack_rows(base, np.arange(prep.h), 0)
    return finalize(state, base)
