"""Spatial (image-tile) sharding: row bands across chips with halo exchange.

The third parallel axis (after view and job sharding): the reference-view
image is split into horizontal bands, one per chip on the ``tile`` mesh
axis.  Each chip owns its band's plane/cost state and evaluates costs only
for its rows; between checkerboard sub-sweeps the boundary plane rows are
exchanged with the neighboring chips over ICI (`jax.lax.ppermute`) — the
MVS analog of ring-style neighbor exchange (SURVEY.md §5 "long-context"
mapping; BASELINE "tile-boundary hypothesis exchange").

Design:
* reference-image window channels are pre-sliced into per-shard blocks WITH
  their window halos on the host (read-only, so no exchange needed);
* source views + warp constants are replicated (any band can warp anywhere);
* only the mutable plane field needs per-sweep halo exchange (pad rows =
  the propagation reach: 1 close / 5 far);
* pixel y-coordinates are global via ScenePack.row_offset; band heights are
  kept even so the checkerboard parity is preserved across shards.
* refinement PRNG keys are folded with the shard index — random draws are
  shard-independent (same distribution as, but not bitwise equal to, the
  single-device schedule); propagation-only runs match single-device
  exactly (tested).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import AlgorithmParams
from ..models.patchmatch import (CLOSE_OFFSETS, FAR_OFFSETS,
                                 MONOLITHIC_OFFSETS, PMState,
                                 multiview_cost, propagation_sweep,
                                 random_unit_hemisphere, refinement_sweep)
from ..geometry import transforms as T
from ..ops import checkerboard as cb
from ..ops.cost import ScenePack


class TileShards(NamedTuple):
    """Per-shard row bands (leaves stacked on a leading [n_tiles] axis)."""

    refE: jnp.ndarray      # [n, H_loc + 2pr, W2E + pc, C] img even cols
    refO: jnp.ndarray
    gxE: jnp.ndarray
    gxO: jnp.ndarray
    gyE: jnp.ndarray
    gyO: jnp.ndarray
    rays: jnp.ndarray      # [n, H_loc, W, 3]
    view_vec: jnp.ndarray  # [n, H_loc, W, 3]
    texture_ok: jnp.ndarray
    row_offset: jnp.ndarray  # [n] int32


def shard_scene_rows(scene: ScenePack, n: int):
    """Split the row-dependent scene arrays into n even-height bands (with
    window halos for the reference channels).  Returns (TileShards,
    base_scene, H_loc)."""
    H = scene.rays.shape[0]
    assert H % n == 0 and (H // n) % 2 == 0, \
        "image height must split into even-height bands (pad rows first)"
    H_loc = H // n
    pr = scene.ref_img.pr

    def band_halo(a):  # [H + 2pr, ...] padded rows -> [n, H_loc + 2pr, ...]
        return jnp.stack([a[i * H_loc:i * H_loc + H_loc + 2 * pr]
                          for i in range(n)])

    def band(a):       # [H, ...] -> [n, H_loc, ...]
        return a.reshape((n, H_loc) + a.shape[1:])

    shards = TileShards(
        refE=band_halo(scene.ref_img.E), refO=band_halo(scene.ref_img.O),
        gxE=band_halo(scene.ref_gx.E), gxO=band_halo(scene.ref_gx.O),
        gyE=band_halo(scene.ref_gy.E), gyO=band_halo(scene.ref_gy.O),
        rays=band(scene.rays), view_vec=band(scene.view_vec),
        texture_ok=band(scene.texture_ok),
        row_offset=jnp.arange(n, dtype=jnp.int32) * H_loc,
    )
    return shards, scene, H_loc


def _local_scene(shards_local: TileShards, base: ScenePack,
                 H_loc: int) -> ScenePack:
    """Rebuild a per-shard ScenePack from its band + the replicated base."""
    ref = base.ref_img
    sq = lambda a: a[0]

    def eo(E, O, proto):
        return cb.PaddedEO(E=sq(E), O=sq(O), pr=proto.pr, pc=proto.pc,
                           h=H_loc, w2=proto.w2)

    return base._replace(
        ref_img=eo(shards_local.refE, shards_local.refO, base.ref_img),
        ref_gx=eo(shards_local.gxE, shards_local.gxO, base.ref_gx),
        ref_gy=eo(shards_local.gyE, shards_local.gyO, base.ref_gy),
        rays=sq(shards_local.rays),
        view_vec=sq(shards_local.view_vec),
        texture_ok=sq(shards_local.texture_ok),
        row_offset=shards_local.row_offset[0],
    )


def _exchange_halo(planes: jnp.ndarray, pad: int, axis: str,
                   n: int) -> jnp.ndarray:
    """Fetch `pad` boundary plane rows from the up/down neighbor shards;
    global image edges fall back to edge replication (matching the
    single-device PaddedEO edge padding)."""
    idx = jax.lax.axis_index(axis)
    from_up = jax.lax.ppermute(planes[-pad:], axis,
                               [(i, i + 1) for i in range(n - 1)])
    from_dn = jax.lax.ppermute(planes[:pad], axis,
                               [(i, i - 1) for i in range(1, n)])
    top_edge = jnp.repeat(planes[:1], pad, axis=0)
    bot_edge = jnp.repeat(planes[-1:], pad, axis=0)
    halo_up = jnp.where(idx == 0, top_edge, from_up)
    halo_dn = jnp.where(idx == n - 1, bot_edge, from_dn)
    return jnp.concatenate([halo_up, planes, halo_dn], axis=0)


def iteration_tiled(state: PMState, scene: ScenePack,
                    params: AlgorithmParams, axis: str, n: int,
                    cost_fn=multiview_cost) -> PMState:
    """One PatchMatch iteration on a tile shard, with halo exchanges of the
    plane field before every propagation sub-sweep."""
    for parity in (0, 1):
        if params.propagation_variant == "monolithic":
            sweeps = ((MONOLITHIC_OFFSETS, 5),)
        else:
            sweeps = ((CLOSE_OFFSETS, 1),)
            if params.far_propagation:
                sweeps = sweeps + ((FAR_OFFSETS, 5),)
        for offsets, pad in sweeps:
            halo = _exchange_halo(state.planes, pad, axis, n)
            state = propagation_sweep(state, scene, params, parity, offsets,
                                      cost_fn=cost_fn, halo_planes=halo)
        if params.refine:
            state = refinement_sweep(state, scene, params, parity,
                                     cost_fn=cost_fn)
    return state


def run_patchmatch_tile_sharded(scene: ScenePack, params: AlgorithmParams,
                                key, mesh: Mesh, axis: str = "tile",
                                iterations: int | None = None) -> PMState:
    """Full PatchMatch with the image rows sharded over `axis`.

    Init randomness is drawn globally (identical to the single-device init
    for the same key) and row-sharded; refinement keys are per-shard.
    Returns a PMState with global [H, W] arrays (rows gathered back by the
    output sharding)."""
    n = mesh.shape[axis]
    iters = params.iterations if iterations is None else iterations

    # Global random init (bitwise-identical plane field to single-device).
    h, w = scene.rays.shape[:2]
    x, y = T.pixel_grid(h, w)
    k_disp, k_norm, key = jax.random.split(key, 3)
    disp = jax.random.uniform(k_disp, (h, w), minval=params.min_disparity,
                              maxval=params.max_disparity)
    depth = T.disparity_depth(scene.f, scene.baseline, disp)
    nrm = random_unit_hemisphere(k_norm, scene.view_vec)
    d = T.plane_d_at_pixel(scene.M_inv, scene.P_col4, nrm, x, y, depth)
    planes0 = jnp.concatenate([nrm, d[..., None]], axis=-1)

    shards, base, H_loc = shard_scene_rows(scene, n)

    state_spec = PMState(planes=P(axis), cost=P(axis), key=P())

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(), P(axis), P()), out_specs=state_spec,
        check_vma=False)
    def _run(shards_local, base_scene, planes_local, key):
        scene_l = _local_scene(shards_local, base_scene, H_loc)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        cost = jnp.zeros((H_loc, w), planes_local.dtype)
        for parity in (0, 1):
            c = multiview_cost(
                scene_l, params, parity,
                cb.extract(planes_local[..., :3], parity),
                cb.extract(planes_local[..., 3], parity))
            cost = cb.interleave(cost, c, parity)
        st = PMState(planes=planes_local, cost=cost, key=key)
        for _ in range(iters):
            st = iteration_tiled(st, scene_l, params, axis, n)
        return st

    return _run(shards, base, planes0, key)
