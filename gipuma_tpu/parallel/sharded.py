"""pjit/shard_map parallel runners.

Two levels of parallelism (see parallel/mesh.py):

* view sharding — each chip evaluates the window costs of its local subset
  of source views; the per-view cost vectors [V, H, W2] are combined after
  one `all_gather` over the ``view`` ICI axis (the MVS analog of
  tensor-parallel partial-result reduction).  This replaces the reference's
  serial per-pixel loop over views (gipuma.cu:742-778).
* job sharding — independent depth-map jobs (reference views) run data-
  parallel over the ``job`` axis with zero communication, replacing the
  reference's process-per-view scripting.

The PatchMatch sweeps themselves are replicated over the view axis (they
are < 1% of the FLOPs; the cost evaluation dominates).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import AlgorithmParams
from ..models.patchmatch import PMState, run_patchmatch
from ..models.scene import pad_scene_views
from ..ops.cost import ScenePack, combine_view_costs, per_view_costs
from ..ops.rect_cost import (RectScene, rect_per_view_costs,
                             rect_per_view_costs_batch)


def view_sharded_cost_fn(axis_name: str = "view",
                         rect: bool = False) -> Callable:
    """multiview_cost drop-in: local per-view costs + ICI all-gather.

    Dispatches on the scene type, so the rectified fast path shards over
    views exactly like the exact path; with rect=True it also exposes the
    K-candidate `batch` variant the engine prefers."""

    def cost_fn(scene, params, parity, n, d):
        per_view = (rect_per_view_costs if isinstance(scene, RectScene)
                    else per_view_costs)
        local = per_view(scene, params, parity, n, d)         # [V_local, ...]
        full = jax.lax.all_gather(local, axis_name, axis=0, tiled=True)
        # GOOD needs the GLOBAL real-view count (gipuma.cu:785-786);
        # the local scene only holds this shard's view_valid slice.
        vv = jax.lax.all_gather(scene.view_valid, axis_name, axis=0,
                                tiled=True)
        return combine_view_costs(full, params, view_valid=vv)

    if rect:
        def cost_fn_batch(scene, params, parity, n, d, cand_ok=None,
                          cur=None):
            # cand_ok / cur are part of the batch cost protocol
            # (patchmatch._fold_better); the sharded path runs no
            # candidate culling, so they are unused here.
            local = rect_per_view_costs_batch(scene, params, parity, n, d)
            full = jax.lax.all_gather(local, axis_name, axis=0, tiled=True)
            vv = jax.lax.all_gather(scene.view_valid, axis_name, axis=0,
                                    tiled=True)
            return combine_view_costs(full, params, view_valid=vv)

        cost_fn.batch = cost_fn_batch
    return cost_fn


def _scene_specs(scene, batched: bool):
    """A scene-shaped tree of PartitionSpecs: view-axis leaves sharded
    over 'view', everything else replicated (plus 'job' on the leading
    batch dim when batched).  Handles ScenePack and RectScene."""
    base = P("job") if batched else P()
    view = P("job", "view") if batched else P("view")
    rect = isinstance(scene, RectScene)
    pack = scene.base if rect else scene
    specs = jax.tree.map(lambda _: base, pack,
                         is_leaf=lambda x: not isinstance(x, (ScenePack,)) and
                         not hasattr(x, "tree_flatten"))
    # tree.map recursed into PaddedEO pytrees fine; now override view leaves.
    specs = specs._replace(src=view, A=view, b=view, view_valid=view,
                           src_blocks=view)
    if rect:
        specs = RectScene(base=specs, ref_rect=view, src_rect=view, L=view,
                          fwd_c1=view, fwd_r=view, ret_c1=view, ret_r=view,
                          rot_k=view, disp_bounds=view, spans=base,
                          hw_valid=(None if scene.hw_valid is None
                                    else view),
                          tile_ok=(None if scene.tile_ok is None
                                   else view),
                          fwd2_ok=(None if scene.fwd2_ok is None
                                   else view),
                          ret1_ok=(None if scene.ret1_ok is None
                                   else view),
                          fwd1_ok=(None if scene.fwd1_ok is None
                                   else view),
                          ret2_ok=(None if scene.ret2_ok is None
                                   else view))
    return specs


def pad_rect_scene_views(scene: RectScene, multiple: int) -> RectScene:
    """pad_scene_views for a RectScene: base semantics plus repeating the
    per-pair rect arrays (padded slots carry view_valid = 0 via the base)."""
    V = scene.ref_rect.shape[0]
    target = -(-V // multiple) * multiple
    base = pad_scene_views(scene.base, multiple)
    if target == V:
        return scene._replace(base=base)

    def pad0(a):
        return jnp.concatenate(
            [a, jnp.repeat(a[:1], target - V, axis=0)], axis=0)

    def padz(a):
        # Padded dummy views do ZERO kernel work (extent 0, all tiles
        # masked off); their costs are garbage and masked by
        # view_valid = 0.
        if a is None:
            return None
        return jnp.concatenate(
            [a, jnp.zeros((target - V,) + a.shape[1:], a.dtype)], axis=0)

    return RectScene(base=base, ref_rect=pad0(scene.ref_rect),
                     src_rect=pad0(scene.src_rect), L=pad0(scene.L),
                     fwd_c1=pad0(scene.fwd_c1), fwd_r=pad0(scene.fwd_r),
                     ret_c1=pad0(scene.ret_c1), ret_r=pad0(scene.ret_r),
                     rot_k=pad0(scene.rot_k),
                     disp_bounds=pad0(scene.disp_bounds), spans=scene.spans,
                     hw_valid=padz(scene.hw_valid),
                     tile_ok=padz(scene.tile_ok),
                     fwd2_ok=padz(scene.fwd2_ok),
                     ret1_ok=padz(scene.ret1_ok),
                     fwd1_ok=padz(scene.fwd1_ok),
                     ret2_ok=padz(scene.ret2_ok))


# Compiled sharded runners cached by (mesh, params, scene treedef+shapes):
# rebuilding the shard_map closure per call would RETRACE AND RECOMPILE the
# whole program every invocation (measured ~20 s per call even at 48x64 on
# CPU — the scaling harness and any batch loop would time compiles, not
# compute).
_SHARDED_CACHE: dict = {}


def _scene_cache_key(mesh, params, tree, extra=()):
    leaves, treedef = jax.tree.flatten(tree)
    shapes = tuple((l.shape, str(l.dtype)) for l in leaves)
    return (mesh, params, treedef, shapes) + tuple(extra)


def run_patchmatch_view_sharded(scene, params: AlgorithmParams,
                                key, mesh: Mesh) -> PMState:
    """Single depth-map job with the source-view axis sharded over the
    mesh's 'view' axis (the 'job' axis, if present, is unused/replicated).
    Accepts a ScenePack (exact cost path) or RectScene (fast path)."""
    nview = mesh.shape["view"]
    if isinstance(scene, RectScene):
        # The nested screening scene's strided view axis does not match
        # the view mesh; the sharded sparse path (if culling were on)
        # falls back to _slice_views semantics without it.
        scene = pad_rect_scene_views(scene._replace(cull=None), nview)
    else:
        scene = pad_scene_views(scene, nview)
    rect = isinstance(scene, RectScene)

    ck = _scene_cache_key(mesh, params, scene, ("view1", rect))
    fn = _SHARDED_CACHE.get(ck)
    if fn is None:
        specs = _scene_specs(scene, batched=False)
        state_spec = PMState(planes=P(), cost=P(), key=P())

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh, in_specs=(specs, P()),
            out_specs=state_spec, check_vma=False)
        def fn(scene_local, key):
            return run_patchmatch(scene_local, params, key,
                                  cost_fn=view_sharded_cost_fn(rect=rect))

        _SHARDED_CACHE[ck] = fn
    return fn(scene, key)


def run_patchmatch_batch_sharded(scenes: ScenePack, params: AlgorithmParams,
                                 keys, mesh: Mesh) -> PMState:
    """Batch of depth-map jobs: leading axis sharded over 'job', views over
    'view'.  `scenes` is a ScenePack whose every leaf has a leading batch
    dimension (stack_scenes); keys: [B] PRNG keys.

    This is the full multi-chip "training step" analog: dp(job) x tp(view).
    """
    nview = mesh.shape["view"]
    scenes = pad_scene_views_batched(scenes, nview)

    ck = _scene_cache_key(mesh, params, scenes, ("batch",))
    fn = _SHARDED_CACHE.get(ck)
    if fn is None:
        specs = _scene_specs(scenes, batched=True)
        state_spec = PMState(planes=P("job"), cost=P("job"), key=P("job"))

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh, in_specs=(specs, P("job")),
            out_specs=state_spec, check_vma=False)
        def fn(scene_local, keys_local):
            run = lambda sc, k: run_patchmatch(
                sc, params, k, cost_fn=view_sharded_cost_fn())
            return jax.vmap(run)(scene_local, keys_local)

        _SHARDED_CACHE[ck] = fn
    return fn(scenes, keys)


def stack_scenes(scenes: list[ScenePack]) -> ScenePack:
    """Stack per-job ScenePacks along a new leading batch axis (all jobs
    must share image size and view count — pad_scene_views first)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)


def pad_scene_views_batched(scenes: ScenePack, multiple: int) -> ScenePack:
    """pad_scene_views for a batched ScenePack (view axis is axis 1)."""
    V = scenes.src.shape[1]
    target = -(-V // multiple) * multiple
    if target == V:
        return scenes
    pad = target - V

    def pad1(a):
        return jnp.concatenate([a, jnp.repeat(a[:, :1], pad, axis=1)], axis=1)

    return scenes._replace(
        src=pad1(scenes.src), A=pad1(scenes.A), b=pad1(scenes.b),
        src_blocks=pad1(scenes.src_blocks),
        view_valid=jnp.concatenate(
            [scenes.view_valid,
             jnp.zeros(scenes.view_valid.shape[:1] + (pad,),
                       scenes.view_valid.dtype)], axis=1))
