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


def view_sharded_cost_fn(axis_name: str = "view") -> Callable:
    """multiview_cost drop-in: local per-view costs + ICI all-gather."""

    def cost_fn(scene, params, parity, n, d):
        local = per_view_costs(scene, params, parity, n, d)   # [V_local, ...]
        full = jax.lax.all_gather(local, axis_name, axis=0, tiled=True)
        return combine_view_costs(full, params)

    return cost_fn


def _scene_specs(scene: ScenePack, batched: bool) -> ScenePack:
    """A ScenePack-shaped tree of PartitionSpecs: view-axis leaves sharded
    over 'view', everything else replicated (plus 'job' on the leading
    batch dim when batched)."""
    base = P("job") if batched else P()
    view = P("job", "view") if batched else P("view")
    specs = jax.tree.map(lambda _: base, scene,
                         is_leaf=lambda x: not isinstance(x, (ScenePack,)) and
                         not hasattr(x, "tree_flatten"))
    # tree.map recursed into PaddedEO pytrees fine; now override view leaves.
    return specs._replace(src=view, A=view, b=view, view_valid=view,
                          src_blocks=view)


def run_patchmatch_view_sharded(scene: ScenePack, params: AlgorithmParams,
                                key, mesh: Mesh) -> PMState:
    """Single depth-map job with the source-view axis sharded over the
    mesh's 'view' axis (the 'job' axis, if present, is unused/replicated)."""
    nview = mesh.shape["view"]
    scene = pad_scene_views(scene, nview)
    specs = _scene_specs(scene, batched=False)
    state_spec = PMState(planes=P(), cost=P(), key=P())

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(specs, P()), out_specs=state_spec,
        check_vma=False)
    def _run(scene_local, key):
        return run_patchmatch(scene_local, params, key,
                              cost_fn=view_sharded_cost_fn())

    return _run(scene, key)


def run_patchmatch_batch_sharded(scenes: ScenePack, params: AlgorithmParams,
                                 keys, mesh: Mesh) -> PMState:
    """Batch of depth-map jobs: leading axis sharded over 'job', views over
    'view'.  `scenes` is a ScenePack whose every leaf has a leading batch
    dimension (stack_scenes); keys: [B] PRNG keys.

    This is the full multi-chip "training step" analog: dp(job) x tp(view).
    """
    nview = mesh.shape["view"]
    scenes = pad_scene_views_batched(scenes, nview)
    specs = _scene_specs(scenes, batched=True)
    state_spec = PMState(planes=P("job"), cost=P("job"), key=P("job"))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(specs, P("job")), out_specs=state_spec,
        check_vma=False)
    def _run(scene_local, keys_local):
        run = lambda sc, k: run_patchmatch(sc, params, k,
                                           cost_fn=view_sharded_cost_fn())
        return jax.vmap(run)(scene_local, keys_local)

    return _run(scenes, keys)


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
