"""Component timing of the rect cost path on the real chip.

Times, at dinoSparseRing rect scale, the pieces of one candidate-batch
evaluation (rect_per_view_costs_batch):

  * permute2d forward (m: K*3 channels, S x S -> Hrp x Wrp)
  * rect_pair_cost_batch (36 window offsets, K candidates, one view)
  * permute2d return (cost: K channels, Hrp x Wrp -> S x S)
  * the full per-view scan (all V views)

Batched in one script: each distinct Pallas compile costs ~30-60 s through
the remote compile helper.
"""
from __future__ import annotations

import functools as ft
import time

import jax
import jax.numpy as jnp
import numpy as np

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.rect_scene import build_rect_scene
from gipuma_tpu.models.scene import build_scene
from gipuma_tpu.ops.rect_cost import (rect_pair_cost_batch,
                                      rect_per_view_costs_batch)
from gipuma_tpu.ops.permute2d import permute2d
from gipuma_tpu.utils.synthetic import plane_scene


def timeit(label, fn, *args, reps=5, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    np.asarray(jax.tree.leaves(out)[0])
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: first={t_c:.2f}s steady={dt*1e3:.2f}ms", flush=True)
    return out, dt


def main():
    print("devices:", jax.devices(), flush=True)
    h, w, n_views = 480, 640, 7
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=800.0,
                                     plane_depth=5.0, slant=(0.2, -0.1))
    params = PRESETS["middlebury"].replace(seed=0, cost_path="rect")
    params = params.with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    base = build_scene(images, rig, list(range(1, n_views)), params, 3.0, 8.0)
    scene, info = build_rect_scene(images, rig, list(range(1, n_views)),
                                   params, 3.0, 8.0, base=base)
    hrp, wrp = info["rect_shape_padded"]
    span_sample, span_perm = info["spans"]
    s = scene.fwd_c1.shape[-2]
    K = 4
    print(f"rect={hrp}x{wrp} S={s} spans={info['spans']} "
          f"offsets={len(params.window_offsets())}", flush=True)

    key = jax.random.PRNGKey(0)
    m_sq = jax.random.normal(key, (K * 3, s, s), jnp.float32)
    abc = jax.random.uniform(key, (K, 3, hrp, wrp), jnp.float32,
                             minval=0.0, maxval=0.01)
    cost_rect = jax.random.uniform(key, (K, hrp, wrp), jnp.float32)

    jperm_f = jax.jit(ft.partial(permute2d, max_span_blocks=span_perm))
    jperm_r = jax.jit(ft.partial(permute2d, max_span_blocks=span_perm))
    jcost = jax.jit(ft.partial(rect_pair_cost_batch, params=params,
                               span_blocks=span_sample))

    _, t_pf = timeit("permute fwd (K*3 ch, SxS->rect)", jperm_f,
                     m_sq, scene.fwd_c1[0], scene.fwd_r[0])
    _, t_pc = timeit("pair cost batch (1 view, K=4)", jcost,
                     scene.ref_rect[0], scene.src_rect[0], abc,
                     disp_lo=scene.disp_bounds[0, 0],
                     disp_hi=scene.disp_bounds[0, 1])
    _, t_pr = timeit("permute ret (K ch, rect->SxS)", jperm_r,
                     cost_rect, scene.ret_c1[0], scene.ret_r[0])

    v = n_views - 1
    per_view = t_pf + t_pc + t_pr
    print(f"sum x {v} views = {per_view * v * 1e3:.1f}ms", flush=True)

    n = jax.random.normal(key, (K, h, w // 2, 3), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    d = -jnp.ones((K, h, w // 2), jnp.float32) * 5.0
    jfull = jax.jit(ft.partial(rect_per_view_costs_batch, params=params,
                               parity=0))
    _, t_full = timeit("rect_per_view_costs_batch (V views, K=4)", jfull,
                       scene, n=n, d=d)
    print(f"scan overhead vs sum: {(t_full - per_view * v) * 1e3:.1f}ms",
          flush=True)


if __name__ == "__main__":
    main()
