"""Hardware check + timing of the fused rect cost kernel vs the unfused
path, at dinoSparseRing rect scale.  Verifies numerics on-chip, then times
both.  Batched in one script (each Pallas compile ~30-60 s remote)."""
from __future__ import annotations

import functools as ft
import time

import jax
import jax.numpy as jnp
import numpy as np

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.ops.pallas_rect_fused import fused_pair_cost_batch
from gipuma_tpu.ops.rect_cost import rect_pair_cost_batch


def timeit(label, fn, *args, reps=5, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    np.asarray(jax.tree.leaves(out)[0])
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    s = float(jnp.sum(jax.tree.leaves(out)[0]))   # tiny fetch
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: first={t_c:.1f}s steady={dt*1e3:.2f}ms (sum={s:.1f})",
          flush=True)
    return out, dt


def main():
    print("devices:", jax.devices(), flush=True)
    C, hr, wr, K = 1, 816, 896, 4
    params = AlgorithmParams(box_hsize=11, box_vsize=11)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    ref = jax.random.uniform(k1, (3 * C, hr, wr), jnp.float32, 0.0, 255.0)
    src = jax.random.uniform(k2, (3 * C, hr, wr), jnp.float32, 0.0, 255.0)
    coef = jax.random.uniform(k3, (K, 3, 1, 1), jnp.float32, -0.05, 0.05)
    abc = jnp.broadcast_to(coef, (K, 3, hr, wr)).copy()
    abc = abc.at[:, 2].add(30.0)
    lo, hi = jnp.float32(-20.0), jnp.float32(120.0)

    jfused = jax.jit(ft.partial(fused_pair_cost_batch, params=params,
                                span_blocks=3))
    junfused = jax.jit(ft.partial(rect_pair_cost_batch, params=params,
                                  span_blocks=3))

    got, t_f = timeit("fused  (K=4)", jfused, ref, src, abc,
                      disp_lo=lo, disp_hi=hi)
    want, t_u = timeit("unfused(K=4)", junfused, ref, src, abc,
                       disp_lo=lo, disp_hi=hi)
    g = np.asarray(got)
    w = np.asarray(want)
    err = np.abs(g - w).max()
    print(f"max abs diff on-chip: {err:.5f}  speedup {t_u/t_f:.2f}x",
          flush=True)

    # K=1 case (refinement rounds).
    jf1 = jax.jit(ft.partial(fused_pair_cost_batch, params=params,
                             span_blocks=3))
    ju1 = jax.jit(ft.partial(rect_pair_cost_batch, params=params,
                             span_blocks=3))
    _, t_f1 = timeit("fused  (K=1)", jf1, ref, src, abc[:1],
                     disp_lo=lo, disp_hi=hi)
    _, t_u1 = timeit("unfused(K=1)", ju1, ref, src, abc[:1],
                     disp_lo=lo, disp_hi=hi)
    print(f"K=1 speedup {t_u1/t_f1:.2f}x", flush=True)


if __name__ == "__main__":
    main()
