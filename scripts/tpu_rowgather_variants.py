"""Microbenchmark row_gather variants on the real chip: packed vs f32,
span-narrowed vs full predicated scan, B=1 vs B=4, plus the raw
dynamic_gather ceiling — to find what actually dominates the kernel.
Rates in G samples/s (samples = B*C*H*Ws)."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gipuma_tpu.ops.pallas_rowgather import pack_taps, row_gather_batch


def rate(label, src, x, span, reps=10):
    f = jax.jit(lambda s, xx: row_gather_batch(s, xx,
                                               max_span_blocks=span))
    out = f(src, x)
    np.asarray(out[0, 0, 0, :8])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(src, x)
    np.asarray(out[0, 0, 0, :8])
    dt = (time.perf_counter() - t0) / reps
    n = out.size
    print(f"{label}: {dt*1e3:7.2f} ms  {n/dt/1e9:6.2f} G samp/s", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    C, H, W = 3, 984, 1024
    src = jax.random.uniform(key, (C, H, W), jnp.float32, 0.0, 255.0)
    src_p = jnp.asarray(pack_taps(np.asarray(src)))
    # Realistic warp positions: identity +- 60 px.
    base = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    jit1 = jax.random.uniform(key, (1, H, W), jnp.float32, -60.0, 60.0)
    jit4 = jax.random.uniform(key, (4, H, W), jnp.float32, -60.0, 60.0)
    x1 = jnp.clip(base[None] + jit1, 0, W - 1)
    x4 = jnp.clip(base[None] + jit4, 0, W - 1)

    rate("f32    span3 B=4", src, x4, 3)
    rate("packed span3 B=4", src_p, x4, 3)
    rate("f32    span2 B=4", src, jnp.clip(base[None] + jit4 * 0.2, 0, W - 1), 2)
    rate("packed span2 B=4", src_p, jnp.clip(base[None] + jit4 * 0.2, 0, W - 1), 2)
    rate("f32    full  B=4", src, x4, None)
    rate("packed full  B=4", src_p, x4, None)
    rate("f32    span3 B=1", src, x1, 3)
    rate("packed span3 B=1", src_p, x1, 3)


if __name__ == "__main__":
    main()
