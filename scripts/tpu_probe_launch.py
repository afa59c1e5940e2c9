"""Probe: where do the rect-path TPU cycles go?

Hypotheses to separate:
  (a) pallas launch overhead through the axon relay (many small launches),
  (b) row_gather throughput below the measured 35 G samples/s at these
      shapes,
  (c) XLA overhead between launches (dynamic_slice materialization etc).

All timings force a device->host fetch (np.asarray) — block_until_ready
through the relay returns early, so async timings lie.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gipuma_tpu.ops.pallas_rowgather import row_gather
from gipuma_tpu.ops.rect_cost import rect_pair_cost
from gipuma_tpu.config import PRESETS


def sync_time(label, fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])          # compile + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])          # force full pipeline drain
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    hr, wr = 816, 896
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (3, hr, wr), jnp.float32)
    x = jnp.clip(jax.random.uniform(key, (hr, wr)) * (wr - 2), 0, wr - 2)

    # (1) one row_gather launch at pair shape: 2.2M samples x 3ch.
    f1 = jax.jit(lambda s, xx: row_gather(s, xx))
    dt1 = sync_time("single row_gather [3,816,896]", f1, src, x)
    print(f"  -> {3*hr*wr/dt1/1e9:.1f} G elem/s", flush=True)

    # (2) 36 row_gathers in a lax.scan (the window loop shape).
    def f36(s, xx):
        def step(acc, off):
            sm = row_gather(s, xx + off)
            return acc + sm.sum(0), None
        acc, _ = jax.lax.scan(step, jnp.zeros((hr, wr)),
                              jnp.arange(36, dtype=jnp.float32))
        return acc
    dt36 = sync_time("36x row_gather scan", jax.jit(f36), src, x)
    print(f"  -> per call {dt36/36*1e3:.2f} ms; "
          f"{36*3*hr*wr/dt36/1e9:.1f} G elem/s", flush=True)

    # (3) tiny pallas launch x 36 — pure launch overhead.
    src_t = src[:, :8, :128]
    x_t = x[:8, :128] * 0 + 5.0
    def ftiny(s, xx):
        def step(acc, _):
            return acc + row_gather(s, xx)[0], None
        acc, _ = jax.lax.scan(step, jnp.zeros((8, 128)),
                              jnp.arange(36, dtype=jnp.float32))
        return acc
    dtt = sync_time("36x tiny row_gather", jax.jit(ftiny), src_t, x_t)
    print(f"  -> per tiny launch {dtt/36*1e3:.3f} ms", flush=True)

    # (4) the full rect_pair_cost at pair shape (36 offsets + VPU math).
    params = PRESETS["middlebury"]
    abc = jnp.stack([jnp.full((hr, wr), 0.01), jnp.full((hr, wr), 0.01),
                     jnp.full((hr, wr), 3.0)])
    fpc = jax.jit(lambda r, s, a: rect_pair_cost(r, s, a, params))
    dtc = sync_time("rect_pair_cost [3,816,896]", fpc, src, src, abc)

    # (5) XLA-only: 36 dynamic_slices + arithmetic, no pallas.
    srcp = jnp.pad(src, ((0, 0), (7, 7), (0, 0)))
    def fxla(s):
        def step(acc, off):
            sl = jax.lax.dynamic_slice(
                srcp, (0, off.astype(jnp.int32) % 14, 0), (3, hr, wr))
            return acc + sl.sum(0), None
        acc, _ = jax.lax.scan(step, jnp.zeros((hr, wr)),
                              jnp.arange(36))
        return acc
    sync_time("36x dynamic_slice XLA only", jax.jit(fxla), src)


if __name__ == "__main__":
    main()
