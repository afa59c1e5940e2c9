"""A/B the dynamic-span row_gather against the previous static-span kernel
on realistic rect-cost shapes (dino-scale rect grid, packed taps, B=4/B=1),
interleaved to cancel relay drift."""
from __future__ import annotations

import importlib.util
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

spec = importlib.util.spec_from_file_location("old_rg", "/tmp/old_rowgather.py")
old_rg = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_rg)

from gipuma_tpu.ops.pallas_rowgather import pack_taps, row_gather_batch


def timer(f, src, x, reps=20):
    out = f(src, x)
    np.asarray(out[0, 0, 0, :8])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(src, x)
    np.asarray(out[0, 0, 0, :8])
    return (time.perf_counter() - t0) / reps


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    H, W = 984, 1024
    src = rng.uniform(0, 255, (3, H, W)).astype(np.float32)
    src_p = jnp.asarray(pack_taps(src))
    base = np.arange(W, dtype=np.float32)[None, None, :] * np.ones(
        (4, H, 1), np.float32)
    # Converged-field-like positions: smooth per-row shift, span ~2 blocks.
    x4 = jnp.asarray(np.clip(base + rng.uniform(-45, 45, (4, H, 1)).astype(
        np.float32), 0, W - 1))
    x1 = x4[:1]

    fo4 = jax.jit(lambda s, x: old_rg.row_gather_batch(s, x,
                                                       max_span_blocks=4))
    fn4 = jax.jit(lambda s, x: row_gather_batch(s, x, max_span_blocks=4))
    fo1 = jax.jit(lambda s, x: old_rg.row_gather_batch(s, x,
                                                       max_span_blocks=4))
    fn1 = jax.jit(lambda s, x: row_gather_batch(s, x, max_span_blocks=4))

    # Compile all four first.
    for f, x in ((fo4, x4), (fn4, x4), (fo1, x1), (fn1, x1)):
        np.asarray(f(src_p, x)[0, 0, 0, :8])
    # Equality check old vs new.
    d = np.abs(np.asarray(fo4(src_p, x4)) - np.asarray(fn4(src_p, x4)))
    print("old-vs-new max diff:", d.max(), flush=True)

    for rep in range(3):
        to4 = timer(fo4, src_p, x4)
        tn4 = timer(fn4, src_p, x4)
        to1 = timer(fo1, src_p, x1)
        tn1 = timer(fn1, src_p, x1)
        print(f"rep{rep}: B=4 old {to4*1e3:6.2f} ms  new {tn4*1e3:6.2f} ms "
              f"({to4/tn4:4.2f}x) | B=1 old {to1*1e3:6.2f} ms  new "
              f"{tn1*1e3:6.2f} ms ({to1/tn1:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
