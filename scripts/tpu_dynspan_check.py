"""Validate + time the dynamic-span row_gather on the real chip.

Correctness vs numpy bilinear (bf16 tolerance for packed), at realistic
(smooth, span ~2) and adversarial (full-span jitter) sample positions.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gipuma_tpu.ops.pallas_rowgather import pack_taps, row_gather_batch


def np_ref(src, x):
    C, H, W = src.shape
    B = x.shape[0]
    out = np.zeros((B, C, H, x.shape[2]), np.float32)
    xc = np.clip(x, 0, W - 1)
    x0 = np.clip(np.floor(xc).astype(np.int64), 0, W - 2)
    fx = np.clip(xc - x0, 0, 1)
    rows = np.arange(H)[None, :, None]
    for c in range(C):
        v0 = src[c][rows, x0]
        v1 = src[c][rows, x0 + 1]
        out[:, c] = v0 * (1 - fx) + v1 * fx
    return out


def check(label, src_j, x_j, span, expect, tol):
    f = jax.jit(lambda s, xx: row_gather_batch(s, xx, max_span_blocks=span))
    t0 = time.perf_counter()
    out = np.asarray(f(src_j, x_j))
    print(f"{label}: first call {time.perf_counter()-t0:.1f}s", flush=True)
    err = np.abs(out - expect)
    rel = err / np.maximum(np.abs(expect), 1.0)
    print(f"  max abs err {err.max():.4f}  max rel {rel.max():.5f}",
          flush=True)
    assert rel.max() < tol, f"{label}: mismatch"
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(src_j, x_j)
    np.asarray(out[0, 0, 0, :8])
    dt = (time.perf_counter() - t0) / reps
    n = out.size
    print(f"  {dt*1e3:7.2f} ms  {n/dt/1e9:6.2f} G samp/s", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    C, H, W = 3, 984, 1024
    src = rng.uniform(0, 255, (C, H, W)).astype(np.float32)
    src_j = jnp.asarray(src)
    src_p = jnp.asarray(pack_taps(src))
    base = np.arange(W, dtype=np.float32)[None, None, :] * np.ones(
        (4, H, 1), np.float32)
    x_smooth = np.clip(base + rng.uniform(-20, 20, (4, H, 1)).astype(
        np.float32), 0, W - 1)                      # per-row shift: span ~2
    # Per-sample jitter sized so any [8, 128] tile stays within 4 blocks
    # (tile x-range <= 128 + 240 + block alignment 127 < 512).
    x_wild = np.clip(base + rng.uniform(-120, 120, (4, H, W)).astype(
        np.float32), 0, W - 1)
    xs_j = jnp.asarray(x_smooth)
    xw_j = jnp.asarray(x_wild)

    e_s = np_ref(src, x_smooth)
    e_w = np_ref(src, x_wild)

    check("f32    span4 smooth", src_j, xs_j, 4, e_s, 1e-5)
    check("packed span4 smooth", src_p, xs_j, 4, e_s, 6e-3)
    check("f32    span4 wild  ", src_j, xw_j, 4, e_w, 1e-5)
    check("packed full  smooth", src_p, xs_j, None, e_s, 6e-3)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
