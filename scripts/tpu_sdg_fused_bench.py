"""A/B the fused window-grads cost kernel vs the unfused path on the chip.

Dino-rect-like shapes (one pair, K=4 candidates, box 11).  Checks
elementwise agreement on-device, then times both paths.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.ops.pallas_rowgather import pack_taps
from gipuma_tpu.ops.rect_cost import rect_pair_cost_batch


def t(label, fn, *args, reps=10):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:32s} {dt*1e3:8.2f} ms", flush=True)
    return out, dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    C, hr, wr, K = 1, 640, 768, 4
    box = 11
    params = AlgorithmParams(box_hsize=box, box_vsize=box)
    ref = jnp.asarray(rng.uniform(0, 255, (3 * C, hr, wr)).astype(np.float32))
    src = jnp.asarray(pack_taps(
        rng.uniform(0, 255, (C, hr, wr)).astype(np.float32)))
    coef = rng.uniform(-0.05, 0.05, (K, 3, 1, 1)).astype(np.float32)
    abc = jnp.asarray(np.broadcast_to(coef, (K, 3, hr, wr)).copy())
    abc = abc.at[:, 2].add(60.0)
    lo, hi = jnp.float32(40.0 - 16.0), jnp.float32(145.0 + 16.0)
    span = 4   # ceil((132 + 2*7 + 137)/128) + 1 — the build formula

    p_un = params.replace(fused_window_cost=False)
    f_un = jax.jit(lambda a, l, h: rect_pair_cost_batch(
        ref, src, a, p_un, disp_lo=l, disp_hi=h, span_blocks=span))
    f_fu = jax.jit(lambda a, l, h: rect_pair_cost_batch(
        ref, src, a, params, disp_lo=l, disp_hi=h, span_blocks=span))

    want = np.asarray(f_un(abc, lo, hi))
    got = np.asarray(f_fu(abc, lo, hi))
    bad = np.abs(want - got) > 1e-3 + 1e-5 * np.abs(want)
    print(f"agreement: {100.0 * (1 - bad.mean()):.4f}% "
          f"max|d|={np.abs(want-got).max():.2e}", flush=True)

    t("unfused (per-row gathers + XLA)", f_un, abc, lo, hi)
    t("fused kernel", f_fu, abc, lo, hi)

    # K=1 (init / single-candidate evals)
    f_un1 = jax.jit(lambda a, l, h: rect_pair_cost_batch(
        ref, src, a, p_un, disp_lo=l, disp_hi=h, span_blocks=span))
    f_fu1 = jax.jit(lambda a, l, h: rect_pair_cost_batch(
        ref, src, a, params, disp_lo=l, disp_hi=h, span_blocks=span))
    t("unfused K=1", f_un1, abc[:1], lo, hi)
    t("fused   K=1", f_fu1, abc[:1], lo, hi)


if __name__ == "__main__":
    main()
