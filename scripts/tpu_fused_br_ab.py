"""Fused-kernel row-block (BR) A/B on the chip: compile time vs runtime.

The per-grid-step unroll is (BR/8) * G * T * K * E gather bodies; Mosaic
compile time through the remote helper grows superlinearly with it, so the
right BR balances one-time compile cost (user experience, iteration speed)
against steady-state runtime.  Dino-L1-like shapes, K=4.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.ops.pallas_rowgather import pack_taps
from gipuma_tpu.ops.pallas_sdg_fused import fused_sdg_cost_batch


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    C, hr, wr, K = 1, 984, 768, 4
    params = AlgorithmParams(box_hsize=11, box_vsize=11)
    ref = jnp.asarray(rng.uniform(0, 255, (3 * C, hr, wr)).astype(np.float32))
    src = jnp.asarray(pack_taps(
        rng.uniform(0, 255, (C, hr, wr)).astype(np.float32)))
    coef = rng.uniform(-0.05, 0.05, (K, 3, 1, 1)).astype(np.float32)
    abc = jnp.asarray(np.broadcast_to(coef, (K, 3, hr, wr)).copy())
    abc = abc.at[:, 2].add(60.0)
    lo, hi = jnp.float32(26.0), jnp.float32(128.0)
    span = 3

    import os
    want = None
    for br in (32, 16, 8):
        os.environ["GIPUMA_FUSED_BR"] = str(br)
        fn = jax.jit(lambda a: fused_sdg_cost_batch(
            ref, src, a, params, disp_lo=lo, disp_hi=hi, span_blocks=span))
        t0 = time.perf_counter()
        out = np.asarray(fn(abc))
        tc = time.perf_counter() - t0
        if want is None:
            want = out
        else:
            print(f"  BR={br} max|d| vs BR=32: "
                  f"{np.abs(out - want).max():.2e}", flush=True)
        t0 = time.perf_counter()
        for _ in range(10):
            r = fn(abc)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / 10
        print(f"BR={br}: compile+first {tc:6.1f} s   steady {dt*1e3:7.2f} ms",
              flush=True)
    os.environ.pop("GIPUMA_FUSED_BR", None)


if __name__ == "__main__":
    main()
