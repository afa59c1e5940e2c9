"""On-device kernel equivalence artifact (VERDICT r2 item 5).

Runs every production Pallas kernel on the TPU and in interpret mode on
IDENTICAL inputs, in ONE process (the compile relay is slow — batch all
qualification), and writes KERNEL_EQUIV.json with the max abs diff per
kernel.  Guards the Mosaic mis-lowering class of bug (two found so far:
dynamic negative lane roll, alignment provability) against silent
regression.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_kernel_equiv.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gipuma_tpu.config import AlgorithmParams
    from gipuma_tpu.ops.pallas_rowgather import (pack_taps, row_gather,
                                                 row_gather_affine,
                                                 row_gather_batch)
    from gipuma_tpu.ops.pallas_sdg_fused import fused_sdg_cost_batch
    from gipuma_tpu.ops.permute2d import build_tables, permute2d

    assert jax.default_backend() != "cpu", \
        "this artifact must run on the TPU backend"
    rng = np.random.default_rng(0)
    results = {}

    def record(name, dev, itp, tol=1e-3):
        # tol covers device-vs-host f32 arithmetic differences (FMA
        # contraction, reduction order) on 0..255-scale values; index/
        # gather bugs produce O(1..255) diffs, far above it.
        dev = np.asarray(dev)
        itp = np.asarray(itp)
        if np.issubdtype(dev.dtype, np.integer):
            dev = dev.astype(np.int64)
            itp = itp.astype(np.int64)
        d = float(np.max(np.abs(dev - itp)))
        results[name] = {"max_abs_diff": d, "shape": list(dev.shape),
                         "tol": tol, "ok": bool(d <= tol)}
        print(json.dumps({name: results[name]}), flush=True)

    # --- row_gather (f32 + packed + nearest) -----------------------------
    H, W = 64, 512
    src = rng.uniform(0, 255, (2, H, W)).astype(np.float32)
    x = np.clip(rng.uniform(0, W - 1, (H, W)), 0, W - 1).astype(np.float32)
    # Bound per-tile span so the scratch-window path engages: local jitter
    # around the identity map.
    base = np.arange(W, dtype=np.float32)[None, :]
    x = np.clip(base + rng.uniform(-40, 40, (H, W)).astype(np.float32),
                0, W - 1)
    srcj = jnp.asarray(src)
    xj = jnp.asarray(x)
    record("row_gather_f32",
           row_gather(srcj, xj, max_span_blocks=2),
           row_gather(srcj, xj, interpret=True, max_span_blocks=2))
    packed = jnp.asarray(pack_taps(src))
    record("row_gather_packed",
           row_gather(packed, xj, max_span_blocks=2),
           row_gather(packed, xj, interpret=True, max_span_blocks=2))
    record("row_gather_nearest",
           row_gather(srcj, xj, max_span_blocks=2, nearest=True),
           row_gather(srcj, xj, interpret=True, max_span_blocks=2,
                      nearest=True))
    xb = jnp.stack([xj, jnp.clip(xj + 3.25, 0, W - 1)])
    record("row_gather_batch",
           row_gather_batch(packed, xb, max_span_blocks=2),
           row_gather_batch(packed, xb, interpret=True, max_span_blocks=2))
    # int32 nearest pass-through (round 5: the f16-pair-packed plane words
    # of config.rect_pack_m ride the forward permute as opaque int32) —
    # must be BIT-exact: any dtype promotion in the kernel would corrupt
    # the packed halves identically detectably here.
    src_i32 = jnp.asarray(rng.integers(np.iinfo(np.int32).min,
                                       np.iinfo(np.int32).max,
                                       (2, H, W), dtype=np.int32))
    record("row_gather_nearest_int32",
           row_gather(src_i32, xj, max_span_blocks=2, nearest=True),
           row_gather(src_i32, xj, interpret=True, max_span_blocks=2,
                      nearest=True), tol=0)

    # --- row_gather_affine ----------------------------------------------
    K = 2
    abc = np.stack([
        np.stack([rng.uniform(-0.05, 0.05, (H, W)),
                  rng.uniform(-0.05, 0.05, (H, W)),
                  rng.uniform(8.0, 24.0, (H, W))]) for _ in range(K)
    ]).astype(np.float32)
    abcj = jnp.asarray(abc)
    args = (packed, abcj, (-2, 0, 2), jnp.float32(1.0),
            jnp.float32(-20.0), jnp.float32(40.0))
    record("row_gather_affine",
           row_gather_affine(*args, max_span_blocks=2),
           row_gather_affine(*args, interpret=True, max_span_blocks=2))

    # --- permute2d (both passes, smooth map) ------------------------------
    out_h, out_w = 56, 384
    ys, xs = np.mgrid[:out_h, :out_w].astype(np.float64)
    R = np.clip(np.round(ys * (H - 1) / (out_h - 1)
                         + 2.0 * np.sin(xs / 40.0)), 0, H - 1)
    Cc = np.clip(np.round(xs * (W - 1) / (out_w - 1)
                          + 3.0 * np.cos(ys / 16.0)), 0, W - 1)
    tabs = build_tables(R, Cc, H, W)
    c1 = jnp.asarray(tabs.c1)
    r = jnp.asarray(tabs.r)
    record("permute2d",
           permute2d(srcj, c1, r, max_span_blocks=3),
           permute2d(srcj, c1, r, interpret=True, max_span_blocks=3))

    # Masked permute (config.rect_permute_skip): the row_gather output-
    # tile mask must lower correctly on device — compare on masked-ON
    # tiles only (off tiles are unspecified by contract).  mask2 covers
    # pass 2's transposed [out_w, out_h] output; mask1 uses the same
    # kernel mechanism on pass 1, so one geometry qualifies the lowering.
    tm2 = np.zeros((out_w // 8, -(-out_h // 128)), np.int32)
    tm2[::2] = 1
    m2j = jnp.asarray(tm2)
    on2 = jnp.asarray(
        np.repeat(np.repeat(tm2 > 0, 8, 0), 128, 1)[:out_w, :out_h].T)
    record("permute2d_mask2",
           jnp.where(on2, permute2d(srcj, c1, r, max_span_blocks=3,
                                    mask2=m2j), 0.0),
           jnp.where(on2, permute2d(srcj, c1, r, interpret=True,
                                    max_span_blocks=3, mask2=m2j), 0.0))

    # --- fused window-cost kernel (aligned + roll + tile mask) -----------
    hr, wr = 32, 512
    params = AlgorithmParams(box_hsize=7, box_vsize=7)
    ref = rng.uniform(0, 255, (3, hr, wr)).astype(np.float32)
    srcw = rng.uniform(0, 255, (1, hr, wr)).astype(np.float32)
    srcp = jnp.asarray(pack_taps(srcw))
    refj = jnp.asarray(ref)
    abck = np.stack([
        np.stack([np.full((hr, wr), a, np.float32),
                  np.full((hr, wr), b, np.float32),
                  np.full((hr, wr), c, np.float32)])
        for a, b, c in [(0.02, -0.03, 12.0), (-0.04, 0.01, 18.0)]])
    abckj = jnp.asarray(abck)
    lo, hi = jnp.float32(-20.0), jnp.float32(40.0)
    for tag, pp in [("fused_sdg", params),
                    ("fused_sdg_onesided",
                     params.replace(sdg_onesided_edges=True)),
                    ("fused_sdg_roll",
                     params.replace(fused_roll=True)),
                    # The two-stage cull's sparse-window configuration
                    # (cull_box x cull_box at cull_increment — a distinct
                    # unroll/gather geometry of the same kernel).
                    ("fused_sdg_cull_window",
                     params.replace(box_hsize=9, box_vsize=9,
                                    window_increment=4))]:
        record(tag,
               fused_sdg_cost_batch(refj, srcp, abckj, pp,
                                    disp_lo=lo, disp_hi=hi, span_blocks=3),
               fused_sdg_cost_batch(refj, srcp, abckj, pp, interpret=True,
                                    disp_lo=lo, disp_hi=hi, span_blocks=3))
    tm = np.ones((hr // 8, wr // 128), np.int32)
    tm[1, 1] = 0
    tmj = jnp.asarray(tm)
    dev = np.asarray(fused_sdg_cost_batch(
        refj, srcp, abckj, params, disp_lo=lo, disp_hi=hi,
        span_blocks=3, tile_ok=tmj))
    itp = np.asarray(fused_sdg_cost_batch(
        refj, srcp, abckj, params, interpret=True, disp_lo=lo, disp_hi=hi,
        span_blocks=3, tile_ok=tmj))
    m = np.kron(tm, np.ones((8, 128))).astype(bool)
    d = float(np.max(np.abs(dev - itp)[:, m]))
    results["fused_sdg_tile_ok"] = {"max_abs_diff": d,
                                    "shape": list(dev.shape),
                                    "tol": 1e-3, "ok": bool(d <= 1e-3),
                                    "note": "compared on masked-on tiles"}
    print(json.dumps({"fused_sdg_tile_ok": results["fused_sdg_tile_ok"]}),
          flush=True)

    summary = {"backend": jax.default_backend(),
               "devices": [str(d) for d in jax.devices()],
               "all_ok": all(v["ok"] for v in results.values()),
               "kernels": results}
    out = ROOT / "KERNEL_EQUIV.json"
    out.write_text(json.dumps(summary, indent=1))
    print(f"wrote {out}: all_ok={summary['all_ok']}")
    return 0 if summary["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
