"""Realistic-shape multichip dryrun + ICI collective-volume model
(VERDICT r4 item 7).

The per-round MULTICHIP artifact proves SPMD compilability at toy shapes
(24x32); this runs the tile x view rect layout at the BENCH shape —
480x640, 6 source views, production box 11 — on the 8-virtual-device CPU
mesh (tile=4 x view=2), records wall time, and computes the analytic
per-iteration ICI byte volume of each collective.  From that it projects
4-host scaling efficiency at DTU scale (the >=80% @ 4 hosts BASELINE
target needs at least a paper model while multi-chip hardware is absent).

Run:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo python scripts/multichip_realistic.py

Writes MULTICHIP_REALISTIC.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def ici_volume_model(h, w, V, K_prop, n_refine, iters, n_view, n_tile,
                    margin, bw_GBs, kernel_s_per_eval):
    """Per-run ICI bytes + a roofline-style scaling projection.

    Collectives in the tile x view layout (parallel/tiled_rect.py +
    parallel/sharded.view_sharded_cost_fn):

    * view all-gather: each sweep stage all-gathers the local per-view
      cost block [V_local, K, H, W2] f32 over the view axis — every chip
      receives (V - V_local) * K * H * W2 * 4 bytes per stage.  Stages
      per iteration: 2 parities x (close K_prop + far K_prop + refine) =
      6 stages (matching the reference's 6 sub-sweeps,
      gipuma.cu:1911-1941).
    * tile halo ppermute: before each propagation sub-sweep each band
      sends m overlap rows of the plane field [m, W, 4ch] f32 both ways.
    """
    w2 = w // 2
    stages = 2 * 3
    ks = [K_prop, K_prop, n_refine]
    gather_bytes = 0
    for k in [k for k in ks for _ in range(2)]:
        gather_bytes += (V - V // n_view) * k * h * w2 * 4
    # Halo exchange happens once per propagation sub-sweep (close + far)
    # per parity: 4 exchanges/iteration, each m rows x [W, 4] f32 x
    # 2 directions.
    halo_bytes = 4 * 2 * margin * w * 4 * 4
    per_iter = gather_bytes + halo_bytes
    total = per_iter * iters

    # Device compute per iteration (very rough): evals = stages * K *
    # window samples... use the measured kernel seconds per (stage, view)
    # eval instead; scaling projection only needs the RATIO.
    compute_s = iters * stages * (V / n_view) * kernel_s_per_eval
    comm_s = total / (bw_GBs * 1e9)
    eff = compute_s / (compute_s + comm_s)
    return {
        "per_iteration_bytes": per_iter,
        "view_allgather_bytes_per_iter": gather_bytes,
        "tile_halo_bytes_per_iter": halo_bytes,
        "total_bytes": total,
        "model_compute_s": compute_s,
        "model_comm_s": comm_s,
        "model_overlap0_efficiency": eff,
    }


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gipuma_tpu.config import PRESETS
    from gipuma_tpu.geometry.camera import FAKE_BASELINE
    from gipuma_tpu.parallel.mesh import make_mesh
    from gipuma_tpu.parallel.tiled_rect import (finalize_tiled,
                                                prepare_tiled_rect,
                                                run_patchmatch_tiled_rect)
    from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene
    from gipuma_tpu.geometry.camera import build_rig

    assert len(jax.devices()) >= 8, "need 8 virtual devices"

    # Shape override: GIPUMA_MC_SHAPE=240x320 runs a reduced (but still
    # far-beyond-toy) dryrun when the full bench-shape CPU-mesh compile
    # does not fit the session wall; the ICI volume model below is
    # analytic and always reported at the FULL bench + DTU shapes.
    h, w, n_views = 480, 640, 7
    shp = os.environ.get("GIPUMA_MC_SHAPE")
    if shp:
        h, w = (int(t) for t in shp.split("x"))
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w,
                                     focal=800.0, plane_depth=5.0,
                                     slant=(0.2, -0.1), texture="noise")
    depth_min, depth_max = 3.0, 8.0
    # Production box/increment; 2 iterations keep the CPU wall tractable
    # (the volume model scales to the full schedule analytically).
    iters = 2
    params = PRESETS["middlebury"].replace(
        seed=0, cost_path="rect", iterations=iters, pyramid_levels=1,
    ).with_depth_range(depth_min, depth_max, rig.f, FAKE_BASELINE)

    mesh = make_mesh(8, view_shards=2, tile_shards=4)
    subset = list(range(1, n_views))

    t0 = time.perf_counter()
    prep = prepare_tiled_rect(images, rig, subset, params, depth_min,
                              depth_max, n_tiles=4)
    prep_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    st = run_patchmatch_tiled_rect(prep, jax.random.PRNGKey(0), mesh)
    depth, normals, cost = finalize_tiled(prep, st)
    depth = np.asarray(depth)
    run_s = time.perf_counter() - t0

    interior = np.s_[16:-16, 16:-16]
    err = np.abs(depth[interior] - gt[interior]) / gt[interior]
    med = float(np.median(err))

    # Volume model at the bench shape and a DTU-scale projection.
    # kernel_s_per_eval: fused-kernel device seconds per (stage, view)
    # evaluation from the round-4 v5e breakdown: ~73 ms device kernel time
    # over ~54 stage-view evals => ~1.35 ms.
    K_prop, n_refine = 4, 2
    model_bench = ici_volume_model(480, 640, len(subset), K_prop, n_refine,
                                   8, 2, 4, prep.margin,
                                   bw_GBs=45.0, kernel_s_per_eval=1.35e-3)
    # DTU full-scale: 1600x1200, 9 views, 4 hosts (view axis over DCN is
    # the wrong layout — project the job axis over hosts instead, with
    # tile x view INSIDE a host's 4 chips: per-host comm is then the same
    # ICI volume, DCN carries only per-view outputs (~2 MB/view), so
    # 4-host efficiency is bounded by single-host behavior + DCN output
    # shipping, not by collectives).
    model_dtu = ici_volume_model(1200, 1600, 9, K_prop, n_refine, 8, 2, 2,
                                 prep.margin, bw_GBs=45.0,
                                 kernel_s_per_eval=1.35e-3 * (4.0))

    out = {
        "ok": bool(med < 5e-3 and np.isfinite(depth).all()),
        "shape": [h, w],
        "views": len(subset),
        "mesh": {"tile": 4, "view": 2},
        "box": [params.box_hsize, params.box_vsize],
        "margin": prep.margin,
        "prep_s": round(prep_s, 2),
        "run_s_cpu8": round(run_s, 2),
        "median_rel_err": med,
        "ici_model_bench_shape": model_bench,
        "ici_model_dtu_4host": model_dtu,
        "notes": [
            "run_s is CPU-mesh wall (8 virtual devices on 2 cores) — NOT "
            "a TPU time; it validates the layout at a realistic shape.",
            "efficiency model: eff = compute/(compute+comm) with zero "
            "compute/comm overlap (pessimistic) at 45 GB/s ICI per link.",
            "4-host DTU projection keeps tile x view INSIDE each host "
            "(job axis over DCN): cross-host traffic is only per-view "
            "outputs (~2 MB/view over seconds of compute), so projected "
            "4-host scaling efficiency ~= model_overlap0_efficiency of "
            "one host (>= 0.9 by the model) — comfortably above the "
            "0.80 BASELINE bar, with the stated assumptions.",
        ],
    }
    (ROOT / "MULTICHIP_REALISTIC.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
