"""Fusion at DTU job scale (VERDICT r2 item 7): N=49 views at >= 0.5x DTU
resolution through the in-tree fusibile-semantics fusion, timed, with
DTU-style accuracy/completeness vs the analytic ground-truth cloud.

The reference delegates this stage to the out-of-tree `fusibile` binary at
exactly this job shape (49 views per DTU scan, scripts/dtu_fast.sh:56-57);
this artifact shows the in-tree stage handles the real shape in
minutes-class time, not just the toy test shapes.

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/fusion_at_scale.py
    -> FUSION_SCALE.json
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np


def main() -> int:
    import os
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from gipuma_tpu.config import FusionParams
    from gipuma_tpu.eval.metrics import accuracy_completeness
    from gipuma_tpu.fusion.fuse import fuse_depthmaps
    from gipuma_tpu.utils.synthetic import intersect_plane, make_ring_P

    num_cams, h, w = 49, 600, 800            # 0.5x DTU 1600x1200, DTU N
    focal, depth_mid = 1000.0, 550.0         # DTU-ish mm scale
    n_pl = np.array([0.15, -0.1, 1.0])
    n_pl /= np.linalg.norm(n_pl)
    d_pl = -n_pl @ np.array([0.0, 0.0, depth_mid])

    rng = np.random.default_rng(0)
    Ps = make_ring_P(num_cams, h, w, focal, target_depth=depth_mid,
                     radius=depth_mid / 4.0)
    t0 = time.perf_counter()
    depths, normals = [], []
    for P in Ps:
        X, dep = intersect_plane(P, h, w, n_pl, d_pl)
        # Realistic per-view depth noise (~0.1% of depth) + 1% gross
        # outliers the consistency check must reject.
        dep = dep * (1.0 + rng.normal(scale=1e-3, size=dep.shape))
        out_mask = rng.random(dep.shape) < 0.01
        dep = np.where(out_mask, dep * rng.uniform(0.5, 1.5, dep.shape),
                       dep)
        depths.append(dep.astype(np.float32))
        normals.append(np.broadcast_to(n_pl, (h, w, 3)).astype(np.float32))
    t_gen = time.perf_counter() - t0
    depths = np.stack(depths)
    normals = np.stack(normals)

    params = FusionParams(disp_thresh=0.25, normal_thresh=30.0,
                          num_consistent=3)
    t0 = time.perf_counter()
    pts, nrm, col = fuse_depthmaps(depths, normals, Ps, params, f=focal)
    t_fuse = time.perf_counter() - t0

    # Optional: the view-sharded fusion on the virtual 8-device CPU mesh
    # at the SAME shape (VERDICT r3 item 5).  Run with
    #   XLA_FLAGS=--xla_force_host_platform_device_count=8 ... --sharded
    t_sharded = None
    sharded_pts = None
    if "--sharded" in sys.argv:
        import jax
        from jax.sharding import Mesh

        from gipuma_tpu.fusion.sharded import fuse_depthmaps_sharded
        devs = np.array(jax.devices())
        mesh = Mesh(devs, ("view",))
        t0 = time.perf_counter()
        pts_s, _, _ = fuse_depthmaps_sharded(depths, normals, Ps, params,
                                             mesh, f=focal)
        t_sharded = time.perf_counter() - t0
        sharded_pts = int(len(pts_s))
        assert sharded_pts == len(pts), (sharded_pts, len(pts))

    # Ground-truth cloud: the exact plane intersections of view 0 (the
    # analytic surface sampled at sensor resolution).
    X0, _ = intersect_plane(Ps[0], h, w, n_pl, d_pl)
    gt_pts = X0.reshape(-1, 3)
    sub = rng.choice(len(gt_pts), size=min(len(gt_pts), 120_000),
                     replace=False)
    t0 = time.perf_counter()
    acc, comp = accuracy_completeness(
        pts[rng.choice(len(pts), size=min(len(pts), 120_000),
                       replace=False)],
        gt_pts[sub])
    t_eval = time.perf_counter() - t0

    res_plane = np.abs(pts @ n_pl + d_pl)
    out = {
        "views": num_cams, "shape": [h, w],
        "points_fused": int(len(pts)),
        "fuse_seconds": round(t_fuse, 2),
        "gen_seconds": round(t_gen, 2),
        "eval_seconds": round(t_eval, 2),
        "accuracy_mm": round(float(acc), 4),
        "completeness_mm": round(float(comp), 4),
        "median_plane_residual_mm": round(float(np.median(res_plane)), 4),
        "params": {"disp_thresh": params.disp_thresh,
                   "normal_thresh": params.normal_thresh,
                   "num_consistent": params.num_consistent},
        "note": ("synthetic slanted plane at DTU mm scale; 0.1% depth "
                 "noise + 1% gross outliers injected per view; matches "
                 "the dtu_fast fusion job shape (49 views, "
                 "scripts/dtu_fast.sh:56-57) at 0.5x resolution"),
        "dtu_metric_mapping": (
            "Once real DTU imagery exists (DATA_REQUEST.md #3): run "
            "scripts/run_real_dataset.sh <scan> with the dtu_fast preset "
            "(49 ref views, fusion disp_thresh 0.1 / normal_thresh 30 / "
            "num_consistent 3 — scripts/dtu_fast.sh:24-26,56-57), then "
            "eval/metrics.accuracy_completeness(fused_pts, gt_pts) "
            "against the DTU structured-light reference cloud: accuracy "
            "= median distance fused->GT, completeness = median GT->"
            "fused, both in mm (pass max_dist=20 for the standard DTU "
            "outlier cut) — the same median-based definition as the "
            "ICCV'15 table "
            "(BASELINE.md).  The bar is within 2% of the reference "
            "binary's numbers on the same scan (BASELINE.json); the "
            "acc/comp printed here is this metric on the synthetic "
            "plane scene (noise floor ~1 mm by construction of the "
            "injected 0.1% depth noise at 550 mm)."),
    }
    if t_sharded is not None:
        out["sharded_8dev_seconds"] = round(t_sharded, 2)
        out["sharded_points"] = sharded_pts
        out["sharded_note"] = (
            "fusion/sharded.py on the virtual 8-device CPU mesh (2 real "
            "cores — wall time is contention-bound, the artifact is the "
            "point-for-point EQUALITY with the single-device result plus "
            "the psum composition compiling/executing at the real shape)")
    print(json.dumps(out))
    (ROOT / "FUSION_SCALE.json").write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
