"""Rect supersampling trim A/B (VERDICT r2 item 1-ii).

Sweeps `rect_slope_req` (and the routing budget) and reports, per setting:
the rect-grid work proxy (evaluated footprint tiles per image pixel — what
the fused kernel actually runs under rect_footprint_skip) and the depth
quality on the parity synthetic scene.  Quality is the gate: the build
retries with inflated scales whenever plane routing exceeds the budget, so
lower slope targets trade supersampled rows/columns for more
routing-budget pressure.

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python -u scripts/supersample_ab.py
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
    jax.config.update("jax_platforms", "cpu")
    from gipuma_tpu.config import PRESETS
    from gipuma_tpu.geometry.camera import FAKE_BASELINE
    from gipuma_tpu.models.patchmatch import (finalize,
                                              run_patchmatch_host_loop)
    from gipuma_tpu.models.rect_scene import build_rect_scene
    from gipuma_tpu.ops.rect_cost import rect_multiview_cost
    from gipuma_tpu.utils.synthetic import plane_scene

    h, w, num_cams = 192, 256, 5
    base = PRESETS["middlebury"]
    depth_mid = 0.5 * (base.depth_min + base.depth_max)
    images, rig, gt, (n_w, _) = plane_scene(
        num_cams=num_cams, h=h, w=w, focal=1.25 * w,
        plane_depth=depth_mid, slant=(0.2, -0.1), radius=depth_mid / 4.0)
    subset = list(range(1, num_cams))
    border = 12
    s = np.s_[border:-border, border:-border]

    rows = []
    for slope_req, budget in [(1.05, 0.005), (1.0, 0.005), (0.95, 0.01),
                              (0.9, 0.02), (0.85, 0.02)]:
        params = base.replace(
            seed=0, view_selection=False, pyramid_levels=1,
            rect_slope_req=slope_req, rect_routing_budget=budget)
        params = params.with_depth_range(base.depth_min, base.depth_max,
                                         rig.f, FAKE_BASELINE)
        scene, info = build_rect_scene(images, rig, subset, params,
                                       base.depth_min, base.depth_max)
        tiles = float(np.asarray(scene.tile_ok).sum()) * 8 * 128
        bbox = sum(p["rect_shape"][0] * p["rect_shape"][1]
                   for p in info["pairs"])
        bad = max(p.get("routing_bad_frac", 0.0) for p in info["pairs"])
        st = run_patchmatch_host_loop(scene, params, jax.random.PRNGKey(0),
                                      cost_fn=rect_multiview_cost)
        d, n, _ = finalize(st, scene.base)
        dd = np.asarray(d)[s]
        g = np.asarray(gt)[s]
        rel = np.abs(dd - g) / g
        nn = np.asarray(n)[s]
        ang = np.degrees(np.arccos(np.clip(
            np.abs(nn @ np.asarray(n_w, np.float64)), 0, 1)))
        row = {
            "slope_req": slope_req, "budget": budget,
            "tiles_per_imgpx": round(tiles / (len(subset) * h * w), 3),
            "bbox_per_imgpx": round(bbox / (len(subset) * h * w), 3),
            "max_routing_bad": round(bad, 5),
            "med": float(np.median(rel)),
            "p99": float(np.quantile(rel, 0.99)),
            "n_med_deg": float(np.median(ang)),
            "scales": [p.get("scales") for p in info["pairs"]],
        }
        print(json.dumps(row), flush=True)
        rows.append(row)
    (ROOT / "SUPERSAMPLE_AB.json").write_text(json.dumps(rows, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
