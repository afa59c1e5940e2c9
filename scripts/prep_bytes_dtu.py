"""Quantify the host->device payload of a DTU-scale RectScene (VERDICT
r4 item 3: prep 58.8 s/view at 1600x1200 = ~25 s numpy build + ~30 s
relay transfer; the transfer side is bounded by shipped bytes at the
relay's ~15 MB/s warm rate).

Builds ONE full-scale scene on the real DTU rig (reference calib files
read at run time) on CPU and prints per-field device-array bytes, the
total, and the projected relay seconds — the factual basis for the
"ship only original images" device-side-build design in ROADMAP.md.

Run:  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/prep_bytes_dtu.py
"""
from __future__ import annotations

import glob
import json
import os
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

CALIB_DIR = "/root/reference/data/dtu/calib"
PATTERN = "rect_0??_3_r5000.png.P"
RELAY_MBS = 15.0


def main() -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")

    from gipuma_tpu.config import PRESETS
    from gipuma_tpu.geometry.camera import FAKE_BASELINE, build_rig
    from gipuma_tpu.io.calib import read_P_file
    from gipuma_tpu.models.rect_scene import build_rect_scene
    from gipuma_tpu.select import select_views
    from gipuma_tpu.utils.synthetic import plane_scene_for_rig

    files = sorted(glob.glob(os.path.join(CALIB_DIR, PATTERN)))
    Ps_all = [read_P_file(f) for f in files]
    h, w = 1200, 1600
    params = PRESETS["dtu_fast"].replace(cost_path="rect")
    order = [0] + list(range(1, len(Ps_all)))
    rig = build_rig(Ps_all, [str(i) for i in order])
    subset, dmin, dmax = select_views(rig, w, h, params)
    params = params.with_depth_range(dmin, dmax, rig.f, FAKE_BASELINE)
    images, _, _ = plane_scene_for_rig(Ps_all, h, w, 550.0,
                                       slant=(0.15, -0.1), texture="noise")
    scene, _ = build_rect_scene(images, rig, subset, params, dmin, dmax)

    # Device-RESIDENT footprint (post-expansion) per field.
    rows = []
    resident = 0
    for name, val in scene._asdict().items():
        if val is None or not hasattr(val, "nbytes"):
            continue
        nb = int(np.asarray(val).nbytes)
        resident += nb
        rows.append((name, tuple(np.asarray(val).shape),
                     str(np.asarray(val).dtype), nb))
    rows.sort(key=lambda r: -r[3])
    for name, shape, dt, nb in rows:
        print(f"resident {name:12s} {str(shape):28s} {dt:8s} "
              f"{nb/1e6:9.1f} MB")

    # SHIPPED payload (what actually crosses the relay, models/
    # rect_scene.py assemble(): images as f16, permutation tables as
    # int16 past f16's 2048 exact-int range, masks int32).
    V = int(scene.fwd_r.shape[0])
    hrp, wrp = int(scene.fwd_r.shape[-2]), int(scene.fwd_r.shape[-1])
    s_sq = int(scene.ret_r.shape[-1])
    shipped = {
        "ref+src images f16": 2 * V * hrp * wrp * 2,
        "fwd_r i16": V * hrp * wrp * 2,
        "fwd_c1 i16": V * s_sq * wrp * 2,
        "ret_c1 i16": V * hrp * s_sq * 2,
        "ret_r i16": V * s_sq * s_sq * 2,
        "tile/permute masks i32": sum(
            int(np.asarray(m).nbytes) for m in
            (scene.tile_ok, scene.fwd2_ok, scene.ret1_ok,
             scene.fwd1_ok, scene.ret2_ok)),
    }
    total = sum(shipped.values())
    img_mb = sum(np.asarray(images[i]).nbytes
                 for i in [0] + list(subset)) / 2e6   # as f16
    out = {
        "views": V, "h": h, "w": w, "hrp": hrp, "wrp": wrp,
        "resident_MB": round(resident / 1e6, 1),
        "shipped_MB": round(total / 1e6, 1),
        "shipped_fields_MB": {k: round(v / 1e6, 1)
                              for k, v in shipped.items()},
        "relay_s_at_15MBs": round(total / 1e6 / RELAY_MBS, 1),
        "device_side_build_floor_MB": round(img_mb, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
