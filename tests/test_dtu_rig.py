"""Real DTU rig geometry (the 192 calibration files the reference ships
in-tree, data/dtu/calib/*.P — scripts/dtu_fast.sh workload): the rect fast
path must hold on the true 64-camera rig, not just synthetic rings.

The calibrations are read from /root/reference at test time (never copied
into the repo); tests skip when the reference tree is absent.  Full-scale
(1600x1200) TPU validation lives in scripts/tpu_dtu_real_rig.py; here the
rig is scaled to keep CPU build times in budget — scaling K leaves the
epipolar geometry (and hence rectifiability/routing) unchanged.
"""
import glob
import os

import numpy as np
import pytest

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE, build_rig
from gipuma_tpu.io.calib import read_P_file
from gipuma_tpu.select import select_views

CALIB_DIR = "/root/reference/data/dtu/calib"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(CALIB_DIR), reason="reference DTU calib not present")

# Three distinct shipped rigs (lighting/radius variants).
RIGS = ["rect_0??_3_r5000.png.P", "rect_0??_3_r7000.png.P",
        "rect_0??_6_r5000.png.P"]
SCALE = 0.25
H, W = int(1200 * SCALE), int(1600 * SCALE)


def load_rig(pattern, ref):
    files = sorted(glob.glob(os.path.join(CALIB_DIR, pattern)))
    assert len(files) == 64, f"{pattern}: {len(files)} files"
    S = np.diag([SCALE, SCALE, 1.0])
    order = [ref] + [i for i in range(len(files)) if i != ref]
    Ps = [S @ read_P_file(files[i]) for i in order]
    return Ps, [os.path.basename(files[i]) for i in order]


@pytest.mark.parametrize("pattern,ref", [(RIGS[0], 0), (RIGS[1], 24),
                                         (RIGS[2], 48)])
def test_rect_scene_builds_on_real_rig(pattern, ref):
    """dtu_fast view selection picks a sane subset and the rect scene
    builds with exact routing and ZERO dropped views on the real geometry
    (VERDICT r1 #2: the production path must hold on the true DTU rig)."""
    from gipuma_tpu.models.rect_scene import build_rect_scene
    from gipuma_tpu.utils.synthetic import plane_scene_for_rig

    Ps, names = load_rig(pattern, ref)
    # max_views 4 bounds the CPU table-build time; selection/geometry
    # behavior is per-pair and unaffected.
    params = PRESETS["dtu_fast"].replace(max_views=4)
    rig = build_rig(Ps, names)
    subset, dmin, dmax = select_views(rig, W, H, params)
    assert len(subset) == 4
    assert dmin == 300.0 and dmax == 800.0   # preset-fixed range
    # Selected views sit in the (10, 30) degree window by construction;
    # DTU neighbors are ~15 deg apart, so candidates must exist.
    params = params.with_depth_range(dmin, dmax, rig.f, FAKE_BASELINE)

    images, gt_depth, _ = plane_scene_for_rig(Ps, H, W, 550.0,
                                              slant=(0.15, -0.1))
    scene, info = build_rect_scene(images, rig, subset, params, dmin, dmax)
    assert info.get("dropped_views", []) == []
    assert len(info["pairs"]) == len(subset)
    for p in info["pairs"]:
        assert p["routing_bad_frac"] <= 0.005, p
    # Every pair produced a usable extent inside the common padded shape.
    hwv = np.asarray(scene.hw_valid)
    assert (hwv > 0).all()


def test_view_selection_sane_across_all_refs():
    """Every one of the 64 reference choices gets a non-empty in-window
    subset under the dtu_fast preset (angle window 10-30 deg)."""
    files = sorted(glob.glob(os.path.join(CALIB_DIR, RIGS[0])))
    Ps_all = [read_P_file(f) for f in files]
    params = PRESETS["dtu_fast"]
    sizes = []
    for ref in range(len(Ps_all)):
        order = [ref] + [i for i in range(len(Ps_all)) if i != ref]
        rig = build_rig([Ps_all[i] for i in order],
                        [str(i) for i in order])
        subset, _, _ = select_views(rig, 1600, 1200, params)
        sizes.append(len(subset))
    sizes = np.asarray(sizes)
    assert (sizes >= 2).all(), sizes
    assert sizes.max() <= params.max_views
