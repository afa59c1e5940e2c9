"""Fusion + eval metrics tests on synthetic multi-view depth maps."""
import numpy as np
import pytest

from gipuma_tpu.config import FusionParams
from gipuma_tpu.eval.metrics import (accuracy_completeness, depth_error,
                                     normal_error)
from gipuma_tpu.fusion.fuse import fuse_depthmaps
from gipuma_tpu.utils.synthetic import intersect_plane, make_ring_P


def make_gt_depthmaps(num_cams=4, h=32, w=40, focal=80.0, depth=5.0):
    n = np.array([0.0, 0.0, 1.0])
    d = -depth
    Ps = make_ring_P(num_cams, h, w, focal, target_depth=depth)
    depths, normals = [], []
    for P in Ps:
        X, dep = intersect_plane(P, h, w, n, d)
        depths.append(dep.astype(np.float32))
        normals.append(np.broadcast_to(n, (h, w, 3)).astype(np.float32))
    return np.stack(depths), np.stack(normals), Ps, (n, d)


def test_fusion_consistent_plane():
    depths, normals, Ps, (n, d) = make_gt_depthmaps()
    params = FusionParams(disp_thresh=0.5, normal_thresh=30.0, num_consistent=2)
    pts, nrm, col = fuse_depthmaps(depths, normals, Ps, params, f=80.0)
    # Points must lie on the plane.
    res = np.abs(pts @ n + d)
    assert len(pts) > 500
    assert np.median(res) < 1e-3
    # Greedy dedup: far fewer points than total pixels.
    assert len(pts) < depths[0].size * len(depths) * 0.6
    # Fused normals stay the plane normal.
    assert np.abs(nrm @ n).min() > 0.99


def test_fusion_rejects_outliers():
    depths, normals, Ps, _ = make_gt_depthmaps()
    # Corrupt a block in view 0: depths nobody else agrees with.
    depths = depths.copy()
    depths[0, 5:10, 5:10] = 2.0
    params = FusionParams(disp_thresh=0.1, normal_thresh=30.0, num_consistent=2)
    pts, _, _ = fuse_depthmaps(depths, normals, Ps, params, f=80.0)
    # No fused point should sit near depth 2 in front of camera 0.
    z = pts[:, 2]
    assert (np.abs(z - 2.0) > 0.5).all()


def test_fusion_num_consistent_monotone():
    depths, normals, Ps, _ = make_gt_depthmaps()
    sizes = []
    for k in (1, 2, 3):
        params = FusionParams(disp_thresh=0.5, normal_thresh=30.0,
                              num_consistent=k)
        pts, _, _ = fuse_depthmaps(depths, normals, Ps, params, f=80.0)
        sizes.append(len(pts))
    assert sizes[0] >= sizes[1] >= sizes[2]


def test_fusion_many_views_one_executable():
    """DTU-scale view count (49): the traced-index fusion compiles ONE
    executable and completes quickly; the fused cloud sits on the GT plane
    and acc/comp against the GT cloud stay tight."""
    import time

    from gipuma_tpu.fusion import fuse as fuse_mod

    depths, normals, Ps, (n, d) = make_gt_depthmaps(num_cams=49, h=48, w=64)
    params = FusionParams(disp_thresh=0.5, normal_thresh=30.0,
                          num_consistent=3)
    t0 = time.perf_counter()
    pts, nrm, _ = fuse_depthmaps(depths, normals, Ps, params, f=80.0)
    dt = time.perf_counter() - t0
    assert len(pts) > 1000
    res = np.abs(pts @ n + d)
    assert np.median(res) < 1e-3
    # GT cloud = view 0's back-projected plane points.
    from gipuma_tpu.fusion.fuse import _back_project_grid, _cam_arrays
    M_inv, p4, _ = _cam_arrays(np.stack(Ps))
    gt_pts = np.asarray(_back_project_grid(M_inv[0], p4[0],
                                           depths[0])).reshape(-1, 3)
    acc, comp = accuracy_completeness(pts, gt_pts, sample=2000)
    assert acc < 0.05 and comp < 0.05
    # One traced-index executable for all 49 views: re-tracing per view
    # would blow this budget by an order of magnitude on CPU.
    assert dt < 120.0


def test_depth_error_metrics():
    gt = np.full((10, 10), 5.0)
    d = gt.copy()
    d[0, :] = 7.0     # 10 bad pixels at tol=1
    rep = depth_error(d, gt, tol=1.0)
    assert rep.error_rate == pytest.approx(0.1)
    # default tol2 = 2*tol = 2; |7-5| = 2 >= 2 -> still bad at tol2
    assert rep.error_rate_tol2 == pytest.approx(0.1)
    rep2 = depth_error(d, gt, tol=1.0, tol2=2.5)
    assert rep2.error_rate_tol2 == pytest.approx(0.0)
    assert rep.mean_abs_error == pytest.approx(0.2)


def test_depth_error_occlusion_and_valid():
    gt = np.full((4, 4), 5.0)
    d = gt.copy()
    d[0, 0] = 9.0
    occ = np.zeros((4, 4), bool)
    occ[0, 0] = True  # the bad pixel is occluded
    rep = depth_error(d, gt, tol=1.0, occlusion_mask=occ)
    assert rep.error_rate_nocc == pytest.approx(0.0)
    valid = np.ones((4, 4), bool)
    valid[0, 0] = False
    rep = depth_error(d, gt, tol=1.0, valid=valid)
    assert rep.error_rate_valid == pytest.approx(0.0)


def test_normal_error_metrics():
    n = np.zeros((5, 5, 3))
    n[..., 2] = 1.0
    g = n.copy()
    rep = normal_error(n, g)
    assert rep.error_rate_02 == pytest.approx(0.0)
    # Rotate one normal by ~0.25 rad.
    n2 = n.copy()
    n2[0, 0] = [np.sin(0.25), 0, np.cos(0.25)]
    rep = normal_error(n2, g)
    assert rep.error_rate_02 == pytest.approx(1 / 25)
    assert rep.error_rate_03 == pytest.approx(0.0)


def test_accuracy_completeness():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, size=(2000, 3))
    rec = gt + 0.01  # uniformly offset
    acc, comp = accuracy_completeness(rec, gt, sample=None)
    assert acc == pytest.approx(np.sqrt(3) * 0.01, rel=0.2)
    assert comp == pytest.approx(np.sqrt(3) * 0.01, rel=0.2)
