"""Coarse-to-fine PatchMatch (models/pyramid.py): the pyramid must recover
synthetic scenes as accurately as the single-level engine — the final
level runs the same full-resolution refinement."""
import jax
import numpy as np

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.models.pyramid import (downscale2, run_patchmatch_pyramid,
                                       upsample2_to)
from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene


def test_down_up_shapes():
    a = np.arange(13 * 9, dtype=np.float32).reshape(13, 9)
    d = downscale2(a)
    assert d.shape == (6, 4)
    u = upsample2_to(d, 13, 9)
    assert u.shape == (13, 9)
    n = np.zeros((5, 7, 3), np.float32)
    assert upsample2_to(downscale2(n), 5, 7).shape == (5, 7, 3)


def test_pyramid_recovers_plane():
    h, w, ncams = 64, 96, 5
    images, rig, gt, _ = plane_scene(num_cams=ncams, h=h, w=w, focal=140.0,
                                     plane_depth=5.0, slant=(0.25, -0.15))
    Ps = make_ring_P(ncams, h, w, 140.0, target_depth=5.0)
    names = [f"cam{i:03d}" for i in range(ncams)]
    params = AlgorithmParams(
        box_hsize=9, box_vsize=9, iterations=4, n_best=2, seed=0,
        pyramid_levels=2, pyramid_fine_iterations=2)
    from gipuma_tpu.geometry.camera import FAKE_BASELINE
    params = params.with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)

    depth, normals, cost = run_patchmatch_pyramid(
        images, Ps, names, list(range(1, ncams)), params, 3.0, 8.0,
        jax.random.PRNGKey(0))

    interior = np.s_[10:-10, 10:-10]
    err = np.abs(depth[interior] - gt[interior]) / gt[interior]
    assert np.median(err) < 0.005, f"median rel err {np.median(err):.4f}"
    assert np.isfinite(cost).all() and normals.shape == (h, w, 3)
