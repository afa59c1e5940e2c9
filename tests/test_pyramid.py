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


def test_pyramid_fine_trims_quality():
    """The bench configuration's fine-level trims (pyramid_fine_far=False,
    pyramid_fine_refine_rounds, pyramid_carry_cost — config.py) must hold
    BOTH median and p99 depth error against the untrimmed pyramid: the
    bench gate alone only checks the median, so tail regressions from the
    trims would otherwise ship ungated."""
    h, w, ncams = 64, 96, 5
    images, rig, gt, _ = plane_scene(num_cams=ncams, h=h, w=w, focal=140.0,
                                     plane_depth=5.0, slant=(0.25, -0.15))
    Ps = make_ring_P(ncams, h, w, 140.0, target_depth=5.0)
    names = [f"cam{i:03d}" for i in range(ncams)]
    from gipuma_tpu.geometry.camera import FAKE_BASELINE
    base = AlgorithmParams(
        box_hsize=9, box_vsize=9, iterations=4, n_best=2, seed=0,
        cost_path="rect", pyramid_levels=2, pyramid_fine_iterations=2,
    ).with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    trimmed = base.replace(pyramid_fine_far=False,
                           pyramid_fine_refine_rounds=2,
                           pyramid_carry_cost=True)
    interior = np.s_[10:-10, 10:-10]

    def run(params):
        depth, _, cost = run_patchmatch_pyramid(
            images, Ps, names, list(range(1, ncams)), params, 3.0, 8.0,
            jax.random.PRNGKey(0))
        err = np.abs(depth[interior] - gt[interior]) / gt[interior]
        assert np.isfinite(cost).all()
        return np.median(err), np.quantile(err, 0.99)

    med_u, p99_u = run(base)
    med_t, p99_t = run(trimmed)
    # Same error class: within 2x of untrimmed and under absolute caps.
    assert med_t < max(2.0 * med_u, 5e-3), (med_t, med_u)
    assert p99_t < max(2.0 * p99_u, 5e-2), (p99_t, p99_u)

    # pyramid_coarse_box (config.py): shrinking the coarse-level window
    # (which still covers a LARGER physical footprint than the fine box)
    # must stay in the same error class — median AND p99 — as the
    # UNTRIMMED pyramid (gating against the trimmed schedule would let
    # chained 2x allowances drift to 4x the untrimmed error — advisor r3).
    med_c, p99_c = run(trimmed.replace(pyramid_coarse_box=7))
    assert med_c < max(2.0 * med_u, 5e-3), (med_c, med_u)
    assert p99_c < max(2.0 * p99_u, 5e-2), (p99_c, p99_u)
