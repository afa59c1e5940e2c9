"""View selection + depth-range inference (selectViews parity)."""
import numpy as np
import pytest

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.geometry.camera import build_rig
from gipuma_tpu.select import select_views
from gipuma_tpu.utils.synthetic import make_ring_P


def test_angle_window_filters_views():
    # Ring of cameras: center camera 0 + 6 around it, aimed at depth 5.
    Ps = make_ring_P(7, 64, 80, 120.0, radius=0.4, target_depth=5.0)
    rig = build_rig(Ps)
    # All ring cameras subtend ~atan(0.4/5) = 4.6 degrees to the center ray.
    params = AlgorithmParams(min_angle=1.0, max_angle=10.0, view_selection=True)
    subset, dmin, dmax = select_views(rig, 80, 64, params)
    assert subset == [1, 2, 3, 4, 5, 6]
    # Inferred range from baselines (main.cpp:469-472): plausible and ordered.
    assert 0 < dmin < dmax

    # Too-narrow window rejects everything.
    params = AlgorithmParams(min_angle=30.0, max_angle=40.0, view_selection=True)
    subset, _, _ = select_views(rig, 80, 64, params)
    assert subset == []


def test_max_views_cap_deterministic():
    Ps = make_ring_P(9, 64, 80, 120.0, radius=0.4, target_depth=5.0)
    rig = build_rig(Ps)
    params = AlgorithmParams(min_angle=1.0, max_angle=10.0, max_views=3)
    s1, _, _ = select_views(rig, 80, 64, params, seed=7)
    s2, _, _ = select_views(rig, 80, 64, params, seed=7)
    s3, _, _ = select_views(rig, 80, 64, params, seed=8)
    assert len(s1) == 3 and s1 == s2
    assert s1 != s3 or True   # different seeds may coincide; length must hold
    assert len(s3) == 3


def test_selection_off_takes_all():
    Ps = make_ring_P(5, 64, 80, 120.0)
    rig = build_rig(Ps)
    params = AlgorithmParams(view_selection=False, min_angle=89.0,
                             max_angle=89.5)
    subset, _, _ = select_views(rig, 80, 64, params)
    assert subset == [1, 2, 3, 4]


def test_explicit_depth_range_wins():
    Ps = make_ring_P(4, 64, 80, 120.0)
    rig = build_rig(Ps)
    params = AlgorithmParams(min_angle=1.0, max_angle=10.0,
                             depth_min=2.5, depth_max=9.5)
    _, dmin, dmax = select_views(rig, 80, 64, params)
    assert (dmin, dmax) == (2.5, 9.5)
