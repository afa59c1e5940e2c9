"""View selection + depth-range inference (host-side numpy).

Capability parity with selectViews (main.cpp:430-499): accept source
cameras whose central viewing ray intersects the reference's at an angle in
(min_angle, max_angle); derive the depth range from baselines when the user
did not fix it; cap the subset at max_views.

Deviation: the reference caps by std::random_shuffle seeded with time(0)
(main.cpp:493-495) — non-reproducible.  We shuffle with a seeded PRNG.
"""
from __future__ import annotations

import math

import numpy as np

from .config import AlgorithmParams
from .geometry.camera import Rig


def central_view_vector(cam, x: float, y: float) -> np.ndarray:
    pt = np.array([x, y, 1.0])
    X = cam.M_inv @ (pt - cam.P_col4)
    v = X - cam.C
    return v / np.linalg.norm(v)


def select_views(rig: Rig, width: int, height: int,
                 params: AlgorithmParams,
                 seed: int = 0) -> tuple[list[int], float, float]:
    """Returns (selected source view indices, depth_min, depth_max).

    depth_min/max are the params' values if set (>= 0), else inferred from
    accepted baselines: min_range = (b/2)/sin(max_angle/2), max_range =
    (b/2)/sin(min_angle/2) (main.cpp:469-472).
    """
    ref = rig.cameras[0]
    x, y = width / 2.0, height / 2.0
    v_ref = central_view_vector(ref, x, y)

    min_rad = math.radians(params.min_angle)
    max_rad = math.radians(params.max_angle)

    subset: list[int] = []
    min_depth, max_depth = 9999.0, 0.0
    for i in range(1, rig.num_cameras):
        cam = rig.cameras[i]
        v = central_view_vector(cam, x, y)
        baseline = float(np.linalg.norm(np.asarray(ref.C) - np.asarray(cam.C)))
        dot = float(np.clip(np.dot(v_ref, v), -1.0, 1.0))
        angle = math.acos(dot)
        if min_rad < angle < max_rad:
            if params.view_selection:
                subset.append(i)
            min_range = (baseline / 2.0) / math.sin(max_rad / 2.0)
            max_range = (baseline / 2.0) / math.sin(min_rad / 2.0)
            min_depth = min(min_depth, min_range)
            max_depth = max(max_depth, max_range)

    depth_min = params.depth_min if params.depth_min != -1 else min_depth
    depth_max = params.depth_max if params.depth_max != -1 else max_depth

    if not params.view_selection:
        subset = list(range(1, rig.num_cameras))
        return subset, depth_min, depth_max

    if len(subset) >= params.max_views:
        rng = np.random.default_rng(seed)
        subset = list(rng.permutation(subset)[:params.max_views])
        subset = [int(v) for v in subset]
    return subset, depth_min, depth_max
