"""Epipolar rectification properties (round-2 sampling groundwork)."""
import numpy as np
import pytest

from gipuma_tpu.geometry.camera import build_rig
from gipuma_tpu.geometry.rectify import (plane_disparity_coeffs,
                                         rectified_bounds, rectify_pair,
                                         warp_to_rectified)
from gipuma_tpu.utils.synthetic import make_ring_P


@pytest.fixture(scope="module")
def pair():
    Ps = make_ring_P(3, 64, 80, 120.0, radius=0.4, target_depth=5.0)
    rig = build_rig(Ps)
    ref, src = rig.cameras[0], rig.cameras[1]
    rect = rectify_pair(ref.K, src.K, src.R, src.t)
    return rig, ref, src, rect


def project(K, R, t, X):
    q = K @ (R @ X + t)
    return q[:2] / q[2]


def hom(T, p):
    q = T @ np.array([p[0], p[1], 1.0])
    return q[:2] / q[2]


def test_epipolar_rows_align(pair, rng):
    """Corresponding rectified pixels share the y coordinate."""
    rig, ref, src, rect = pair
    for _ in range(50):
        X = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                      rng.uniform(3, 9)])
        p_ref = project(ref.K, np.eye(3), np.zeros(3), X)
        p_src = project(src.K, src.R, src.t, X)
        r_ref = hom(rect.T_ref, p_ref)
        r_src = hom(rect.T_src, p_src)
        assert abs(r_ref[1] - r_src[1]) < 1e-6 * max(1, abs(r_ref[1]))


def test_disparity_is_affine_in_plane(pair, rng):
    """disp(p̂) = a x̂ + b ŷ + c with (a,b,c) = plane_disparity_coeffs(m)."""
    rig, ref, src, rect = pair
    for _ in range(20):
        n = rng.normal(size=3)
        n[2] = -abs(n[2]) - 0.5
        n /= np.linalg.norm(n)
        d = -n @ np.array([0.2, -0.1, 5.0])   # plane through a point
        m = n / d
        abc = plane_disparity_coeffs(rect, m)
        for _ in range(10):
            # A point ON the plane, built from a random ray.
            ray = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), 1.0])
            s = -d / (n @ ray)
            X = s * ray
            if X[2] < 0.5:
                continue
            p_ref = project(ref.K, np.eye(3), np.zeros(3), X)
            p_src = project(src.K, src.R, src.t, X)
            r_ref = hom(rect.T_ref, p_ref)
            r_src = hom(rect.T_src, p_src)
            disp_direct = r_ref[0] - r_src[0]
            disp_affine = abc[0] * r_ref[0] + abc[1] * r_ref[1] + abc[2]
            np.testing.assert_allclose(disp_affine, disp_direct,
                                       rtol=1e-5, atol=1e-6)


def test_forward_motion_rejected():
    K = np.array([[100.0, 0, 40], [0, 100, 30], [0, 0, 1]])
    R = np.eye(3)
    t = np.array([0.0, 0.0, -0.5])   # center straight ahead
    with pytest.raises(ValueError):
        rectify_pair(K, K, R, t)


def test_warp_roundtrip_identity(pair):
    """Warping with the identity homography reproduces the image."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    rig, ref, src, rect = pair
    img = np.arange(64 * 80, dtype=np.float32).reshape(64, 80)
    out = warp_to_rectified(jnp.asarray(img), np.eye(3), 64, 80)
    np.testing.assert_allclose(np.asarray(out)[..., 0], img, atol=1e-3)


def test_rectified_bounds_contains_projected_corners(pair):
    rig, ref, src, rect = pair
    lo, hi = rectified_bounds(rect.T_ref, 80, 64)
    c = hom(rect.T_ref, np.array([0.0, 0.0]))
    assert (c >= lo - 1e-6).all() and (c <= hi + 1e-6).all()
