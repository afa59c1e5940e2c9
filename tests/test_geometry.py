"""Geometry layer vs numpy oracles (property tests)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gipuma_tpu.geometry import transforms as T
from gipuma_tpu.geometry.camera import (
    build_rig, camera_center_from_P, decompose_projection)


def random_pose(rng):
    """Random K (positive diag), rotation R, translation t."""
    K = np.array([[rng.uniform(100, 500), 0.0, rng.uniform(30, 70)],
                  [0.0, rng.uniform(100, 500), rng.uniform(30, 70)],
                  [0.0, 0.0, 1.0]])
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    t = rng.normal(size=3)
    return K, Q, t


def test_decompose_projection_roundtrip(rng):
    for _ in range(20):
        K, R, t = random_pose(rng)
        P = K @ np.hstack([R, t[:, None]])
        scale = rng.uniform(0.1, 10.0)
        K2, R2, C2 = decompose_projection(P * scale)
        np.testing.assert_allclose(K2, K, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(R2, R, rtol=1e-6, atol=1e-8)
        C = -R.T @ t
        np.testing.assert_allclose(C2, C, rtol=1e-5, atol=1e-7)


def test_camera_center_minors(rng):
    for _ in range(10):
        K, R, t = random_pose(rng)
        P = K @ np.hstack([R, t[:, None]])
        C = camera_center_from_P(P)
        np.testing.assert_allclose(C, -R.T @ t, rtol=1e-5, atol=1e-7)


def test_build_rig_rebases_reference(rng):
    Ps = []
    for _ in range(4):
        K, R, t = random_pose(rng)
        Ps.append(K @ np.hstack([R, t[:, None]]))
    rig = build_rig(Ps)
    ref = rig.cameras[0]
    np.testing.assert_allclose(ref.R, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(ref.t, 0.0, atol=1e-6)
    # All cameras keep their relative geometry: pairwise center distances.
    def centers(mats):
        return np.stack([camera_center_from_P(P) for P in mats])
    C_orig = centers(Ps)
    C_new = np.stack([c.C for c in rig.cameras])
    D_orig = np.linalg.norm(C_orig[:, None] - C_orig[None], axis=-1)
    D_new = np.linalg.norm(C_new[:, None] - C_new[None], axis=-1)
    np.testing.assert_allclose(D_new, D_orig, rtol=1e-4, atol=1e-6)


def test_plane_depth_roundtrip(rng):
    Ps = []
    for _ in range(2):
        K, R, t = random_pose(rng)
        Ps.append(K @ np.hstack([R, t[:, None]]))
    rig = build_rig(Ps)
    ref = rig.cameras[0]
    M_inv = jnp.asarray(ref.M_inv, jnp.float32)
    P_col4 = jnp.asarray(ref.P_col4, jnp.float32)
    fx = jnp.asarray(rig.f, jnp.float32)
    cx = jnp.asarray(ref.K[0, 2], jnp.float32)
    cy = jnp.asarray(ref.K[1, 2], jnp.float32)
    alpha = jnp.asarray(rig.alpha, jnp.float32)

    for _ in range(20):
        x = jnp.asarray(rng.uniform(0, 80), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 64), jnp.float32)
        depth = jnp.asarray(rng.uniform(2.0, 10.0), jnp.float32)
        n = rng.normal(size=3)
        n[2] = -abs(n[2]) - 0.5        # face the camera
        n = jnp.asarray(n / np.linalg.norm(n), jnp.float32)
        d = T.plane_d_at_pixel(M_inv, P_col4, n, x, y, depth)
        depth2 = T.depth_from_plane(n, d, x, y, fx, cx, cy, alpha)
        np.testing.assert_allclose(float(depth2), float(depth), rtol=2e-3)


def test_warp_matches_explicit_homography(rng):
    """Rank-1 warp == K2 (R - t n^T / d) K1^-1 homography (gipuma.cu:339-356)."""
    Ps = []
    for _ in range(2):
        K, R, t = random_pose(rng)
        Ps.append(K @ np.hstack([R, t[:, None]]))
    rig = build_rig(Ps)
    ref, src = rig.cameras[0], rig.cameras[1]

    for _ in range(10):
        n = rng.normal(size=3)
        n = n / np.linalg.norm(n)
        d = rng.uniform(1.0, 10.0) * np.sign(rng.normal())
        H = src.K @ (src.R - np.outer(src.t, n) / d) @ ref.K_inv
        x, y = rng.uniform(0, 80), rng.uniform(0, 64)
        p = np.array([x, y, 1.0])
        q = H @ p
        expected = q[:2] / q[2]

        A, b = T.warp_coefficients(src.K, src.R, src.t)
        rays = T.pixel_rays(jnp.asarray(ref.K_inv, jnp.float32),
                            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
        m = jnp.asarray(n / d, jnp.float32)
        got = T.warp_points(jnp.asarray(A, jnp.float32),
                            jnp.asarray(b, jnp.float32), rays, m)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3, atol=2e-3)


def test_back_project_project_roundtrip(rng):
    K, R, t = random_pose(rng)
    P = K @ np.hstack([R, t[:, None]])
    rig = build_rig([P, P])
    cam = rig.cameras[0]
    M_inv = jnp.asarray(cam.M_inv, jnp.float32)
    P_col4 = jnp.asarray(cam.P_col4, jnp.float32)
    for _ in range(10):
        x, y = rng.uniform(0, 80), rng.uniform(0, 64)
        depth = rng.uniform(1.0, 20.0)
        X = T.back_project(M_inv, P_col4,
                           jnp.asarray(x, jnp.float32),
                           jnp.asarray(y, jnp.float32),
                           jnp.asarray(depth, jnp.float32))
        q = cam.P @ np.append(np.asarray(X), 1.0)
        np.testing.assert_allclose(q[:2] / q[2], [x, y], rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(q[2], depth, rtol=1e-3)


def test_hemisphere_flip():
    v = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    n_toward = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    n_away = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    np.testing.assert_allclose(np.asarray(T.flip_to_hemisphere(n_toward, v)),
                               np.asarray(n_toward))
    np.testing.assert_allclose(np.asarray(T.flip_to_hemisphere(n_away, v)),
                               np.asarray(n_toward))
