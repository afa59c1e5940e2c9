"""Vectorized camera/plane geometry (device-side, jnp).

Capability parity with the reference's device geometry helpers
(gipuma.cu:66-130, 339-356, 694-715) — but vectorized over pixels and views
instead of per-thread scalar math, and with the per-(pixel,view,hypothesis)
3x3 homography replaced by its rank-1 decomposition:

    H p = K2 R (K1inv p) - (K2 t) * (n . K1inv p) / d
        = A r - b (m . r),  A = K2 R,  b = K2 t,  m = n / d

so the per-hypothesis part is a scalar (m . r) per pixel — no 3x3 matmul per
pixel-hypothesis-view as in getHomography_cu (gipuma.cu:339-356).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_grid(h: int, w: int, dtype=jnp.float32):
    """Return x[h,w], y[h,w] integer pixel coordinate grids (as floats)."""
    y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(dtype)
    x = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(dtype)
    return x, y


def pixel_rays(K_inv, x, y):
    """r = K_inv @ (x, y, 1) for pixel coords; returns [..., 3].

    The reference computes this implicitly inside getHomography_cu for every
    (pixel, hypothesis, view); here it is hoisted — r is hypothesis- and
    view-independent.
    """
    ones = jnp.ones_like(x)
    p = jnp.stack([x, y, ones], axis=-1)
    return jnp.einsum("ij,...j->...i", K_inv, p)


def back_project(M_inv, P_col4, x, y, depth):
    """X = M_inv @ (depth * (x, y, 1) - P_col4); reference get3Dpoint_cu
    (gipuma.cu:71-80). Returns [..., 3] points."""
    p = jnp.stack([depth * x, depth * y, depth], axis=-1) - P_col4
    return jnp.einsum("ij,...j->...i", M_inv, p)


def view_vectors(M_inv, P_col4, C, x, y):
    """Unit vectors from camera center through each pixel; reference
    getViewVector_cu (gipuma.cu:122-130)."""
    Xd1 = back_project(M_inv, P_col4, x, y, jnp.ones_like(x))
    v = Xd1 - C
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def plane_d(normal, X):
    """Plane distance parameter d = -(n . X); reference getPlaneDistance_cu
    (gipuma.cu:92-94)."""
    return -jnp.sum(normal * X, axis=-1)


def plane_d_at_pixel(M_inv, P_col4, normal, x, y, depth):
    """d of the plane with normal `normal` passing through the back-projection
    of (x, y, depth); reference getD_cu (gipuma.cu:96-111)."""
    X = back_project(M_inv, P_col4, x, y, depth)
    return plane_d(normal, X)


def depth_from_plane(normal, d, x, y, fx, cx, cy, alpha):
    """Per-pixel depth induced by plane (n, d); reference
    getDepthFromPlane3_cu (gipuma.cu:694-705):

        depth = -d*fx / (nx*(x-cx) + ny*(y-cy)*alpha + nz*fx)
    """
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    return -d * fx / (nx * (x - cx) + ny * (y - cy) * alpha + nz * fx)


def disparity_depth(f, baseline, v):
    """Self-inverse disparity<->depth conversion f*b/v (gipuma.cu:66-68)."""
    return f * baseline / v


def flip_to_hemisphere(n, view_vector):
    """Flip normals so they face the camera: if n . view >= 0, negate
    (reference vecOnHemisphere_cu, gipuma.cu:131-137; note the reference
    negates only for strictly positive dot, we match)."""
    dp = jnp.sum(n * view_vector, axis=-1, keepdims=True)
    return jnp.where(dp > 0.0, -n, n)


def normalize(v, eps=0.0):
    """Unit-normalize along the last axis (rsqrt, like normalize_cu)."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(n2 + eps)


def warp_coefficients(K_src, R_src, t_src):
    """Per-view homography building blocks A = K2 @ R, b = K2 @ t.

    With r = K1inv p and m = n/d, the plane-induced homography of the
    reference (getHomography_cu, gipuma.cu:339-356) maps p to
    A r - b (m . r) up to dehomogenization."""
    A = K_src @ R_src
    b = K_src @ t_src
    return A, b


def warp_points(A, b, rays, m):
    """Apply the rank-1-decomposed homography to precomputed rays.

    rays: [..., 3] (K1inv p), m: [..., 3] plane vector n/d.
    Returns dehomogenized (x', y') source-pixel coordinates [..., 2].
    """
    s = jnp.sum(m * rays, axis=-1, keepdims=True)        # (m . r)
    q = jnp.einsum("ij,...j->...i", A, rays) - b * s     # A r - b (m.r)
    return q[..., :2] / q[..., 2:3]


def angle_between(v1, v2):
    """Angle (radians) between vectors with the reference's NaN guard
    (mathUtils.h:16-24)."""
    dp = jnp.clip(jnp.sum(v1 * v2, axis=-1), -1.0, 1.0)
    return jnp.arccos(dp)
