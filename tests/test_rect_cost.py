"""Rectified window cost: the true plane must minimize the cost on real
rectified imagery of a synthetic scene."""
import numpy as np
import jax.numpy as jnp
import pytest

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.geometry.camera import build_rig
from gipuma_tpu.geometry.rectify import (plane_disparity_coeffs,
                                         rectified_bounds, rectify_pair,
                                         warp_to_rectified)
from gipuma_tpu.ops.rect_cost import rect_window_cost
from gipuma_tpu.ops.sampling import central_gradients
from gipuma_tpu.utils.synthetic import plane_scene


def build_rect_inputs(slant=(0.0, 0.0)):
    images, rig, gt_depth, (n_w, d_w) = plane_scene(
        num_cams=3, h=64, w=80, focal=120.0, slant=slant)
    ref_c, src_c = rig.cameras[0], rig.cameras[1]
    rect = rectify_pair(ref_c.K, src_c.K, src_c.R, src_c.t)

    lo_r, hi_r = rectified_bounds(rect.T_ref, 80, 64)
    lo_s, hi_s = rectified_bounds(rect.T_src, 80, 64)
    lo = np.minimum(lo_r, lo_s) - 2
    hi = np.maximum(hi_r, hi_s) + 2
    hr = int(np.ceil(hi[1] - lo[1]))
    wr = -(-int(np.ceil(hi[0] - lo[0])) // 128) * 128

    # Shift the rectified window so it starts at `lo` (adjust K_new's
    # principal point implicitly via the offset argument).
    ref_rect = warp_to_rectified(jnp.asarray(images[0]), rect.T_ref, hr, wr,
                                 offset=lo)[..., 0]
    src_rect = warp_to_rectified(jnp.asarray(images[1]), rect.T_src, hr, wr,
                                 offset=lo)[..., 0]
    return images, rig, rect, lo, ref_rect, src_rect, (n_w, d_w), hr, wr


@pytest.mark.parametrize("slant", [(0.0, 0.0), (0.3, -0.2)])
def test_true_plane_minimizes_rect_cost(slant):
    (images, rig, rect, lo, ref_rect, src_rect,
     (n_w, d_w), hr, wr) = build_rect_inputs(slant)
    params = AlgorithmParams(box_hsize=7, box_vsize=7)

    gx_ref, _ = central_gradients(ref_rect)
    gx_src, _ = central_gradients(src_rect)
    src_chw = jnp.stack([src_rect, gx_src])

    # Plane in the rebased ref frame (camera 0 at origin): m = n/d.
    n = np.asarray(n_w)
    d = float(d_w)
    if n[2] > 0:
        n, d = -n, -d
    abc_vec = plane_disparity_coeffs(rect, n / d)
    # Account for the window offset `lo`: disparity is evaluated at global
    # rect coords = local + lo (x shift also preserves the row alignment
    # because both images were shifted by the same lo).
    def abc_field(vec):
        a, b, c = vec
        c2 = c + a * lo[0] + b * lo[1]
        out = np.broadcast_to(np.array([a, b, c2], np.float32), (hr, wr, 3))
        return jnp.asarray(out)

    c_true = np.asarray(rect_window_cost(ref_rect, gx_ref, src_chw,
                                         abc_field(abc_vec), params,
                                         interpret=True))
    # Wrong depths: scale m (same normal, different d).
    c_wrong1 = np.asarray(rect_window_cost(ref_rect, gx_ref, src_chw,
                                           abc_field(abc_vec * 1.35), params,
                                           interpret=True))
    c_wrong2 = np.asarray(rect_window_cost(ref_rect, gx_ref, src_chw,
                                           abc_field(abc_vec * 0.7), params,
                                           interpret=True))

    # Compare over a region verified valid in BOTH rectified frames:
    # ref pixels' rect positions (T_ref of the image interior), eroded by
    # the window radius + max disparity margin.
    import itertools
    xs, ys = [], []
    for (px, py) in itertools.product((12, 40, 67), (12, 32, 51)):
        q = rect.T_ref @ np.array([px, py, 1.0])
        xs.append(q[0] / q[2] - lo[0])
        ys.append(q[1] / q[2] - lo[1])
    x0, x1 = int(min(xs)) + 8, int(max(xs)) - 8
    y0, y1 = int(min(ys)) + 8, int(max(ys)) - 8
    m = np.s_[y0:y1, x0:x1]
    assert c_true[m].size > 200
    assert np.median(c_true[m]) < 0.6 * np.median(c_wrong1[m])
    assert np.median(c_true[m]) < 0.6 * np.median(c_wrong2[m])
    # Near-zero absolute cost for the true plane (resampling noise only).
    assert np.median(c_true[m]) < 2.0


def test_window_grads_equals_channel_path_on_linear_images():
    """On LINEAR intensity images every operator in play is exact — the
    bilinear interpolant reproduces the image, central differences of any
    step give the true gradient, and the window-sample differences of the
    window_grads path (after the plane-Jacobian corrections) reduce to the
    same gradients.  So rect_pair_cost_batch on packed-image-words input
    (the window_grads path) must match the full-channel path to float32
    rounding.  Exercises the 1/(1-a) gx correction, the +b*gx chain-rule
    term in gy, the step-inc ref operators, and the scan row alignment."""
    from gipuma_tpu.ops.pallas_rowgather import pack_taps
    from gipuma_tpu.ops.rect_cost import rect_pair_cost_batch

    hr, wr = 48, 128
    params = AlgorithmParams(box_hsize=7, box_vsize=7)
    inc = params.window_increment
    y, x = np.mgrid[0:hr, 0:wr].astype(np.float32)
    # Integer-valued linear ramps <= 255: exactly representable in bf16,
    # so tap packing adds zero quantization error.
    ref_img = x * 1.0 + y * 2.0 + 3.0
    src_img = x * 0.5 + y * 1.0 + 5.0

    def channels(img, gxc, gyc, step):
        gx = np.full_like(img, 2.0 * step * gxc)
        gy = np.full_like(img, 2.0 * step * gyc)
        return jnp.asarray(np.stack([img, gx, gy]))

    # Plain path: step-1 ref grads + full f32 src channels.
    ref_1 = channels(ref_img, 1.0, 2.0, 1)
    src_3c = channels(src_img, 0.5, 1.0, 1)
    # window_grads path: step-inc ref grads + packed image words only.
    ref_i = channels(ref_img, 1.0, 2.0, inc)
    src_pk = jnp.asarray(pack_taps(src_img[None]))

    abc = np.broadcast_to(
        np.array([0.12, -0.07, 2.3], np.float32).reshape(3, 1, 1),
        (3, hr, wr))
    abc_k = jnp.asarray(np.stack([abc, abc * 0.8]))

    c_plain = np.asarray(rect_pair_cost_batch(ref_1, src_3c, abc_k, params,
                                              interpret=True))
    c_sdg = np.asarray(rect_pair_cost_batch(ref_i, src_pk, abc_k, params,
                                            interpret=True))
    m = np.s_[:, 12:-12, 16:-16]
    diff = np.abs(c_plain[m] - c_sdg[m])
    assert float(diff.max()) < 1e-3, float(diff.max())
    # And the costs are non-trivial (linear images still mismatch).
    assert float(np.abs(c_plain[m]).max()) > 0.1


def test_cull_pack_roundtrips():
    """config.cull_pack's f16 packers (sparse cull pass): plane triples
    and cost pairs survive pack -> nearest-permute-passthrough -> unpack
    within f16 precision (~5e-4 relative)."""
    from gipuma_tpu.ops.rect_cost import (_pack_f16_pairs, _pack_m_tri,
                                          _unpack_f16_pairs, _unpack_m_tri)
    rng = np.random.default_rng(7)
    for k in (1, 2, 4, 5):
        m = (rng.normal(size=(k, 3, 16, 24)).astype(np.float32) * 0.3)
        r = np.asarray(_unpack_m_tri(_pack_m_tri(jnp.asarray(m)), k))
        assert np.abs(r - m).max() <= 5e-4 * np.abs(m).max() + 1e-6
        c = rng.uniform(0.0, 3.0, size=(k, 16, 24)).astype(np.float32)
        rc = np.asarray(_unpack_f16_pairs(_pack_f16_pairs(jnp.asarray(c)), k))
        assert np.abs(rc - c).max() <= 5e-4 * np.abs(c).max() + 1e-6
    # Specials pass through the cost packer: NaN stays NaN, big stays big
    # (the engine masks >= MAXCOST after unpack).
    c = np.array([[[np.nan, 1.0]], [[70000.0, 2.0]]], np.float32)
    rc = np.asarray(_unpack_f16_pairs(_pack_f16_pairs(jnp.asarray(c)), 2))
    assert np.isnan(rc[0, 0, 0]) and rc[1, 0, 0] >= 1000.0
