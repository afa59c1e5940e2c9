"""Multiview cost vs an independent numpy oracle.

The oracle transcribes the published cost formulas (bilaterally weighted
truncated color+gradient over a sparse window, best-n view combination)
directly — explicit per-pixel homography, per-sample warps, bilinear
sampling with precomputed-gradient channels — with none of the engine's
reformulations (rank-1 warp, affine-in-window, checkerboard slicing), so it
checks all of them at once.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gipuma_tpu.config import AlgorithmParams, CostCombination, MAXCOST
from gipuma_tpu.models.scene import build_scene
from gipuma_tpu.ops import checkerboard as cb
from gipuma_tpu.ops.cost import combine_view_costs, per_view_costs
from gipuma_tpu.utils.synthetic import plane_scene


def np_central_gradients(img):
    gx = np.empty_like(img)
    gy = np.empty_like(img)
    gx[:, 1:-1] = img[:, 2:] - img[:, :-2]
    gx[:, 0] = img[:, 1] - img[:, 0]
    gx[:, -1] = img[:, -1] - img[:, -2]
    gy[1:-1, :] = img[2:, :] - img[:-2, :]
    gy[0, :] = img[1, :] - img[0, :]
    gy[-1, :] = img[-1, :] - img[-2, :]
    return gx, gy


def np_bilinear(img, x, y):
    h, w = img.shape
    x = np.clip(x, 0.0, w - 1.000001)
    y = np.clip(y, 0.0, h - 1.000001)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = x - x0
    fy = y - y0
    return ((img[y0, x0] * (1 - fx) + img[y0, x0 + 1] * fx) * (1 - fy)
            + (img[y0 + 1, x0] * (1 - fx) + img[y0 + 1, x0 + 1] * fx) * fy)


def oracle_pixel_cost(images, rig, params, px, py, n, d, view_subset):
    """Per-view window costs for one pixel, straight from the formulas."""
    ref = images[0].astype(np.float64)
    rgx, rgy = np_central_gradients(ref)
    h, w = ref.shape
    refc = ref[np.clip(py, 0, h - 1), np.clip(px, 0, w - 1)]
    out = []
    for v in view_subset:
        src = images[v].astype(np.float64)
        sgx, sgy = np_central_gradients(src)
        cam = rig.cameras[v]
        refcam = rig.cameras[0]
        H = cam.K @ (cam.R - np.outer(cam.t, n) / d) @ refcam.K_inv
        cost = 0.0
        hr, vr = params.box_hrad, params.box_vrad
        for i in range(-hr, hr + 1, params.window_increment):
            for j in range(-vr, vr + 1, params.window_increment):
                xs, ys = px + i, py + j
                ref_v = ref[np.clip(ys, 0, h - 1), np.clip(xs, 0, w - 1)]
                rgx_v = rgx[np.clip(ys, 0, h - 1), np.clip(xs, 0, w - 1)]
                rgy_v = rgy[np.clip(ys, 0, h - 1), np.clip(xs, 0, w - 1)]
                wgt = np.exp(-abs(ref_v - refc) / params.gamma)
                q = H @ np.array([xs, ys, 1.0])
                xw, yw = q[0] / q[2], q[1] / q[2]
                s_v = np_bilinear(src, xw, yw)
                s_gx = np_bilinear(sgx, xw, yw)
                s_gy = np_bilinear(sgy, xw, yw)
                col = min(abs(ref_v - s_v), params.tau_color)
                grad = min((abs(rgx_v - s_gx) + abs(rgy_v - s_gy)) * 0.0625,
                           params.tau_gradient)
                cost += wgt * ((1 - params.alpha) * col + params.alpha * grad)
        if np.isnan(cost) or cost >= MAXCOST:
            cost = MAXCOST
        out.append(cost)
    return np.array(out)


@pytest.fixture(scope="module")
def scene_setup():
    images, rig, gt_depth, (n_w, d_w) = plane_scene(num_cams=4, h=32, w=40,
                                                    focal=60.0)
    params = AlgorithmParams(box_hsize=7, box_vsize=7)
    view_subset = [1, 2, 3]
    scene = build_scene(images, rig, view_subset, params,
                        depth_min=2.0, depth_max=10.0)
    return images, rig, params, view_subset, scene


def test_per_view_costs_match_oracle(scene_setup, rng):
    images, rig, params, view_subset, scene = scene_setup
    h, w = images[0].shape

    for parity in (0, 1):
        w2 = w // 2
        # Random plane fields over the half-grid.
        n = rng.normal(size=(h, w2, 3))
        n[..., 2] = -np.abs(n[..., 2]) - 0.3
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        depth = rng.uniform(3.0, 8.0, size=(h, w2))

        # d from plane through back-projected point (same convention as engine)
        import gipuma_tpu.geometry.transforms as T
        xg = cb.active_x(h, w2, parity)
        yg = cb.active_y(h, w2)
        d = np.asarray(T.plane_d_at_pixel(
            scene.M_inv, scene.P_col4, jnp.asarray(n, jnp.float32),
            xg, yg, jnp.asarray(depth, jnp.float32)))

        costs = np.asarray(per_view_costs(
            scene, params, parity, jnp.asarray(n, jnp.float32),
            jnp.asarray(d, jnp.float32)))
        assert costs.shape == (len(view_subset), h, w2)

        # Spot-check interior pixels against the oracle.
        for (py, jj) in [(10, 5), (15, 10), (20, 3), (8, 14)]:
            px = int(np.asarray(xg)[py, jj])
            expect = oracle_pixel_cost(images, rig, params, px, py,
                                       n[py, jj], d[py, jj], view_subset)
            got = costs[:, py, jj]
            np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-2)


def test_combine_best_n():
    params = AlgorithmParams(cost_comb=CostCombination.BEST_N, n_best=2)
    costs = jnp.asarray(np.array(
        [[3.0], [1.0], [2.0], [MAXCOST]], np.float32))
    out = float(combine_view_costs(costs, params)[0])
    assert out == pytest.approx(1.5)

    # only one valid view -> mean over 1
    costs = jnp.asarray(np.array([[MAXCOST], [4.0], [MAXCOST]], np.float32))
    out = float(combine_view_costs(costs, params)[0])
    assert out == pytest.approx(4.0)

    # no valid view -> MAXCOST
    costs = jnp.full((3, 1), MAXCOST, jnp.float32)
    out = float(combine_view_costs(costs, params)[0])
    assert out == pytest.approx(MAXCOST)


def test_combine_all_and_good():
    costs = jnp.asarray(np.array([[2.0], [4.0], [9.0]], np.float32))
    p_all = AlgorithmParams(cost_comb=CostCombination.ALL)
    assert float(combine_view_costs(costs, p_all)[0]) == pytest.approx(5.0)

    p_good = AlgorithmParams(cost_comb=CostCombination.GOOD, good_factor=1.5)
    # clamp to 2.0*1.5=3.0: (2 + 3 + 3)/3
    assert float(combine_view_costs(costs, p_good)[0]) == pytest.approx(8.0 / 3.0)


def test_combine_good_ignores_padded_views():
    """GOOD divides by the REAL subset size (gipuma.cu:785-786): padded
    view-sharding slots (view_valid = 0, cost MAXCOST) must change neither
    the denominator nor the clamped sum."""
    p_good = AlgorithmParams(cost_comb=CostCombination.GOOD, good_factor=1.5)
    costs = jnp.asarray(np.array([[2.0], [4.0], [9.0]], np.float32))
    unpadded = float(combine_view_costs(
        costs, p_good, view_valid=jnp.ones(3, jnp.float32))[0])
    assert unpadded == pytest.approx(8.0 / 3.0)

    padded = jnp.concatenate(
        [costs, jnp.full((2, 1), MAXCOST, jnp.float32)])
    vv = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0], jnp.float32)
    assert float(combine_view_costs(padded, p_good, view_valid=vv)[0]) == \
        pytest.approx(unpadded)

    # A REAL view at MAXCOST still counts in the denominator (the
    # reference clamps it to the threshold and keeps numBest = subset
    # size) — distinguishable from a padded slot only via view_valid.
    costs4 = jnp.asarray(np.array([[2.0], [4.0], [9.0], [MAXCOST]],
                                  np.float32))
    vv4 = jnp.ones(4, jnp.float32)
    # clamp to 3.0: (2 + 3 + 3 + 3) / 4
    assert float(combine_view_costs(costs4, p_good, view_valid=vv4)[0]) == \
        pytest.approx(11.0 / 4.0)


def test_true_plane_has_low_cost(scene_setup):
    """The ground-truth plane must cost far less than a random plane."""
    images, rig, params, view_subset, scene = scene_setup
    h, w = images[0].shape
    w2 = w // 2

    # Ground truth plane in the rebased frame = original frame here because
    # camera 0 is at the origin in plane_scene.
    _, _, gt_depth, (n_w, d_w) = plane_scene(num_cams=4, h=32, w=40, focal=60.0)
    n = np.broadcast_to(np.asarray(-n_w if n_w[2] > 0 else n_w, np.float32),
                        (h, w2, 3))
    d = np.full((h, w2), np.float32(-d_w if n_w[2] > 0 else d_w))

    import gipuma_tpu.ops.cost as cost_mod
    c_true = np.asarray(cost_mod.multiview_cost(
        scene, params, 0, jnp.asarray(n), jnp.asarray(d)))

    rng = np.random.default_rng(7)
    n_rand = np.broadcast_to(np.asarray([0.3, 0.2, -0.93], np.float32),
                             (h, w2, 3))
    d_rand = np.full((h, w2), 30.0, np.float32)
    c_rand = np.asarray(cost_mod.multiview_cost(
        scene, params, 0, jnp.asarray(n_rand), jnp.asarray(d_rand)))

    interior = np.s_[8:24, 4:16]
    assert np.median(c_true[interior]) < 0.1 * np.median(c_rand[interior])
