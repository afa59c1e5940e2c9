"""Fused window-grads cost kernel (ops/pallas_sdg_fused) vs the unfused
window_grads path (ops/rect_cost._rect_pair_cost_batch_sdg on the
row_gather_affine path) — elementwise equivalence in interpret mode,
including disparity clamping, the analytic scratch-window base, and
window-edge behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.ops.pallas_rowgather import pack_taps
from gipuma_tpu.ops.pallas_sdg_fused import fused_sdg_cost_batch
from gipuma_tpu.ops.rect_cost import rect_pair_cost_batch


def _mk_inputs(key, C, hr, wr, K):
    k1, k2, k3 = jax.random.split(key, 3)
    ref = jax.random.uniform(k1, (3 * C, hr, wr), jnp.float32, 0.0, 255.0)
    src = np.asarray(
        jax.random.uniform(k2, (C, hr, wr), jnp.float32, 0.0, 255.0))
    src_packed = jnp.asarray(pack_taps(src))
    coef = jax.random.uniform(k3, (K, 3, 1, 1), jnp.float32,
                              minval=-0.05, maxval=0.05)
    abc = jnp.broadcast_to(coef, (K, 3, hr, wr)).copy()
    abc = abc.at[:, 2].add(10.0)   # center disparity
    return ref, src_packed, abc


@pytest.mark.parametrize("C,K,box", [(1, 2, 5), (3, 1, 7)])
def test_fused_sdg_matches_unfused(C, K, box):
    # wr = 4 blocks with span 3 exercises the dynamic analytic base.
    # (Shapes are minimal: interpret-mode Pallas costs ~2 s/Mtile.)
    hr, wr = 16, 512
    params = AlgorithmParams(box_hsize=box, box_vsize=box)
    ref, src, abc = _mk_inputs(jax.random.PRNGKey(0), C, hr, wr, K)
    lo, hi = jnp.float32(-20.0), jnp.float32(40.0)
    want = rect_pair_cost_batch(ref, src, abc,
                                params.replace(fused_window_cost=False),
                                interpret=True, disp_lo=lo, disp_hi=hi,
                                span_blocks=3)
    got = fused_sdg_cost_batch(ref, src, abc, params, interpret=True,
                               disp_lo=lo, disp_hi=hi, span_blocks=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("C,K,box", [(1, 2, 5), (1, 1, 7)])
def test_fused_sdg_onesided_matches_unfused(C, K, box):
    """sdg_onesided_edges: the ring-free kernel matches the ring-free
    unfused path elementwise (edge rows/columns use doubled one-sided
    window-sample differences)."""
    hr, wr = 16, 512
    params = AlgorithmParams(box_hsize=box, box_vsize=box,
                             sdg_onesided_edges=True)
    ref, src, abc = _mk_inputs(jax.random.PRNGKey(3), C, hr, wr, K)
    lo, hi = jnp.float32(-20.0), jnp.float32(40.0)
    want = rect_pair_cost_batch(ref, src, abc,
                                params.replace(fused_window_cost=False),
                                interpret=True, disp_lo=lo, disp_hi=hi,
                                span_blocks=3)
    got = fused_sdg_cost_batch(ref, src, abc, params, interpret=True,
                               disp_lo=lo, disp_hi=hi, span_blocks=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-3)


def test_onesided_interior_matches_ring_on_smooth_planes():
    """On a smooth (quadratic) image the one-sided edge estimator's
    O(inc^2*I'') mismatch is tiny: whole-window costs stay close to the
    ring mode's."""
    hr, wr = 16, 256
    params = AlgorithmParams(box_hsize=5, box_vsize=5,
                             fused_window_cost=False)
    ys, xs = np.mgrid[:hr, :wr].astype(np.float32)
    img = 50.0 + 0.8 * xs + 0.3 * ys + 2e-3 * xs * ys
    ref = np.stack([img,
                    np.gradient(img, axis=1) * 4.0,    # step-2 central *2
                    np.gradient(img, axis=0) * 4.0])
    src = jnp.asarray(pack_taps(img[None]))
    abc = jnp.zeros((1, 3, hr, wr), jnp.float32) + jnp.asarray(
        [0.0, 0.0, 3.0], jnp.float32)[None, :, None, None]
    lo, hi = jnp.float32(-10.0), jnp.float32(20.0)
    ring = rect_pair_cost_batch(jnp.asarray(ref), src, abc, params,
                                interpret=True, disp_lo=lo, disp_hi=hi,
                                span_blocks=2)
    oneside = rect_pair_cost_batch(
        jnp.asarray(ref), src, abc,
        params.replace(sdg_onesided_edges=True),
        interpret=True, disp_lo=lo, disp_hi=hi, span_blocks=2)
    # The one-sided estimator's shorter (inc vs 2*inc) baseline doubles
    # the bf16 tap-quantization noise of the 2 edge rows/columns' gradient
    # estimates — the dominant difference on a smooth image (the operator
    # mismatch itself is O(inc^2*I''), negligible here).  The engine-level
    # quality gate is tests/test_rect_engine.py::
    # test_recovers_plane_onesided_edges.
    interior = np.s_[:, 4:-4, 4:-4]
    np.testing.assert_allclose(np.asarray(oneside)[interior],
                               np.asarray(ring)[interior],
                               rtol=0.15, atol=0.15)


def test_fused_sdg_hw_valid_masking():
    """Per-view extent skipping: the valid region is bitwise-unchanged by
    hw_valid; only the (never-read) pad region becomes unspecified."""
    hr, wr = 32, 512
    params = AlgorithmParams(box_hsize=5, box_vsize=5)
    ref, src, abc = _mk_inputs(jax.random.PRNGKey(2), 1, hr, wr, 2)
    lo, hi = jnp.float32(-20.0), jnp.float32(40.0)
    full = np.asarray(fused_sdg_cost_batch(
        ref, src, abc, params, interpret=True,
        disp_lo=lo, disp_hi=hi, span_blocks=3))
    hv, wv = 10, 384     # partial row block; one column group skipped
    got = np.asarray(fused_sdg_cost_batch(
        ref, src, abc, params, interpret=True, disp_lo=lo, disp_hi=hi,
        span_blocks=3, hw_valid=jnp.asarray([hv, wv], jnp.int32)))
    np.testing.assert_array_equal(got[:, :hv, :wv], full[:, :hv, :wv])


@pytest.mark.parametrize("d_hi,onesided,span", [
    (40.0, False, 3),
    (40.0, True, 3),
    # d_hi == 125 makes the analytic base of column group g=1 exactly
    # 128-aligned (shift_raw == 0) on the onesided layout (XS_EXT[0] ==
    # -hrad == -2 at box 5): the roll amount must then be 0, never the
    # full lane width SPAN*128 (unverified dynamic-roll class on v5e).
    # The [-20, 125] disparity range needs the honest span bound 4 — the
    # roll path has no right-edge clamp slack to hide an understated span.
    (125.0, True, 4),
])
def test_fused_roll_matches_aligned(d_hi, onesided, span):
    """config.fused_roll (unaligned scratch base, TK = span-1 takes) is
    bitwise-equal to the aligned full-span path in interpret mode."""
    hr, wr = 16, 512
    params = AlgorithmParams(box_hsize=5, box_vsize=5,
                             sdg_onesided_edges=onesided)
    ref, src, abc = _mk_inputs(jax.random.PRNGKey(7), 1, hr, wr, 2)
    lo, hi = jnp.float32(-20.0), jnp.float32(d_hi)
    base = np.asarray(fused_sdg_cost_batch(
        ref, src, abc, params, interpret=True,
        disp_lo=lo, disp_hi=hi, span_blocks=span))
    rolled = np.asarray(fused_sdg_cost_batch(
        ref, src, abc, params.replace(fused_roll=True), interpret=True,
        disp_lo=lo, disp_hi=hi, span_blocks=span))
    np.testing.assert_array_equal(rolled, base)


def test_fused_sdg_tile_ok_masking():
    """Footprint tile skip: masked-ON tiles are bitwise-unchanged by
    tile_ok; masked-off tiles (no read-back targets) are unspecified."""
    hr, wr = 32, 512
    params = AlgorithmParams(box_hsize=5, box_vsize=5)
    ref, src, abc = _mk_inputs(jax.random.PRNGKey(5), 1, hr, wr, 2)
    lo, hi = jnp.float32(-20.0), jnp.float32(40.0)
    full = np.asarray(fused_sdg_cost_batch(
        ref, src, abc, params, interpret=True,
        disp_lo=lo, disp_hi=hi, span_blocks=3))
    tm = np.ones((hr // 8, wr // 128), np.int32)
    tm[1, 2] = 0     # one interior tile off
    tm[3, :] = 0     # one tile row off
    got = np.asarray(fused_sdg_cost_batch(
        ref, src, abc, params, interpret=True, disp_lo=lo, disp_hi=hi,
        span_blocks=3, tile_ok=jnp.asarray(tm)))
    for u in range(hr // 8):
        for v in range(wr // 128):
            if tm[u, v]:
                np.testing.assert_array_equal(
                    got[:, 8 * u:8 * u + 8, 128 * v:128 * v + 128],
                    full[:, 8 * u:8 * u + 8, 128 * v:128 * v + 128])


def test_fused_sdg_unaligned_rows_full_span():
    # hr not a multiple of the row block; span == num blocks (base pinned 0).
    hr, wr = 12, 256
    params = AlgorithmParams(box_hsize=5, box_vsize=5)
    ref, src, abc = _mk_inputs(jax.random.PRNGKey(1), 1, hr, wr, 2)
    lo, hi = jnp.float32(-60.0), jnp.float32(90.0)
    want = rect_pair_cost_batch(ref, src, abc,
                                params.replace(fused_window_cost=False),
                                interpret=True, disp_lo=lo, disp_hi=hi,
                                span_blocks=2)
    got = fused_sdg_cost_batch(ref, src, abc, params, interpret=True,
                               disp_lo=lo, disp_hi=hi, span_blocks=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-3)
