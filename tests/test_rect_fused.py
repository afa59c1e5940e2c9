"""Fused rect cost kernel (ops/pallas_rect_fused) vs the unfused reference
(ops/rect_cost.rect_pair_cost_batch) — elementwise equivalence in interpret
mode, including disparity clamping and window-edge behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.ops.pallas_rect_fused import fused_pair_cost_batch
from gipuma_tpu.ops.rect_cost import rect_pair_cost_batch


def _mk_inputs(key, C, hr, wr, K):
    k1, k2, k3 = jax.random.split(key, 3)
    ref = jax.random.uniform(k1, (3 * C, hr, wr), jnp.float32, 0.0, 255.0)
    src = jax.random.uniform(k2, (3 * C, hr, wr), jnp.float32, 0.0, 255.0)
    # Affine disparity fields with small slopes (realistic planes).
    coef = jax.random.uniform(k3, (K, 3, 1, 1), jnp.float32,
                              minval=-0.05, maxval=0.05)
    abc = jnp.broadcast_to(coef, (K, 3, hr, wr)).copy()
    abc = abc.at[:, 2].add(10.0)   # center disparity
    return ref, src, abc


@pytest.mark.parametrize("C,K,box", [(1, 3, 7), (3, 2, 5)])
def test_fused_matches_unfused(C, K, box):
    hr, wr = 48, 256
    params = AlgorithmParams(box_hsize=box, box_vsize=box)
    ref, src, abc = _mk_inputs(jax.random.PRNGKey(0), C, hr, wr, K)
    want = rect_pair_cost_batch(ref, src, abc, params, interpret=True,
                                disp_lo=jnp.float32(-20.0),
                                disp_hi=jnp.float32(40.0), span_blocks=2)
    got = fused_pair_cost_batch(ref, src, abc, params, interpret=True,
                                disp_lo=jnp.float32(-20.0),
                                disp_hi=jnp.float32(40.0), span_blocks=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-3)


def test_fused_unclamped_and_unaligned_rows():
    # hr not a multiple of BLOCK_ROWS; no disparity bounds (full span).
    hr, wr = 40, 128
    params = AlgorithmParams(box_hsize=5, box_vsize=5)
    ref, src, abc = _mk_inputs(jax.random.PRNGKey(1), 1, hr, wr, 2)
    want = rect_pair_cost_batch(ref, src, abc, params, interpret=True)
    got = fused_pair_cost_batch(ref, src, abc, params, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-3)
