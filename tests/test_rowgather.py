"""Row-aligned gather (rectified sampling primitive) vs numpy oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from gipuma_tpu.ops.pallas_rowgather import row_gather


def oracle(src, x):
    C, H, W = src.shape
    x = np.clip(x, 0, W - 1)
    x0 = np.clip(np.floor(x).astype(int), 0, W - 2)
    f = np.clip(x - x0, 0, 1)
    out = np.empty((C, *x.shape), np.float32)
    rows = np.arange(x.shape[0])[:, None]
    for c in range(C):
        out[c] = src[c][rows, x0] * (1 - f) + src[c][rows, x0 + 1] * f
    return out


@pytest.mark.parametrize("C,H,W,Ws", [(1, 40, 128, 100), (3, 48, 256, 200)])
def test_row_gather_matches_oracle(rng, C, H, W, Ws):
    src = rng.random((C, H, W)).astype(np.float32)
    x = (rng.random((H, Ws)) * (W + 10) - 5).astype(np.float32)
    got = np.asarray(row_gather(jnp.asarray(src), jnp.asarray(x),
                                interpret=True))
    np.testing.assert_allclose(got, oracle(src, x), rtol=1e-6, atol=1e-6)
