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


@pytest.mark.parametrize("span", [None, 2])
def test_row_gather_packed_taps(rng, span):
    """bf16 tap-pair packing (one int32 word = both bilinear taps, one
    gather) must match the f32 path within bf16 tap quantization."""
    from gipuma_tpu.ops.pallas_rowgather import pack_taps

    src = (rng.random((3, 40, 256)) * 255.0).astype(np.float32)
    x = (rng.random((40, 300)) * 255.0).astype(np.float32)
    want = oracle(src, x)
    got = np.asarray(row_gather(jnp.asarray(pack_taps(src)), jnp.asarray(x),
                                interpret=True, max_span_blocks=span))
    # bf16 has 8 mantissa bits: |err| <= 0.5 per tap at intensity 255.
    assert np.abs(got - want).max() < 1.0
