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


@pytest.mark.parametrize("span", [None, 2])
def test_row_gather_grad_fwd(rng, span):
    """grad_fwd packing ([img-taps, gy-taps] words -> img, gx, gy channels
    with gx = 2*(v1 - v0), the bilinear interpolant's derivative)."""
    from gipuma_tpu.ops.pallas_rowgather import pack_taps

    C = 2  # two image channels
    img = (rng.random((C, 40, 256)) * 255.0).astype(np.float32)
    gy = (rng.random((C, 40, 256)) * 20.0 - 10.0).astype(np.float32)
    x = (rng.random((40, 300)) * 255.0).astype(np.float32)
    src = np.concatenate([img, gy], axis=0)
    got = np.asarray(row_gather(jnp.asarray(pack_taps(src)), jnp.asarray(x),
                                interpret=True, max_span_blocks=span,
                                grad_fwd=True))
    assert got.shape == (3 * C, 40, 300)
    want_img = oracle(img, x)
    want_gy = oracle(gy, x)
    x0 = np.clip(np.floor(np.clip(x, 0, 255)).astype(int), 0, 254)
    rows = np.arange(40)[:, None]
    want_gx = np.stack([2.0 * (img[c][rows, x0 + 1] - img[c][rows, x0])
                        for c in range(C)])
    assert np.abs(got[:C] - want_img).max() < 1.0
    assert np.abs(got[C:2 * C] - want_gx).max() < 2.5   # diff of bf16 taps
    assert np.abs(got[2 * C:] - want_gy).max() < 0.1


@pytest.mark.parametrize("span", [None, 2])
def test_row_gather_tile_mask(rng, span):
    """Output-tile skip (tile_ok): masked-on [8, 128] tiles match the
    unmasked gather exactly; masked-off tiles are unspecified and must not
    perturb masked-on ones (shared scratch window state)."""
    C, H, W, Ws = 2, 48, 256, 300
    src = rng.random((C, H, W)).astype(np.float32)
    x = (rng.random((H, Ws)) * (W - 1)).astype(np.float32)
    tm = (rng.random((-(-H // 8), -(-Ws // 128))) < 0.5).astype(np.int32)
    tm[0, 0] = 1  # keep at least one tile on
    want = np.asarray(row_gather(jnp.asarray(src), jnp.asarray(x),
                                 interpret=True, max_span_blocks=span))
    got = np.asarray(row_gather(jnp.asarray(src), jnp.asarray(x),
                                interpret=True, max_span_blocks=span,
                                tile_ok=jnp.asarray(tm)))
    on = np.repeat(np.repeat(tm > 0, 8, 0), 128, 1)[:H, :Ws]
    # 1-ULP tolerance: the mask input changes XLA's fusion of the lerp in
    # interpret mode (FMA contraction), not the gathered taps.
    np.testing.assert_allclose(got[:, on], want[:, on], rtol=2e-7, atol=0)
