"""2-pass smooth-map permutation vs direct indexing."""
import numpy as np
import jax.numpy as jnp
import pytest

from gipuma_tpu.ops.permute2d import build_tables, permute2d, permute2d_take


def smooth_map(out_h, out_w, in_h, in_w, rot=0.1, scale=1.1, shift=(2.3, -1.7)):
    """Rotation+scale+shift map from output to input coords (homography-like)."""
    s, c = np.sin(rot), np.cos(rot)
    ys, xs = np.meshgrid(np.arange(out_h), np.arange(out_w), indexing="ij")
    xi = scale * (c * xs - s * ys) + shift[0]
    yi = scale * (s * xs + c * ys) + shift[1]
    R = np.clip(np.round(yi).astype(np.int64), 0, in_h - 1)
    C = np.clip(np.round(xi).astype(np.int64), 0, in_w - 1)
    return R, C


@pytest.mark.parametrize("rot,scale", [(0.0, 1.0), (0.15, 1.3), (-0.2, 0.95)])
def test_permute_matches_direct_indexing(rot, scale):
    in_h, in_w, out_h, out_w = 48, 64, 40, 56
    R, C = smooth_map(out_h, out_w, in_h, in_w, rot=rot, scale=scale)
    t = build_tables(R, C, in_h, in_w)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, in_h, in_w)).astype(np.float32)
    want = x[:, R, C]

    got = np.asarray(permute2d(jnp.asarray(x), jnp.asarray(t.c1),
                               jnp.asarray(t.r), interpret=True))
    # Slot contention (border clipping; vertical collapse under scale<1) is
    # reported precisely; every unaffected output must be bit-exact, and the
    # affected outputs must still read a same-row horizontal neighbor.
    ok = ~t.affected
    assert ok.sum() > want[0].size * 3 // 4
    np.testing.assert_array_equal(got[:, ok], want[:, ok])
    if t.conflicts == 0:
        np.testing.assert_array_equal(got, want)
    sy, sx = np.nonzero(t.affected)
    if sy.size:
        read_c = t.c1[R[sy, sx], sx].astype(np.int64)
        np.testing.assert_array_equal(
            got[:, sy, sx], x[:, R[sy, sx], read_c])

    got_take = np.asarray(permute2d_take(jnp.asarray(x), jnp.asarray(R),
                                         jnp.asarray(C)))
    np.testing.assert_array_equal(got_take, want)


def test_single_channel_shape():
    R, C = smooth_map(16, 24, 20, 32)
    t = build_tables(R, C, 20, 32)
    x = np.arange(20 * 32, dtype=np.float32).reshape(20, 32)
    got = np.asarray(permute2d(jnp.asarray(x), jnp.asarray(t.c1),
                               jnp.asarray(t.r), interpret=True))
    assert got.shape == (16, 24)
    if t.conflicts == 0:
        np.testing.assert_array_equal(got, x[R, C])


def test_vertical_collapse_reports_conflicts():
    # A map that folds two output rows with DIFFERENT columns onto one input
    # row must be flagged (the 2-pass decomposition cannot represent it).
    out_h = out_w = 8
    R = np.zeros((out_h, out_w), np.int64)          # all rows -> row 0
    C = np.tile(np.arange(out_w), (out_h, 1))
    C[1] = (C[1] + 3) % out_w                       # row 1 wants shifted cols
    t = build_tables(R, C, 8, 8)
    assert t.conflicts > 0
