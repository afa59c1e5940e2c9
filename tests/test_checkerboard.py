"""Checkerboard compressed-layout access vs direct numpy indexing."""
import numpy as np
import jax.numpy as jnp

from gipuma_tpu.ops import checkerboard as cb


def ref_value(a, y, x):
    """Clamp-to-edge lookup (= edge padding)."""
    h, w = a.shape[:2]
    return a[np.clip(y, 0, h - 1), np.clip(x, 0, w - 1)]


def test_shifted_matches_oracle(rng):
    h, w = 12, 16
    a = rng.normal(size=(h, w)).astype(np.float32)
    eo = cb.PaddedEO.build(jnp.asarray(a), pr=6, pc=8)
    for parity in (0, 1):
        for (dy, dx) in [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1),
                         (-5, 0), (0, 5), (-3, 2), (4, -6), (6, 7)]:
            got = np.asarray(eo.shifted(dy, dx, parity))
            w2 = w // 2
            expect = np.zeros((h, w2), np.float32)
            for y in range(h):
                p = (y + parity) % 2
                for j in range(w2):
                    x = 2 * j + p
                    expect[y, j] = ref_value(a, y + dy, x + dx)
            np.testing.assert_array_equal(got, expect, err_msg=f"parity={parity} dy={dy} dx={dx}")


def test_shifted_channels(rng):
    h, w, c = 8, 10, 3
    a = rng.normal(size=(h, w, c)).astype(np.float32)
    eo = cb.PaddedEO.build(jnp.asarray(a), pr=2, pc=4)
    got = np.asarray(eo.shifted(-1, 1, 1))
    w2 = w // 2
    for y in range(h):
        p = (y + 1) % 2
        for j in range(w2):
            x = 2 * j + p
            np.testing.assert_array_equal(
                got[y, j], ref_value(a, y - 1, x + 1))


def test_extract_interleave_roundtrip(rng):
    h, w = 10, 14
    a = rng.normal(size=(h, w)).astype(np.float32)
    aj = jnp.asarray(a)
    black = cb.extract(aj, 0)
    red = cb.extract(aj, 1)
    # interleaving both halves back reconstructs the array
    out = cb.interleave(jnp.zeros_like(aj), black, 0)
    out = cb.interleave(out, red, 1)
    np.testing.assert_array_equal(np.asarray(out), a)
    # black active coords have (x+y) even
    x = np.asarray(cb.active_x(h, w // 2, 0))
    y = np.asarray(cb.active_y(h, w // 2))
    assert ((x + y) % 2 == 0).all()
    x = np.asarray(cb.active_x(h, w // 2, 1))
    assert ((x + y) % 2 == 1).all()


def test_interleave_only_touches_active(rng):
    h, w = 6, 8
    a = rng.normal(size=(h, w, 4)).astype(np.float32)
    vals = rng.normal(size=(h, w // 2, 4)).astype(np.float32)
    out = np.asarray(cb.interleave(jnp.asarray(a), jnp.asarray(vals), 0))
    for y in range(h):
        for x in range(w):
            if (x + y) % 2 == 0:
                j = x // 2
                np.testing.assert_array_equal(out[y, x], vals[y, j])
            else:
                np.testing.assert_array_equal(out[y, x], a[y, x])
