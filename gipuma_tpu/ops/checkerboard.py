"""Red/black checkerboard layout for TPU-dense half-grid sweeps.

The reference maps CUDA threads to alternating image rows to form the
checkerboard (gipuma.cu:1713-1823: ``p.y = 2y`` or ``2y+1`` by thread
parity).  On TPU we instead use a *compressed* dense layout: the active
color's pixels form an [H, W/2] array (one pixel per row-column slot), so
every sweep computes on a dense half-grid with zero masking waste, and all
neighbor/window accesses become static strided slices — no gathers.

Conventions:
  * BLACK pixels satisfy (x + y) % 2 == 0, RED (x + y) % 2 == 1.
    (Reference "black" kernels map even threadIdx.x to even rows; the color
    naming is arbitrary — only the alternation order matters.)
  * parity p in {0 (black), 1 (red)}; active x(y, j) = 2*j + ((y + p) % 2).
  * W must be even (io layer pads odd-width images).

The key access pattern: value of array `a` at (y + dy, x + dx) for all
active pixels (y, x).  With `a` edge-padded and split into even/odd column
planes E/O, this is a static contiguous slice of E or O selected by row
parity — see `PaddedEO.shifted`.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
from jax import lax


def row_parity(h: int, parity: int) -> jnp.ndarray:
    """[H, 1] int32 array: (y + parity) % 2 — the active-x offset per row."""
    y = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    return (y + parity) % 2


def active_x(h: int, w2: int, parity: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H, W2] x-coordinates of the active pixels."""
    j = jax.lax.broadcasted_iota(jnp.int32, (h, w2), 1)
    return (2 * j + row_parity(h, parity)).astype(dtype)


def active_y(h: int, w2: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H, W2] y-coordinates (just the row index broadcast)."""
    return jax.lax.broadcasted_iota(jnp.int32, (h, w2), 0).astype(dtype)


@jax.tree_util.register_pytree_node_class
class PaddedEO:
    """Even/odd column split of an edge-padded [H + 2*pr, W + 2*pc(, C)] array.

    A registered pytree: (E, O) are array children; (pr, pc, h, w2) are
    static aux data so vmap/shard_map/jit treat them as structure."""

    def __init__(self, E, O, pr: int, pc: int, h: int, w2: int):
        self.E = E   # columns 0, 2, 4, ... of the padded array
        self.O = O   # columns 1, 3, 5, ...
        self.pr = pr  # row padding
        self.pc = pc  # column padding (even)
        self.h = h    # original height
        self.w2 = w2  # original width // 2

    def tree_flatten(self):
        return (self.E, self.O), (self.pr, self.pc, self.h, self.w2)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @staticmethod
    def build(a: jnp.ndarray, pr: int, pc: int) -> "PaddedEO":
        """Edge-pad `a` ([H, W] or [H, W, C]) and split columns even/odd.

        Edge padding replicates border pixels — identical to the clamp
        addressing the reference's textures resolve to."""
        if pc % 2:
            pc += 1
        h, w = a.shape[:2]
        assert w % 2 == 0, "width must be even (io layer pads)"
        pad = [(pr, pr), (pc, pc)] + [(0, 0)] * (a.ndim - 2)
        ap = jnp.pad(a, pad, mode="edge")
        return PaddedEO(E=ap[:, 0::2], O=ap[:, 1::2], pr=pr, pc=pc, h=h, w2=w // 2)

    @staticmethod
    def build_row_padded(a_ext: jnp.ndarray, pr: int, pc: int) -> "PaddedEO":
        """Like `build`, but `a_ext` already carries pr real halo rows on
        each side (tile sharding); only columns are edge-padded."""
        if pc % 2:
            pc += 1
        h_ext, w = a_ext.shape[:2]
        assert w % 2 == 0
        pad = [(0, 0), (pc, pc)] + [(0, 0)] * (a_ext.ndim - 2)
        ap = jnp.pad(a_ext, pad, mode="edge")
        return PaddedEO(E=ap[:, 0::2], O=ap[:, 1::2], pr=pr, pc=pc,
                        h=h_ext - 2 * pr, w2=w // 2)

    def shifted(self, dy: int, dx: int, parity: int) -> jnp.ndarray:
        """[H, W2(, C)] values of the source array at (y + dy, x + dx) for all
        active pixels (y, x) of the given parity.  Out-of-image accesses
        resolve to edge-replicated values (callers mask when the reference
        instead skips, e.g. propagation border guards gipuma.cu:1238-1291)."""

        def plane(pi: int) -> jnp.ndarray:
            s = pi + dx + self.pc
            src = self.E if s % 2 == 0 else self.O
            start = (self.pr + dy, s // 2)
            limit = (self.pr + dy + self.h, s // 2 + self.w2)
            if src.ndim == 3:
                start += (0,)
                limit += (src.shape[2],)
            return lax.slice(src, start, limit)

        b0, b1 = plane(0), plane(1)
        rp = row_parity(self.h, parity)
        if b0.ndim == 3:
            rp = rp[..., None]
        return jnp.where(rp == 0, b0, b1)

    def shifted_dyn(self, dy: jnp.ndarray, dx: jnp.ndarray, parity: int,
                    dx_parity: int) -> jnp.ndarray:
        """Like `shifted` but with *traced* (dy, dx) offsets — usable inside
        lax.scan over window offsets, which keeps the compiled graph size
        independent of the window area.  `dx_parity` (= dx % 2) must be
        static: offsets are scanned in two groups, one per column parity.

        Requires |dy| <= pr and |dx| <= pc - 1 (callers pad accordingly)."""

        def plane(pi: int) -> jnp.ndarray:
            s_parity = (pi + dx_parity + self.pc) % 2   # static (pc is even)
            src = self.E if s_parity == 0 else self.O
            # Column start: floor((pi + dx + pc) / 2); for the even-parity
            # combination this equals (dx + pc) // 2 regardless of pi.
            col = (pi + dx + self.pc) // 2
            start = (self.pr + dy, col)
            sizes = (self.h, self.w2)
            if src.ndim == 3:
                start += (0,)
                sizes += (src.shape[2],)
            return lax.dynamic_slice(src, start, sizes)

        b0, b1 = plane(0), plane(1)
        rp = row_parity(self.h, parity)
        if b0.ndim == 3:
            rp = rp[..., None]
        return jnp.where(rp == 0, b0, b1)


def extract(a: jnp.ndarray, parity: int) -> jnp.ndarray:
    """Compress a full [H, W(, C)] array to the active half-grid [H, W2(, C)]."""
    e, o = a[:, 0::2], a[:, 1::2]
    rp = row_parity(a.shape[0], parity)
    if a.ndim == 3:
        rp = rp[..., None]
    return jnp.where(rp == 0, e, o)


def interleave(a: jnp.ndarray, vals: jnp.ndarray, parity: int) -> jnp.ndarray:
    """Scatter half-grid `vals` [H, W2(, C)] back into full array `a`,
    writing only the active color's pixels."""
    e, o = a[:, 0::2], a[:, 1::2]
    rp = row_parity(a.shape[0], parity)
    if a.ndim == 3:
        rp = rp[..., None]
    new_e = jnp.where(rp == 0, vals, e)
    new_o = jnp.where(rp == 1, vals, o)
    stacked = jnp.stack([new_e, new_o], axis=2)  # [H, W2, 2(, C)]
    return stacked.reshape(a.shape)
