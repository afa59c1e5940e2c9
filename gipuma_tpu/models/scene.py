"""ScenePack construction: images + calibration -> device-ready cost inputs.

The TPU analog of the reference's texture upload + GlobalState wiring
(main.cpp:509-656, 829-933): instead of CUDA texture objects we precompute
per-view gradient channels (exactly equivalent to the reference's
central-difference texture fetches — see ops/sampling.py) and pack
everything into a single pytree.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AlgorithmParams
from ..geometry import transforms as T
from ..geometry.camera import Rig, rig_to_cameraset
from ..ops import checkerboard as cb
from ..ops.cost import ScenePack
from ..ops.pallas_sampling import pad_width_to_128, split_blocks
from ..ops.sampling import central_gradients, pack_bilinear_taps


def ensure_even_width(img: np.ndarray) -> np.ndarray:
    """Pad odd-width images by one edge-replicated column (checkerboard
    layout needs even W; outputs are cropped back by the pipeline)."""
    if img.shape[1] % 2 == 1:
        img = np.concatenate([img, img[:, -1:]], axis=1)
    return img


def build_scene(images: Sequence[np.ndarray], rig: Rig,
                view_subset: Sequence[int], params: AlgorithmParams,
                depth_min: float, depth_max: float,
                dtype=jnp.float32, lite: bool = False) -> ScenePack:
    """Pack reference image (index 0) + selected source views.

    images: list of [H, W] or [H, W, C] float arrays (intensity scale 0-255,
    matching the reference's CV_32F grayscale conversion, main.cpp:741-751).
    view_subset: indices into `images`/rig.cameras (excluding 0).

    lite=True skips the exact-cost-path sampling arrays (bilinear tap
    tables, Pallas block splits, padded reference windows) — the rect fast
    path (ops/rect_cost.py) reads only the geometry fields, and these
    arrays dominate scene-build time and device memory.  The skipped
    fields hold rank-preserving dummies so the pytree structure (and the
    view axis for pad_scene_views) stays intact.
    """
    ref = np.asarray(images[0], dtype=np.float32)
    if ref.ndim == 2:
        ref = ref[..., None]
    h, w = ref.shape[:2]
    assert w % 2 == 0, "width must be even — use ensure_even_width"
    C = ref.shape[2]

    cams = rig_to_cameraset(rig)

    V = len(view_subset)
    pr = params.box_vrad
    pc = params.box_hrad + 2
    ref_j = jnp.asarray(ref, dtype=dtype)
    if lite:
        tiny = jnp.zeros((2, 2, C), dtype)
        ref_img_eo = cb.PaddedEO.build(tiny, 0, 0)
        ref_gx_eo = ref_img_eo
        ref_gy_eo = ref_img_eo
        src = jnp.zeros((V, 1, 1), dtype)
        src_blocks = jnp.zeros((V, 1, 1, 1, 128), dtype)
    else:
        # Reference channels, padded for checkerboard window access.
        gx, gy = central_gradients(jnp.moveaxis(ref_j, -1, 0))
        gx = jnp.moveaxis(gx, 0, -1)
        gy = jnp.moveaxis(gy, 0, -1)
        ref_img_eo = cb.PaddedEO.build(ref_j, pr, pc)
        ref_gx_eo = cb.PaddedEO.build(gx, pr, pc)
        ref_gy_eo = cb.PaddedEO.build(gy, pr, pc)

    # Source views: packed (img, gx, gy) channels.
    src_list, A_list, b_list = [], [], []
    for v in view_subset:
        if not lite:
            img = np.asarray(images[v], dtype=np.float32)
            if img.ndim == 2:
                img = img[..., None]
            assert img.shape[:2] == (h, w), \
                "all views must share the image size"
            img_j = jnp.asarray(img, dtype=dtype)
            vgx, vgy = central_gradients(jnp.moveaxis(img_j, -1, 0))
            src_list.append(jnp.concatenate(
                [img_j, jnp.moveaxis(vgx, 0, -1), jnp.moveaxis(vgy, 0, -1)],
                axis=-1))
        cam = rig.cameras[v]
        A, b = T.warp_coefficients(cam.K, cam.R, cam.t)
        A_list.append(A)
        b_list.append(b)

    if not lite:
        src_hwc = jnp.stack(src_list)               # [V, H, W, 3C]
        # Bilinear 2x2 tap table for the XLA sampler: [V, H*W, 4*3C].
        src = jax.vmap(pack_bilinear_taps)(src_hwc)
        # Block-split copy for the Pallas sampler: [V, NB, 3C, H, 128].
        src_chw = jnp.moveaxis(src_hwc, -1, 1)      # [V, 3C, H, W]
        src_blocks = jax.vmap(
            lambda s: split_blocks(pad_width_to_128(s)))(src_chw)
    A = jnp.asarray(np.stack(A_list), dtype=dtype)  # [V, 3, 3]
    b = jnp.asarray(np.stack(b_list), dtype=dtype)  # [V, 3]

    ref_cam = rig.cameras[0]
    K1_inv = jnp.asarray(ref_cam.K_inv, dtype=dtype)
    x, yg = T.pixel_grid(h, w, dtype)
    rays = T.pixel_rays(K1_inv, x, yg)
    M_inv = jnp.asarray(ref_cam.M_inv, dtype=dtype)
    P_col4 = jnp.asarray(ref_cam.P_col4, dtype=dtype)
    C_ref = jnp.asarray(ref_cam.C, dtype=dtype)
    view_vec = T.view_vectors(M_inv, P_col4, C_ref, x, yg)

    return ScenePack(
        ref_img=ref_img_eo,
        ref_gx=ref_gx_eo,
        ref_gy=ref_gy_eo,
        src=src,
        A=A,
        b=b,
        k1inv_c0=K1_inv[:, 0],
        k1inv_c1=K1_inv[:, 1],
        rays=rays,
        view_vec=view_vec,
        fx=jnp.asarray(rig.f, dtype=dtype),
        cx=jnp.asarray(ref_cam.K[0, 2], dtype=dtype),
        cy=jnp.asarray(ref_cam.K[1, 2], dtype=dtype),
        alpha_focal=jnp.asarray(rig.alpha, dtype=dtype),
        f=jnp.asarray(rig.f, dtype=dtype),
        baseline=jnp.asarray(rig.baseline, dtype=dtype),
        M_inv=M_inv,
        P_col4=P_col4,
        R_orig_inv=jnp.asarray(ref_cam.R_orig_inv, dtype=dtype),
        depth_min=jnp.asarray(depth_min, dtype=dtype),
        depth_max=jnp.asarray(depth_max, dtype=dtype),
        view_valid=jnp.ones((len(view_subset),), dtype=dtype),
        src_blocks=src_blocks,
        texture_ok=_texture_mask(ref_j, params) if params.no_texture_check
        else jnp.ones((h, w), bool),
        row_offset=jnp.asarray(0, jnp.int32),
        global_h=jnp.asarray(h, jnp.int32),
    )


def _texture_mask(ref: jnp.ndarray, params: AlgorithmParams) -> jnp.ndarray:
    """NOTEXTURE_CHECK capability (hasImageTexture, gipuma.cu:520-547):
    a pixel is textureless when more than hrad*vrad*4/inc^2 * no_texture_per
    window samples have bilateral weight > no_texture_sim."""
    import jax.numpy as jnp

    h, w = ref.shape[:2]
    refp = jnp.pad(ref, ((params.box_vrad, params.box_vrad),
                         (params.box_hrad, params.box_hrad), (0, 0)),
                   mode="edge")
    count = jnp.zeros((h, w), jnp.int32)
    for (dx, dy) in params.window_offsets():
        win = jax.lax.dynamic_slice(
            refp, (params.box_vrad + dy, params.box_hrad + dx, 0),
            (h, w, ref.shape[2]))
        wgt = jnp.exp(-jnp.mean(jnp.abs(win - ref), -1) / params.gamma)
        count = count + (wgt > params.no_texture_sim).astype(jnp.int32)
    inc = params.window_increment
    limit = (params.box_hrad * params.box_vrad * 4) // (inc * inc) \
        * params.no_texture_per
    return count <= limit


def pad_scene_views(scene: ScenePack, multiple: int) -> ScenePack:
    """Pad the view axis to a multiple of the view-mesh size.

    Padded slots duplicate view 0's arrays but carry view_valid = 0, so
    their per-view costs are forced to MAXCOST and never influence the
    best-n combination."""
    V = scene.num_views
    target = -(-V // multiple) * multiple
    if target == V:
        return scene
    pad = target - V

    def pad0(a):
        reps = jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0)
        return reps

    return scene._replace(
        src=pad0(scene.src), A=pad0(scene.A), b=pad0(scene.b),
        src_blocks=pad0(scene.src_blocks),
        view_valid=jnp.concatenate(
            [scene.view_valid, jnp.zeros((pad,), scene.view_valid.dtype)]))
