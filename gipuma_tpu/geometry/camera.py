"""Camera model and calibration preprocessing.

Host-side (numpy) camera setup with capability parity to the reference's
``getCameraParameters`` (cameraGeometryUtils.h:174-353):

* decompose 3x4 projection matrices into K, R, t (RQ decomposition — the
  reference uses cv::decomposeProjectionMatrix),
* rebase every camera so the reference camera becomes K[I|0]
  (cameraGeometryUtils.h:109-115,266-271),
* precompute the flat per-camera arrays the compute path needs
  (K, K_inv, R, t, C, M_inv, P, P_col4, R_orig_inv).

Device-side state is a ``CameraSet``: stacked jnp arrays forming a pytree so
the whole calibration rig can be passed through jit/pjit.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import numpy as np

# The reference hardcodes the KITTI baseline for the depth<->"disparity"
# conversion used by the sampling schedule (cameraGeometryUtils.h:305).
FAKE_BASELINE = 0.54


def decompose_projection(P: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decompose a 3x4 projection into (K, R, C) with K upper-triangular,
    positive diagonal, K[2,2]=1, R a proper rotation, and C the camera center.

    Equivalent to cv::decomposeProjectionMatrix (used at
    cameraGeometryUtils.h:252) implemented via RQ decomposition.
    """
    P = np.asarray(P, dtype=np.float64)
    M = P[:, :3]
    # RQ decomposition via QR of the flipped/transposed matrix.
    Pflip = np.flipud(M).T  # reverse rows, transpose
    Q, R_ = np.linalg.qr(Pflip)
    K = np.flipud(R_.T)[:, ::-1]
    R = np.flipud(Q.T)
    # Fix signs so diag(K) > 0.
    sign = np.diag(np.sign(np.diag(K)))
    K = K @ sign
    R = sign @ R
    if np.linalg.det(R) < 0:
        R = -R
        # Overall P scale sign absorbed; C (nullspace) unaffected.
    K = K / K[2, 2]
    # Camera center: right nullspace of P.
    _, _, Vt = np.linalg.svd(P)
    C = Vt[-1]
    C = C[:3] / C[3]
    return K, R, C


def camera_center_from_P(P: np.ndarray) -> np.ndarray:
    """Camera center via signed 3x3 minors of P (H&Z p.163).

    Capability of cameraGeometryUtils.h:22-49 (getCameraCenter).
    """
    P = np.asarray(P, dtype=np.float64)
    C = np.empty(4)
    for i in range(4):
        cols = [j for j in range(4) if j != i]
        C[i] = ((-1.0) ** i) * np.linalg.det(P[:, cols])
    return C[:3] / C[3]


def scale_K(K: np.ndarray, scale: float) -> np.ndarray:
    """Rescale intrinsics for a resized image (cameraGeometryUtils.h:136-147)."""
    K = K.copy()
    K[0, 0] /= scale
    K[1, 1] /= scale
    K[0, 2] /= scale
    K[1, 2] /= scale
    return K


@dataclasses.dataclass
class HostCamera:
    """One camera, host-side (float64 numpy), before/after rebasing."""

    P: np.ndarray          # 3x4 (after rebasing: K_shared @ [R|t])
    K: np.ndarray          # 3x3 per-camera intrinsics
    K_inv: np.ndarray
    R: np.ndarray          # 3x3 (rebased)
    t: np.ndarray          # 3
    C: np.ndarray          # 3 camera center (rebased frame)
    M_inv: np.ndarray      # inv(P[:, :3])
    P_col4: np.ndarray     # P[:, 3]
    R_orig_inv: np.ndarray  # inverse of the pre-rebasing rotation
    image_name: str = ""


@dataclasses.dataclass
class Rig:
    """The full calibrated, rebased camera rig (host-side)."""

    cameras: list[HostCamera]
    f: float               # shared focal length = K_ref[0,0] after scaling
    fy: float
    alpha: float           # fx / fy
    baseline: float        # FAKE_BASELINE (reference semantics)
    K_ref: np.ndarray      # shared K (reference camera's, scaled)
    K_ref_inv: np.ndarray

    @property
    def num_cameras(self) -> int:
        return len(self.cameras)


def build_rig(P_matrices: Sequence[np.ndarray],
              image_names: Sequence[str] | None = None,
              cam_scale: float = 1.0,
              rebase: bool = True) -> Rig:
    """Build a rebased rig from per-camera 3x4 projection matrices.

    Mirrors getCameraParameters (cameraGeometryUtils.h:174-353): camera 0 is
    the reference; after this call its pose is exactly [I|0] and all other
    cameras are expressed relative to it.  Per the reference, P uses the
    *shared* (reference) K for all cameras while the homography path uses
    per-camera K (cameraGeometryUtils.h:298,311-331).
    """
    n = len(P_matrices)
    Ks, Rs, Cs, ts = [], [], [], []
    for P in P_matrices:
        K, R, C = decompose_projection(np.asarray(P, dtype=np.float64))
        Ks.append(K)
        Rs.append(R)
        Cs.append(C)
        ts.append(-R @ C)

    # Rebase transform: inv([R0 t0; 0 1]) (cameraGeometryUtils.h:109-115).
    transform = np.eye(4)
    if rebase:
        T0 = np.eye(4)
        T0[:3, :3] = Rs[0]
        T0[:3, 3] = ts[0]
        transform = np.linalg.inv(T0)

    K_shared = scale_K(Ks[0], cam_scale)
    K_shared_inv = np.linalg.inv(K_shared)

    cams: list[HostCamera] = []
    for i in range(n):
        Ki = scale_K(Ks[i], cam_scale)
        Ti = np.eye(4)
        Ti[:3, :3] = Rs[i]
        Ti[:3, 3] = ts[i]
        Tn = Ti @ transform
        Rn = Tn[:3, :3]
        tn = Tn[:3, 3]
        # P uses the shared K — "assuming K is the same for all cameras"
        # (cameraGeometryUtils.h:278-279,298).
        P = K_shared @ Tn[:3, :4]
        C = camera_center_from_P(P)
        cams.append(HostCamera(
            P=P,
            K=Ki,
            K_inv=np.linalg.inv(Ki),
            R=Rn,
            t=tn,
            C=C,
            M_inv=np.linalg.inv(P[:, :3]),
            P_col4=P[:, 3].copy(),
            R_orig_inv=np.linalg.inv(Rs[i]),
            image_name=(image_names[i] if image_names else f"cam{i:03d}"),
        ))

    return Rig(
        cameras=cams,
        f=float(K_shared[0, 0]),
        fy=float(K_shared[1, 1]),
        alpha=float(K_shared[0, 0] / K_shared[1, 1]),
        baseline=FAKE_BASELINE,
        K_ref=K_shared,
        K_ref_inv=K_shared_inv,
    )


class CameraSet(NamedTuple):
    """Stacked device-side camera arrays (a pytree; leaves are [V, ...]).

    This is the TPU analog of ``CameraParameters_cu`` (cameraparameters.h:7-27,
    camera.h:7-62) — but as stacked dense arrays instead of an array of
    structs, so every geometric op vectorizes over views.
    """

    K: "np.ndarray"        # [V,3,3] per-camera intrinsics
    K_inv: "np.ndarray"    # [V,3,3]
    R: "np.ndarray"        # [V,3,3] rebased rotations
    t: "np.ndarray"        # [V,3]
    C: "np.ndarray"        # [V,3]
    M_inv: "np.ndarray"    # [V,3,3]
    P: "np.ndarray"        # [V,3,4]
    P_col4: "np.ndarray"   # [V,3]
    R_orig_inv: "np.ndarray"  # [V,3,3]
    # Scalars (0-d arrays) shared across cameras, reference semantics:
    f: "np.ndarray"        # K_ref[0,0]
    fy: "np.ndarray"
    alpha: "np.ndarray"    # f / fy
    baseline: "np.ndarray"  # FAKE_BASELINE
    cx: "np.ndarray"       # [V] per-camera principal points (cam.K[2])
    cy: "np.ndarray"       # [V] (cam.K[5])


def rig_to_cameraset(rig: Rig, dtype=np.float32) -> CameraSet:
    """Pack a host Rig into stacked arrays ready for jnp.asarray."""
    import jax.numpy as jnp

    def stack(attr):
        return jnp.asarray(np.stack([getattr(c, attr) for c in rig.cameras]),
                           dtype=dtype)

    return CameraSet(
        K=stack("K"),
        K_inv=stack("K_inv"),
        R=stack("R"),
        t=stack("t"),
        C=stack("C"),
        M_inv=stack("M_inv"),
        P=stack("P"),
        P_col4=stack("P_col4"),
        R_orig_inv=stack("R_orig_inv"),
        f=jnp.asarray(rig.f, dtype=dtype),
        fy=jnp.asarray(rig.fy, dtype=dtype),
        alpha=jnp.asarray(rig.alpha, dtype=dtype),
        baseline=jnp.asarray(rig.baseline, dtype=dtype),
        cx=jnp.asarray(np.array([c.K[0, 2] for c in rig.cameras]), dtype=dtype),
        cy=jnp.asarray(np.array([c.K[1, 2] for c in rig.cameras]), dtype=dtype),
    )
