"""Synthetic known-transform recovery for data/registration.py — the JAX
soft-MI affine registration replacing the reference's SimpleITK
Sobel + Mattes-MI pipeline (reference organize_folder_structure.py:99-140).
"""
import numpy as np
from scipy import ndimage as ndi

from mra_gan_tpu.data.registration import (apply_transform,
                                           center_of_mass_init,
                                           register_affine)

SHAPE = (32, 32, 32)


def _blob_volume(seed: int = 0) -> np.ndarray:
    """Smooth, structured test volume: a few gaussian blobs on a smooth
    background — enough mutual-information signal to register on, none of
    the degeneracy of pure noise."""
    rs = np.random.RandomState(seed)
    vol = ndi.gaussian_filter(rs.rand(*SHAPE).astype(np.float32), 3.0)
    for _ in range(5):
        c = rs.uniform(8, 24, 3)
        ii, jj, kk = np.meshgrid(*[np.arange(s, dtype=np.float32)
                                   for s in SHAPE], indexing="ij")
        r2 = (ii - c[0]) ** 2 + (jj - c[1]) ** 2 + (kk - c[2]) ** 2
        vol += rs.uniform(0.5, 1.5) * np.exp(-r2 / rs.uniform(8, 30))
    return vol


def _true_params(angle_deg: float, t: np.ndarray) -> np.ndarray:
    """(12,) delta-from-identity affine: small z-rotation + translation, in
    the registration module's parameterization (A = I + params[:9])."""
    a = np.deg2rad(angle_deg)
    rot = np.array([[np.cos(a), -np.sin(a), 0],
                    [np.sin(a), np.cos(a), 0],
                    [0, 0, 1]], np.float32)
    p = np.zeros(12, np.float32)
    p[:9] = (rot - np.eye(3)).ravel()
    p[9:12] = t
    return p


def _mean_displacement(p_est: np.ndarray, p_true: np.ndarray) -> float:
    """Mean |T_est(x) - T_true(x)| over the central half of the grid (edges
    are dominated by the resampler's constant padding, not the transform)."""
    c = np.array([(s - 1) / 2.0 for s in SHAPE], np.float32)
    axes = [np.arange(s // 4, 3 * s // 4, dtype=np.float32) for s in SHAPE]
    pts = np.stack([g.ravel() for g in np.meshgrid(*axes, indexing="ij")])
    d_a = (p_est[:9] - p_true[:9]).reshape(3, 3)
    d_t = (p_est[9:12] - p_true[9:12])[:, None]
    disp = d_a @ (pts - c[:, None]) + d_t
    return float(np.mean(np.linalg.norm(disp, axis=0)))


def test_known_transform_recovery():
    """Apply a known small affine (3 deg rotation + ~2-voxel translation),
    register, and require sub-voxel mean recovery error (the VERDICT's
    <1 voxel contract; typically recovers to ~0.1-0.3 voxels)."""
    moving = _blob_volume()
    p_true = _true_params(3.0, np.array([2.0, -1.5, 1.0], np.float32))
    # fixed(x) = moving(T_true(x)) — so the registration's estimate of
    # "fixed-voxel -> moving-voxel" should converge to p_true
    fixed = apply_transform(moving, p_true, SHAPE)

    p_est = register_affine(fixed, moving, iters_per_level=100)
    err = _mean_displacement(p_est, p_true)
    assert err < 1.0, f"mean displacement error {err:.3f} voxels"

    # and the resampled moving image must actually line up with fixed
    realigned = apply_transform(moving, p_est, SHAPE)
    sl = tuple(slice(s // 4, 3 * s // 4) for s in SHAPE)
    r = np.corrcoef(realigned[sl].ravel(), fixed[sl].ravel())[0, 1]
    assert r > 0.98, f"post-registration correlation {r:.4f}"


def test_pure_translation_recovery_intensity_mode():
    """Translation-only recovery with raw intensities (no Sobel features)
    also converges — guards the use_gradient_features=False path."""
    moving = _blob_volume(seed=3)
    p_true = _true_params(0.0, np.array([-2.0, 1.0, 2.5], np.float32))
    fixed = apply_transform(moving, p_true, SHAPE)
    p_est = register_affine(fixed, moving, iters_per_level=100,
                            use_gradient_features=False)
    err = _mean_displacement(p_est, p_true)
    assert err < 1.0, f"mean displacement error {err:.3f} voxels"


def test_center_of_mass_init_translation():
    """The CenteredTransformInitializer equivalent: a shift of a compact
    mass shows up as the translation component of the init (fixed-voxel ->
    moving-voxel convention: fixed(x) = moving(x + t))."""
    ii, jj, kk = np.meshgrid(*[np.arange(s, dtype=np.float32)
                               for s in SHAPE], indexing="ij")

    def blob(c):
        r2 = (ii - c[0]) ** 2 + (jj - c[1]) ** 2 + (kk - c[2]) ** 2
        return np.exp(-r2 / 12.0).astype(np.float32)

    moving = blob((16, 16, 16))
    fixed = blob((19, 16, 14))  # = moving shifted by t = (-3, 0, +2)
    p = center_of_mass_init(fixed, moving)
    np.testing.assert_allclose(p[9:12], [-3.0, 0.0, 2.0], atol=0.25)
