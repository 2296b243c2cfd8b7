"""Camera-model family round-trip tests (camodocal parity:
thirdparty/camera_models PinholeCamera / CataCamera / EquidistantCamera /
ScaramuzzaCamera). Each model must satisfy, over a realistic field of view:

  lift(project(P)) collinear with P      (space -> plane -> ray)
  project(lift(uv)) == uv                (plane -> ray -> plane)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from isvins_tpu.config import CameraConfig
from isvins_tpu.frontend import (
    EquidistantCamera,
    MeiCamera,
    OcamCamera,
    PinholeRadtan,
    make_camera,
)


def _rays(n=200, max_angle_deg=45.0, seed=0):
    """Random camera-frame points within max_angle of the optical axis."""
    rng = np.random.default_rng(seed)
    ang = np.deg2rad(max_angle_deg) * np.sqrt(rng.uniform(0.05, 1.0, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    d = rng.uniform(0.5, 10.0, n)
    return np.stack(
        [np.sin(ang) * np.cos(phi), np.sin(ang) * np.sin(phi), np.cos(ang)], -1
    ) * d[:, None]


def _check_roundtrip(cam, pts3, atol_px=1e-6, atol_dir=1e-8):
    uv = np.asarray(cam.space_to_plane(jnp.asarray(pts3)))
    ray = np.asarray(cam.lift_projective(jnp.asarray(uv)))
    # collinearity on the z=1 plane
    ref = pts3[:, :2] / pts3[:, 2:3]
    assert np.allclose(ray[:, :2], ref, atol=atol_dir), (
        np.abs(ray[:, :2] - ref).max()
    )
    uv2 = np.asarray(cam.space_to_plane(jnp.asarray(ray)))
    assert np.allclose(uv2, uv, atol=atol_px), np.abs(uv2 - uv).max()


def test_pinhole_radtan_roundtrip():
    cfg = CameraConfig()  # EuRoC calib
    cam = make_camera(cfg)
    assert isinstance(cam, PinholeRadtan)
    _check_roundtrip(cam, _rays(max_angle_deg=35.0), atol_px=1e-6, atol_dir=1e-9)


def test_mei_roundtrip():
    cfg = CameraConfig(
        model="mei", xi=0.9, fx=600.0, fy=602.0, cx=370.0, cy=240.0,
        k1=-0.2, k2=0.05, p1=1e-4, p2=-2e-4,
    )
    cam = make_camera(cfg)
    assert isinstance(cam, MeiCamera)
    _check_roundtrip(cam, _rays(max_angle_deg=60.0), atol_px=1e-6, atol_dir=1e-9)
    # near-axis focal equals gamma/(1+xi)
    eps = 1e-4
    uv = np.asarray(cam.space_to_plane(jnp.asarray([[eps, 0.0, 1.0]])))
    du = uv[0, 0] - cfg.cx
    assert abs(du / eps - float(cam.focal)) / float(cam.focal) < 1e-3


def test_equidistant_roundtrip():
    # TUM-VI-like Kannala-Brandt fisheye
    cfg = CameraConfig(
        model="equidistant", fx=285.7, fy=286.0, cx=254.9, cy=256.9,
        kb=(0.00348, 0.000715, -0.00205, 0.000203),
    )
    cam = make_camera(cfg)
    assert isinstance(cam, EquidistantCamera)
    _check_roundtrip(cam, _rays(max_angle_deg=80.0), atol_px=1e-7, atol_dir=1e-9)


def test_equidistant_r_theta_matches_reference_polynomial():
    cam = EquidistantCamera.from_config(
        CameraConfig(model="equidistant", kb=(0.01, -0.002, 0.003, -0.0005))
    )
    th = np.linspace(0.0, 1.4, 50)
    r = np.asarray(cam._r(jnp.asarray(th)))
    k2, k3, k4, k5 = 0.01, -0.002, 0.003, -0.0005
    ref = th + k2 * th**3 + k3 * th**5 + k4 * th**7 + k5 * th**9
    assert np.allclose(r, ref, atol=1e-12)


def _fit_ocam():
    """Build a self-consistent OCAM calibration: forward polynomial for a
    quasi-parabolic mirror, inverse polynomial fit numerically (exactly what
    the Scaramuzza toolbox ships in its calib files)."""
    a0, a2, a3 = -160.0, 9.0e-4, 1.5e-7
    poly = (a0, 0.0, a2, a3)
    phi = np.linspace(0.0, 420.0, 500)
    z = -(a0 + a2 * phi**2 + a3 * phi**3)
    theta = np.arctan2(-z, phi)
    inv = np.polynomial.polynomial.polyfit(theta, phi, 11)
    return poly, tuple(inv)


def test_scaramuzza_roundtrip():
    poly, inv_poly = _fit_ocam()
    cfg = CameraConfig(
        model="scaramuzza", fx=160.0, cx=320.0, cy=240.0,
        ocam_poly=poly, ocam_inv_poly=inv_poly,
        ocam_cde=(1.0002, -3e-5, 4e-5),
    )
    cam = make_camera(cfg)
    assert isinstance(cam, OcamCamera)
    # inverse polynomial is a numerical fit: px tolerance is fit-limited
    _check_roundtrip(cam, _rays(max_angle_deg=70.0), atol_px=2e-3, atol_dir=5e-6)


def test_factory_rejects_unknown_and_incomplete():
    with pytest.raises(ValueError):
        make_camera(CameraConfig(model="nope"))
    with pytest.raises(ValueError):
        make_camera(CameraConfig(model="scaramuzza"))  # no polynomials


def test_tracker_runs_with_fisheye_model():
    """The frontend is camera-model agnostic: a fisheye tracker tracks a
    moving blob and produces normalized-plane outputs through the KB lift."""
    from isvins_tpu.config import TrackerConfig
    from isvins_tpu.frontend import FeatureTracker

    H, W = 96, 128
    cfg = CameraConfig(
        model="equidistant", width=W, height=H, fx=60.0, fy=60.0,
        cx=W / 2, cy=H / 2, kb=(0.004, 0.0007, -0.002, 0.0002),
    )
    tr = FeatureTracker(cfg, TrackerConfig(max_cnt=30, min_dist=8, freq=100,
                                           equalize=False, lk_levels=2,
                                           flow_back=False))
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 60, (H, W)).astype(np.float32)
    for k in range(3):
        img = np.roll(base, shift=k, axis=1)
        out = tr.read_image(img, t=0.1 * k)
    assert out["ids"].size > 0
    # normalized outputs must be finite (fisheye lift sane)
    assert np.isfinite(out["pts_norm"]).all()
