"""Frontend kernels: camera model roundtrip, pyramidal LK on synthetic
shifts, Shi-Tomasi detection, CLAHE sanity, and tracker-follows-rendered-
world integration."""

import numpy as np
import jax
import jax.numpy as jnp

import isvins_tpu  # noqa: F401
from isvins_tpu.config import euroc_config
from isvins_tpu.frontend import FeatureTracker, PinholeRadtan
from isvins_tpu.frontend.image_ops import clahe, nms_topk, shi_tomasi_response
from isvins_tpu.frontend.lk import pyramidal_lk


def test_camera_roundtrip(rng):
    cam = PinholeRadtan.from_config(euroc_config().camera)
    pts3 = rng.normal(size=(200, 3)) * np.array([1.0, 1.0, 0.2]) + np.array([0, 0, 4.0])
    uv = cam.space_to_plane(jnp.asarray(pts3))
    un = cam.lift_projective(uv)
    expected = pts3 / pts3[:, 2:3]
    np.testing.assert_allclose(np.asarray(un), expected, atol=1e-6)


def _texture(H, W, seed=0):
    rng = np.random.default_rng(seed)
    # smooth random texture: low-frequency sum of sinusoids + noise blur
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.zeros((H, W))
    for _ in range(24):
        fx, fy = rng.uniform(0.01, 0.15, 2)
        ph = rng.uniform(0, 2 * np.pi)
        img += rng.uniform(5, 25) * np.sin(fx * x + fy * y + ph)
    return img - img.min()


def test_lk_recovers_shift(rng):
    H, W = 120, 160
    img0 = _texture(H, W, 1)
    shift = np.array([3.3, -2.4])
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    from scipy.ndimage import map_coordinates

    img1 = map_coordinates(img0, [y + shift[1], x - 0.0 + 0.0], order=1)
    img1 = map_coordinates(img0, [y - shift[1], x - shift[0]], order=1)
    pts = rng.uniform([20, 20], [W - 20, H - 20], size=(30, 2))
    p1, ok, err = pyramidal_lk(
        jnp.asarray(img0, jnp.float32), jnp.asarray(img1, jnp.float32),
        jnp.asarray(pts, jnp.float32), jnp.ones(30, bool),
    )
    flow = np.asarray(p1) - pts
    ok = np.asarray(ok)
    assert ok.sum() > 20
    np.testing.assert_allclose(flow[ok], np.tile(shift, (int(ok.sum()), 1)), atol=0.2)


def test_shi_tomasi_finds_corners():
    H, W = 96, 128
    img = np.zeros((H, W))
    centers = [(30, 40), (70, 90), (50, 20)]
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    for (cy, cx) in centers:
        img += 120.0 * np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * 2.5**2))
    resp = shi_tomasi_response(jnp.asarray(img, jnp.float32))
    pts, vals, ok = nms_topk(resp, 3, 8)
    pts = np.asarray(pts)
    for (cy, cx) in centers:
        d = np.sqrt((pts[:, 0] - cx) ** 2 + (pts[:, 1] - cy) ** 2)
        assert d.min() < 4.0, (pts, (cx, cy))


def test_clahe_sane():
    rng = np.random.default_rng(0)
    img = (rng.uniform(100, 140, size=(96, 128))).astype(np.float32)  # low contrast
    out = np.asarray(clahe(jnp.asarray(img)))
    assert np.isfinite(out).all()
    assert out.std() > img.std() * 1.2  # contrast stretched


def test_tracker_follows_rendered_world():
    """Render blob images of a moving camera over fixed world points; the
    tracker must maintain IDs and follow projections within ~0.5 px."""
    from isvins_tpu.utils.synthetic import make_world, project
    from isvins_tpu.config import TrackerConfig, CameraConfig

    H, W = 240, 320
    cam_cfg = CameraConfig(width=W, height=H, fx=200.0, fy=200.0, cx=W / 2, cy=H / 2,
                           k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    trk_cfg = TrackerConfig(max_cnt=60, min_dist=16, lk_levels=3, lk_win=21,
                            equalize=False, border=4)
    world = make_world(n_frames=8, frame_hz=25.0, n_landmarks=400, seed=3)
    tic = np.zeros(3)
    R_bc = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    from isvins_tpu.geom import mat_to_quat
    qic = np.asarray(mat_to_quat(jnp.asarray(R_bc)))

    K = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]])
    base = _texture(H, W, 9) * 0.04

    def render(k):
        pts, depth, vis = project(world, k, tic, qic)
        px = (K @ pts.T).T[:, :2]
        inb = vis & (px[:, 0] > 5) & (px[:, 0] < W - 5) & (px[:, 1] > 5) & (px[:, 1] < H - 5)
        img = base.copy()
        y, x = np.mgrid[0:H, 0:W].astype(np.float64)
        for p in px[inb]:
            d2 = (x - p[0]) ** 2 + (y - p[1]) ** 2
            img += 120.0 * np.exp(-d2 / (2 * 3.0**2))
        return np.clip(img, 0, 255), px, inb

    tracker = FeatureTracker(cam_cfg, trk_cfg)
    id_hits = 0
    total = 0
    prev_out = None
    for k in range(6):
        img, px, inb = render(k)
        out = tracker.read_image(img, k * 0.04)
        if k >= 2:
            # tracked features should sit near some true projected point
            d = np.sqrt(
                ((out["pts_px"][:, None, :] - px[None, inb, :]) ** 2).sum(-1)
            ).min(axis=1)
            tracked = out["track_cnt"] >= 2
            assert tracked.sum() > 15, tracked.sum()
            frac_near = (d[tracked] < 1.5).mean()
            assert frac_near > 0.7, (k, frac_near)
            if prev_out is not None:
                common = np.intersect1d(out["ids"], prev_out["ids"])
                id_hits += len(common)
                total += len(out["ids"])
        prev_out = out
    assert id_hits > 0.6 * total  # persistent identities


def test_epipolar_inliers_fused():
    """SVD-free device-side epipolar classification (the tracker's fused
    RANSAC, initial/five_point.epipolar_inliers): on a synthetic two-view
    geometry with 25% gross outliers it must keep the true correspondences
    and reject the contaminated ones."""
    import numpy as np
    import jax.numpy as jnp
    from isvins_tpu.initial.five_point import epipolar_inliers
    from isvins_tpu.geom import hostmath as hm

    rng = np.random.default_rng(5)
    n = 120
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(4, 9, n)], axis=1)
    phi = np.array([0.03, -0.12, 0.05])
    Rq = hm.so3_exp_quat_np(phi)
    R = hm.quat_to_mat_np(Rq)
    t = np.array([0.3, -0.05, 0.1])
    p1 = X[:, :2] / X[:, 2:3]
    Xc2 = X @ R.T + t
    p2 = Xc2[:, :2] / Xc2[:, 2:3]
    is_out = rng.random(n) < 0.25
    p2 = p2 + is_out[:, None] * rng.normal(scale=0.05, size=(n, 2))
    valid = np.ones(n, bool)
    samples = np.stack([rng.choice(n, size=8, replace=False)
                        for _ in range(128)]).astype(np.int32)
    thresh = 2.0 / 460.0
    inl, n_inl = epipolar_inliers(
        jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32),
        jnp.asarray(valid), jnp.asarray(samples), thresh * thresh)
    inl = np.asarray(inl)
    kept_true = inl[~is_out].mean()
    rejected_out = 1.0 - inl[is_out].mean()
    assert kept_true > 0.9, kept_true
    assert rejected_out > 0.85, rejected_out
