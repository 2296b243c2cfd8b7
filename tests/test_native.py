"""Native C++ runtime (CSV ingestion + measurement aligner) vs Python
reference semantics."""

import os
import tempfile

import numpy as np
import pytest

import isvins_tpu  # noqa: F401
from isvins_tpu import native


pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_parse_csv_ns():
    rng = np.random.default_rng(0)
    n = 500
    ts = np.sort(rng.integers(1e18, 2e18, size=n))
    data = rng.normal(size=(n, 6))
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
        for i in range(n):
            f.write(f"{ts[i]}," + ",".join(f"{v:.9f}" for v in data[i]) + "\n")
        path = f.name
    try:
        out = native.parse_csv_ns(path, 6)
        assert out is not None
        t_s, d = out
        np.testing.assert_allclose(t_s, ts / 1e9, rtol=1e-12)
        np.testing.assert_allclose(d, data, atol=1e-9)
    finally:
        os.unlink(path)


def test_aligner_matches_python_semantics():
    """The native aligner must reproduce the System._process interpolation:
    samples strictly before t_img keep their own dt; one synthetic sample is
    interpolated at exactly t_img."""
    rng = np.random.default_rng(1)
    al = native.NativeAligner()
    t = 0.0
    samples = []
    for _ in range(100):
        t += 0.005
        acc = rng.normal(size=3)
        gyr = rng.normal(size=3)
        samples.append((t, acc, gyr))
        al.push_imu(t, acc, gyr)

    t_img = 0.1037
    assert al.ready(t_img)
    dts, accs, gyrs = al.collect(t_img)
    # python reference
    cur = t_img_0 = t_img  # current_time initialized to the first image time
    # first collect: current_time = t_img at entry, so all dt of samples
    # before t_img are relative to the previous sample chain starting there —
    # replicate the C++ logic directly:
    cur = t_img
    exp = []
    last = None
    idx = 0
    for (ts, acc, gyr) in samples:
        if ts >= t_img:
            break
        dt = ts - cur
        if dt > 0:
            exp.append((dt, acc, gyr))
        cur = ts
        last = (acc, gyr)
        idx += 1
    ts2, acc2, gyr2 = samples[idx]
    dt1 = t_img - cur
    dt2 = ts2 - t_img
    w1 = dt2 / (dt1 + dt2)
    w2 = dt1 / (dt1 + dt2)
    exp.append((dt1, w1 * last[0] + w2 * acc2, w1 * last[1] + w2 * gyr2))

    assert len(dts) == len(exp)
    for k, (dt_e, a_e, g_e) in enumerate(exp):
        np.testing.assert_allclose(dts[k], dt_e, atol=1e-12)
        np.testing.assert_allclose(accs[k], a_e, atol=1e-12)
        np.testing.assert_allclose(gyrs[k], g_e, atol=1e-12)

    # second image: continues from current_time = t_img
    t_img2 = 0.2012
    dts2, accs2, gyrs2 = al.collect(t_img2)
    assert abs(dts2.sum() - (t_img2 - t_img)) < 1e-9
    assert (dts2 > 0).all()


def test_aligner_not_ready():
    al = native.NativeAligner()
    al.push_imu(0.01, np.zeros(3), np.zeros(3))
    assert not al.ready(0.05)
    assert al.collect(0.05) is None
