"""Pinhole camera with radial-tangential distortion, batched over points.

Replaces camodocal::PinholeCamera (thirdparty/camera_models/.../PinholeCamera.cc,
~892 LoC): `space_to_plane` (project + distort) and `lift_projective`
(undistort via fixed-point iteration — the camodocal recursive inverse,
batched over all features at once instead of per-point loops).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PinholeRadtan(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray

    @staticmethod
    def from_config(cam) -> "PinholeRadtan":
        mk = lambda v: jnp.asarray(v, jnp.float64)
        return PinholeRadtan(
            mk(cam.fx), mk(cam.fy), mk(cam.cx), mk(cam.cy),
            mk(cam.k1), mk(cam.k2), mk(cam.p1), mk(cam.p2),
        )

    def distort(self, xy):
        """Apply radtan distortion on normalized coords. xy (...,2)."""
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = self.k1 * r2 + self.k2 * r2 * r2
        dx = x * radial + 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        dy = y * radial + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return xy + jnp.stack([dx, dy], axis=-1)

    def space_to_plane(self, p3):
        """(...,3) camera-frame points -> (...,2) pixels (with distortion)."""
        z = jnp.where(jnp.abs(p3[..., 2]) > 1e-9, p3[..., 2], 1e-9)
        xy = p3[..., :2] / z[..., None]
        xyd = self.distort(xy)
        u = self.fx * xyd[..., 0] + self.cx
        v = self.fy * xyd[..., 1] + self.cy
        return jnp.stack([u, v], axis=-1)

    def lift_projective(self, uv, iters: int = 25):
        """(...,2) pixels -> (...,3) normalized bearings [x, y, 1]
        (camodocal liftProjective with the iterative distortion inverse)."""
        xd = (uv[..., 0] - self.cx) / self.fx
        yd = (uv[..., 1] - self.cy) / self.fy
        pd = jnp.stack([xd, yd], axis=-1)

        def body(_, p):
            d = self.distort(p) - p  # distortion offset at current estimate
            return pd - d

        p = jax.lax.fori_loop(0, iters, body, pd)
        return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
