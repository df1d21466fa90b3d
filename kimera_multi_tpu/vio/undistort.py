"""Camera undistortion / rectification.

Role of `image_undistort` (SURVEY.md section 2.1): radtan (plumb-bob)
model per params/D455/LeftCameraParams.yaml (`distortion_model: radtan`).
The remap grid is precomputed once (fixed-point undistortion iteration,
vmapped over pixels); application is one bilinear gather per frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


class CameraModel(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0


def distort_normalized(x: jnp.ndarray, y: jnp.ndarray, cam: CameraModel):
    """Apply radtan distortion to normalized coordinates."""
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
    xd = x * radial + 2 * cam.p1 * x * y + cam.p2 * (r2 + 2 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2 * y * y) + 2 * cam.p2 * x * y
    return xd, yd


def undistort_map(cam: CameraModel, H: int, W: int, iters: int = 8):
    """Remap grid: for each RECTIFIED pixel, the distorted source pixel.

    Inverts the distortion with fixed-point iteration (standard approach;
    fixed iteration count, branchless)."""
    us = (jnp.arange(W, dtype=jnp.float32) - cam.cx) / cam.fx
    vs = (jnp.arange(H, dtype=jnp.float32) - cam.cy) / cam.fy
    x, y = jnp.meshgrid(us, vs)  # target (undistorted) normalized coords

    def body(_, xy):
        xc, yc = xy
        xd, yd = distort_normalized(xc, yc, cam)
        return xc - (xd - x), yc - (yd - y)

    xc, yc = jax.lax.fori_loop(0, iters, body, (x, y))
    xd, yd = distort_normalized(xc, yc, cam)
    map_u = xd * cam.fx + cam.cx
    map_v = yd * cam.fy + cam.cy
    return map_u, map_v


@jax.jit
def remap(img: jnp.ndarray, map_u: jnp.ndarray, map_v: jnp.ndarray):
    """Bilinear remap of (H, W) image through the precomputed grid."""
    return map_coordinates(img, [map_v, map_u], order=1, mode="constant",
                           cval=0.0)


def undistort_points(pts: jnp.ndarray, cam: CameraModel, iters: int = 8):
    """Undistort pixel points (N, 2) -> rectified pixels (N, 2)."""
    x = (pts[:, 0] - cam.cx) / cam.fx
    y = (pts[:, 1] - cam.cy) / cam.fy

    def body(_, xy):
        xc, yc = xy
        xd, yd = distort_normalized(xc, yc, cam)
        return xc - (xd - x), yc - (yd - y)

    xu, yu = jax.lax.fori_loop(0, iters, body, (x, y))
    return jnp.stack([xu * cam.fx + cam.cx, yu * cam.fy + cam.cy], -1)
