"""Binary keypoint descriptors (the ORB role in the LCD data path).

The reference extracts ORB descriptors at keyframes and matches them with
BruteForce-Hamming knn (images/kimera-multi.drawio:2583; docker patch
docker/copy/kimera_multi_lcd.patch:26-38). This module produces the same
artifact shape — (N, 32) packed uint8, 256 bits — TPU-natively: a
BRIEF-style smoothed-intensity pair test with a fixed, seed-derived
sampling pattern, computed for all keypoints in one vmapped gather batch
and packed into bytes with a bit-weight matmul (no per-point host loop).

Deviation, by design: no rotation steering (ORB's moment-based
orientation). The LCD matching tier only needs descriptor *consistency*
between revisits of similar viewpoint — the acceptance tests assert
revisit matching + RANSAC verification works end-to-end.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


_N_BITS = 256
_PATCH = 24  # sampling diameter in pixels


def _pattern(seed: int = 7):
    """Fixed BRIEF pattern: 256 Gaussian-distributed point pairs."""
    npr = np.random.default_rng(seed)
    sigma = _PATCH / 5.0
    a = np.clip(npr.normal(0, sigma, (_N_BITS, 2)), -_PATCH / 2, _PATCH / 2)
    b = np.clip(npr.normal(0, sigma, (_N_BITS, 2)), -_PATCH / 2, _PATCH / 2)
    return a.astype(np.float32), b.astype(np.float32)


_PAT_A, _PAT_B = _pattern()
_BIT_W = (1 << np.arange(8)).astype(np.int32)  # LSB-first byte packing


def describe(img: jnp.ndarray, pts: jnp.ndarray, valid: jnp.ndarray
             ) -> jnp.ndarray:
    """(H, W) image + (N, 2) keypoints (x, y) -> (N, 32) packed uint8.

    Invalid slots produce zero descriptors. The image is box-smoothed
    (5x5) first, as BRIEF prescribes."""
    k = jnp.ones((5, 5), jnp.float32) / 25.0
    sm = jax.lax.conv_general_dilated(
        img[None, None], k[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    pa = jnp.asarray(_PAT_A)
    pb = jnp.asarray(_PAT_B)

    def one(pt, ok):
        xa = pt[0] + pa[:, 0]
        ya = pt[1] + pa[:, 1]
        xb = pt[0] + pb[:, 0]
        yb = pt[1] + pb[:, 1]
        ia = map_coordinates(sm, [ya, xa], order=1, mode="nearest")
        ib = map_coordinates(sm, [yb, xb], order=1, mode="nearest")
        bits = (ia < ib).astype(jnp.int32).reshape(32, 8)
        bytes_ = jnp.sum(bits * jnp.asarray(_BIT_W)[None], axis=1)
        return jnp.where(ok, bytes_, 0).astype(jnp.uint8)

    return jax.vmap(one)(pts, valid)
