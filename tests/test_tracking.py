"""GFTT detection + KLT tracking on synthetic imagery."""

import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.vio import tracking


def _texture(seed=0, H=120, W=160, n_blobs=40):
    npr = np.random.default_rng(seed)
    img = np.zeros((H, W), np.float32)
    ys, xs = np.mgrid[0:H, 0:W]
    cx = npr.uniform(10, W - 10, n_blobs)
    cy = npr.uniform(10, H - 10, n_blobs)
    amp = npr.uniform(0.5, 1.0, n_blobs)
    for i in range(n_blobs):
        img += amp[i] * np.exp(
            -(((xs - cx[i]) ** 2 + (ys - cy[i]) ** 2) / (2 * 2.5**2)))
    return img.astype(np.float32), np.stack([cx, cy], -1)


def _shift(img, dx, dy):
    """Subpixel shift via linear interp (content moves by (dx, dy))."""
    from scipy import ndimage  # available via baked scipy

    return ndimage.shift(img, (dy, dx), order=1, mode="constant").astype(
        np.float32)


def test_gftt_finds_blobs():
    img, centers = _texture()
    params = tracking.GfttParams(max_features=64, min_distance=5)
    pts, scores, valid = tracking.gftt_detect(jnp.asarray(img), params)
    pts = np.asarray(pts)[np.asarray(valid)]
    assert len(pts) >= 20
    # most detected corners are near blob structure (within 6 px of a blob)
    d = np.linalg.norm(pts[:, None, :] - centers[None], axis=-1).min(1)
    assert np.median(d) < 6.0


def test_klt_recovers_translation():
    img0, _ = _texture(seed=1)
    dx, dy = 3.3, -2.1
    img1 = _shift(img0, dx, dy)
    params = tracking.GfttParams(max_features=48, min_distance=7)
    pts, _, valid = tracking.gftt_detect(jnp.asarray(img0), params)
    kparams = tracking.KltParams(win_size=16, max_level=3, max_iter=20)
    pts1, tracked = tracking.klt_track(
        jnp.asarray(img0), jnp.asarray(img1), pts, valid, kparams)
    m = np.asarray(tracked) & np.asarray(valid)
    assert m.sum() >= 10
    flow = np.asarray(pts1)[m] - np.asarray(pts)[m]
    med = np.median(flow, axis=0)
    assert abs(med[0] - dx) < 0.3
    assert abs(med[1] - dy) < 0.3


def test_klt_rejects_featureless():
    img0 = np.zeros((96, 128), np.float32)
    img1 = np.zeros((96, 128), np.float32)
    pts = jnp.asarray([[50.0, 40.0], [80.0, 60.0]])
    pts1, tracked = tracking.klt_track(
        jnp.asarray(img0), jnp.asarray(img1), pts, jnp.ones(2, bool),
        tracking.KltParams(win_size=16, max_level=2, max_iter=5))
    assert not bool(np.asarray(tracked).any())
