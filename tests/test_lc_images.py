"""Loop-closure image evidence (extract_lc_images.py equivalent)."""

import json
import struct
import zlib

import numpy as np

from kimera_multi_tpu.eval import lc_forensics
from kimera_multi_tpu.io import png


def _decode_png(path):
    raw = open(path, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w = 8, None
    idat = b""
    while pos < len(raw):
        (n,) = struct.unpack(">I", raw[pos:pos + 4])
        tag = raw[pos + 4:pos + 8]
        data = raw[pos + 8:pos + 8 + n]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", data[:10])
            assert depth == 8 and ctype == 2
        elif tag == b"IDAT":
            idat += data
        pos += 12 + n
    rows = zlib.decompress(idat)
    stride = 1 + w * 3
    img = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        row = rows[y * stride:(y + 1) * stride]
        assert row[0] == 0  # filter type none
        img[y] = np.frombuffer(row[1:], np.uint8).reshape(w, 3)
    return img


def test_png_roundtrip(tmp_path):
    img = (np.arange(24 * 30) % 256).astype(np.uint8).reshape(24, 30)
    p = tmp_path / "x.png"
    png.write_png(str(p), img)
    got = _decode_png(str(p))
    np.testing.assert_array_equal(got[..., 0], img)
    np.testing.assert_array_equal(got[..., 1], img)


def test_extract_lc_images_writes_annotated_pairs(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 1, (2, 6, 32, 40)).astype(np.float32)
    rows = [
        dict(robot1=0, pose1=1, robot2=1, pose2=3, gt_distance=42.5,
             mono_inliers=17, stereo_inliers=9),
        dict(robot1=0, pose1=2, robot2=1, pose2=4, gt_distance=3.0,
             mono_inliers=30, stereo_inliers=20),  # below threshold
        dict(robot1=1, pose1=0, robot2=0, pose2=5, gt_distance=61.0,
             mono_inliers=11, stereo_inliers=6),
    ]
    out = tmp_path / "lc_images"
    written = lc_forensics.extract_lc_images(
        rows, lambda r, f: frames[r, f], str(out), threshold=30.0)
    assert len(written) == 2  # only the suspicious (> 30 m) loops
    img = _decode_png(written[0])
    # side-by-side pair + caption strip: wider than one frame, taller too
    assert img.shape[1] >= 2 * 40 + 4
    assert img.shape[0] > 32
    # the caption strip has lit pixels (text rendered)
    assert img[:11].sum() > 0
    manifest = json.loads((out / "lc_images.json").read_text())
    assert len(manifest) == 2
    assert manifest[0]["gt_distance"] == 42.5
    assert manifest[0]["image"] in written[0]
