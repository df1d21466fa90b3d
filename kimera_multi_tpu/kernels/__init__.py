from . import bow, hamming, linalg, minimal, ransac  # noqa: F401
