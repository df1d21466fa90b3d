from . import imu, pipeline, smoother, tracking  # noqa: F401
