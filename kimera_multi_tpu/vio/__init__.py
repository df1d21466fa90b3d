from . import imu, pipeline, smoother, tracking, undistort  # noqa: F401
