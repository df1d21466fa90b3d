from . import mesh_io, tsdf  # noqa: F401
