from . import marching, mesh_io, tsdf  # noqa: F401
