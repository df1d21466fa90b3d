from . import checkpoint, fault, mesh, rounds  # noqa: F401
