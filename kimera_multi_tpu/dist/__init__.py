from . import chain, checkpoint, fault, mesh, rounds, sharded_verify  # noqa: F401
