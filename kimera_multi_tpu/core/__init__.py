from . import containers, lie, rng, stiefel  # noqa: F401
