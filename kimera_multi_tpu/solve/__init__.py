from . import chordal, gnc, pgo, robust  # noqa: F401
