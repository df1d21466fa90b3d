from . import chordal, deformation, gnc, pcm, pgo, rbcd, robust  # noqa: F401
