from . import ape  # noqa: F401
