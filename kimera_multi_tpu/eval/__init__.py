from . import ape, lc_forensics  # noqa: F401
