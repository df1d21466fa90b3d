from . import bow_db, lcd, submap, vocab  # noqa: F401
