from . import bow_db, dlc, lcd, submap, tf_correction, vocab  # noqa: F401
