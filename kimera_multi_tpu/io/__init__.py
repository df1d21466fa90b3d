from . import config, logs, sim_world, synthetic  # noqa: F401
