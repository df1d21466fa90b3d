from . import config, dataset, logs, native, sim_world, synthetic  # noqa: F401
