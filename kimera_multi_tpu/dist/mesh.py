"""Device-mesh construction: robots -> sub-meshes.

The framework's analogue of the reference's process topology (6 robot
process groups under one ROS master, SURVEY.md section 2.3 row 1): the
leading mesh axis is the robot axis; each robot's block computations live
on its slice. A second axis ("shard") is reserved for intra-robot
parallelism (RANSAC hypothesis batches / Hamming tiles / pose-chain
blocks — SURVEY.md section 2.3 rows 7-8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROBOT_AXIS = "robots"
SHARD_AXIS = "shard"


def robot_mesh(n_robots: int, devices=None, intra: int | None = None) -> Mesh:
    """Build a (robots, shard) mesh. Uses the first n_robots * intra
    devices; intra defaults to the largest power that fits."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_robots:
        raise ValueError(
            f"need >= {n_robots} devices for {n_robots} robots, have "
            f"{len(devices)} — use a smaller fleet or a virtual device mesh"
        )
    if intra is None:
        intra = max(1, len(devices) // n_robots)
    use = devices[: n_robots * intra]
    arr = np.asarray(use).reshape(n_robots, intra)
    return Mesh(arr, (ROBOT_AXIS, SHARD_AXIS))


def robot_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (R, ...) arrays: robot axis split, rest replicated."""
    return NamedSharding(mesh, P(ROBOT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
