"""Checkpoint / resume for distributed rounds.

The reference has no true checkpointing — it dumps trajectories every 10 s
and restarts dpgo from scratch per instance (SURVEY.md section 5
"Checkpoint/resume"). Here the full round state — lifted poses Y, GNC
(mu, weights), active mask, round index — is saved so a run resumes
mid-optimization (resume = reload + continue RBCD).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..core.containers import GncState
from .rounds import RoundState


def save(path: str, state: RoundState) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        Y=np.asarray(state.Y),
        active=np.asarray(state.active),
        mu=np.asarray(state.gnc_state.mu),
        weights=np.asarray(state.gnc_state.weights),
        barc2=np.asarray(state.gnc_state.barc2),
        outer_iter=np.asarray(state.gnc_state.outer_iter),
        round_idx=np.asarray(state.round_idx),
    )


def load(path: str, mesh=None) -> RoundState:
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    Y = jnp.asarray(z["Y"])
    active = jnp.asarray(z["active"])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .mesh import ROBOT_AXIS

        import jax

        Y = jax.device_put(Y, NamedSharding(mesh, P(ROBOT_AXIS)))
        active = jax.device_put(active, NamedSharding(mesh, P(ROBOT_AXIS)))
    return RoundState(
        Y=Y,
        active=active,
        gnc_state=GncState(
            mu=jnp.asarray(z["mu"]),
            weights=jnp.asarray(z["weights"]),
            barc2=jnp.asarray(z["barc2"]),
            outer_iter=jnp.asarray(z["outer_iter"]),
        ),
        round_idx=jnp.asarray(z["round_idx"]),
    )
