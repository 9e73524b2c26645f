"""Device-mesh sharding for the actor-learner (pjit/GSPMD path).

The reference has no parallelism at all (SURVEY.md §2.7: one env, one
learner, ROS pub/sub between 3-5 local processes). Here the environment
batch axis is the scaling axis: env states, observations, per-env stats and
the replay ring are sharded over a 1-D ``env`` mesh; agent parameters and
optimizer state are replicated. We annotate shardings on the trainer-state
pytree and let GSPMD partition the jitted rollout — the learner's gradient
all-reduce and any replay gather/scatter become XLA collectives over ICI
(the scaling-book recipe: pick a mesh, annotate, let the compiler place
collectives).

Multi-host: the same program runs under `jax.distributed` with the env axis
spanning all hosts' devices; nothing here is host-count-specific.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crowdnav_tpu.parallel.runtime import Trainer, TrainerConfig, TrainerState


def make_mesh(n_devices: int | None = None, axis: str = "env") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _trainer_shardings(trainer_state: TrainerState, mesh: Mesh):
    """Sharding pytree: leading-axis ``env`` sharding for per-env / per-row
    arrays, replication for parameters and scalars."""
    sharded = NamedSharding(mesh, P("env"))
    replicated = NamedSharding(mesh, P())
    axis_size = mesh.shape["env"]

    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                and leaf.shape[0] % axis_size == 0 and leaf.shape[0] > 0:
            return sharded
        return replicated

    def param_spec(leaf):
        return replicated

    return TrainerState(
        env_states=jax.tree.map(spec, trainer_state.env_states),
        obs=spec(trainer_state.obs),
        agent_state=jax.tree.map(param_spec, trainer_state.agent_state),
        replay=jax.tree.map(spec, trainer_state.replay),
        stats=jax.tree.map(spec, trainer_state.stats),
        key=replicated,
    )


class ShardedTrainer(Trainer):
    """Trainer whose jitted rollout runs sharded over a device mesh."""

    def __init__(self, env, agent, tcfg: TrainerConfig, mesh: Mesh,
                 discrete: bool = False):
        super().__init__(env, agent, tcfg, discrete=discrete)
        if tcfg.n_envs % mesh.shape["env"] != 0:
            raise ValueError(
                f"n_envs={tcfg.n_envs} must divide the env mesh axis "
                f"({mesh.shape['env']})")
        self.mesh = mesh

    def init(self, key: jax.Array) -> TrainerState:
        state = super().init(key)
        shardings = _trainer_shardings(state, self.mesh)
        return jax.device_put(state, shardings)

    def make_jitted(self):
        # shardings propagate from the placed inputs; donate the big state
        return jax.jit(self.rollout_chunk, donate_argnums=(0,))
