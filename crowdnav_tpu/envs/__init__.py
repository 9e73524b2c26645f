"""Batched environment engine: world model, crowd dynamics, MDP layers."""

from crowdnav_tpu.envs.config import (  # noqa: F401
    CrowdBehavior,
    EnvConfig,
    ROBOT_PRESETS,
    WORLD_PRESETS,
    make_config,
)
from crowdnav_tpu.envs.world import EnvState, init_state, world_step  # noqa: F401
from crowdnav_tpu.envs.crowd_env import CrowdEnv  # noqa: F401
from crowdnav_tpu.envs.simple_env import SimpleEnv  # noqa: F401
