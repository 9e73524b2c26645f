"""On-device agents: TD3 / DDPG / SAC / DQN / tabular Q-Learning & SARSA."""

from crowdnav_tpu.agents.replay import ReplayBuffer, ReplayState, Transition  # noqa: F401
from crowdnav_tpu.agents.td3 import TD3, TD3Config  # noqa: F401
from crowdnav_tpu.agents.ddpg import DDPG, DDPGConfig  # noqa: F401
from crowdnav_tpu.agents.sac import SAC, SACConfig  # noqa: F401
from crowdnav_tpu.agents.dqn import DQN, DQNConfig  # noqa: F401
from crowdnav_tpu.agents.tabular import (  # noqa: F401
    QLearning,
    Sarsa,
    TabularConfig,
    discretize_state,
)
