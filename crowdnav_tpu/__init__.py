"""crowdnav_tpu — TPU-native DRL mapless crowd navigation with perceived risk.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
``ailabspace/drl-based-mapless-crowd-navigation-with-perceived-risk``:
the ROS/Gazebo TurtleBot3 stack (lidar robot in a walled room among moving
cylindrical pedestrians, perceived-risk state augmentation, TD3/DDPG/SAC/
DQN/Q-Learning/SARSA agents) becomes a single pure-functional program:
thousands of environments stepped in lockstep on TPU, feeding on-device
actor-learners, sharded over a device mesh.

Layering (bottom-up), mirroring SURVEY.md §1-§2:

- ``ops``       geometry / lidar raycast / perceived-risk kernels
- ``envs``      world model, batched env engine (perceived-risk + simple)
- ``models``    flax network definitions (actors, critics, Q-MLPs)
- ``agents``    TD3, DDPG, SAC, DQN, tabular Q/SARSA + HBM replay
- ``parallel``  mesh construction, shard_map train-step, collectives
- ``utils``     config tree, CSV episode logs, checkpointing
- ``parity``    NumPy reference-faithful single-env port (test oracle)
"""

__version__ = "0.1.0"
