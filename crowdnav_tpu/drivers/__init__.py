"""Experiment drivers (CLI): training and evaluation runs.

TPU-native replacements for the reference's 7 `start_*_training.py` /
`start_td3_real_world_test.py` scripts (SURVEY.md §2.3) and their roslaunch
wrappers: one `train` entry point covering TD3/DDPG/SAC/DQN/Q-Learning/
SARSA, and one `evaluate` entry point covering the test-world suites.
"""
