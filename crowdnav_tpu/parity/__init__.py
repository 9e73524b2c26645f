"""Reference-faithful NumPy oracle (kept out of the JAX path).

`reference_env.NumpyRiskPipeline` re-implements the sequential semantics of
`environment_stage_1_nobonus.get_state/compute_reward` the way the reference
does it — Python loops over the 359-scan ring, dict-keyed obstacle tracks,
list segmentation — with the documented intended-semantics fixes applied at
the same sites as the JAX pipeline. Fixed-seed trajectory tests
(`tests/test_parity.py`) drive both implementations with identical physics
and compare states, rewards and termination step-by-step (SURVEY.md §7.10).
"""

from crowdnav_tpu.parity.reference_env import NumpyCrowdEnv  # noqa: F401
