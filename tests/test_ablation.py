"""Ablation arms: state-variant composition and CP-weight toggles.

The reference's ablation arms are commented-out code toggles
(`environment_stage_1_nobonus.py:1032-1033` no-CP state, `:838-842` CP
weights, `:968-988` grp block) whose results live in
`results/td3/{ablation_study,revamped}/`; here they are explicit config
(`crowdnav_tpu.envs.config.ABLATION_PRESETS`).
"""
import jax
import jax.numpy as jnp
import pytest

from crowdnav_tpu.envs import CrowdEnv, make_config
from crowdnav_tpu.envs.config import ABLATION_PRESETS


def _rollout(cfg, n_steps=6, lin=0.22, ang=0.3):
    env = CrowdEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    action = jnp.array([lin, ang], jnp.float32)
    step = jax.jit(env.step)
    for _ in range(n_steps):
        state, obs, _, _ = step(state, action)
    return env, state, obs


@pytest.mark.parametrize("arm,expected_extra", [
    ("basic", 4),            # scans + [htg, dtg, x, y]
    ("basic_grp", 5),        # + goal-reaching probability
    ("basic_grp_cp", 7 + 4 * 8),
    ("basic_grp_cp_gcp", 7 + 4 * 8),
    ("no_cp", 7 + 4 * 8),
    ("no_cpdto", 7 + 4 * 8),
])
def test_state_dims(arm, expected_extra):
    cfg = make_config("crowd_dense", ablation=arm, max_steps=32)
    assert cfg.state_dim_risk == cfg.n_scans + expected_extra
    env, state, obs = _rollout(cfg, n_steps=2)
    assert obs.shape == (cfg.state_dim_risk,)
    assert env.obs_dim == cfg.state_dim_risk


def test_no_cp_block_is_robot_pose_padding():
    """The "no CP" toggle (:1032-1033): top-K slots are [x, y, 0, 0] * K even
    with obstacles tracked."""
    cfg = make_config("crowd_dense", ablation="no_cp", max_steps=64)
    env, state, obs = _rollout(cfg)
    K = cfg.k_obstacles
    block = obs[-4 * K:].reshape(K, 4)
    pos = jnp.round(state.pos, 3)
    assert jnp.allclose(block[:, :2], pos[None, :], atol=1e-6)
    assert jnp.all(block[:, 2:] == 0.0)


def test_full_block_differs_from_no_cp_once_tracking():
    """Sanity: the full arm actually puts tracked obstacles in the state."""
    full = make_config("crowd_dense", max_steps=64)
    _, state, obs = _rollout(full)
    if bool(jnp.any(state.tracks.valid)):
        K = full.k_obstacles
        block = obs[-4 * K:].reshape(K, 4)
        pos = jnp.round(state.pos, 3)
        assert not jnp.allclose(block[:, :2], pos[None, :], atol=1e-6)


def test_cp_weight_arms():
    assert ABLATION_PRESETS["no_cpdto"]["cp_ttc_weight"] == 1.0
    assert ABLATION_PRESETS["no_cpdto"]["cp_dist_weight"] == 0.0
    cfg = make_config("crowd_dense", ablation="basic_grp_cp")
    assert cfg.cp_dist_weight == 0.0
    cfg_main = make_config("crowd_dense", ablation="basic_grp_cp_gcp")
    assert cfg_main.cp_ttc_weight == 0.5 and cfg_main.cp_dist_weight == 0.5


def test_grp_bounded_and_zero_at_reset():
    """grp (:968-988): 0 on the reset path (CP block skipped), <= 1 after
    (min(1, 0.15/ttg); may be negative when moving away, as the reference
    lets negative TTC through)."""
    cfg = make_config("crowd_dense", ablation="basic_grp", max_steps=64)
    env = CrowdEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert float(obs[-1]) == 0.0
    action = jnp.array([0.22, 0.0], jnp.float32)
    step = jax.jit(env.step)
    for _ in range(5):
        state, obs, _, _ = step(state, action)
    assert float(obs[-1]) <= 1.0


def test_ablation_trains_one_chunk():
    """End-to-end: TD3 over the basic_grp arm steps + learns under jit."""
    from crowdnav_tpu.agents import TD3, TD3Config
    from crowdnav_tpu.parallel import Trainer, TrainerConfig

    cfg = make_config("crowd_sparse", ablation="basic_grp", max_steps=16)
    env = CrowdEnv(cfg)
    agent = TD3(TD3Config(hidden=32, batch_size=8, buffer_size=512),
                env.obs_dim)
    trainer = Trainer(env, agent, TrainerConfig(
        n_envs=4, rollout_chunk=8, learn_start=8))
    state = trainer.init(jax.random.PRNGKey(0))
    state = trainer.make_jitted()(state)
    assert int(state.replay.size) > 0
    assert jnp.all(jnp.isfinite(state.obs))
