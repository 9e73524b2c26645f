"""Pallas raycast kernel vs the XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from crowdnav_tpu.ops.lidar_pallas import scan_batch, scan_batch_pallas


def test_pallas_matches_xla_interpret():
    rng = np.random.default_rng(0)
    n, p = 16, 6
    pos = jnp.asarray(rng.uniform(-1.0, 1.0, (n, 2)), jnp.float32)
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    peds = jnp.asarray(rng.uniform(-1.3, 1.3, (n, p, 2)), jnp.float32)
    ref = scan_batch(pos, yaw, peds, 0.0505, 1.45, 0.6, 0.08, backend="xla")
    got = scan_batch_pallas(pos, yaw, peds, 0.0505, 1.45, 0.6, 0.08,
                            interpret=True)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_pallas_no_peds():
    pos = jnp.zeros((4, 2), jnp.float32)
    yaw = jnp.zeros(4, jnp.float32)
    peds = jnp.zeros((4, 0, 2), jnp.float32)
    got = scan_batch_pallas(pos, yaw, peds, 0.0505, 2.45, 0.6, 0.08,
                            interpret=True)
    np.testing.assert_allclose(got, 0.6, atol=1e-6)


def test_pallas_unaligned_batch():
    rng = np.random.default_rng(1)
    n = 13  # not a multiple of TILE_ENV
    pos = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    yaw = jnp.zeros(n, jnp.float32)
    peds = jnp.asarray(rng.uniform(-1.3, 1.3, (n, 3, 2)), jnp.float32)
    ref = scan_batch(pos, yaw, peds, 0.0505, 1.45, 0.6, 0.08, backend="xla")
    got = scan_batch_pallas(pos, yaw, peds, 0.0505, 1.45, 0.6, 0.08,
                            interpret=True)
    assert got.shape == (13, 359)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_step_batch_pallas_matches_vmapped_step():
    """CrowdEnv.step_batch with the pallas backend (interpret on CPU) must
    reproduce the vmapped per-env step bit-for-bit at float tolerance —
    same scans, obs, rewards, dones, auto-reset behavior."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from crowdnav_tpu.envs import CrowdEnv, make_config

    cfg = make_config("crowd_dense", "crossing", max_steps=30, jitter=1.0)
    env_x = CrowdEnv(cfg)
    env_p = CrowdEnv(dataclasses.replace(cfg, lidar_backend="pallas"))
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states, obs = jax.vmap(env_x.reset)(keys)
    actions = jnp.tile(jnp.asarray([(0.2, 0.3)], jnp.float32), (8, 1))
    for _ in range(3):
        out_x = jax.jit(lambda s, a: jax.vmap(env_x.step)(s, a))(states,
                                                                 actions)
        out_p = jax.jit(env_p.step_batch)(states, actions)
        np.testing.assert_allclose(np.asarray(out_p.obs),
                                   np.asarray(out_x.obs), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out_p.reward),
                                   np.asarray(out_x.reward), atol=1e-3)
        np.testing.assert_array_equal(np.asarray(out_p.done),
                                      np.asarray(out_x.done))
        states = out_x.state
