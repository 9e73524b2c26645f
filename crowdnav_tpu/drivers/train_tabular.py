"""Tabular Q-Learning / SARSA training driver.

Replaces `start_qlearn_training.py` / `start_sarsa_training.py`: the state
is the digitized (distance-to-goal, heading-to-goal) pair only
(`start_qlearn_training.py:73-75` — the lidar digitization is computed but
unused there), actions are the 3 discrete motions, updates are online
(no replay). Batched: N envs step in lockstep; per-step updates are applied
sequentially within the batch (a `lax.scan` over envs) to keep the exact
single-writer semantics of the reference's dict updates.

Note the reference quirk (documented, fixed here): its drivers index
``observation[-2]/[-1]`` as dtg/htg, which in the committed state layout are
the agent x/y (`environment_stage_1_original.py:315-320`); we read the true
htg/dtg at indices 359/360.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from crowdnav_tpu.agents import QLearning, Sarsa, TabularConfig
from crowdnav_tpu.agents.tabular import (discretize_state, load_table,
                                         save_table)
from crowdnav_tpu.envs import SimpleEnv, make_config
from crowdnav_tpu.utils import EpisodeLogger


def _state_index(obs):
    htg, dtg = obs[..., 359], obs[..., 360]
    return discretize_state(dtg, htg)


def make_rollout(env: SimpleEnv, algo, chunk: int, learning: bool = True,
                 bank=None):
    """Jitted chunk: carry = (env_states, obs, actions, tab, key, stats).

    ``bank`` = pre-randomized ``(states, obs)`` reset bank (leading axis B):
    auto-resets draw from it instead of the env's single deterministic
    template, so greedy evaluation counts B distinct episodes rather than
    one repeated trajectory (the Trainer's reset-bank mechanism,
    `parallel/runtime.py`)."""

    def one_step(carry, _):
        env_states, obs, actions, tab, key, stats = carry
        key, k_act, k_bank = jax.random.split(key, 3)
        was_done = env_states.done
        out = jax.vmap(env.step_discrete)(env_states, actions)
        if bank is not None:
            bank_states, bank_obs = bank
            k_idx, k_fresh = jax.random.split(k_bank)
            n = was_done.shape[0]
            idx = jax.random.randint(k_idx, (n,), 0, bank_obs.shape[0])
            fresh = jax.random.split(k_fresh, n)
            b_state = jax.tree.map(lambda a: a[idx],
                                   bank_states).replace(key=fresh)

            def sel(a, b):
                m = was_done.reshape(was_done.shape + (1,) * (a.ndim - 1))
                return jnp.where(m, a, b)

            out = out._replace(
                state=jax.tree.map(sel, b_state, out.state),
                obs=sel(bank_obs[idx], out.obs))
        s = _state_index(obs)
        s2 = _state_index(out.obs)
        k_envs = jax.random.split(k_act, s2.shape[0])
        next_actions = jax.vmap(
            lambda si, k: algo.act(tab, si, k, explore=learning))(s2, k_envs)

        if learning:
            def upd(tab, row):
                si, ai, r, s2i, a2i, live = row
                def do(tab):
                    if isinstance(algo, Sarsa):
                        return algo.update(tab, si, ai, r, s2i, a2i)
                    return algo.update(tab, si, ai, r, s2i)
                return jax.lax.cond(live, do, lambda t: t, tab), None

            rows = (s, actions, out.reward, s2, next_actions,
                    ~env_states.done)
            tab, _ = jax.lax.scan(upd, tab, rows)

        # episode accounting
        ep_r, ep_n, done_cnt, succ_cnt, rew_sum, step_sum = stats
        was_done = env_states.done
        ep_r = ep_r + jnp.where(was_done, 0.0, out.reward)
        ep_n = ep_n + jnp.where(was_done, 0, 1)
        d = out.done
        done_cnt = done_cnt + jnp.sum(d)
        succ_cnt = succ_cnt + jnp.sum(d & out.state.episode_success)
        rew_sum = rew_sum + jnp.sum(jnp.where(d, ep_r, 0.0))
        step_sum = step_sum + jnp.sum(jnp.where(d, ep_n, 0))
        stats = (jnp.where(d, 0.0, ep_r), jnp.where(d, 0, ep_n),
                 done_cnt, succ_cnt, rew_sum, step_sum)
        return (out.state, out.obs, next_actions, tab, key, stats), None

    def rollout(carry):
        carry, _ = jax.lax.scan(one_step, carry, None, length=chunk)
        return carry

    return jax.jit(rollout)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--algo", default="qlearn", choices=["qlearn", "sarsa"])
    p.add_argument("--world", default="crowd_none")
    p.add_argument("--behavior", default="static")
    p.add_argument("--n-envs", type=int, default=64)
    p.add_argument("--env-steps", type=float, default=2e5)
    p.add_argument("--chunk", type=int, default=100)
    p.add_argument("--max-steps", type=int, default=200)  # configs/qlearn.yaml
    p.add_argument("--outdir", default="results")
    p.add_argument("--load", default=None,
                   help="resume from a saved Q-table .npz (the reference "
                        "loads a pretrained pickle at qlearn.py:23)")
    p.add_argument("--no-learning", action="store_true",
                   help="greedy evaluation only (reference eval mode; the "
                        "CSV is written as <algo>_training_test.csv, the "
                        "reference's qlearn_training_dis_no_greedy_test*."
                        "csv pattern)")
    p.add_argument("--jitter", type=float, default=0.0,
                   help="reset-randomization scale so N greedy eval envs "
                        "are N distinct episodes (deterministic worlds "
                        "otherwise collapse the batch to one episode)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None,
                   help="JAX platform override, e.g. 'cpu'")
    args = p.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = make_config(args.world, args.behavior, max_steps=args.max_steps,
                      jitter=args.jitter)
    env = SimpleEnv(cfg)
    algo = (QLearning if args.algo == "qlearn" else Sarsa)(TabularConfig())
    tab = load_table(args.load) if args.load else algo.init()

    key = jax.random.PRNGKey(args.seed)
    key, k_env, k_bank = jax.random.split(key, 3)
    batched_reset = jax.jit(jax.vmap(env.reset))
    env_states, obs = batched_reset(jax.random.split(k_env, args.n_envs))
    bank = None
    if args.jitter:
        bank = batched_reset(
            jax.random.split(k_bank, max(256, args.n_envs)))
    actions = jnp.zeros(args.n_envs, jnp.int32)
    stats = (jnp.zeros(args.n_envs), jnp.zeros(args.n_envs, jnp.int32),
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
             jnp.zeros(()), jnp.zeros((), jnp.int32))
    carry = (env_states, obs, actions, tab, key, stats)

    rollout = make_rollout(env, algo, args.chunk,
                           learning=not args.no_learning, bank=bank)
    logger = EpisodeLogger(
        args.outdir,
        f"{args.algo}_training" + ("_test" if args.no_learning else ""))
    steps_per_chunk = args.n_envs * args.chunk
    n_chunks = max(1, int(args.env_steps // steps_per_chunk))
    ep_base = 0
    for chunk in range(n_chunks):
        t0 = time.time()
        carry = rollout(carry)
        jax.block_until_ready(carry[1])
        env_states, obs, actions, tab, key, stats = carry
        tab = algo.decay_epsilon(tab)
        carry = (env_states, obs, actions, tab, key, stats)
        eps, succ = int(stats[2]), int(stats[3])
        mean_r = float(stats[4]) / max(eps, 1)
        mean_s = float(stats[5]) / max(eps, 1)
        logger.record(ep_base + eps, succ, eps - succ, round(mean_r, 3),
                      round(mean_s, 2))
        ep_base += eps
        # zero the completed-episode counters
        stats = (stats[0], stats[1], jnp.zeros((), jnp.int32),
                 jnp.zeros((), jnp.int32), jnp.zeros(()),
                 jnp.zeros((), jnp.int32))
        carry = (env_states, obs, actions, tab, key, stats)
        print(json.dumps({"chunk": chunk, "episodes": eps, "successes": succ,
                          "mean_reward": round(mean_r, 2),
                          "mean_steps": round(mean_s, 1),
                          "epsilon": round(float(tab.epsilon), 4),
                          "sps": round(steps_per_chunk / (time.time() - t0),
                                       1)}), flush=True)
    save_table(f"{args.outdir}/{args.algo}_qtable", tab)
    # hyperparameter JSON next to the table (the reference DQN's pattern,
    # start_dqn_training.py:134-144)
    import dataclasses

    from crowdnav_tpu.utils import save_run_metadata
    save_run_metadata(args.outdir, {
        "algo": args.algo, "agent_config": dataclasses.asdict(algo.cfg),
        "world": args.world, "behavior": args.behavior,
        "n_envs": args.n_envs, "seed": args.seed})
    return carry


if __name__ == "__main__":
    main()
