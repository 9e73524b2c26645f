"""Evaluation driver: the reference's test procedure as a batched run.

Replaces the flag-flipped test mode (`start_td3_training.py:41-43`
``continue_execution=True, learning=False`` against
`turtlebot3_obstacle_{4,8,12,20}.world` + `simulate_*_20.py` crowd patterns,
README.md:56-89): loads a checkpoint, rolls N greedy episodes per scenario,
reports success rate, mean reward/steps, ego/social safety (the CSV metrics
of `utils.py:56-57`). ``min_scan_range`` is 0 in the test worlds so
collisions don't truncate episodes (README.md:66-68).

    python -m crowdnav_tpu.drivers.evaluate --algo td3 \
        --checkpoint results/ckpt_td3 --suite 20
"""
from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crowdnav_jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from crowdnav_tpu.drivers.train import RISK_ENV_ALGOS, _build_agent
from crowdnav_tpu.envs import CrowdEnv, SimpleEnv, make_config
from crowdnav_tpu.parallel import Trainer, TrainerConfig
from crowdnav_tpu.utils import EpisodeLogger, restore_checkpoint

# the paper's 20-pedestrian evaluation scenarios (README.md:82-89)
SUITES = {
    "4": [("test_4", b) for b in ("crossing", "towards", "ahead", "random")],
    "8": [("test_8", b) for b in ("crossing", "towards", "ahead", "random")],
    "12": [("test_12", b)
           for b in ("crossing", "towards", "ahead", "random")],
    "20": [("test_20", b)
           for b in ("crossing_20", "towards_20", "ahead_20", "random_20")],
    # greedy evaluation in the TRAINING world (collisions terminate) — the
    # in-distribution success check used to validate a training run
    "train": [("crowd_dense", "crowd")],
    "train_sparse": [("crowd_sparse", "crowd")],
    # harder-than-published regimes where the perceived-risk features should
    # bind hardest (VERDICT r4 item 1): ±0.5 m/s crowds in the 3x3 training
    # room, 20 pedestrians in the 3x3 room (no reference counterpart), and
    # the 20-ped test patterns at 5x the published 0.04 m/s speed. The first
    # three run with collisions terminating (training-world min_scan_range);
    # the test_20 rows keep the eval-protocol min_scan_range=0.
    "hard": [("crowd_dense", "crowd_highspeed"), ("crowd_20", "crowd"),
             ("crowd_20", "crowd_highspeed"), ("test_20", "crossing_fast"),
             ("test_20", "towards_fast"), ("test_20", "random_fast")],
}


def evaluate_scenario(algo: str, agent_state, world: str, behavior: str,
                      n_envs: int, max_steps: int, seed: int,
                      jitter: float = 0.0, ablation: str | None = None,
                      robot: str | None = None,
                      agent_cfg: dict | None = None):
    """One scenario, N envs. With ``jitter`` > 0 every env (and every
    auto-reset, via the reset bank) starts from a distinct randomized spawn
    — the batched stand-in for the episode-to-episode physics variation of
    the reference's Gazebo test worlds; without it, fixed-pattern behaviors
    make all N envs bit-identical and the success rate degenerates to
    {0, 1}.

    Episode accounting: one ``max_steps`` chunk is rolled and only episodes
    that COMPLETE inside it are counted (an env's in-flight 2nd+ episode at
    chunk end is dropped, never truncated-as-failure). Auto-reset episodes
    after the first re-draw their spawn from the jittered reset bank, so
    with ``jitter`` > 0 the 2nd+ episodes sample the same spawn distribution
    as episode 1 up to bank discretization (``reset_bank = n_envs``
    distinct spawns)."""
    cfg = make_config(world, behavior, max_steps=max_steps, jitter=jitter,
                      ablation=ablation, robot=robot)
    env_cls = CrowdEnv if algo in RISK_ENV_ALGOS else SimpleEnv
    env = env_cls(cfg)
    if agent_cfg is not None:
        from crowdnav_tpu.drivers.train import build_agent_from_metadata
        agent, discrete = build_agent_from_metadata(algo, agent_cfg,
                                                    env.obs_dim, n_envs)
    else:
        agent, discrete = _build_agent(algo, env.obs_dim, n_envs)
    tcfg = TrainerConfig(n_envs=n_envs, rollout_chunk=max_steps,
                         learning=False,
                         reset_bank=n_envs if jitter else 0)
    trainer = Trainer(env, agent, tcfg, discrete=discrete)
    state = trainer.init(jax.random.PRNGKey(seed))
    if agent_state is not None:
        state = state.replace(agent_state=agent_state)
    run = trainer.make_jitted()
    t0 = time.time()
    state = run(state)     # one chunk = max_steps -> every env finishes >=1 ep
    jax.block_until_ready(state.obs)
    summary, state = trainer.drain_stats(state)
    summary["timelapse"] = round(time.time() - t0, 2)
    summary["scenario"] = f"{world}/{behavior}"
    return summary, state.agent_state


def trace_scenario(algo: str, agent_state, world: str, behavior: str,
                   max_steps: int, seed: int, outdir: str,
                   agent_cfg: dict | None = None):
    """Single-env greedy rollout with full state capture: writes the
    reference's per-step trajectory CSV (`environment_stage_1_original.py:
    284-286`) and a path plot + final-frame render (the RViz stand-in)."""
    from crowdnav_tpu import viz

    cfg = make_config(world, behavior, max_steps=max_steps)
    env_cls = CrowdEnv if algo in RISK_ENV_ALGOS else SimpleEnv
    env = env_cls(cfg)
    if agent_cfg is not None:
        from crowdnav_tpu.drivers.train import build_agent_from_metadata
        agent, _ = build_agent_from_metadata(algo, agent_cfg, env.obs_dim, 1)
    else:
        agent, _ = _build_agent(algo, env.obs_dim, 1)
    a_state = agent_state if agent_state is not None \
        else agent.init(jax.random.PRNGKey(seed))
    policy = lambda obs: agent.act(a_state, obs, explore=False)
    states, scans, traj, rewards, dones = jax.jit(
        lambda k: viz.trace_rollout(env, policy, k, max_steps)
    )(jax.random.PRNGKey(seed))
    tag = f"{algo}_{world}_{behavior}"
    viz.TrajectoryWriter(outdir, f"{tag}_trajectory").record_rollout(traj)
    ax = viz.render_trajectory(cfg, jax.device_get(traj),
                               title=f"{world}/{behavior}", label=algo)
    viz.save_figure(ax, f"{outdir}/{tag}_trajectory.png")
    last = jax.tree.map(lambda x: x[-1], states)
    ax = viz.render_frame(cfg, last, scans=jax.device_get(scans)[-1])
    viz.save_figure(ax, f"{outdir}/{tag}_final_frame.png")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--algo", default="td3",
                   choices=["td3", "ddpg", "sac", "dqn"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--checkpoint-step", type=int, default=None,
                   help="restore a specific step from a snapshot manager "
                        "dir (agent_snapshots_<algo>); default = latest")
    p.add_argument("--suite", default="20", choices=list(SUITES))
    p.add_argument("--ablation", default=None,
                   help="ablation arm of the checkpoint being evaluated "
                        "(state dims must match training)")
    p.add_argument("--robot", default=None,
                   help="robot kinematic variant of the checkpoint being "
                        "evaluated (envs.config.ROBOT_PRESETS; default "
                        "from checkpoint metadata, else burger)")
    p.add_argument("--n-envs", type=int, default=256)
    p.add_argument("--max-steps", type=int, default=500)
    p.add_argument("--outdir", default="results")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--jitter", type=float, default=1.0,
                   help="spawn-randomization scale so the N eval envs are N "
                        "distinct episodes (0 restores the deterministic "
                        "lockstep batch)")
    p.add_argument("--platform", default=None,
                   help="JAX platform override, e.g. 'cpu'")
    p.add_argument("--trajectory", action="store_true",
                   help="also run a single-env greedy rollout per scenario "
                        "and write trajectory CSV + path/frame renders "
                        "(the reference's trajectory audit + RViz views)")
    args = p.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    agent_state = None
    agent_cfg = None
    if args.checkpoint:
        from crowdnav_tpu.utils.checkpoint import (load_run_metadata,
                                                   restore_agent_state)
        # checkpoint metadata (run_config.json, the reference DQN's
        # params-JSON pattern) pins algo/ablation/agent hyperparameters:
        # evaluation rebuilds the exact training-time agent instead of
        # silently assuming defaults, and errors on conflicting CLI flags
        meta = load_run_metadata(args.checkpoint)
        if meta is not None:
            if meta["algo"] != args.algo:
                raise SystemExit(
                    f"--algo {args.algo} conflicts with checkpoint "
                    f"metadata (trained as {meta['algo']!r})")
            ckpt_abl = meta.get("ablation")
            if args.ablation is None:
                args.ablation = ckpt_abl
            elif args.ablation != ckpt_abl:
                raise SystemExit(
                    f"--ablation {args.ablation} conflicts with checkpoint "
                    f"metadata (trained with ablation={ckpt_abl!r})")
            ckpt_robot = meta.get("robot")
            if args.robot is None:
                args.robot = ckpt_robot
            elif ckpt_robot is not None and args.robot != ckpt_robot:
                raise SystemExit(
                    f"--robot {args.robot} conflicts with checkpoint "
                    f"metadata (trained with robot={ckpt_robot!r})")
            agent_cfg = meta["agent_config"]
        # restore ONLY the agent-state subtree against a shape template
        # (the training run's env batch / replay sizes need not match)
        world, behavior = SUITES[args.suite][0]
        cfg = make_config(world, behavior, max_steps=args.max_steps,
                          ablation=args.ablation, robot=args.robot)
        env_cls = CrowdEnv if args.algo in RISK_ENV_ALGOS else SimpleEnv
        env = env_cls(cfg)
        if meta is not None and meta.get("obs_dim") not in (
                None, env.obs_dim):
            raise SystemExit(
                f"checkpoint obs_dim {meta['obs_dim']} != eval env "
                f"obs_dim {env.obs_dim} (world/ablation mismatch)")
        if agent_cfg is not None:
            from crowdnav_tpu.drivers.train import build_agent_from_metadata
            agent, discrete = build_agent_from_metadata(
                args.algo, agent_cfg, env.obs_dim, args.n_envs)
        else:
            agent, discrete = _build_agent(args.algo, env.obs_dim,
                                           args.n_envs)
        agent_state = restore_agent_state(
            args.checkpoint, jax.jit(agent.init)(jax.random.PRNGKey(0)),
            step=args.checkpoint_step)

    logger = EpisodeLogger(args.outdir, f"{args.algo}_training_test")
    results = []
    for i, (world, behavior) in enumerate(SUITES[args.suite]):
        summary, agent_state = evaluate_scenario(
            args.algo, agent_state, world, behavior, args.n_envs,
            args.max_steps, args.seed + i, jitter=args.jitter,
            ablation=args.ablation, robot=args.robot, agent_cfg=agent_cfg)
        logger.record_summary(summary, 0, summary["timelapse"])
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in summary.items()}), flush=True)
        results.append(summary)
        if args.trajectory:
            trace_scenario(args.algo, agent_state, world, behavior,
                           args.max_steps, args.seed + i, args.outdir,
                           agent_cfg=agent_cfg)
    overall = sum(r["success_rate"] for r in results) / len(results)
    print(json.dumps({"suite": args.suite, "overall_success_rate":
                      round(overall, 4)}))
    return results


if __name__ == "__main__":
    main()
