"""Unified training driver.

Replaces `start_{td3,ddpg,sac,dqn,qlearn,sarsa}_training.py` (all of which
share one loop skeleton, `start_td3_training.py:104-168`): pick an
algorithm + world + crowd behavior, run chunked batched training, append
aggregate CSV rows in the reference's schema, checkpoint periodically.

Examples
--------
TD3 + perceived risk, K=8, crowd-dense (the paper's main config):

    python -m crowdnav_tpu.drivers.train --algo td3 --world crowd_dense \
        --behavior crowd --n-envs 1024 --env-steps 2000000

DQN on the simple env (discrete actions):

    python -m crowdnav_tpu.drivers.train --algo dqn --world crowd_sparse \
        --behavior random --n-envs 256 --env-steps 500000
"""
from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crowdnav_jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from crowdnav_tpu.agents import (DDPG, DDPGConfig, DQN, DQNConfig, SAC,
                                 SACConfig, TD3, TD3Config)
from crowdnav_tpu.envs import CrowdEnv, SimpleEnv, make_config
from crowdnav_tpu.envs.config import ABLATION_PRESETS, ROBOT_PRESETS
from crowdnav_tpu.parallel import (ShardedTrainer, Trainer, TrainerConfig,
                                   make_mesh)
from crowdnav_tpu.utils import (EpisodeLogger, StepThroughput,
                                restore_checkpoint, save_checkpoint,
                                trace_if)

# algo -> (agent factory, env class, discrete?)
# envs follow the reference drivers: TD3/DDPG on the perceived-risk env
# (start_td3_training.py:13), SAC/DQN/tabular on the simple env
# (start_sac_training.py:13, start_dqn_training.py:15).
def _build_agent(algo: str, obs_dim: int, n_envs: int, args=None):
    if algo == "td3":
        kw = {}
        if args is not None and getattr(args, "actor_lr", None):
            kw.update(actor_lr=args.actor_lr)
        if args is not None and getattr(args, "critic_lr", None):
            kw.update(critic_lr=args.critic_lr)
        if args is not None and getattr(args, "learner_dtype", None):
            kw.update(compute_dtype=args.learner_dtype)
        if args is not None and args.sigma_min is not None:
            kw.update(explore_sigma_min=args.sigma_min,
                      explore_decay_steps=int(args.sigma_decay_steps))
        if args is not None and getattr(args, "batch_size", None):
            kw.update(batch_size=args.batch_size)
        if args is not None and getattr(args, "explore_eps", None):
            kw.update(explore_uniform_eps=args.explore_eps)
            if getattr(args, "explore_eps_min", None) is not None:
                kw.update(explore_uniform_eps_min=args.explore_eps_min)
            if getattr(args, "explore_spectrum", False):
                kw.update(explore_eps_spectrum=True)
        return TD3(TD3Config(**kw), obs_dim), False
    if algo == "ddpg":
        kw = {}
        if args is not None and getattr(args, "actor_lr", None):
            kw.update(actor_lr=args.actor_lr)
        if args is not None and getattr(args, "batch_size", None):
            kw.update(batch_size=args.batch_size)
        if args is not None and getattr(args, "explore_eps", None):
            kw.update(explore_uniform_eps=args.explore_eps)
            if getattr(args, "explore_eps_min", None) is not None:
                kw.update(explore_uniform_eps_min=args.explore_eps_min)
            if getattr(args, "explore_spectrum", False):
                kw.update(explore_eps_spectrum=True)
        return DDPG(DDPGConfig(**kw), obs_dim, n_envs=n_envs), False
    kw = {}
    if args is not None and getattr(args, "batch_size", None):
        kw.update(batch_size=args.batch_size)
    if algo == "sac":
        return SAC(SACConfig(**kw), obs_dim), False
    if algo == "dqn":
        return DQN(DQNConfig(**kw), obs_dim), True
    raise ValueError(f"unknown algo {algo!r} (tabular algos: use "
                     "crowdnav_tpu.drivers.train_tabular)")


RISK_ENV_ALGOS = {"td3", "ddpg"}

_CONFIG_CLS = {"td3": TD3Config, "ddpg": DDPGConfig, "sac": SACConfig,
               "dqn": DQNConfig}


def build_agent_from_metadata(algo: str, cfg_dict: dict, obs_dim: int,
                              n_envs: int):
    """Rebuild the exact training-time agent from checkpoint metadata
    (`run_config.json` — the reference DQN's params-JSON pattern,
    `start_dqn_training.py:134-144`). Unknown keys are dropped so old
    metadata survives config-field evolution."""
    import dataclasses
    cls = _CONFIG_CLS[algo]
    fields = {f.name for f in dataclasses.fields(cls)}
    cfg = cls(**{k: v for k, v in cfg_dict.items() if k in fields})
    if algo == "td3":
        return TD3(cfg, obs_dim), False
    if algo == "ddpg":
        return DDPG(cfg, obs_dim, n_envs=n_envs), False
    if algo == "sac":
        return SAC(cfg, obs_dim), False
    return DQN(cfg, obs_dim), True


def run_metadata(args, trainer) -> dict:
    """Everything evaluate/resume needs to rebuild the agent + env."""
    import dataclasses
    return {
        "algo": args.algo,
        "agent_config": dataclasses.asdict(trainer.agent.cfg),
        "obs_dim": trainer.env.obs_dim,
        "world": args.world,
        "behavior": args.behavior,
        "ablation": getattr(args, "ablation", None),
        "robot": getattr(args, "robot", None),
        "jitter": getattr(args, "jitter", 0.0),
        "actuation_noise": getattr(args, "actuation_noise", 0.0),
        "dt_jitter": getattr(args, "dt_jitter", 0.0),
        "lidar_noise": getattr(args, "lidar_noise", 0.0),
        "n_envs": args.n_envs,
        "updates_per_step": args.updates_per_step,
        "replay_obs_dtype": getattr(args, "replay_obs_dtype", None)
        or "float32",
        "seed": args.seed,
    }


def collapse_verdict(summary: dict, chunk: int, args):
    """Early-collapse gate for --restart-on-collapse.

    The flagship large-batch TD3 recipe bifurcates: runs either escape to
    ~98% success or fall into a 0%-success attractor (mean episode reward
    ~-300..-460, diverging actor loss) that never recovers
    (results/r5/README.md §1.2). Calibration on the round-5 corpus of
    flagship-recipe training CSVs: escapes happen as late as chunk ~18
    (abl_no_cp: -352 at chunk 10, +457 at chunk 18, 98% final), so the
    default detection chunk is 24, where the corpus separates cleanly
    (collapsed <= -290 everywhere, escaped >= +450).

    Returns None while the verdict must be deferred (before the detection
    chunk, or no episodes completed in this chunk's stats window yet),
    else True (collapsed) / False (healthy). The caller renders the
    verdict once per attempt, at the first non-deferred chunk. Evaluated
    on every process (drain_stats already runs everywhere), so the
    verdict is consistent under --multihost.
    """
    if chunk + 1 < args.collapse_detect_chunk:
        return None
    if summary["episodes"] == 0:  # stats window empty — defer
        return None
    return summary["mean_reward"] < args.collapse_reward_threshold


def build(args):
    noise_kw = {k: v for k, v in (
        ("actuation_noise", getattr(args, "actuation_noise", 0.0)),
        ("dt_jitter", getattr(args, "dt_jitter", 0.0)),
        ("lidar_noise", getattr(args, "lidar_noise", 0.0))) if v}
    if getattr(args, "risk_backend", None):
        noise_kw["risk_backend"] = args.risk_backend
    cfg = make_config(args.world, args.behavior,
                      ablation=getattr(args, "ablation", None),
                      jitter=getattr(args, "jitter", 0.0),
                      robot=getattr(args, "robot", None),
                      max_steps=args.max_steps, **noise_kw)
    env_cls = CrowdEnv if args.algo in RISK_ENV_ALGOS else SimpleEnv
    env = env_cls(cfg)
    agent, discrete = _build_agent(args.algo, env.obs_dim, args.n_envs,
                                   args)
    reset_bank = getattr(args, "reset_bank", 0)
    if getattr(args, "jitter", 0.0) and not reset_bank:
        # jittered resets are pointless if every auto-reset restores the one
        # deterministic template; default to a bank of distinct spawns
        reset_bank = max(256, args.n_envs)
    tcfg = TrainerConfig(n_envs=args.n_envs, rollout_chunk=args.chunk,
                         updates_per_step=args.updates_per_step,
                         learn_start=args.learn_start,
                         reset_bank=reset_bank,
                         replay_obs_dtype=getattr(args, "replay_obs_dtype",
                                                  None) or "float32")
    if getattr(args, "multihost", False):
        # mesh over ALL global devices (jax.distributed must be initialized)
        trainer = ShardedTrainer(env, agent, tcfg, make_mesh(None),
                                 discrete=discrete)
    elif args.n_devices > 1:
        trainer = ShardedTrainer(env, agent, tcfg, make_mesh(args.n_devices),
                                 discrete=discrete)
    else:
        trainer = Trainer(env, agent, tcfg, discrete=discrete)
    return trainer


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--algo", required=True,
                   choices=["td3", "ddpg", "sac", "dqn"])
    p.add_argument("--world", default="crowd_dense")
    p.add_argument("--behavior", default="crowd")
    p.add_argument("--ablation", default=None,
                   choices=list(ABLATION_PRESETS),
                   help="ablation arm (SURVEY.md §4)")
    p.add_argument("--robot", default=None,
                   choices=list(ROBOT_PRESETS),
                   help="robot kinematic variant (default: the reference's "
                        "modified burger; see envs.config.ROBOT_PRESETS)")
    p.add_argument("--n-envs", type=int, default=1024)
    p.add_argument("--n-devices", type=int, default=1)
    p.add_argument("--env-steps", type=float, default=2e6)
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--max-steps", type=int, default=500)
    p.add_argument("--updates-per-step", type=int, default=1,
                   help="gradient updates per batched env step; the "
                        "reference's update:data ratio of 1 corresponds to "
                        "n_envs here — ratios of 1/8..1/64 converge in "
                        "practice (see TrainerConfig)")
    p.add_argument("--learn-start", type=int, default=1024)
    p.add_argument("--learner-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="TD3 MLP compute dtype (params/targets/losses stay "
                        "float32); bfloat16 feeds the MXU at native rate")
    p.add_argument("--replay-obs-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="replay obs/next_obs storage dtype; bfloat16 halves "
                        "the ring and removes XLA's whole-ring convert "
                        "pathology (agents/replay.py docs)")
    p.add_argument("--actor-lr", type=float, default=None,
                   help="actor learning rate override (td3/ddpg; default "
                        "3e-4). A lower actor LR is the standard lever "
                        "against DDPG's late actor-collapse")
    p.add_argument("--critic-lr", type=float, default=None,
                   help="critic learning rate override (td3; default "
                        "3e-4) — the batch-envelope sweep scales both LRs "
                        "with the batch size")
    p.add_argument("--batch-size", type=int, default=None,
                   help="learner batch per update (reference: TD3 128, "
                        "DDPG/SAC/DQN 64). Larger batches with "
                        "proportionally fewer --updates-per-step keep the "
                        "sample-reuse ratio while feeding the MXU bigger "
                        "matmuls")
    p.add_argument("--jitter", type=float, default=0.0,
                   help="reset-randomization scale (start pose, pedestrian "
                        "spawns/phases); 1.0 = standard training diversity")
    p.add_argument("--actuation-noise", type=float, default=0.0,
                   help="per-step Gaussian noise std on the executed "
                        "(lin, ang) command, as a fraction of the action "
                        "box (EnvConfig.actuation_noise — the Gazebo "
                        "contact-physics stand-in)")
    p.add_argument("--dt-jitter", type=float, default=0.0,
                   help="uniform +-fraction jitter on the physics dt per "
                        "step (the reference's wall-clock scheduling "
                        "jitter, environment_stage_1_nobonus.py:1198-1205)")
    p.add_argument("--risk-backend", default=None,
                   choices=["xla", "pallas"],
                   help="tracker+CP+topK backend (default xla; 'pallas' "
                        "is the fused VMEM kernel, bit-matching — "
                        "tests/test_risk_pallas.py)")
    p.add_argument("--lidar-noise", type=float, default=0.0,
                   help="Gaussian std (m) on hit-beam lidar ranges (the "
                        "sensor plugin's disabled noise field, "
                        "turtlebot3_burger.gazebo.xacro:150-177)")
    p.add_argument("--reset-bank", type=int, default=0,
                   help="size of the pre-randomized reset bank for diverse "
                        "auto-resets (0 = auto when --jitter is set)")
    p.add_argument("--sigma-min", type=float, default=None,
                   help="anneal TD3 exploration sigma to this value "
                        "(reference ships constant 1.0)")
    p.add_argument("--sigma-decay-steps", type=float, default=1e6,
                   help="env-steps over which sigma anneals")
    p.add_argument("--explore-eps", type=float, default=0.0,
                   help="epsilon-uniform action mixing for TD3 behavior "
                        "policy (coverage guarantee; 0 = reference-parity "
                        "Gaussian-only)")
    p.add_argument("--explore-eps-min", type=float, default=None,
                   help="anneal epsilon to this floor over "
                        "--sigma-decay-steps (None = constant epsilon)")
    p.add_argument("--explore-spectrum", action="store_true",
                   help="per-env log-spaced epsilon spectrum between "
                        "--explore-eps and --explore-eps-min (Ape-X style; "
                        "permanent explorer envs instead of an anneal)")
    p.add_argument("--outdir", default="results")
    p.add_argument("--ckpt-every-chunks", type=int, default=50)
    p.add_argument("--snapshot-every-chunks", type=int, default=0,
                   help="also save a small agent-only snapshot (params/"
                        "targets/opt state, a few MB) every N chunks into "
                        "<outdir>/agent_snapshots_<algo>, keyed by env-step "
                        "— the reference keeps per-episode model saves "
                        "(start_td3_training.py:150-154) so the PEAK policy "
                        "of a run that later collapses (e.g. DDPG, "
                        "BASELINE.md) remains evaluable via "
                        "drivers.evaluate --checkpoint ... --checkpoint-step")
    p.add_argument("--restart-on-collapse", type=int, default=0,
                   metavar="N",
                   help="re-initialize and retry (up to N times, fresh "
                        "seed each attempt) when the early-training collapse "
                        "attractor is detected. The large-batch TD3 recipe "
                        "bifurcates: runs either escape to ~98%% success or "
                        "lock into a 0%%-success attractor (results/r5/"
                        "README.md §1.2) — restarting costs a fraction of a "
                        "run vs a wasted full one. Detection at "
                        "--collapse-detect-chunk via "
                        "--collapse-reward-threshold.")
    p.add_argument("--collapse-detect-chunk", type=int, default=24,
                   help="chunk index (1-based) at which the collapse check "
                        "runs. Default 24, calibrated on the round-5 "
                        "flagship-recipe corpus: every escaped run (incl. "
                        "the latest escape seen, abl_no_cp at chunk ~18) is "
                        "above +450 mean reward by chunk 20, every collapsed "
                        "run stays below -290 for the whole run")
    p.add_argument("--collapse-reward-threshold", type=float, default=-100.0,
                   help="mean episode reward below which the run is declared "
                        "collapsed (corpus margin at the default detection "
                        "chunk: collapsed ≤ -290, escaped ≥ +450)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --outdir "
                        "(the reference's continue_execution/resume_epoch, "
                        "start_td3_training.py:41-49)")
    p.add_argument("--profile-dir", default=None,
                   help="capture an xprof trace of one warm chunk into this "
                        "directory (view with TensorBoard profile plugin)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None,
                   help="JAX platform override, e.g. 'cpu' for a local smoke "
                        "run (the JAX_PLATFORMS env var is re-pinned by TPU "
                        "relay hooks and cannot be relied on)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-process execution: calls jax.distributed."
                        "initialize (coordinator/process id from "
                        "--coordinator/--num-processes/--process-id or the "
                        "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID env vars) and shards the env axis "
                        "over ALL hosts' devices; --n-envs is the GLOBAL "
                        "batch. Run the same command on every host.")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if (args.algo == "ddpg" and args.explore_eps_min is not None
            and not args.explore_spectrum):
        print("warning: --explore-eps-min without --explore-spectrum is "
              "ignored for DDPG (it has no epsilon anneal; TD3 anneals via "
              "decay_sigma). Pass --explore-spectrum for per-env epsilons.",
              flush=True)
    if args.multihost:
        from crowdnav_tpu.parallel import init_multihost, process_summary
        init_multihost(args.coordinator, args.num_processes, args.process_id)
        print(json.dumps(process_summary()), flush=True)
    trainer = build(args)
    t_init = time.time()
    state = trainer.init(jax.random.PRNGKey(args.seed))
    print(json.dumps({"event": "initialized",
                      "secs": round(time.time() - t_init, 1)}), flush=True)
    steps_done = 0
    if args.resume:
        state, steps_done = restore_checkpoint(
            f"{args.outdir}/ckpt_{args.algo}", state)
        print(f"resumed from step {steps_done}", flush=True)
    run = trainer.make_jitted()
    is_main = jax.process_index() == 0
    if is_main:
        from crowdnav_tpu.utils import save_run_metadata
        meta = run_metadata(args, trainer)
        ckpt_dirs = [f"{args.outdir}/ckpt_{args.algo}",
                     f"{args.outdir}/agent_ckpt_{args.algo}"]
        if args.snapshot_every_chunks:
            ckpt_dirs.append(f"{args.outdir}/agent_snapshots_{args.algo}")
        for d in ckpt_dirs:
            save_run_metadata(d, meta)
    logger = EpisodeLogger(args.outdir, f"{args.algo}_training",
                           extra_headers=["greedy_episodes",
                                          "greedy_success_rate"]) \
        if is_main else None

    steps_per_chunk = args.n_envs * args.chunk
    n_chunks = max(1, int((args.env_steps - steps_done) // steps_per_chunk))
    throughput = StepThroughput(steps_per_chunk)
    episode_base = 0
    t_start = time.time()
    attempt = 0
    verdict_done = False
    wasted_steps = 0  # env-steps burned by collapse-restarted attempts
    chunk = 0
    while chunk < n_chunks:
        t0 = time.time()
        # trace one warm chunk (the 3rd: past compile + cache warmup)
        with trace_if(args.profile_dir, chunk == 2):
            state = run(state)
            jax.block_until_ready(state.obs)
        tput = throughput.tick()
        summary, state = trainer.drain_stats(state)
        if is_main:
            logger.record_summary(summary, episode_base, time.time() - t0)
            episode_base += summary["episodes"]
            print(json.dumps({
                "chunk": chunk,
                "env_steps": steps_done + (chunk + 1) * steps_per_chunk,
                "sps": round(tput["sps"], 1),
                "sps_ema": round(tput["sps_ema"], 1),
                **{k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in summary.items()},
            }), flush=True)
        if (args.restart_on_collapse and attempt < args.restart_on_collapse
                and not verdict_done):
            verdict = collapse_verdict(summary, chunk, args)
            if verdict is not None:
                verdict_done = True
                if not verdict and is_main:
                    print(json.dumps({
                        "event": "collapse_check",
                        "verdict": "healthy",
                        "chunk": chunk,
                        "mean_reward": round(summary["mean_reward"], 2),
                    }), flush=True)
                if verdict:
                    attempt += 1
                    if is_main:
                        print(json.dumps({
                            "event": "collapse_restart",
                            "attempt": attempt,
                            "mean_reward": round(summary["mean_reward"], 2),
                            "threshold": args.collapse_reward_threshold,
                            "new_seed": args.seed + 1009 * attempt,
                        }), flush=True)
                    # fresh init (new seed), restart the chunk loop; CSV
                    # rows from the aborted attempt stay in the log with
                    # the restart event marking the boundary
                    state = trainer.init(
                        jax.random.PRNGKey(args.seed + 1009 * attempt))
                    # keep checkpoint step keys monotone across attempts:
                    # count the aborted attempt's env-steps as consumed
                    wasted_steps += (chunk + 1) * steps_per_chunk
                    chunk = 0
                    verdict_done = False  # re-arm for the new attempt
                    continue
        chunk += 1  # chunks completed; below, `chunk` == old loop's chunk+1
        if hasattr(trainer.agent, "decay_epsilon"):
            # reference decays epsilon once per episode
            # (start_dqn_training.py:125-127); here once per chunk
            state = state.replace(
                agent_state=trainer.agent.decay_epsilon(state.agent_state))
        if hasattr(trainer.agent, "decay_sigma"):
            state = state.replace(
                agent_state=trainer.agent.decay_sigma(
                    state.agent_state,
                    steps_done + chunk * steps_per_chunk))
        # checkpoint step keys include wasted_steps so they stay monotone
        # across collapse restarts (Orbax refuses a step key below the
        # latest committed one); sigma decay above deliberately does NOT —
        # each attempt anneals from scratch
        if args.ckpt_every_chunks and chunk % args.ckpt_every_chunks == 0:
            save_checkpoint(f"{args.outdir}/ckpt_{args.algo}", state,
                            steps_done + wasted_steps
                            + chunk * steps_per_chunk)
        if args.snapshot_every_chunks and \
                chunk % args.snapshot_every_chunks == 0:
            save_checkpoint(f"{args.outdir}/agent_snapshots_{args.algo}",
                            {"agent_state": state.agent_state},
                            steps_done + wasted_steps
                            + chunk * steps_per_chunk)
    # final checkpoint: full trainer state (multi-GB, gitignored) for exact
    # resume + a small agent-only checkpoint (params/targets/opt state — a
    # few MB) that IS committed and is all `drivers.evaluate --checkpoint`
    # needs (restore_agent_state reads just the agent_state subtree).
    final_step = steps_done + wasted_steps + n_chunks * steps_per_chunk
    save_checkpoint(f"{args.outdir}/ckpt_{args.algo}", state, final_step)
    # called from ALL processes: orbax save/wait_until_finished are
    # collective under jax.process_count() > 1 — an is_main guard here
    # would hang process 0 at the barrier at the very end of a run
    save_checkpoint(f"{args.outdir}/agent_ckpt_{args.algo}",
                    {"agent_state": state.agent_state}, final_step)
    print(f"done: {wasted_steps + n_chunks * steps_per_chunk:.0f} env-steps "
          f"({attempt} collapse restarts) in {time.time() - t_start:.1f}s"
          if attempt else
          f"done: {n_chunks * steps_per_chunk:.0f} env-steps in "
          f"{time.time() - t_start:.1f}s")
    return state


if __name__ == "__main__":
    main()
