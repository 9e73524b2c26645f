"""End-to-end driver tests: the unified train CLI (replaces the six
`start_*_training.py` scripts) including checkpoint + --resume (the
reference's continue_execution/resume_epoch, `start_td3_training.py:41-49`).
Run tiny on CPU."""
import csv
import glob

from crowdnav_tpu.drivers import train


def _args(outdir, extra=()):
    return ["--algo", "dqn", "--world", "crowd_none", "--behavior", "static",
            "--n-envs", "8", "--chunk", "4", "--env-steps", "64",
            "--max-steps", "16", "--learn-start", "16",
            "--ckpt-every-chunks", "1", "--outdir", outdir,
            "--platform", "cpu", *extra]


def test_train_driver_checkpoints_and_resumes(tmp_path):
    outdir = str(tmp_path)
    train.main(_args(outdir))
    ckpts = glob.glob(f"{outdir}/ckpt_dqn/*")
    assert ckpts, "driver wrote no checkpoint"

    # CSV in the reference 8-column schema exists and has rows
    csv_files = glob.glob(f"{outdir}/dqn_training*.csv")
    assert csv_files
    with open(csv_files[0]) as f:
        rows = list(csv.reader(f))
    assert len(rows) >= 2  # header + at least one summary row

    # resume: picks up from saved step, runs further chunks without error
    state = train.main(_args(outdir, ["--env-steps", "128", "--resume"]))
    assert state is not None


def test_restart_on_collapse_verdict_gate():
    """collapse_verdict defers (None) before the detection chunk or while
    no episodes have completed, then renders True/False on the reward
    threshold (results/r5/README.md §1.2: the 0%-attractor sits near mean
    reward -450 and is separable by chunk ~10)."""
    import argparse

    args = argparse.Namespace(collapse_detect_chunk=10,
                              collapse_reward_threshold=-300.0)
    collapsed = {"episodes": 500, "mean_reward": -447.0}
    healthy = {"episodes": 500, "mean_reward": -88.0}
    assert train.collapse_verdict(collapsed, 9, args) is True
    assert train.collapse_verdict(healthy, 9, args) is False
    # before the detection chunk: defer
    assert train.collapse_verdict(collapsed, 8, args) is None
    # empty stats window at/after the detection chunk: defer to the next
    # chunk that actually completed episodes
    assert train.collapse_verdict(
        {"episodes": 0, "mean_reward": 0.0}, 9, args) is None
    assert train.collapse_verdict(collapsed, 15, args) is True


def test_restart_on_collapse_end_to_end(tmp_path, capsys):
    """With an always-triggering threshold the driver restarts (fresh seed)
    exactly `--restart-on-collapse` times, then completes the run."""
    import json as _json

    outdir = str(tmp_path)
    # detect chunk 1 defers until the first chunk with completed episodes
    # (chunk 4 here: 16-step timeouts, 4-step chunks); threshold high
    # enough that any finite reward counts as "collapsed"
    train.main(_args(outdir, ["--env-steps", "256",
                              "--restart-on-collapse", "1",
                              "--collapse-detect-chunk", "1",
                              "--collapse-reward-threshold", "1e9"]))
    events = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
              if l.startswith("{") and "collapse_restart" in l]
    assert len(events) == 1
    assert events[0]["attempt"] == 1
    assert events[0]["new_seed"] == 1009
    ckpts = glob.glob(f"{outdir}/ckpt_dqn/*")
    assert ckpts, "run did not complete after restart"


def test_checkpoint_metadata_round_trip(tmp_path):
    """A checkpoint trained with NON-DEFAULT agent hyperparameters must
    evaluate correctly with no extra CLI flags: run_config.json (the
    reference DQN's params-JSON pattern, start_dqn_training.py:134-144)
    pins algo/ablation/agent config, and conflicting flags error out."""
    import json

    import pytest

    from crowdnav_tpu.drivers import evaluate

    outdir = str(tmp_path)
    train.main(["--algo", "td3", "--world", "crowd_none", "--behavior",
                "static", "--n-envs", "8", "--chunk", "4", "--env-steps",
                "64", "--max-steps", "16", "--learn-start", "16",
                "--ckpt-every-chunks", "0", "--outdir", outdir,
                "--platform", "cpu", "--ablation", "no_cp",
                "--batch-size", "16"])
    ckpt = f"{outdir}/agent_ckpt_td3"
    meta = json.load(open(f"{ckpt}/run_config.json"))
    assert meta["agent_config"]["batch_size"] == 16
    assert meta["ablation"] == "no_cp"

    # no --ablation / --batch-size flags: metadata reconstructs the agent
    # (a default-config rebuild would fail the restore on no_cp's obs_dim)
    results = evaluate.main(["--algo", "td3", "--checkpoint", ckpt,
                             "--suite", "train", "--n-envs", "8",
                             "--max-steps", "16", "--outdir",
                             f"{outdir}/eval", "--platform", "cpu"])
    assert results and "success_rate" in results[0]

    # conflicting flags are an error, not a silent wrong restore
    with pytest.raises(SystemExit):
        evaluate.main(["--algo", "td3", "--checkpoint", ckpt,
                       "--suite", "train", "--ablation", "no_cpdto",
                       "--n-envs", "8", "--max-steps", "16",
                       "--outdir", f"{outdir}/eval2", "--platform", "cpu"])
    with pytest.raises(SystemExit):
        evaluate.main(["--algo", "ddpg", "--checkpoint", ckpt,
                       "--suite", "train", "--n-envs", "8",
                       "--max-steps", "16",
                       "--outdir", f"{outdir}/eval3", "--platform", "cpu"])
