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
