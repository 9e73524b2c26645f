#!/bin/bash
# Round-3 TPU chain 5: ablation contrast in the FAITHFUL reference regime.
#
# Chain 3 showed Gaussian-only exploration at 8:1 sample reuse collapses
# ALL arms (even full) — but the reference trains at ~128:1 reuse (one
# batch-128 update per single env step, start_td3_training.py:135-136),
# so its rare lucky goal episodes are replayed two orders of magnitude
# harder. These arms reproduce that: sigma-1.0 Gaussian only, batch 128,
# 512 updates per 512-env batched step (= 128:1 reuse), ~1.2M env-steps
# (the reference's ~3000 episodes = ~500k steps, 2.4x margin).
set -u
cd /root/repo
LOG=results/r3/chain5.log
exec >>"$LOG" 2>&1

run() {
  echo "=== $(date +%T) START: $*"
  timeout 5400 "$@"
  echo "=== $(date +%T) DONE rc=$? : $*"
  sleep 90
}

for ARM in full no_cp no_cpdto; do
  EXTRA=""
  if [ "$ARM" != "full" ]; then EXTRA="--ablation $ARM"; fi
  run python -u -m crowdnav_tpu.drivers.train --algo td3 \
    --world crowd_dense --behavior crowd --n-envs 512 --chunk 16 \
    --env-steps 1.2e6 --updates-per-step 512 --batch-size 128 \
    --learn-start 2048 --jitter 1.0 $EXTRA \
    --outdir results/r3/refreuse_$ARM --ckpt-every-chunks 0 \
    --snapshot-every-chunks 30
  run python -u -m crowdnav_tpu.drivers.evaluate --algo td3 $EXTRA \
    --checkpoint results/r3/refreuse_$ARM/agent_ckpt_td3 --suite train \
    --n-envs 1024 --outdir results/r3/refreuse_$ARM
done

echo "=== $(date +%T) CHAIN5 COMPLETE"
