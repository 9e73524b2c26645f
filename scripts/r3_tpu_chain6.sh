#!/bin/bash
# Round-3 TPU chain 6: bf16-learner validation + perf artifacts.
# - flagship config with --learner-dtype bfloat16: throughput + a full
#   convergence run + greedy eval (params/targets stay f32)
# - bench --dtype bfloat16 for the throughput delta
# - finer env-step profile (update_tracks / collision_probs / top_k rows)
set -u
cd /root/repo
LOG=results/r3/chain6.log
exec >>"$LOG" 2>&1

run() {
  echo "=== $(date +%T) START: $*"
  timeout 5400 "$@"
  echo "=== $(date +%T) DONE rc=$? : $*"
  sleep 90
}

run python -u -m crowdnav_tpu.drivers.train --algo td3 --world crowd_dense \
  --behavior crowd --n-envs 8192 --chunk 64 --env-steps 48e6 \
  --updates-per-step 32 --batch-size 2048 --learn-start 16384 \
  --learner-dtype bfloat16 \
  --jitter 1.0 --explore-eps 1.0 --explore-eps-min 0.05 --explore-spectrum \
  --outdir results/r3/td3_bf16 --ckpt-every-chunks 0 \
  --snapshot-every-chunks 20

run python -u -m crowdnav_tpu.drivers.evaluate --algo td3 \
  --checkpoint results/r3/td3_bf16/agent_ckpt_td3 --suite train \
  --n-envs 1024 --outdir results/r3/td3_bf16

run python -u bench.py --dtype bfloat16 --xla-only

run python -u scripts/profile_env_r3.py

echo "=== $(date +%T) CHAIN6 COMPLETE"
