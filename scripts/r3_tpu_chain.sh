#!/bin/bash
# Round-3 TPU run chain: one client at a time, 90 s cooldown between runs
# (tpu-relay discipline). Logs to results/r3/chain.log.
set -u
cd /root/repo
LOG=results/r3/chain.log
mkdir -p results/r3
exec >>"$LOG" 2>&1

run() {
  echo "=== $(date +%T) START: $*"
  timeout 5400 "$@"
  echo "=== $(date +%T) DONE rc=$? : $*"
  sleep 90
}

# 1. Flagship TD3+risk at the sweep's best converging config (8192 envs,
#    32x2048 learner = 8:1 sample reuse; ~187k total updates at 48M steps,
#    matching the r2 bigbatch update budget scaled 4x in batch).
run python -u -m crowdnav_tpu.drivers.train --algo td3 --world crowd_dense \
  --behavior crowd --n-envs 8192 --chunk 64 --env-steps 48e6 \
  --updates-per-step 32 --batch-size 2048 --learn-start 16384 \
  --jitter 1.0 --explore-eps 1.0 --explore-eps-min 0.05 --explore-spectrum \
  --outdir results/r3/td3_main --ckpt-every-chunks 45 \
  --snapshot-every-chunks 10

# 2. In-distribution greedy eval of the flagship checkpoint (train suite).
run python -u -m crowdnav_tpu.drivers.evaluate --algo td3 \
  --checkpoint results/r3/td3_main/agent_ckpt_td3 --suite train \
  --n-envs 1024 --outdir results/r3/td3_main

# 3+4. The paper's headline ablation contrast at the SAME budget/config:
#      no_cp (CP block replaced by robot-pose padding) and no_cpdto.
for ARM in no_cp no_cpdto; do
run python -u -m crowdnav_tpu.drivers.train --algo td3 --world crowd_dense \
  --behavior crowd --ablation $ARM --n-envs 8192 --chunk 64 \
  --env-steps 48e6 --updates-per-step 32 --batch-size 2048 \
  --learn-start 16384 --jitter 1.0 \
  --explore-eps 1.0 --explore-eps-min 0.05 --explore-spectrum \
  --outdir results/r3/td3_$ARM --ckpt-every-chunks 0 \
  --snapshot-every-chunks 10
run python -u -m crowdnav_tpu.drivers.evaluate --algo td3 --ablation $ARM \
  --checkpoint results/r3/td3_$ARM/agent_ckpt_td3 --suite train \
  --n-envs 1024 --outdir results/r3/td3_$ARM
done

# 5. DDPG re-run WITH periodic agent snapshots so the pre-collapse peak
#    stays evaluable (VERDICT r2 item 4). Reference-parity exploration
#    (OU only) reproduces the collapse; snapshots every ~400k steps.
run python -u -m crowdnav_tpu.drivers.train --algo ddpg --world crowd_dense \
  --behavior crowd --n-envs 2048 --chunk 64 --env-steps 16e6 \
  --updates-per-step 16 --batch-size 1024 --learn-start 16384 \
  --jitter 1.0 --outdir results/r3/ddpg --ckpt-every-chunks 0 \
  --snapshot-every-chunks 3

echo "=== $(date +%T) CHAIN COMPLETE"
