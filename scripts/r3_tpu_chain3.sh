#!/bin/bash
# Round-3 TPU chain 3: the ablation contrast under REFERENCE-REGIME
# exploration (Gaussian sigma 1.0 only, no epsilon mixing — exactly the
# reference's behavior policy, td3.py:67-78) at a small budget.
#
# Motivation: at full TPU scale (48M steps + eps-spectrum exploration) the
# no_cp arm does NOT collapse (98.4% greedy eval, results/r3/td3_no_cp) —
# the scans alone suffice. The reference's 1.6% no_cp collapse must then
# be a property of its training regime, not of the state's information
# content. These runs test that hypothesis: same engine, reference-parity
# exploration, matched small budget, full vs no_cp vs no_cpdto.
set -u
cd /root/repo
LOG=results/r3/chain3.log
exec >>"$LOG" 2>&1

run() {
  echo "=== $(date +%T) START: $*"
  timeout 5400 "$@"
  echo "=== $(date +%T) DONE rc=$? : $*"
  sleep 90
}

train_arm() {  # $1 = outdir tag, $2... = extra args
  local TAG=$1; shift
  run python -u -m crowdnav_tpu.drivers.train --algo td3 \
    --world crowd_dense --behavior crowd --n-envs 512 --chunk 64 \
    --env-steps 6e6 --updates-per-step 32 --batch-size 128 \
    --learn-start 2048 --jitter 1.0 \
    --outdir results/r3/refregime_$TAG --ckpt-every-chunks 0 \
    --snapshot-every-chunks 30 "$@"
}

train_arm full
run python -u -m crowdnav_tpu.drivers.evaluate --algo td3 \
  --checkpoint results/r3/refregime_full/agent_ckpt_td3 --suite train \
  --n-envs 1024 --outdir results/r3/refregime_full

train_arm no_cp --ablation no_cp
run python -u -m crowdnav_tpu.drivers.evaluate --algo td3 \
  --ablation no_cp \
  --checkpoint results/r3/refregime_no_cp/agent_ckpt_td3 --suite train \
  --n-envs 1024 --outdir results/r3/refregime_no_cp

train_arm no_cpdto --ablation no_cpdto
run python -u -m crowdnav_tpu.drivers.evaluate --algo td3 \
  --ablation no_cpdto \
  --checkpoint results/r3/refregime_no_cpdto/agent_ckpt_td3 --suite train \
  --n-envs 1024 --outdir results/r3/refregime_no_cpdto

echo "=== $(date +%T) CHAIN3 COMPLETE"
