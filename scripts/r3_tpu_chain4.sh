#!/bin/bash
# Round-3 TPU chain 4: the DDPG story (VERDICT r2 item 4).
# - OU-only DDPG never leaves 0% at batch scale (results/r3/ddpg — the
#   parity collapse, reproduced again on TPU).
# - eps-spectrum DDPG (r2) peaked ~60% around 1.6M steps then collapsed;
#   r2 kept no pre-collapse checkpoint. Re-run WITH dense agent snapshots
#   and eval the PEAK snapshot.
# - stabilization arm: same run at actor_lr 1e-4 (the standard lever
#   against DDPG actor collapse).
set -u
cd /root/repo
LOG=results/r3/chain4.log
exec >>"$LOG" 2>&1

run() {
  echo "=== $(date +%T) START: $*"
  timeout 5400 "$@"
  echo "=== $(date +%T) DONE rc=$? : $*"
  sleep 90
}

run python -u -m crowdnav_tpu.drivers.train --algo ddpg --world crowd_dense \
  --behavior crowd --n-envs 2048 --chunk 64 --env-steps 16e6 \
  --updates-per-step 16 --batch-size 1024 --learn-start 16384 \
  --jitter 1.0 --explore-eps 1.0 --explore-eps-min 0.05 --explore-spectrum \
  --outdir results/r3/ddpg_spectrum --ckpt-every-chunks 0 \
  --snapshot-every-chunks 2

run python -u -m crowdnav_tpu.drivers.train --algo ddpg --world crowd_dense \
  --behavior crowd --n-envs 2048 --chunk 64 --env-steps 16e6 \
  --updates-per-step 16 --batch-size 1024 --learn-start 16384 \
  --actor-lr 1e-4 \
  --jitter 1.0 --explore-eps 1.0 --explore-eps-min 0.05 --explore-spectrum \
  --outdir results/r3/ddpg_lowlr --ckpt-every-chunks 0 \
  --snapshot-every-chunks 2

echo "=== $(date +%T) CHAIN4 COMPLETE"
