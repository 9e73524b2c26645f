#!/bin/bash
# Round-3 TPU chain 2: flagship test-suite evals (4/8/12/20), env-stage
# profile, warm bench. Run AFTER r3_tpu_chain.sh completes.
set -u
cd /root/repo
LOG=results/r3/chain2.log
exec >>"$LOG" 2>&1

run() {
  echo "=== $(date +%T) START: $*"
  timeout 5400 "$@"
  echo "=== $(date +%T) DONE rc=$? : $*"
  sleep 90
}

for SUITE in 4 8 12 20; do
run python -u -m crowdnav_tpu.drivers.evaluate --algo td3 \
  --checkpoint results/r3/td3_main/agent_ckpt_td3 --suite $SUITE \
  --n-envs 1024 --outdir results/r3/td3_main
done

run python -u scripts/profile_env_r3.py

# warm the bench programs (both backends) so the driver's end-of-round
# bench hits the compile cache; also the committed BENCH numbers
run python -u bench.py

echo "=== $(date +%T) CHAIN2 COMPLETE"
