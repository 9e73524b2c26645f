#!/bin/bash
# Serial TPU run chain (relay discipline: one client at a time, cooldown
# between clients). Usage:
#
#   setsid nohup bash scripts/tpu_chain.sh CHAINFILE LOGFILE &
#
# CHAINFILE is a text file with one command per line (blank lines and
# `#` comments skipped). Each command runs under `timeout 5400` followed
# by a 90 s cooldown. Replaces the six one-off r3_tpu_chain*.sh scripts
# (their exact commands are preserved in results/r3/chain*.log).
set -u
cd /root/repo
CHAIN=${1:?chain file}
LOG=${2:?log file}
mkdir -p "$(dirname "$LOG")"
exec >>"$LOG" 2>&1

while IFS= read -r line; do
  case "$line" in ''|'#'*) continue;; esac
  echo "=== $(date +%T) START: $line"
  timeout 5400 bash -c "$line"
  rc=$?   # capture BEFORE the next command substitution clobbers $?
  echo "=== $(date +%T) DONE rc=$rc : $line"
  sleep "${COOLDOWN:-90}"
done < "$CHAIN"
echo "=== $(date +%T) CHAIN COMPLETE: $CHAIN"
