#!/bin/bash
# One-shot A/B: temporarily revert the round-5 association-rounding
# semantics (geom.boxes_associated + the segmentation inline form) to the
# pre-fix raw-overlap test, run one flagship-recipe training + eval, then
# restore the committed code. Used only to bisect the suspected collapse
# regression; safe to re-run (restores via git checkout).
set -euo pipefail
cd /root/repo
SEED=${1:?seed}
OUT=${2:?outdir}

python - <<'EOF'
import re
p = "crowdnav_tpu/ops/risk.py"
s = open(p).read()
s = s.replace(
    """    inter = (jnp.maximum(side - jnp.abs(dx), 0.0)
             * jnp.maximum(side - jnp.abs(dy), 0.0))
    assoc_next = inter * 1.0005 > 1e-3 * side * side""",
    """    assoc_next = (jnp.abs(dx) < side) & (jnp.abs(dy) < side)  # BISECT""")
assert "BISECT" in s
open(p, "w").write(s)

p = "crowdnav_tpu/ops/geom.py"
s = open(p).read()
s = s.replace(
    """    inter = jnp.maximum(side - dx, 0.0) * jnp.maximum(side - dy, 0.0)
    return inter * 1.0005 > 1e-3 * side * side""",
    """    return (dx < side) & (dy < side)  # BISECT""")
assert "BISECT" in s
open(p, "w").write(s)
print("patched to pre-fix association")
EOF

python -u -m crowdnav_tpu.drivers.train --algo td3 --world crowd_dense \
  --behavior crowd --n-envs 16384 --chunk 64 --env-steps 64e6 \
  --updates-per-step 32 --batch-size 4096 --learn-start 32768 \
  --replay-obs-dtype bfloat16 --jitter 1.0 --explore-eps 1.0 \
  --explore-eps-min 0.05 --explore-spectrum --seed "$SEED" \
  --outdir "$OUT" --ckpt-every-chunks 0 || true
git checkout -- crowdnav_tpu/ops/risk.py crowdnav_tpu/ops/geom.py
echo "restored committed association code"
python -u -m crowdnav_tpu.drivers.evaluate --algo td3 \
  --checkpoint "$OUT/agent_ckpt_td3" --suite train --n-envs 1024 \
  --outdir "$OUT"
