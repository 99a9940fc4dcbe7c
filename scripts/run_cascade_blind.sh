#!/bin/bash
# Blind-route cascade proof: same trained-vs-random-encoder comparison as
# run_cascade_proof.sh, but with the privileged (dis, theta) route
# measurements zeroed in the policy obs (--blind-route) — route geometry is
# then only discoverable through the camera/route-fig -> encoder path.
# Reuses the encoder pretrained by run_cascade_proof.sh.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=${W:-/tmp/cascade_blind}
ENC=${ENC:-/tmp/cascade_proof/encoder.msgpack}
ITERS=${ITERS:-120}
mkdir -p "$W"
LOG="$W/driver.log"
{
  date
  python scripts/cascade_proof.py rl --arm trained --blind-route \
      --work-dir "$W" --encoder "$ENC" --iterations "$ITERS" || exit 1
  date
  python scripts/cascade_proof.py rl --arm random --blind-route \
      --work-dir "$W" --iterations "$ITERS" || exit 1
  date
  python scripts/cascade_proof.py eval --arm trained --blind-route \
      --work-dir "$W" --encoder "$ENC" || exit 1
  python scripts/cascade_proof.py eval --arm random --blind-route \
      --work-dir "$W" || exit 1
  python scripts/cascade_proof.py report --work-dir "$W"
  date
  echo CASCADE_BLIND_DONE
} >> "$LOG" 2>&1
