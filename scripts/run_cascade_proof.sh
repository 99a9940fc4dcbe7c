#!/bin/bash
# Runs the full cascade-proof experiment (VERDICT round-1 item 2).
# Each phase in its own process so TPU sessions stay short-lived.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=${W:-/tmp/cascade_proof}
mkdir -p "$W"
LOG="$W/driver.log"
{
  date
  if [ -z "$(ls "$W/data" 2>/dev/null)" ]; then
    python scripts/cascade_proof.py collect --work-dir "$W" --data-dir "$W/data" --frames 12000 || exit 1
  fi
  date
  python scripts/cascade_proof.py pretrain --work-dir "$W" --data-dir "$W/data" --epochs 20 || exit 1
  date
  python scripts/cascade_proof.py rl --arm trained --work-dir "$W" --encoder "$W/encoder.msgpack" --iterations 120 || exit 1
  date
  python scripts/cascade_proof.py rl --arm random  --work-dir "$W" --iterations 120 || exit 1
  date
  python scripts/cascade_proof.py eval --arm trained --work-dir "$W" --encoder "$W/encoder.msgpack" || exit 1
  python scripts/cascade_proof.py eval --arm random  --work-dir "$W" || exit 1
  python scripts/cascade_proof.py report --work-dir "$W"
  date
  echo CASCADE_PROOF_DONE
} >> "$LOG" 2>&1
