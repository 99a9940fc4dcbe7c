#!/bin/bash
# Full blind-route cascade pipeline from a clean /tmp: rebuild the shared
# prereqs (expert dataset + pretrained encoder, same as run_cascade_proof.sh)
# then run the blind-route arms (run_cascade_blind.sh). Used when the work
# dirs were wiped between sessions.
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
  if [ ! -f "$W/encoder.msgpack" ]; then
    python scripts/cascade_proof.py pretrain --work-dir "$W" --data-dir "$W/data" --epochs 20 || exit 1
  fi
  date
  echo PREREQS_DONE
} >> "$LOG" 2>&1
ENC="$W/encoder.msgpack" bash scripts/run_cascade_blind.sh
