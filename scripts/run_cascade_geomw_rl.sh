#!/bin/bash
# Blind-route RL arm + ensemble eval for the WEIGHTED route-geom encoder
# (run after scripts/run_cascade_geomw.sh passes its probe gate).
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=${W:-/tmp/cascade_geomw}
ITERS=${ITERS:-120}
LOG="$W/driver.log"
{
  date
  python scripts/cascade_proof.py rl --arm trained --blind-route \
      --route-geom --work-dir "$W" --encoder "$W/encoder.msgpack" \
      --iterations "$ITERS" || exit 1
  date
  python scripts/cascade_proof.py eval --arm trained --blind-route \
      --route-geom --work-dir "$W" --encoder "$W/encoder.msgpack" || exit 1
  date
  echo CASCADE_GEOMW_DONE
} >> "$LOG" 2>&1
