#!/bin/bash
# Junction-dense camera-route RL arms + ensemble evals (run after
# scripts/run_cascade_dense.sh passes its probe gate). Both arms train and
# eval on the SAME dense-route distribution (6 legs of 25-45 m) so the
# trained-vs-random comparison is corner-decision-dominated.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=${W:-/tmp/cascade_dense}
ITERS=${ITERS:-160}
ROUTE_ARGS="--route-legs 6 --leg-min 25 --leg-max 45"
LOG="$W/driver.log"
{
  for ARM in trained random; do
    date
    python scripts/cascade_proof.py rl --arm "$ARM" --blind-route \
        --camera-route --route-geom --work-dir "$W" $ROUTE_ARGS \
        --encoder "$W/encoder.msgpack" --iterations "$ITERS" || exit 1
    date
    python scripts/cascade_proof.py eval --arm "$ARM" --blind-route \
        --camera-route --route-geom --work-dir "$W" $ROUTE_ARGS \
        --encoder "$W/encoder.msgpack" || exit 1
  done
  date
  echo CASCADE_DENSE_DONE
} >> "$LOG" 2>&1
