#!/bin/bash
# Camera-route RL arms + ensemble evals (run after
# scripts/run_cascade_camroute.sh passes its probe gate: trained R^2_dis
# must clearly beat random R^2_dis on CAMERA-ONLY latents).
#
# Unlike the geomw stage-2 runner this runs BOTH arms — in camera-route
# mode the random encoder's projection of the blanked plane carries no
# route signal, so the trained-vs-random comparison is the experiment.
# Collect afterwards with:
#   python scripts/cascade_artifacts.py --blind --work-dir $W \
#       --out BENCH_r3_cascade_camroute.json
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=${W:-/tmp/cascade_camroute}
ITERS=${ITERS:-120}
LOG="$W/driver.log"
{
  for ARM in trained random; do
    date
    python scripts/cascade_proof.py rl --arm "$ARM" --blind-route \
        --camera-route --route-geom --work-dir "$W" \
        --encoder "$W/encoder.msgpack" --iterations "$ITERS" || exit 1
    date
    python scripts/cascade_proof.py eval --arm "$ARM" --blind-route \
        --camera-route --route-geom --work-dir "$W" \
        --encoder "$W/encoder.msgpack" || exit 1
  done
  date
  echo CASCADE_CAMROUTE_DONE
} >> "$LOG" 2>&1
