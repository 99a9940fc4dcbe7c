#!/bin/bash
# Round-3 cascade experiment: CAMERA-ROUTE on JUNCTION-DENSE routes.
# The camera-route arms (BENCH_r3_cascade_camroute.json) produced a
# probe-proven latent gap and a driving-score win but a completion TIE at
# ~35%: with 3 legs of 40-90 m the episodes die at/near the first corner
# for both arms, so corner decisions — the one place route perception is
# indispensable — are a tiny fraction of experience. This variant shortens
# the legs (6 legs of 25-45 m => a corner every ~35 m) so corner decisions
# dominate, keeping everything else from the camera-route protocol:
# in_route_blank encoder input + blind-route policy obs + geom-head
# pretrain + the probe gate before any RL hours are spent.
#
# Stage 1 (this script): collect dense-route frames -> pretrain -> probe.
# Stage 2: scripts/run_cascade_dense_rl.sh (gated by run_cascade_dense_auto.sh).
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=${W:-/tmp/cascade_dense}
DATA=${DATA:-$W/data}
ROUTE_ARGS="--route-legs 6 --leg-min 25 --leg-max 45"
mkdir -p "$W"
LOG="$W/driver.log"
{
  date
  if [ ! -d "$DATA" ]; then
    python scripts/cascade_proof.py collect --data-dir "$DATA" \
        --frames 12000 $ROUTE_ARGS || exit 1
    echo COLLECT_DONE
  fi
  if [ ! -f "$W/encoder.msgpack" ]; then
    python scripts/cascade_proof.py pretrain --route-geom --camera-route \
        --work-dir "$W" --data-dir "$DATA" --epochs 20 || exit 1
  fi
  date
  echo PRETRAIN_DONE
  python scripts/latent_probe.py --route-geom --camera-route \
      --encoder "$W/encoder.msgpack" $ROUTE_ARGS \
      --out "$W/latent_probe.json" --cache /tmp/probe_frames_dense.npz \
      || exit 1
  date
  echo PROBE_DONE
} >> "$LOG" 2>&1
