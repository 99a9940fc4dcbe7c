#!/bin/bash
# Priority-route-curriculum A/B on the device path: does the in-graph
# PriorityRouteIndexer port (JaxEnvConfig.priority_routes — softmax over
# 100-completion, 20% uniform; priority_route_indexer.py:42-61) speed up
# learning over uniform route sampling at a matched budget?
# 2 seeds x {uniform, priority}, 300 iterations x 32 envs x 200 steps =
# 1.92M env-steps/run, random encoder, standard moving-traffic protocol.
# Held-out eval stays uniform in BOTH arms (the driver forces
# priority_routes=False for eval). Results -> /tmp/device_scale/curr/.
# Blocks on the shared scale-experiment lock.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
C=$W/curr
mkdir -p "$C"
exec 9>"$W/.lock"
flock 9 || exit 1
{
  date
  for seed in 0 1; do
    for arm in uniform priority; do
      if [ "$arm" = priority ]; then EXTRA="--priority-routes"; else EXTRA=""; fi
      OUT="$C/${arm}_s${seed}.json"
      [ -f "$OUT" ] && continue
      timeout 3000 python scripts/run_device_scale.py \
          --iterations 300 --snap-every 50 --eval-members 6 \
          --seed $seed $EXTRA \
          --workdir "$C/${arm}_s${seed}" --out "$OUT" \
          || echo "RUN_${arm}_s${seed}_FAILED"
      echo "RUN_${arm}_s${seed}_DONE"
      date
    done
  done
  echo CURRICULUM_AB_DONE
} >> "$C/driver.log" 2>&1
