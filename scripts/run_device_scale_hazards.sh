#!/bin/bash
# Follow-up arm for the device-path scale experiment: standard routes with
# in-graph Scenario-3 crossing hazards armed (JaxEnvConfig.n_hazards — see
# envs/jax_env.py; reference srunner DynamicObjectCrossing,
# object_crash_vehicle.py). Blocks on the same lock as run_device_scale.sh,
# so it can be launched while the standard/dense arms are still running and
# will start the moment they release the TPU.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
mkdir -p "$W"
LOG="$W/driver_hazards.log"
exec 9>"$W/.lock"
flock 9 || exit 1
{
  date
  for try in 1 2; do
    timeout 5400 python scripts/run_device_scale.py \
        --iterations 1500 --hazards 4 --workdir "$W/hazards" \
        --out "$W/hazards.json" && break
    echo "ARM_hazards_RETRY_$try"
    date
  done
  echo DEVICE_SCALE_HAZARDS_DONE
  date
} >> "$LOG" 2>&1
