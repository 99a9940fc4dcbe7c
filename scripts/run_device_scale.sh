#!/bin/bash
# Unattended device-path scale experiment (see run_device_scale.py):
# standard-route arm then junction-dense arm, each 1500 iterations
# (9.6M env-steps) + held-out on-device ensemble eval. flock-guarded;
# each arm is retried once if the tunnel wedges (timeout covers compile
# ~6 min + ~30 min train + eval).
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
mkdir -p "$W"
LOG="$W/driver.log"
exec 9>"$W/.lock"
flock -n 9 || { echo "ALREADY_RUNNING"; exit 0; }
{
  date
  for arm in standard dense; do
    if [ "$arm" = dense ]; then
      EXTRA="--route-legs 6 --leg-min 25 --leg-max 45"
    else
      EXTRA=""
    fi
    for try in 1 2; do
      timeout 5400 python scripts/run_device_scale.py \
          --iterations 1500 --workdir "$W/$arm" $EXTRA \
          --out "$W/$arm.json" && break
      echo "ARM_${arm}_RETRY_$try"
      date
    done
    echo "ARM_${arm}_DONE"
    date
  done
  echo DEVICE_SCALE_DONE
} >> "$LOG" 2>&1
