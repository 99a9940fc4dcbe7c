#!/bin/bash
# Throughput sweep of the device-resident training path over num_envs,
# queued behind the scale-experiment lock. Finds the chip's saturation
# point for the full cascade training iteration (BENCH_NOTES.md measured
# 5.9k steps/s at N=32 and 7.3k at N=128; this probes the N=256/512 tail)
# and refreshes BENCH numbers after the route-timeout graph change.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
mkdir -p "$W"
LOG="$W/driver_sweep.log"
exec 9>"$W/.lock"
flock 9 || exit 1
{
  date
  : > "$W/sweep.jsonl"
  for n in 32 64 128 256 512; do
    timeout 1200 python scripts/bench_device_env.py --num-envs "$n" \
        --arms train --out "$W/sweep.jsonl" || echo "SWEEP_N${n}_FAILED"
  done
  echo DEVICE_SWEEP_DONE
  date
} >> "$LOG" 2>&1
