#!/bin/bash
# NoCrash continuation: once the r4 chain releases the experiment flock,
# warm-start the NoCrash policy from its last snapshot and train 2x the
# base budget more (800 -> 2400 cumulative iterations, 15.36M cumulative
# env-steps), then re-run the full two-town ensemble eval.
# Rationale: BENCH_r3_scale showed the collision failure mode is
# budget-bound (0.73 -> 0.855 completion when warm-started to 2x steps);
# BENCH_r4_nocrash's failures are 95% collisions.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
mkdir -p "$W"
exec 9>"$W/.lock"
flock 9 || exit 1
{
  date
  timeout 10800 python scripts/run_nocrash_eval.py \
      --encoder "$W/enc_floors/net_epoch23.msgpack" \
      --iterations 1600 --warm-start \
      --workdir "$W/nocrash" --out BENCH_r4_nocrash_ext.json
  echo NOCRASH_EXT_DONE; date
} >> "$W/nocrash_ext.log" 2>&1
