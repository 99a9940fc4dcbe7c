#!/bin/bash
# Round-4 resume wrapper: /tmp was wiped with the machine, so rebuild the
# perception dataset first (now collected under the committed canvas-top
# light clamp, so every labeled light frame keeps visible pixels), then
# hand off to the main round-4 chain (encoders -> NoCrash protocol ->
# camroute stats grid). Idempotent: skips collection when the last shard
# already exists.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
mkdir -p "$W"
{
  exec 9>"$W/.lock"
  flock 9 || exit 1
  date
  if [ ! -f /tmp/pdata/shard_00031.npz ]; then
    timeout 4500 python train_perception.py --data-dir /tmp/pdata \
        --collect 16384 --epochs 0 --work-dir "$W/collect" || true
    echo COLLECT_DONE; date
  fi
  flock -u 9
} >> "$W/resume.log" 2>&1
exec bash scripts/run_r4_chain.sh
