#!/bin/bash
# VERDICT round-2 item #2: make the cascade claim survive statistics.
# 5 seeds x {trained, random} encoder arms on the device-resident path
# under the standard moving-traffic protocol (the round-3 configuration
# that broke the corner floor), 120 iterations x 32 envs x 200 steps
# = 768k env-steps per seed, 6-member snapshot ensembles, held-out
# on-device eval per run (eval.py protocol, eval_agent_config.py:51-57).
# Pre-registered primary metric: ensemble mean driving score.
# Results append to /tmp/device_scale/stats/ as they land.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
S=$W/stats
mkdir -p "$S"
exec 9>"$W/.lock"
flock 9 || exit 1
ENC="$W/enc_std_bal/net_epoch24.msgpack"
[ -f "$ENC" ] || { echo "ENCODER_MISSING $ENC"; exit 1; }
{
  date
  for seed in 0 1 2 3 4; do
    for arm in random trained; do
      if [ "$arm" = trained ]; then EXTRA="--encoder $ENC"; else EXTRA=""; fi
      OUT="$S/${arm}_s${seed}.json"
      [ -f "$OUT" ] && continue
      timeout 3000 python scripts/run_device_scale.py \
          --iterations 120 --snap-every 20 --seed $seed $EXTRA \
          --workdir "$S/${arm}_s${seed}" --out "$OUT" \
          || echo "RUN_${arm}_s${seed}_FAILED"
      echo "RUN_${arm}_s${seed}_DONE"
      date
    done
  done
  echo CASCADE_STATS_DONE
} >> "$S/driver.log" 2>&1
