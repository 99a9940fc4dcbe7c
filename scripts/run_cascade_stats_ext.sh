#!/bin/bash
# Extend the multi-seed cascade-stats runs (BENCH_r3_cascade_stats.json,
# 120 iterations = 768k env-steps/seed) to 500 iterations (~3.2M
# env-steps/seed) by warm-starting each seed from its newest snapshot
# (scripts/run_device_scale.py --resume). Question: does the
# pre-registered primary metric (ensemble driving score), which TIES at
# 768k steps because the trained arm's extra distance costs collision
# penalties, separate once both arms get budget to learn collision
# avoidance? Same held-out eval bank per seed (seed+1000), 6-member
# ensembles as before. Results -> /tmp/device_scale/stats500/,
# assembled into BENCH_r3_cascade_stats_ext.json.
# Blocks on the shared scale-experiment lock.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
S=$W/stats
S2=$W/stats500
mkdir -p "$S2"
exec 9>"$W/.lock"
flock 9 || exit 1
ENC="$W/enc_std_bal/net_epoch24.msgpack"
[ -f "$ENC" ] || { echo "ENCODER_MISSING $ENC"; exit 1; }
{
  date
  for seed in 0 1 2 3 4; do
    for arm in random trained; do
      if [ "$arm" = trained ]; then EXTRA="--encoder $ENC"; else EXTRA=""; fi
      OUT="$S2/${arm}_s${seed}.json"
      [ -f "$OUT" ] && continue
      [ -d "$S/${arm}_s${seed}" ] || { echo "MISSING_WORKDIR ${arm}_s${seed}"; continue; }
      timeout 3000 python scripts/run_device_scale.py \
          --resume --iterations 380 --snap-every 20 --eval-members 6 \
          --seed $seed $EXTRA \
          --workdir "$S/${arm}_s${seed}" --out "$OUT" \
          || echo "RUN_${arm}_s${seed}_FAILED"
      echo "RUN_${arm}_s${seed}_DONE"
      date
    done
    # assemble incrementally so partial grids are still reportable
    python scripts/assemble_cascade_stats.py --statsdir "$S2" \
        --out BENCH_r3_cascade_stats_ext.json || true
  done
  echo CASCADE_STATS_EXT_DONE
} >> "$S2/driver.log" 2>&1
