#!/bin/bash
# POST-HOC extension of the camera-route grid from the pre-registered
# 5+5 to a FIXED 8+8 (declared before launch; results ship regardless of
# direction). Purpose: the 5+5 grid confirmed the completion gap but
# left the pre-registered primary (driving score, +4.28 +/- 6.36)
# unconfirmed; 3 more seeds per arm shrink the Welch CI ~25%. The
# artifact and README must label these seeds as extension, not part of
# the pre-registered grid.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
S=$W/camstats
exec 9>"$W/.lock"
flock 9 || exit 1
{
  date
  ENC="$W/enc/net_epoch17.msgpack"
  run_seed() {
    OUT="$S/$1_s$2.json"
    [ -f "$OUT" ] && return 0
    timeout 3600 python scripts/run_device_scale.py \
        --iterations 750 --snap-every 125 --eval-members 6 \
        --camroute --seed "$2" $3 \
        --workdir "$S/$1_s$2" --out "$OUT" \
        || echo "RUN_$1_s$2_FAILED"
    echo "RUN_$1_s$2_DONE"; date
    python scripts/assemble_cascade_stats.py --statsdir "$S" \
        --out BENCH_r4_camroute_stats.json || true
    python scripts/track_seed_results.py || true
  }
  # alternate arms so a mid-chain stop leaves balanced n
  run_seed trained 5 "--encoder $ENC"
  run_seed random 5 ""
  run_seed trained 6 "--encoder $ENC"
  run_seed random 6 ""
  run_seed trained 7 "--encoder $ENC"
  run_seed random 7 ""
  echo R5_CAMROUTE_EXT_DONE; date
} >> "$W/r5_camext.log" 2>&1
