#!/bin/bash
# Round-4 follow-up, one flock holder, ordered:
#   1. retry any camstats seed the main chain lost (trained_s2 wedged at
#      device init when a stale chip claim outlived its killed client;
#      idempotent [ -f OUT ] guards skip completed seeds)
#   2. re-assemble BENCH_r4_camroute_stats.json
#   3. NoCrash warm-start continuation -> BENCH_r4_nocrash_ext.json
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
  ENC="$W/enc/net_epoch17.msgpack"
  S=$W/camstats
  for seed in 0 1 2 3 4; do
    for arm in trained random; do
      if [ "$arm" = trained ]; then EXTRA="--encoder $ENC"; else EXTRA=""; fi
      OUT="$S/${arm}_s${seed}.json"
      [ -f "$OUT" ] && continue
      timeout 3600 python scripts/run_device_scale.py \
          --iterations 750 --snap-every 125 --eval-members 6 \
          --camroute --seed $seed $EXTRA \
          --workdir "$S/${arm}_s${seed}" --out "$OUT" \
          || echo "RETRY_${arm}_s${seed}_FAILED"
      echo "RETRY_${arm}_s${seed}_DONE"; date
    done
  done
  python scripts/assemble_cascade_stats.py --statsdir "$S" \
      --out BENCH_r4_camroute_stats.json || true

  timeout 10800 python scripts/run_nocrash_eval.py \
      --encoder "$W/enc_floors/net_epoch23.msgpack" \
      --iterations 1600 --warm-start \
      --workdir "$W/nocrash" --out BENCH_r4_nocrash_ext.json
  echo R4_FOLLOWUP_DONE; date
} >> "$W/followup.log" 2>&1
