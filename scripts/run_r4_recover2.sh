#!/bin/bash
# Recovery chain v2 (reordered mid-session): with random at n=4 and
# trained at n=2, the gap CI is bottlenecked by TRAINED seeds — so train
# the camroute encoder immediately and run trained seeds before the last
# random seed. Idempotent per-seed; the artifact reassembles after every
# run so whatever lands before the round ends still ships.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
S=$W/camstats
mkdir -p "$W" "$S"
exec 9>"$W/.lock"
flock 9 || exit 1
{
  date
  ENC="$W/enc/net_epoch17.msgpack"
  if [ ! -f "$ENC" ]; then
    timeout 7200 python train_perception.py --data-dir /tmp/pdata \
        --epochs 18 --camroute --holdout --packed --cache --balance \
        --batch-size 48 --save-interval 18 --work-dir "$W/enc"
    echo ENC_camroute_DONE; date
  fi
  run_seed() {  # $1=arm $2=seed $3=extra
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
  }
  if [ -f "$ENC" ]; then
    run_seed trained 2 "--encoder $ENC"
    run_seed trained 3 "--encoder $ENC"
  else
    echo ENCODER_MISSING_SKIP_TRAINED
  fi
  run_seed random 4 ""
  if [ -f "$ENC" ]; then
    run_seed trained 4 "--encoder $ENC"
  fi
  echo R4_RECOVER2_DONE; date
} >> "$W/recover2.log" 2>&1
