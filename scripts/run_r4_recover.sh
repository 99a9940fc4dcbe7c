#!/bin/bash
# Round-4 recovery chain after the machine wipe took /tmp (dataset,
# encoders, and the in-flight camstats seeds). Two halves:
#   collect: host-only (JAX_PLATFORMS=cpu) expert re-collection into
#     /tmp/pdata — deterministic given seed 0 and the in-code
#     SimDrivingEnv collection settings, so the retrained camroute
#     encoder matches the one used by camstats trained seeds 0/1 up to
#     accelerator nondeterminism (noted in the artifact).
#   chip: under the shared flock — missing random camstats seeds first
#     (no encoder dependency), then the camroute encoder retrain once
#     the dataset lands, then the missing trained seeds; the artifact
#     reassembles after every run so partial progress still ships.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
S=$W/camstats
mkdir -p "$W" "$S"

if [ "$1" = collect ]; then
  {
    date
    if [ ! -f /tmp/pdata/shard_00031.npz ]; then
      JAX_PLATFORMS=cpu timeout 5000 python train_perception.py \
          --data-dir /tmp/pdata --collect 16384 --epochs 0 \
          --work-dir "$W/collect" \
          || { echo COLLECT_FAILED; touch "$W/COLLECT_FAILED"; }
    fi
    echo COLLECT_DONE; date
  } >> "$W/recover_collect.log" 2>&1
  exit 0
fi

exec 9>"$W/.lock"
flock 9 || exit 1
{
  date
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
  run_seed random 3 ""
  run_seed random 4 ""
  # wait for the host-side collection to land the last shard; a failed
  # collection writes a sentinel so the chip half doesn't sleep the full
  # 100 minutes for a shard that will never arrive (ADVICE r4)
  for i in $(seq 1 200); do
    [ -f /tmp/pdata/shard_00031.npz ] && break
    [ -f "$W/COLLECT_FAILED" ] && { echo COLLECT_FAILED_SENTINEL_SEEN; break; }
    sleep 30
  done
  ENC="$W/enc/net_epoch17.msgpack"
  if [ ! -f "$ENC" ] && [ -f /tmp/pdata/shard_00031.npz ]; then
    timeout 7200 python train_perception.py --data-dir /tmp/pdata \
        --epochs 18 --camroute --holdout --packed --cache --balance \
        --batch-size 48 --save-interval 18 --work-dir "$W/enc"
    echo ENC_camroute_DONE; date
  fi
  if [ -f "$ENC" ]; then
    run_seed trained 2 "--encoder $ENC"
    run_seed trained 3 "--encoder $ENC"
    run_seed trained 4 "--encoder $ENC"
  else
    echo ENCODER_MISSING_SKIP_TRAINED
  fi
  echo R4_RECOVER_DONE; date
} >> "$W/recover_chip.log" 2>&1
