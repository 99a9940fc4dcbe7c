#!/bin/bash
# Round-4 experiment chain, one flock holder so ordering is deterministic:
#   1. std encoder under the FLOORS protocol (VERDICT r3 item 5): boosted
#      light-state CE (w=300 vs the reference's 0.1 — at 0.1 the latent-z
#      bottleneck provably never learns light hue; see losses.py) +
#      walker seg-class boost, 4-shard holdout tables
#   2. NoCrash eval protocol (VERDICT r3 item 3) -> BENCH_r4_nocrash.json
#   3. camroute trained-vs-random stats grid (VERDICT r3 item 1 follow-up)
#      -> BENCH_r4_camroute_stats.json (assembled incrementally per run)
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
  # ---- floors-protocol std encoder (also the NoCrash ensemble encoder) ----
  DIR="$W/enc_floors"
  if [ ! -f "$DIR/net_epoch23.msgpack" ]; then
    timeout 7200 python train_perception.py --data-dir /tmp/pdata \
        --epochs 24 --holdout --holdout-shards 4 --packed --cache --balance \
        --light-weight 300 --seg-boost 3:4 \
        --batch-size 48 --save-interval 24 --work-dir "$DIR"
    echo ENC_floors_DONE; date
  fi

  # ---- NoCrash protocol (train on Town01 train XMLs, ensemble eval on
  # the reference Town01/Town02 eval XMLs over the town grids) ----
  if [ ! -f BENCH_r4_nocrash.json ]; then
    timeout 5400 python scripts/run_nocrash_eval.py \
        --encoder "$DIR/net_epoch23.msgpack" \
        --workdir "$W/nocrash" --out BENCH_r4_nocrash.json \
      || timeout 3600 python scripts/run_nocrash_eval.py \
        --encoder "$DIR/net_epoch23.msgpack" \
        --workdir "$W/nocrash" --out BENCH_r4_nocrash.json --eval-only
    echo NOCRASH_DONE; date
  fi

  # ---- camroute stats grid (5 seeds x trained/random, idempotent) ----
  ENC="$W/enc/net_epoch17.msgpack"
  S=$W/camstats
  mkdir -p "$S"
  for seed in 0 1 2 3 4; do
    for arm in trained random; do
      if [ "$arm" = trained ]; then EXTRA="--encoder $ENC"; else EXTRA=""; fi
      OUT="$S/${arm}_s${seed}.json"
      [ -f "$OUT" ] && continue
      timeout 3600 python scripts/run_device_scale.py \
          --iterations 750 --snap-every 125 --eval-members 6 \
          --camroute --seed $seed $EXTRA \
          --workdir "$S/${arm}_s${seed}" --out "$OUT" \
          || echo "RUN_${arm}_s${seed}_FAILED"
      echo "RUN_${arm}_s${seed}_DONE"; date
      python scripts/assemble_cascade_stats.py --statsdir "$S" \
          --out BENCH_r4_camroute_stats.json || true
    done
  done
  echo R4_CHAIN_DONE
} >> "$W/chain.log" 2>&1
