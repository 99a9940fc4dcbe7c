#!/bin/bash
# Round-5 continuation: the orphaned enc_std train_perception (spawned by
# run_r5_nocrash.sh before its bash died) holds the flock until it exits.
# This chain then (1) retries the camroute trained_s4 seed that wedged in
# device init (tunnel claim), completing the 5+5 grid, (2) reassembles
# the camroute stats artifact, (3) runs the 3-seed NoCrash protocol with
# tiers (the encoder now exists), (4) assembles BENCH_r5_nocrash.json.
# Idempotent throughout.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
C=$W/camstats
S=$W/nocrash_r5
mkdir -p "$W" "$C" "$S"
exec 9>"$W/.lock"
flock 9 || exit 1
{
  date
  # ---- camroute 5+5: retry trained seed 4 ----
  ENC_CAM="$W/enc/net_epoch17.msgpack"
  if [ ! -f "$C/trained_s4.json" ] && [ -f "$ENC_CAM" ]; then
    timeout 3600 python scripts/run_device_scale.py \
        --iterations 750 --snap-every 125 --eval-members 6 \
        --camroute --seed 4 --encoder "$ENC_CAM" \
        --workdir "$C/trained_s4" --out "$C/trained_s4.json" \
        || echo RUN_trained_s4_FAILED_AGAIN
    echo RUN_trained_s4_DONE; date
  fi
  python scripts/assemble_cascade_stats.py --statsdir "$C" \
      --out BENCH_r4_camroute_stats.json || true
  python scripts/track_seed_results.py || true

  # ---- standard encoder (the first orphaned attempt wedged in device
  # init and was killed; idempotent retry here) ----
  ENC="$W/enc_std/net_epoch23.msgpack"
  if [ ! -f "$ENC" ]; then
    timeout 10800 python train_perception.py --data-dir /tmp/pdata \
        --epochs 24 --holdout --holdout-shards 4 --packed --cache \
        --balance --batch-size 48 --save-interval 24 \
        --work-dir "$W/enc_std"
    echo ENC_std_DONE; date
  fi
  # ---- NoCrash 3 seeds x tiers ----
  if [ ! -f "$ENC" ]; then
    echo ENC_std_MISSING_SKIP_NOCRASH
  else
    for SEED in 0 1 2; do
      OUT="$S/seed_$SEED.json"
      if [ ! -f "$OUT" ]; then
        timeout 5400 python scripts/run_nocrash_eval.py \
            --encoder "$ENC" --seed "$SEED" \
            --workdir "$S/run_s$SEED" --out "$OUT" \
            || echo "NOCRASH_s${SEED}_FAILED"
        echo "NOCRASH_s${SEED}_DONE"; date
        python scripts/assemble_nocrash_stats.py --statsdir "$S" \
            --out BENCH_r5_nocrash.json || true
        mkdir -p results/nocrash_r5
        for f in "$S"/seed_*.json; do
          python scripts/strip_nocrash_seed.py "$f" results/nocrash_r5 || true
        done
      fi
    done
  fi
  echo R5_CONTINUE_DONE; date
} >> "$W/r5_continue.log" 2>&1
