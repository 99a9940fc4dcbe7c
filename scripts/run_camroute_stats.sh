#!/bin/bash
# VERDICT round-3 item #1 follow-up: multi-seed trained-vs-random encoder
# grid under the CAMERA-ROUTE protocol — the configuration where the
# encoder is provably load-bearing (single-seed gap +0.40 completion /
# +23.3 driving score at 9.6M steps, BENCH_r3_scale.json camroute_reeval;
# route raster blanked from the encoder input and dis/theta masked from
# the policy obs, so route geometry must be perceived from the camera's
# painted ribbon). 5 seeds x {trained, random}, 750 iterations x 32 envs
# x 200 steps = 4.8M env-steps/seed, 6-member snapshot ensembles,
# held-out on-device eval per run (eval.py protocol,
# eval_agent_config.py:51-57). Pre-registered primary metric: ensemble
# mean driving score (same registration as BENCH_r3_cascade_stats.json).
# Trained arm uses the SAME camroute-pretrained encoder as the round-3
# single-seed runs (/tmp/device_scale/enc/net_epoch17.msgpack) for
# comparability. Results append to /tmp/device_scale/camstats/; assemble
# with scripts/assemble_cascade_stats.py --statsdir ... Idempotent
# per-seed; re-launch to resume. Blocks on the shared scale lock.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
S=$W/camstats
mkdir -p "$S"
exec 9>"$W/.lock"
flock 9 || exit 1
ENC="$W/enc/net_epoch17.msgpack"
[ -f "$ENC" ] || { echo "ENCODER_MISSING $ENC"; exit 1; }
{
  date
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
      echo "RUN_${arm}_s${seed}_DONE"
      date
      python scripts/assemble_cascade_stats.py --statsdir "$S" \
          --out BENCH_r4_camroute_stats.json || true
    done
  done
  echo CAMROUTE_STATS_DONE
} >> "$S/driver.log" 2>&1
