#!/bin/bash
# Round-3 follow-up batch on the device-scale experiment:
#  1. Re-run the camroute arms' held-out evals under current code — the
#     original evals terminated episodes on overspeed, a TRAINING-only
#     rule (env_wrapper.py:435-441), which cut 223/242 camroute_trained
#     episodes short and distorted the trained-vs-random comparison.
#     Training sections are kept verbatim via --prev.
#  2. Continue the winner arm (standard_traffic: 0.73 eval completion,
#     failures now collisions, curve still climbing 0.49->0.79 across
#     thirds) for 1500 MORE iterations (+9.6M env-steps, warm-started
#     from snap_01500) to probe whether more budget buys collision
#     avoidance. Same held-out eval bank (seed 0 + 1000).
#  3. Re-assemble BENCH_r3_scale.json.
# Blocks on the shared scale-experiment lock.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
exec 9>"$W/.lock"
flock 9 || exit 1
{
  date
  ENC="$W/enc/net_epoch24.msgpack"
  for arm in camroute_trained camroute_random; do
    if [ "$arm" = camroute_trained ]; then EXTRA="--encoder $ENC"; else EXTRA=""; fi
    [ -f "$W/$arm.reeval_done" ] && continue
    timeout 3600 python scripts/run_device_scale.py \
        --eval-only --camroute $EXTRA --workdir "$W/$arm" \
        --prev "$W/$arm.json" --out "$W/$arm.json" \
        && touch "$W/$arm.reeval_done"
    echo "REEVAL_${arm}_DONE"
    date
  done
  if [ ! -f "$W/standard_traffic_ext.json" ]; then
    timeout 5400 python scripts/run_device_scale.py \
        --resume --iterations 1500 --workdir "$W/standard_traffic" \
        --out "$W/standard_traffic_ext.json"
    echo "EXT_DONE"
    date
  fi
  python scripts/assemble_scale_artifact.py --out BENCH_r3_scale.json
  echo SCALE_FOLLOWUP_DONE
} >> "$W/driver_followup.log" 2>&1
