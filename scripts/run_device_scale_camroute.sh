#!/bin/bash
# Camera-route cascade at device scale: the decisive round-3 protocol
# (BENCH_r3_cascade_camroute.json — route geometry only reachable through
# the rendered camera) re-run at 9.6M env-steps/arm on the device-resident
# path. Pretrains the PRODUCTION camroute encoder (in_route_blank) on the
# expert dataset in /tmp/pdata (collect first:
#   python - <<EOF ... collect_dataset(SimDrivingEnv(...), OracleExpert(),
#   16000, "/tmp/pdata") EOF
# or train_perception.py --collect), then runs trained vs random arms.
# Blocks on the shared scale-experiment lock.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
mkdir -p "$W"
LOG="$W/driver_camroute.log"
exec 9>"$W/.lock"
flock 9 || exit 1
{
  date
  ENC_DIR="$W/enc"
  ENC="$ENC_DIR/net_epoch24.msgpack"
  if [ ! -f "$ENC" ]; then
    timeout 5400 python train_perception.py --data-dir /tmp/pdata \
        --epochs 25 --camroute --holdout --packed --cache --batch-size 48 \
        --save-interval 25 --work-dir "$ENC_DIR"
  fi
  [ -f "$ENC" ] || { echo "ENCODER_MISSING"; exit 1; }
  for arm in camroute_trained camroute_random; do
    if [ "$arm" = camroute_trained ]; then
      EXTRA="--encoder $ENC"
    else
      EXTRA=""
    fi
    for try in 1 2; do
      timeout 5400 python scripts/run_device_scale.py \
          --iterations 1500 --camroute $EXTRA --workdir "$W/$arm" \
          --out "$W/$arm.json" && break
      echo "ARM_${arm}_RETRY_$try"
      date
    done
    echo "ARM_${arm}_DONE"
    date
  done
  echo DEVICE_SCALE_CAMROUTE_DONE
} >> "$LOG" 2>&1
