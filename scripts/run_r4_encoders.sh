#!/bin/bash
# Round-4 encoder retrain (the /tmp artifacts were wiped with the machine):
# camroute encoder for the camroute stats grid + standard encoder for the
# NoCrash-protocol runs, both with the class-floor fixes (balanced epoch
# resampling + light-wait collection exemption + doubled walkers; VERDICT
# r3 item 5). Holdout per-class tables print at the end of each run.
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
  for mode in camroute std; do
    if [ "$mode" = camroute ]; then DIR="$W/enc"; EXTRA="--camroute"; else DIR="$W/enc_std_bal"; EXTRA=""; fi
    [ -f "$DIR/net_epoch17.msgpack" ] && continue
    timeout 7200 python train_perception.py --data-dir /tmp/pdata \
        --epochs 18 $EXTRA --holdout --packed --cache --balance \
        --batch-size 48 --save-interval 18 --work-dir "$DIR"
    echo "ENC_${mode}_DONE"
    date
  done
  echo R4_ENCODERS_DONE
} >> "$W/enc_driver.log" 2>&1
