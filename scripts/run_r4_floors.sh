#!/bin/bash
# Round-4 "class floors" phase (VERDICT r3 item 5 done-criterion: every
# light class and walker seg > 0.5 on holdout). Queued behind the main
# chain's flock: regenerate the dataset under the canvas-top light clamp
# (every labeled light frame keeps visible pixels), train the standard
# encoder for 30 epochs with sqrt-balanced epochs, and report per-class
# tables over a 4-shard (2k-frame) holdout.
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
  if [ ! -f /tmp/pdata2/shard_00031.npz ]; then
    timeout 3000 python train_perception.py --data-dir /tmp/pdata2 \
        --collect 16384 --epochs 0 --work-dir "$W/collect2" || true
  fi
  timeout 9000 python train_perception.py --data-dir /tmp/pdata2 \
      --epochs 30 --holdout --holdout-shards 4 --packed --cache --balance \
      --batch-size 48 --save-interval 30 --work-dir "$W/enc_floors"
  echo R4_FLOORS_DONE
  date
} >> "$W/floors.log" 2>&1
