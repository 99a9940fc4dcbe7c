#!/bin/bash
# Blind-route cascade, round 4: pretrain WITH the weighted pred_route_geom
# head (route_geom_weight=2e4; see the danet_config.py comment), then probe.
# The RL arm is launched separately after the probe gate (R^2_dis/theta of
# the geom latent must clear ~0.5 before spending an hour of TPU on RL).
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=${W:-/tmp/cascade_geomw}
DATA=${DATA:-/tmp/cascade_geom/data}   # 12k frames with dis/theta labels
mkdir -p "$W"
LOG="$W/driver.log"
{
  date
  if [ ! -f "$W/encoder.msgpack" ]; then
    python scripts/cascade_proof.py pretrain --route-geom \
        --work-dir "$W" --data-dir "$DATA" --epochs 20 || exit 1
  fi
  date
  echo PRETRAIN_DONE
  python scripts/latent_probe.py --route-geom --encoder "$W/encoder.msgpack" \
      --out "$W/latent_probe.json" --cache /tmp/probe_frames_cache.npz \
      || exit 1
  date
  echo PROBE_DONE
} >> "$LOG" 2>&1
