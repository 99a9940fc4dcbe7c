#!/bin/bash
# Round-3 cascade experiment: CAMERA-ROUTE. The route-raster input plane is
# blanked everywhere (DANetParams.in_route_blank) so route geometry must be
# PERCEIVED from the camera's painted ribbon; combined with --blind-route
# the policy has no privileged channel either. Motivation: the round-2
# ladder (BENCH_r2_cascade_geom.json) proved any full-rank projection of the
# clean raster suffices, so trained-vs-random was insensitive to encoder
# quality. Here a random encoder must do perspective-inverse geometry from
# pixels under randomized weather — the probe gate (trained R^2_dis >>
# random R^2_dis on camera-only latents) decides whether the RL arms are
# worth the TPU hours.
#
# Stage 1 (this script): pretrain (stock objective + weighted geom head,
# camera-route input) -> latent probe gate.
# Stage 2 (run after the gate passes): for ARM in trained random:
#   python scripts/cascade_proof.py rl   --arm $ARM --blind-route \
#       --camera-route --route-geom --work-dir $W --encoder $W/encoder.msgpack
#   python scripts/cascade_proof.py eval --arm $ARM --blind-route \
#       --camera-route --route-geom --work-dir $W --encoder $W/encoder.msgpack
# Collect: scripts/cascade_artifacts.py --geom --work-dir $W \
#       --out BENCH_r3_cascade_camroute.json
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=${W:-/tmp/cascade_camroute}
DATA=${DATA:-/tmp/cascade_geom/data}   # 12k frames with dis/theta labels
mkdir -p "$W"
LOG="$W/driver.log"
{
  date
  if [ ! -d "$DATA" ]; then
    python scripts/cascade_proof.py collect --data-dir "$DATA" \
        --frames 12000 || exit 1
    echo COLLECT_DONE
  fi
  if [ ! -f "$W/encoder.msgpack" ]; then
    python scripts/cascade_proof.py pretrain --route-geom --camera-route \
        --work-dir "$W" --data-dir "$DATA" --epochs 20 || exit 1
  fi
  date
  echo PRETRAIN_DONE
  python scripts/latent_probe.py --route-geom --camera-route \
      --encoder "$W/encoder.msgpack" \
      --out "$W/latent_probe.json" --cache /tmp/probe_frames_cache.npz \
      || exit 1
  date
  echo PROBE_DONE
} >> "$LOG" 2>&1
