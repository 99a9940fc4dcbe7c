#!/bin/bash
# Blind-route cascade, round 3: pretrain the CoPM encoder WITH the
# pred_route_geom auxiliary head (dis/theta supervision on the PPO latent;
# see DANetParams.pred_route_geom), then re-run the blind-route trained arm.
#
# Motivation: BENCH_r2_latent_probe.json showed the stock CoPM objective
# leaves route geometry linearly undecodable from z (R^2 ~ 0) while the
# route-fig input carries it (R^2 > 0.93) — so the frozen trained encoder
# could not beat a random one even blind (BENCH_r2_cascade_blind.json).
# The random blind arm from /tmp/cascade_blind is reused for comparison:
# the geom head is dormant in latent(), so a random-init geom encoder is
# distributionally identical to the round-2 random arm (same seeds/config).
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=${W:-/tmp/cascade_geom}
ITERS=${ITERS:-120}
mkdir -p "$W"
LOG="$W/driver.log"
{
  date
  # 1. dataset WITH dis/theta labels (old shards predate the fields)
  if [ -z "$(ls "$W/data" 2>/dev/null)" ]; then
    JAX_PLATFORMS=cpu python scripts/cascade_proof.py collect \
        --work-dir "$W" --data-dir "$W/data" --frames 12000 || exit 1
  fi
  date
  # 2. pretrain with the aux head; holdout now reports geom R^2
  if [ ! -f "$W/encoder.msgpack" ]; then
    python scripts/cascade_proof.py pretrain --route-geom \
        --work-dir "$W" --data-dir "$W/data" --epochs 20 || exit 1
  fi
  date
  echo PRETRAIN_DONE
  # 3. latent probe on the geom encoder (cached probe frames reused)
  python scripts/latent_probe.py --route-geom --encoder "$W/encoder.msgpack" \
      --out "$W/latent_probe.json" || exit 1
  date
  echo PROBE_DONE
  # 4. blind-route RL arm with the geom encoder + ensemble eval
  python scripts/cascade_proof.py rl --arm trained --blind-route \
      --route-geom --work-dir "$W" --encoder "$W/encoder.msgpack" \
      --iterations "$ITERS" || exit 1
  date
  python scripts/cascade_proof.py eval --arm trained --blind-route \
      --route-geom --work-dir "$W" --encoder "$W/encoder.msgpack" || exit 1
  date
  echo CASCADE_GEOM_DONE
} >> "$LOG" 2>&1
