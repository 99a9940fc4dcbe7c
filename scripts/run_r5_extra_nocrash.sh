#!/bin/bash
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
S=$W/nocrash_r5
exec 9>"$W/.lock"
flock 9 || exit 1
{
  date
  ENC="$W/enc_std/net_epoch23.msgpack"
  for SEED in 3 4; do
    OUT="$S/seed_$SEED.json"
    if [ ! -f "$OUT" ] && [ -f "$ENC" ]; then
      timeout 5400 python scripts/run_nocrash_eval.py \
          --encoder "$ENC" --seed "$SEED" \
          --workdir "$S/run_s$SEED" --out "$OUT" \
          || echo "NOCRASH_s${SEED}_FAILED"
      echo "NOCRASH_s${SEED}_DONE"; date
      python scripts/assemble_nocrash_stats.py --statsdir "$S" \
          --out BENCH_r5_nocrash.json || true
      for f in "$S"/seed_*.json; do
        python scripts/strip_nocrash_seed.py "$f" results/nocrash_r5 || true
      done
    fi
  done
  echo EXTRA_NOCRASH_DONE; date
} >> "$W/r5_extra.log" 2>&1
