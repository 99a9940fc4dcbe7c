#!/bin/bash
# Round-5 NoCrash chain (VERDICT r4 item 4): standard encoder -> 3
# training seeds -> per-seed eval over the NoCrash empty/regular/dense
# tiers on Town01 + held-out Town02 -> assembled multi-seed artifact
# with Student-t CIs. Idempotent per step; reassembles after every seed
# so whatever lands before the round ends still ships. Runs under the
# device-scale flock (one chip; see scripts/ROUND_END_CHECKLIST.md —
# this chain must FINISH before the driver's bench window).
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_scale
S=$W/nocrash_r5
mkdir -p "$W" "$S"
exec 9>"$W/.lock"
flock 9 || exit 1
{
  date
  # Standard (non-camroute) encoder, the r4 floors recipe on the
  # regenerated balanced dataset: 24 epochs (r4's NoCrash snapshot was
  # net_epoch23 of the floors train), sqrt-balanced, holdout tables.
  ENC="$W/enc_std/net_epoch23.msgpack"
  if [ ! -f "$ENC" ]; then
    timeout 10800 python train_perception.py --data-dir /tmp/pdata \
        --epochs 24 --holdout --holdout-shards 4 --packed --cache \
        --balance --batch-size 48 --save-interval 24 \
        --work-dir "$W/enc_std"
    echo ENC_std_DONE; date
  fi
  if [ ! -f "$ENC" ]; then
    echo ENC_std_MISSING_ABORT
    exit 1
  fi
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
        python - "$f" <<'EOF'
import json, os, sys
doc = json.load(open(sys.argv[1]))
# track an eval-only mirror (strip bulky train + episode rows)
for town in doc.get("eval", {}).values():
    for tier in town.values():
        if isinstance(tier, dict):
            tier.pop("rows", None)
doc.get("train", {}).pop("rows", None)
out = os.path.join("results/nocrash_r5", os.path.basename(sys.argv[1]))
json.dump(doc, open(out, "w"), indent=1)
print("tracked", out)
EOF
      done
    fi
  done
  echo R5_NOCRASH_DONE; date
} >> "$W/nocrash_r5.log" 2>&1
