#!/bin/bash
# Unattended stage-1 -> gate -> stage-2 driver for the junction-dense
# camera-route cascade. Mirrors run_cascade_camroute_auto.sh: waits for
# stage 1 ($W/latent_probe.json), applies the probe gate (trained
# camera-only latents must decode route distance far better than a random
# encoder's), and only then spends the TPU hours on the RL arms.
# Gate: r2_dis(trained) >= 0.30 AND r2_dis(trained) - r2_dis(random) >= 0.20.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
cd /root/repo
W=${W:-/tmp/cascade_dense}
LOG="$W/auto.log"
mkdir -p "$W"
exec 9>"$W/.auto.lock"
flock -n 9 || { echo "ALREADY_RUNNING (holder has $W/.auto.lock)"; exit 0; }
{
  date
  if [ ! -f "$W/latent_probe.json" ]; then
    if ! kill -0 "$(cat /tmp/cascade_dense.pid 2>/dev/null)" 2>/dev/null; then
      bash scripts/run_cascade_dense.sh || exit 1
    fi
  fi
  for _ in $(seq 1 480); do   # up to 4 h
    [ -f "$W/latent_probe.json" ] && break
    if ! kill -0 "$(cat /tmp/cascade_dense.pid 2>/dev/null)" 2>/dev/null; then
      sleep 5
      [ -f "$W/latent_probe.json" ] && break
      echo STAGE1_DIED; exit 1
    fi
    sleep 30
  done
  [ -f "$W/latent_probe.json" ] || { echo STAGE1_TIMEOUT; exit 1; }
  GATE=$(python - "$W/latent_probe.json" <<'EOF'
import json, sys
t = json.load(open(sys.argv[1]))["targets"]
tr, rnd = t["trained"]["r2_dis"], t["random"]["r2_dis"]
print("PASS" if tr >= 0.30 and tr - rnd >= 0.20 else "FAIL", tr, rnd)
EOF
  )
  echo "GATE: $GATE"
  case "$GATE" in
    PASS*) bash scripts/run_cascade_dense_rl.sh ;;
    *) echo GATE_FAILED; exit 1 ;;
  esac
  date
  # Assemble the artifact into the repo so the end-of-round auto-commit
  # captures it even if no session is attached when the arms finish.
  python scripts/cascade_artifacts.py --blind --camera-route \
      --route-note "junction-dense routes: 6 legs of 25-45 m (a corner every ~35 m) vs the camroute run's 3 legs of 40-90 m" \
      --work-dir "$W" --out /root/repo/BENCH_r3_cascade_dense.json
  echo CASCADE_DENSE_AUTO_DONE
} >> "$LOG" 2>&1
