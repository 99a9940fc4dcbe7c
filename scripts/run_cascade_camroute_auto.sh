#!/bin/bash
# Unattended stage-1 -> gate -> stage-2 driver for the camera-route cascade.
# Waits for scripts/run_cascade_camroute.sh (stage 1) to produce
# $W/latent_probe.json, applies the probe gate (trained camera-only latents
# must decode route distance far better than a random encoder's), and only
# then spends the TPU hours on the RL arms (scripts/run_cascade_camroute_rl.sh).
# Gate: r2_dis(trained) >= 0.30 AND r2_dis(trained) - r2_dis(random) >= 0.20.
# On gate failure it writes GATE_FAILED and exits so the result can still be
# collected as a diagnosed negative.
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
cd /root/repo
W=${W:-/tmp/cascade_camroute}
LOG="$W/auto.log"
mkdir -p "$W"
# Single-instance guard: a second launch (session handoff, retry) must not
# double-run the TPU stages or interleave writes into the same work dir.
exec 9>"$W/.auto.lock"
flock -n 9 || { echo "ALREADY_RUNNING (holder has $W/.auto.lock)"; exit 0; }
{
  date
  # Stage 1 is expected to already be running (pidfile /tmp/camroute.pid);
  # if it is not and the probe artifact is absent, run it ourselves.
  if [ ! -f "$W/latent_probe.json" ]; then
    if ! kill -0 "$(cat /tmp/camroute.pid 2>/dev/null)" 2>/dev/null; then
      bash scripts/run_cascade_camroute.sh || exit 1
    fi
  fi
  for _ in $(seq 1 480); do   # up to 4 h
    [ -f "$W/latent_probe.json" ] && break
    if ! kill -0 "$(cat /tmp/camroute.pid 2>/dev/null)" 2>/dev/null; then
      # stage-1 process died; if no probe artifact it failed
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
    PASS*) bash scripts/run_cascade_camroute_rl.sh ;;
    *) echo GATE_FAILED; exit 1 ;;
  esac
  date
  # Assemble the artifact into the repo so the end-of-round auto-commit
  # captures it even if no session is attached when the arms finish.
  python scripts/cascade_artifacts.py --blind --camera-route \
      --work-dir "$W" --out /root/repo/BENCH_r3_cascade_camroute.json
  echo CAMROUTE_AUTO_DONE
} >> "$LOG" 2>&1
