#!/bin/bash
# Unattended device-env TPU measurement: waits for the cascade_dense auto
# driver to release the chip (CASCADE_DENSE_AUTO_DONE / GATE_FAILED /
# STAGE1_* in its auto.log, or its pid gone), then measures
#   1. env-core / env-render / full-train env-steps/s at N=32 and N=128
#   2. a 150-iteration N=32 learning run (random frozen production encoder)
# Results -> /tmp/device_bench/*.json(l); repo-side recording happens in the
# session (BENCH_NOTES.md + BENCH_r2_device_env.json).
set -x
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
W=/tmp/device_bench
mkdir -p "$W"
LOG="$W/driver.log"
exec 9>"$W/.lock"
flock -n 9 || { echo "ALREADY_RUNNING"; exit 0; }
{
  date
  for _ in $(seq 1 720); do   # up to 6 h
    if grep -qE "CASCADE_DENSE_AUTO_DONE|GATE_FAILED|STAGE1_(DIED|TIMEOUT)" \
        /tmp/cascade_dense/auto.log 2>/dev/null; then
      break
    fi
    if ! kill -0 "$(cat /tmp/cascade_dense_auto.pid 2>/dev/null)" \
        2>/dev/null; then
      break
    fi
    sleep 30
  done
  echo CHIP_FREE
  date
  timeout 580 python scripts/bench_device_env.py --num-envs 32 \
      --steps 200 --out "$W/bench32.jsonl" \
      || timeout 580 python scripts/bench_device_env.py --num-envs 32 \
      --steps 200 --out "$W/bench32.jsonl"
  date
  timeout 580 python scripts/bench_device_env.py --num-envs 128 \
      --steps 200 --arms train --out "$W/bench128.jsonl" || true
  date
  timeout 3000 python - <<'EOF'
import json, time
import jax
from cadre_tpu.configs.agent_config import RolloutConfig, TrainConfig
from cadre_tpu.envs.jax_env import (JaxDrivingEnv, JaxEnvConfig,
                                    make_route_bank)
from cadre_tpu.rl.agent import CadreAgent
from cadre_tpu.rl.device_rollout import train_device

agent = CadreAgent.create(jax.random.PRNGKey(0), bf16_encoder=True)
env = JaxDrivingEnv(make_route_bank(16, seed=0), num_envs=32,
                    config=JaxEnvConfig())
t0 = time.time()
_, rows = train_device(agent, env, iterations=150,
                       rollout_cfg=RolloutConfig(num_steps=200),
                       train_cfg=TrainConfig())
with open("/tmp/device_bench/learning.json", "w") as f:
    json.dump({"wall_s": round(time.time() - t0, 1), "rows": rows}, f)
print("LEARNING_DONE", rows[-1])
EOF
  date
  echo DEVICE_BENCH_DONE
} >> "$LOG" 2>&1
