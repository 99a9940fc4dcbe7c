"""Measure on-device PPO env-steps/s (BASELINE north star: >=5k aggregate).

Three arms, each chained inside jits so the remote-TPU tunnel's ~30 ms
dispatch cost is amortized (see BENCH_NOTES.md timing rules):
  1. env-core: JaxDrivingEnv.step without rendering (dynamics+reward only)
  2. env-full: with the synthetic camera + route-figure rasterizer
  3. train: the FULL cascade training iteration (render -> frozen DANet
     encoder -> per-command policies -> env -> GAE -> PPO epochs) via
     rl/device_rollout.make_device_iteration — the number comparable to the
     reference's aggregate worker env-steps/s (ppo_agent/train.py:53-110).

Usage: python scripts/bench_device_env.py [--num-envs 32] [--steps 200]
Writes one JSON line per arm; pass --out to append to a file.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def bench_env_only(num_envs: int, steps: int, render: bool, repeats: int = 3):
    from cadre_tpu.envs.jax_env import (
        JaxDrivingEnv,
        JaxEnvConfig,
        _step_one,
        make_route_bank,
    )

    bank = make_route_bank(16, seed=0)
    cfg = JaxEnvConfig(render=render)
    env = JaxDrivingEnv(bank, num_envs=num_envs, config=cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))

    def body(st, key):
        steer = jax.random.uniform(key, (num_envs,), minval=-0.2,
                                   maxval=0.2)
        controls = jnp.stack(
            [steer, jnp.full((num_envs,), 0.5), jnp.zeros(num_envs)],
            axis=-1)
        st, out = jax.vmap(lambda s, c: _step_one(cfg, bank, s, c))(
            st, controls)
        return st, out.rewards.sum()

    @jax.jit
    def chain(st, key):
        keys = jax.random.split(key, steps)
        st, sums = jax.lax.scan(body, st, keys)
        return st, sums.sum()

    state, s = chain(state, jax.random.PRNGKey(1))
    float(s)                                       # compile + sync
    samples = []
    for i in range(repeats):
        t0 = time.perf_counter()
        state, s = chain(state, jax.random.PRNGKey(2 + i))
        float(s)
        samples.append(time.perf_counter() - t0)
    dt = sorted(samples)[len(samples) // 2]
    return num_envs * steps / dt


def bench_train(num_envs: int, steps: int, repeats: int = 3,
                encoder: str | None = None):
    from cadre_tpu.configs.agent_config import RolloutConfig, TrainConfig
    from cadre_tpu.envs.jax_env import (
        JaxDrivingEnv,
        JaxEnvConfig,
        make_route_bank,
    )
    from cadre_tpu.rl.agent import CadreAgent
    from cadre_tpu.rl.device_rollout import make_device_iteration
    from cadre_tpu.rl.ppo import make_optimizer

    danet_vars = None
    if encoder:
        from cadre_tpu.configs.danet_config import danet_params
        from cadre_tpu.utils.checkpoint import load_danet_checkpoint

        danet_vars = load_danet_checkpoint(encoder, danet_params())
    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_vars=danet_vars,
                              bf16_encoder=True)
    bank = make_route_bank(16, seed=0)
    env = JaxDrivingEnv(bank, num_envs=num_envs, config=JaxEnvConfig())
    rollout_cfg = RolloutConfig(num_steps=steps)
    iteration, init_carry = make_device_iteration(agent, env, rollout_cfg,
                                                  TrainConfig())
    jit_it = jax.jit(iteration)
    opt_state = make_optimizer(agent.ppo_cfg).init(agent.params)
    carry = init_carry(agent.danet_vars, jax.random.PRNGKey(1))
    params = agent.params
    rng = jax.random.PRNGKey(2)

    rng, k = jax.random.split(rng)
    params, opt_state, carry, m = jit_it(params, agent.danet_vars,
                                         opt_state, carry, k)
    float(m.checksum)                              # compile + sync
    samples = []
    for _ in range(repeats):
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        params, opt_state, carry, m = jit_it(params, agent.danet_vars,
                                             opt_state, carry, k)
        float(m.checksum)
        samples.append(time.perf_counter() - t0)
    dt = sorted(samples)[len(samples) // 2]
    return num_envs * steps / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--arms", default="core,full,train")
    p.add_argument("--encoder", default=None,
                   help="optional msgpack encoder checkpoint for the train "
                        "arm")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    rows = []
    arms = args.arms.split(",")
    if "core" in arms:
        fps = bench_env_only(args.num_envs, args.steps, render=False)
        rows.append({"metric": "jax_env_core_steps_per_sec", "value":
                     round(fps, 1), "num_envs": args.num_envs})
    if "full" in arms:
        fps = bench_env_only(args.num_envs, args.steps, render=True)
        rows.append({"metric": "jax_env_render_steps_per_sec", "value":
                     round(fps, 1), "num_envs": args.num_envs})
    if "train" in arms:
        fps = bench_train(args.num_envs, args.steps, encoder=args.encoder)
        rows.append({"metric": "device_train_env_steps_per_sec", "value":
                     round(fps, 1), "num_envs": args.num_envs,
                     "steps_per_iter": args.steps,
                     "backend": jax.default_backend()})
    for r in rows:
        r["backend"] = jax.default_backend()
        print(json.dumps(r))
    if args.out:
        with open(args.out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
