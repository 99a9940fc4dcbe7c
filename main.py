"""Training entry point (the reference's `python main.py`).

Single-host trainer against the built-in kinematic simulator (or a CARLA
server when `--env carla` and a server is reachable). The reference's
chief + N-worker shared-memory scheme (main.py:25-72) is replaced by the
jitted (optionally mesh-distributed) PPO update; env workers are in-process.
"""
from __future__ import annotations

import argparse
import datetime
import os

import jax


def parse_args():
    p = argparse.ArgumentParser(description="Train CADRE-TPU")
    p.add_argument("--config", default=None,
                   help="config_files/*.py experiment (Config.fromfile)")
    p.add_argument("--env", default="sim", choices=["sim", "fake", "carla"])
    p.add_argument("--episodes", type=int, default=3000)
    p.add_argument("--num-steps", type=int, default=200)
    p.add_argument("--seq-length", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--routes", default=None,
                   help="route XML (defaults to synthetic routes)")
    p.add_argument("--scenarios", default=None)
    p.add_argument("--work-dir", default=None)
    p.add_argument("--danet-checkpoint", default=None,
                   help=".pt (torch) or .msgpack perception checkpoint")
    p.add_argument("--vehicles", type=int, default=0)
    p.add_argument("--walkers", type=int, default=0)
    p.add_argument("--small", action="store_true",
                   help="small encoder (fast CPU smoke runs)")
    p.add_argument("--carla-host", default="localhost")
    p.add_argument("--carla-port", type=int, default=8010)
    p.add_argument("--town", default="Town01")
    return p.parse_args()


def build_env(args, work_dir):
    if args.env == "fake":
        from cadre_tpu.envs.fake_env import FakeDrivingEnv

        return FakeDrivingEnv(episode_length=args.num_steps,
                              seq_length=args.seq_length)
    if args.env == "carla":
        from cadre_tpu.envs.carla_env import CarlaDrivingEnv

        return CarlaDrivingEnv(
            host=args.carla_host, port=args.carla_port, town=args.town,
            routes_file=args.routes, scenario_file=args.scenarios,
            vehicle_num=(args.vehicles, args.walkers),
            seq_length=args.seq_length, work_dir=work_dir)
    from cadre_tpu.envs.sim_env import SimDrivingEnv

    return SimDrivingEnv(
        routes_file=args.routes, scenario_file=args.scenarios,
        vehicle_num=(args.vehicles, args.walkers), seed=args.seed,
        seq_length=args.seq_length, work_dir=work_dir)


def main():
    args = parse_args()
    from cadre_tpu.configs.agent_config import RolloutConfig, TrainConfig
    from cadre_tpu.configs.danet_config import danet_params
    from cadre_tpu.rl.agent import CadreAgent
    from cadre_tpu.rl.train import train
    from cadre_tpu.utils.logger import setup_logger

    work_dir = args.work_dir or os.path.join(
        "result", datetime.datetime.now().strftime("%Y-%m-%d"),
        datetime.datetime.now().strftime("%H-%M-%S"))
    setup_logger(work_dir, rank=0)

    danet_cfg = danet_params() if not args.small else danet_params(
        da_feature_channel=64, inter_att_dims=48, z_dims=32)
    danet_vars = None
    if args.danet_checkpoint:
        from cadre_tpu.utils.checkpoint import load_danet_checkpoint

        danet_vars = load_danet_checkpoint(args.danet_checkpoint, danet_cfg)
    agent = CadreAgent.create(jax.random.PRNGKey(args.seed),
                              danet_cfg=danet_cfg, danet_vars=danet_vars)

    env = build_env(args, work_dir)
    if args.config:
        import dataclasses

        from cadre_tpu.configs.loader import load_experiment

        exp = load_experiment(args.config)
        rollout_cfg = dataclasses.replace(exp["rollout"],
                                          feature_dims=agent.obs_dim)
        train_cfg = exp["train"]
    else:
        rollout_cfg = RolloutConfig(num_steps=args.num_steps,
                                    seq_length=args.seq_length,
                                    feature_dims=agent.obs_dim)
        train_cfg = TrainConfig(max_episode=args.episodes)
    train(env, agent, rollout_cfg, train_cfg, rank=0, work_dir=work_dir,
          seed=args.seed)


if __name__ == "__main__":
    main()
