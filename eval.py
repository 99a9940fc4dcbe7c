"""Evaluation entry point (the reference's `python eval.py`).

Loads K checkpoints into a vmap ensemble, runs `eval_episode` episodes with
averaged controls; completion ratios land in eval_completion_ratio.csv.
"""
from __future__ import annotations

import argparse
import glob
import os

import jax


def main():
    p = argparse.ArgumentParser(description="Evaluate CADRE-TPU ensemble")
    p.add_argument("--env", default="sim", choices=["sim", "fake", "carla"])
    p.add_argument("--snapshots", nargs="+", required=True,
                   help="msgpack snapshot paths (globs ok)")
    p.add_argument("--episodes", type=int, default=25)
    p.add_argument("--routes", default=None)
    p.add_argument("--scenarios", default=None)
    p.add_argument("--vehicles", type=int, default=20)
    p.add_argument("--walkers", type=int, default=50)
    p.add_argument("--seq-length", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--work-dir", default="result/eval")
    p.add_argument("--small", action="store_true")
    p.add_argument("--danet-checkpoint", default=None)
    p.add_argument("--carla-host", default="localhost")
    p.add_argument("--carla-port", type=int, default=8010)
    p.add_argument("--town", default="Town01")
    args = p.parse_args()

    from cadre_tpu.configs.agent_config import EvalConfig
    from cadre_tpu.configs.danet_config import danet_params
    from cadre_tpu.rl.agent import CadreAgent
    from cadre_tpu.rl.evaluate import evaluate
    from cadre_tpu.utils.logger import setup_logger

    paths = []
    for pat in args.snapshots:
        paths.extend(sorted(glob.glob(pat)))
    if not paths:
        raise SystemExit("no snapshots matched")

    setup_logger(args.work_dir)
    danet_cfg = danet_params() if not args.small else danet_params(
        da_feature_channel=64, inter_att_dims=48, z_dims=32)
    danet_vars = None
    if args.danet_checkpoint:
        from cadre_tpu.utils.checkpoint import load_danet_checkpoint

        danet_vars = load_danet_checkpoint(args.danet_checkpoint, danet_cfg)
    agent = CadreAgent.create(jax.random.PRNGKey(args.seed),
                              danet_cfg=danet_cfg, danet_vars=danet_vars)

    if args.env == "fake":
        from cadre_tpu.envs.fake_env import FakeDrivingEnv

        env = FakeDrivingEnv(seq_length=args.seq_length)
    elif args.env == "carla":
        from cadre_tpu.envs.carla_env import CarlaDrivingEnv

        env = CarlaDrivingEnv(
            host=args.carla_host, port=args.carla_port, town=args.town,
            routes_file=args.routes, scenario_file=args.scenarios,
            vehicle_num=(args.vehicles, args.walkers), training=False,
            seq_length=args.seq_length, work_dir=args.work_dir)
    else:
        from cadre_tpu.envs.sim_env import SimDrivingEnv

        env = SimDrivingEnv(
            routes_file=args.routes, scenario_file=args.scenarios,
            vehicle_num=(args.vehicles, args.walkers), training=False,
            seq_length=args.seq_length, work_dir=args.work_dir,
            seed=args.seed)

    import os

    results = evaluate(env, agent, paths,
                       EvalConfig(eval_episode=args.episodes),
                       seed=args.seed,
                       result_file=os.path.join(args.work_dir,
                                                "criteria_results.csv"))
    mean_ratio = sum(r.completion_ratio for r in results) / len(results)
    print(f"mean completion ratio over {len(results)} episodes: "
          f"{mean_ratio:.2f}%")


if __name__ == "__main__":
    main()
