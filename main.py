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
    p.add_argument("--env", default="sim",
                   choices=["sim", "fake", "carla", "jax"],
                   help="'jax' trains fully on-device: the whole rollout "
                        "(env + encoder + policies) and the PPO update are "
                        "one jitted program (rl/device_rollout.py)")
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
    p.add_argument("--priority-routes", action="store_true",
                   help="device env: in-graph priority route curriculum "
                        "(PriorityRouteIndexer semantics; "
                        "JaxEnvConfig.priority_routes)")
    p.add_argument("--hazards", type=int, default=0,
                   help="--env jax only: in-graph Scenario-3 crossing "
                        "pedestrians per episode (JaxEnvConfig.n_hazards)")
    p.add_argument("--small", action="store_true",
                   help="small encoder (fast CPU smoke runs)")
    p.add_argument("--carla-host", default="localhost")
    p.add_argument("--carla-port", type=int, default=8010,
                   help="first server port; env k uses port+10*k "
                        "(reference main.py:63-70 / start_server.sh)")
    p.add_argument("--town", default="Town01")
    p.add_argument("--num-envs", type=int, default=1,
                   help="N>1 trains the vectorized path (reference "
                        "chief+N-worker topology, main.py:57-70)")
    p.add_argument("--proc-envs", action="store_true",
                   help="isolate each env in its own process over the C++ "
                        "shm ring (runtime/proc_vec_env.py) instead of "
                        "in-process envs")
    p.add_argument("--mesh", default=None, choices=[None, "data"],
                   help="'data' shards every PPO minibatch over all "
                        "visible devices (grad psum over ICI = the chief)")
    p.add_argument("--iterations", type=int, default=None,
                   help="vectorized-path iteration count "
                        "(default: episodes)")
    return p.parse_args()


def make_env(kind: str, rank: int, args_dict: dict, work_dir):
    """Module-level factory (picklable for the spawn-process vec path).
    Per-rank: seed offset, CARLA port offset 10*rank (start_server.sh)."""
    if kind == "fake":
        from cadre_tpu.envs.fake_env import FakeDrivingEnv

        return FakeDrivingEnv(episode_length=args_dict["num_steps"],
                              seq_length=args_dict["seq_length"],
                              seed=args_dict["seed"] + rank)
    if kind == "carla":
        from cadre_tpu.envs.carla_env import CarlaDrivingEnv

        return CarlaDrivingEnv(
            host=args_dict["carla_host"],
            port=args_dict["carla_port"] + 10 * rank,
            town=args_dict["town"], routes_file=args_dict["routes"],
            scenario_file=args_dict["scenarios"],
            vehicle_num=(args_dict["vehicles"], args_dict["walkers"]),
            seq_length=args_dict["seq_length"], work_dir=work_dir,
            rank=rank)
    from cadre_tpu.envs.sim_env import SimDrivingEnv

    return SimDrivingEnv(
        routes_file=args_dict["routes"],
        scenario_file=args_dict["scenarios"],
        vehicle_num=(args_dict["vehicles"], args_dict["walkers"]),
        seed=args_dict["seed"] + rank,
        seq_length=args_dict["seq_length"], work_dir=work_dir, rank=rank)


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

    if args.env == "jax":
        from cadre_tpu.envs.jax_env import (
            JaxDrivingEnv,
            JaxEnvConfig,
            make_route_bank,
        )
        from cadre_tpu.rl.device_rollout import train_device
        from cadre_tpu.utils.logger import logger

        bank = make_route_bank(max(args.num_envs * 2, 16), seed=args.seed,
                               routes_file=args.routes)
        env = JaxDrivingEnv(bank, num_envs=max(args.num_envs, 1),
                            config=JaxEnvConfig(
                                n_hazards=args.hazards,
                                priority_routes=args.priority_routes))
        iterations = args.iterations if args.iterations is not None else \
            args.episodes
        _, rows = train_device(agent, env, iterations=iterations,
                               rollout_cfg=rollout_cfg,
                               train_cfg=train_cfg, seed=args.seed,
                               log_fn=logger.log)
        os.makedirs(os.path.join(work_dir, "models"), exist_ok=True)
        agent.save_snapshot(os.path.join(
            work_dir, "models", f"ppo_model_{iterations}.msgpack"))
        return

    if args.num_envs > 1:
        # the reference's chief + N-worker topology (main.py:57-70), with
        # the gradient psum as the chief and env workers either in-process
        # or process-isolated over the C++ shm ring
        import functools

        from cadre_tpu.rl.vec_train import train_vec

        args_dict = dict(num_steps=args.num_steps,
                         seq_length=args.seq_length, seed=args.seed,
                         carla_host=args.carla_host,
                         carla_port=args.carla_port, town=args.town,
                         routes=args.routes, scenarios=args.scenarios,
                         vehicles=args.vehicles, walkers=args.walkers)
        env_fns = [functools.partial(make_env, args.env, k, args_dict,
                                     work_dir)
                   for k in range(args.num_envs)]
        if args.proc_envs:
            from cadre_tpu.runtime.proc_vec_env import ProcVecDrivingEnv

            vec = ProcVecDrivingEnv(env_fns, seq_length=args.seq_length)
        else:
            from cadre_tpu.envs.vec_env import VecDrivingEnv

            vec = VecDrivingEnv(env_fns)
        mesh = None
        if args.mesh == "data":
            from cadre_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
        iterations = args.iterations if args.iterations is not None else \
            args.episodes
        try:
            train_vec(vec, agent, rollout_cfg, train_cfg,
                      iterations=iterations, seed=args.seed,
                      work_dir=work_dir, mesh=mesh)
        finally:
            close = getattr(vec, "close", None)
            if close:
                close()
        return

    env = build_env(args, work_dir)
    train(env, agent, rollout_cfg, train_cfg, rank=0, work_dir=work_dir,
          seed=args.seed)


if __name__ == "__main__":
    main()
