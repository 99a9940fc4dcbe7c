"""Cascade validation: does the trained CoPM encoder beat a random one?

VERDICT (round 1) found the trained encoder bought nothing measurable
(~58% completion vs ~60% for a random frozen encoder). This experiment
makes the sim perceptually load-bearing — obstacles sit ON the route and
are only observable through the camera (the policy obs is latent +
[speed, dis, theta]; the obstacle sensor feeds only the reward) — then
trains the SAME PPO configuration twice: once on a pretrained frozen
encoder, once on a random frozen encoder, and reports completion and
collision curves.

Phases (run separately so each TPU session stays short):
  collect   -> npz shards from the expert under randomized weather
  pretrain  -> small DANet, holdout per-class report, checkpoint
  rl        -> --arm trained|random, N vec envs, stats JSONL
  report    -> compare the two arms' JSONL curves
"""
from __future__ import annotations

import argparse
import dataclasses
import faulthandler
import json
import os
import signal

import numpy as np

# `kill -USR1 <pid>` dumps all thread stacks to stderr — the remote-TPU
# tunnel can wedge a dispatch, and this is the only stack tool in the image
faulthandler.register(signal.SIGUSR1)


def make_sim_env(rank: int, seed: int, blind_route: bool = False,
                 **env_kwargs):
    from cadre_tpu.envs.sim_env import SimDrivingEnv

    if blind_route:
        # VERDICT r1 item 2's stronger variant: zero the privileged route
        # measurements (dis, theta) in the POLICY observation, so route
        # geometry is only discoverable through the camera/route-fig ->
        # encoder path. Reward/termination still use the true dis/theta
        # internally; only the obs the agent sees is masked.
        class BlindRouteSim(SimDrivingEnv):
            def _assemble_tick(self):
                raw = super()._assemble_tick()
                m = raw["last_measurements"]
                raw["last_measurements"] = [m[0], 0.0, 0.0]
                return raw

        cls = BlindRouteSim
    else:
        cls = SimDrivingEnv
    # obstacles on/near the route: vehicles parked in-lane + wandering
    # walkers; the camera is the only obs channel that sees them
    return cls(seed=seed + rank, vehicle_num=(6, 6),
               randomize_weather=True, rank=rank, **env_kwargs)


def _route_shape(args) -> dict:
    """Synthetic-route shape kwargs shared by collect/rl/eval, so the
    pretrain data, the RL arms, and the ensemble eval all drive the same
    route distribution (junction-dense legs shorten corner spacing)."""
    return {"route_legs": args.route_legs,
            "route_leg_len": (args.leg_min, args.leg_max)}


def phase_collect(args):
    from cadre_tpu.envs.expert import OracleExpert
    from cadre_tpu.perception.data import collect_dataset

    # phase-balanced light cycle for label support: the RL-parity cycle
    # keeps red at 0.5 s / 8.5 s, which starves the light head's red class
    # (VERDICT r2 weak #3: zero red samples in the camroute holdout)
    env = make_sim_env(0, args.seed, light_times=(3.0, 3.0, 3.0),
                       **_route_shape(args))
    env.seq_length = 2
    shards = collect_dataset(env, OracleExpert(), args.frames,
                             args.data_dir, seed=args.seed)
    print(f"collected {args.frames} frames -> {len(shards)} shards")


def _small_cfg(route_geom: bool = False, geom_weight: float = 1.0,
               camera_route: bool = False):
    from cadre_tpu.configs.danet_config import danet_params

    return danet_params(da_feature_channel=64, inter_att_dims=48, z_dims=32,
                        pred_route_geom=route_geom,
                        route_geom_weight=geom_weight,
                        in_route_blank=camera_route)


def phase_pretrain(args):
    import jax

    from cadre_tpu.configs.danet_config import PerceptionTrainParams
    from cadre_tpu.perception.data import PerceptionDataLoader, compute_stats
    from cadre_tpu.perception.trainer import PerceptionTrainer

    paths = PerceptionDataLoader(args.data_dir, batch_size=args.batch).paths
    train_loader = PerceptionDataLoader(paths[:-1], batch_size=args.batch,
                                        seed=args.seed, augment=True,
                                        cache_in_memory=True, packed=True)
    holdout = PerceptionDataLoader(paths[-1:], batch_size=args.batch,
                                   packed=True)
    stats = compute_stats(train_loader.paths)
    tp = PerceptionTrainParams(batch_size=args.batch,
                               max_epochs=args.epochs)
    trainer = PerceptionTrainer(
        _small_cfg(args.route_geom, args.route_geom_weight,
                   args.camera_route), tp, steps_per_epoch=len(train_loader),
        rng=jax.random.PRNGKey(args.seed),
        seg_class_weight=stats.seg_class_weight,
        light_class_weight=stats.light_class_weight)
    trainer.solve(train_loader, epochs=args.epochs, work_dir=args.work_dir,
                  save_interval=max(1, args.epochs // 2))
    rep = trainer.evaluate_per_class(holdout)
    out = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
           for k, v in rep.items()}
    print("HOLDOUT " + json.dumps(out))
    ckpt_path = os.path.join(args.work_dir, "encoder.msgpack")
    trainer.save(ckpt_path)
    print(f"saved {ckpt_path}")


def phase_rl(args):
    import functools

    import jax

    from cadre_tpu.configs.agent_config import (
        AgentConfig,
        RolloutConfig,
        TrainConfig,
    )
    from cadre_tpu.envs.vec_env import VecDrivingEnv
    from cadre_tpu.rl.agent import CadreAgent
    from cadre_tpu.rl.vec_train import train_vec

    cfg = _small_cfg(args.route_geom, args.route_geom_weight,
                     args.camera_route)
    danet_vars = None
    if args.arm == "trained":
        from cadre_tpu.utils.checkpoint import load_danet_checkpoint

        danet_vars = load_danet_checkpoint(args.encoder, cfg)
        print(f"loaded encoder {args.encoder}")
    agent = CadreAgent.create(jax.random.PRNGKey(args.seed),
                              danet_cfg=cfg, danet_vars=danet_vars)

    vec = VecDrivingEnv([functools.partial(make_sim_env, k, args.seed,
                                           blind_route=args.blind_route,
                                           **_route_shape(args))
                         for k in range(args.num_envs)])
    rollout = RolloutConfig(num_steps=args.num_steps,
                            feature_dims=agent.obs_dim)
    # save every ~iterations/24 so the last-8 ensemble covers only the final
    # third of training — the reference evals late checkpoints (episodes
    # 2400-2900 of 3000, eval_agent_config.py:55), not the whole history
    train_cfg = TrainConfig(max_episode=args.iterations, log_interval=5,
                            save_interval=max(1, args.iterations // 24))
    os.makedirs(args.work_dir, exist_ok=True)
    log_path = os.path.join(args.work_dir, f"{args.arm}.jsonl")
    f = open(log_path, "a")

    def hook(stats):
        f.write(json.dumps(dataclasses.asdict(stats)) + "\n")
        f.flush()

    train_vec(vec, agent, rollout, train_cfg, iterations=args.iterations,
              seed=args.seed + 1, work_dir=os.path.join(args.work_dir,
                                                        args.arm),
              iteration_hook=hook)
    f.close()
    print(f"wrote {log_path}")


def phase_eval(args):
    """BASELINE config 5's eval protocol: 8-checkpoint vmapped ensemble,
    25 episodes with traffic, mean completion + driving score
    (eval_agent_config.py:51-57,80-84)."""
    import glob

    import jax

    from cadre_tpu.configs.agent_config import EvalConfig
    from cadre_tpu.rl.agent import CadreAgent
    from cadre_tpu.rl.evaluate import evaluate
    from cadre_tpu.utils.checkpoint import load_danet_checkpoint

    cfg = _small_cfg(args.route_geom, args.route_geom_weight,
                     args.camera_route)
    danet_vars = None
    if args.arm == "trained" and os.path.exists(args.encoder):
        danet_vars = load_danet_checkpoint(args.encoder, cfg)
    agent = CadreAgent.create(jax.random.PRNGKey(args.seed), danet_cfg=cfg,
                              danet_vars=danet_vars)
    models = sorted(
        glob.glob(os.path.join(args.work_dir, args.arm, "models",
                               "*.msgpack")),
        key=lambda p: int("".join(c for c in os.path.basename(p)
                                  if c.isdigit())))
    snaps = models[-8:]                        # last 8 checkpoints
    print(f"ensemble over {len(snaps)} checkpoints: "
          f"{[os.path.basename(s) for s in snaps]}")
    env = make_sim_env(99, args.seed, blind_route=args.blind_route,
                       training=False,
                       work_dir=os.path.join(args.work_dir, "eval"),
                       **_route_shape(args))
    results = evaluate(env, agent, snaps,
                       EvalConfig(eval_episode=args.episodes),
                       seed=args.seed, max_steps=args.max_steps)
    comp = np.array([r.completion_ratio for r in results])
    score = np.array([r.driving_score for r in results])
    out = {"arm": args.arm, "episodes": len(results),
           "mean_completion": float(comp.mean()),
           "mean_driving_score": float(score.mean())}
    print("ENSEMBLE " + json.dumps(out))


def phase_report(args):
    out = {}
    for arm in ("trained", "random"):
        path = os.path.join(args.work_dir, f"{arm}.jsonl")
        if not os.path.exists(path):
            print(f"missing {path}")
            continue
        rows = [json.loads(l) for l in open(path)]
        comp = np.array([r["mean_completion"] for r in rows
                         if r["episodes_finished"] > 0])
        k = max(1, len(comp) // 3)
        out[arm] = {
            "iterations": len(rows),
            "final_third_completion_mean": float(comp[-k:].mean())
            if len(comp) else 0.0,
            "final_third_completion_std": float(comp[-k:].std())
            if len(comp) else 0.0,
            "best_completion": float(comp.max()) if len(comp) else 0.0,
            "mean_throttle_reward_last10": float(np.mean(
                [r["mean_throttle_reward"] for r in rows[-10:]])),
        }
    print(json.dumps(out, indent=2))
    if "trained" in out and "random" in out:
        gap = out["trained"]["final_third_completion_mean"] \
            - out["random"]["final_third_completion_mean"]
        print(f"GAP trained-random (final-third completion): {gap:+.2f} pts")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("phase",
                   choices=["collect", "pretrain", "rl", "eval", "report"])
    p.add_argument("--episodes", type=int, default=25)
    p.add_argument("--max-steps", type=int, default=4000)
    p.add_argument("--data-dir", default="/tmp/cascade_proof/data")
    p.add_argument("--work-dir", default="/tmp/cascade_proof")
    p.add_argument("--frames", type=int, default=12000)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--arm", choices=["trained", "random"], default="trained")
    p.add_argument("--route-geom", action="store_true",
                   help="enable the pred_route_geom auxiliary head "
                        "(dis/theta supervision on the PPO latent) in "
                        "pretrain, and build the matching cfg when loading "
                        "the encoder in rl/eval")
    p.add_argument("--route-geom-weight", type=float, default=20000.0,
                   help="loss weight for the geom head; the default puts "
                        "its initial term at the same order as the "
                        "c*h*w-scaled seg loss so the encoder gradient is "
                        "not drowned (unit weight measured ~1e-5 relative "
                        "and the head only fit the target mean)")
    p.add_argument("--blind-route", action="store_true",
                   help="zero the privileged (dis, theta) measurements in "
                        "the policy obs; route geometry then flows only "
                        "through the camera/route-fig -> encoder path")
    p.add_argument("--camera-route", action="store_true",
                   help="round-3 experiment: blank the route-raster INPUT "
                        "plane everywhere (DANetParams.in_route_blank) so "
                        "route geometry must be perceived from the camera's "
                        "painted ribbon; combine with --blind-route so the "
                        "policy has no privileged channel either. The route "
                        "fig stays a pretrain TARGET. Motivated by "
                        "BENCH_r2_cascade_geom.json: a random projection of "
                        "the clean raster was a sufficient statistic, making "
                        "trained-vs-random insensitive to encoder quality")
    p.add_argument("--route-legs", type=int, default=3,
                   help="synthetic-route legs per episode; junction-dense "
                        "runs raise this so corner decisions dominate")
    p.add_argument("--leg-min", type=float, default=40.0)
    p.add_argument("--leg-max", type=float, default=90.0)
    p.add_argument("--encoder", default="/tmp/cascade_proof/encoder.msgpack")
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument("--num-steps", type=int, default=200)
    p.add_argument("--iterations", type=int, default=120)
    args = p.parse_args()
    {"collect": phase_collect, "pretrain": phase_pretrain,
     "rl": phase_rl, "eval": phase_eval,
     "report": phase_report}[args.phase](args)


if __name__ == "__main__":
    main()
