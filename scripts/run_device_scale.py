"""Scale experiment: does the SimDrivingEnv completion floor break with
10-20x more env-steps?

Context: every host-path cascade arm plateaued at ~20-35% route completion
(BENCH_r3_cascade_camroute.json, BENCH_r3_cascade_dense.json — episodes end
in route deviation at corners), but those arms were step-starved: 192-256k
env-steps at 60-80 env-steps/s was all the 1-core host could afford. The
device-resident path (envs/jax_env.py + rl/device_rollout.py) trains the
same cascade at ~5.9k env-steps/s, and its 150-iteration shakeout run was
still climbing at 960k steps (BENCH_r2_device_env.json learning_run, ~45%).
This driver runs the question to convergence: train for --iterations
iterations (default 1500 = 9.6M env-steps at N=32), snapshot the policy
banks every --snap-every iterations, then run the on-device K-member
ensemble eval (rl/device_eval.py, the eval.py:12-64 / agent.py:83-95
protocol) on a HELD-OUT route bank, and write one JSON artifact with the
training curve, eval episodes, and error-code histogram.

Usage:
  python scripts/run_device_scale.py --iterations 1500 --out \
      /tmp/device_scale/standard.json
  python scripts/run_device_scale.py --route-legs 6 --leg-min 25 \
      --leg-max 45 --iterations 1500 --out /tmp/device_scale/dense.json
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import time

import jax
import numpy as np


def _sha256(path):
    if not path or not os.path.exists(path):
        return None
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _git_rev():
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        return None


def run(args) -> dict:
    import dataclasses

    from cadre_tpu.configs.agent_config import RolloutConfig, TrainConfig
    from cadre_tpu.envs.jax_env import (
        ERROR_CODES,
        JaxDrivingEnv,
        JaxEnvConfig,
        make_route_bank,
    )
    from cadre_tpu.rl.agent import CadreAgent
    from cadre_tpu.rl.device_eval import evaluate_device
    from cadre_tpu.rl.device_rollout import make_device_iteration
    from cadre_tpu.rl.ppo import make_optimizer

    from cadre_tpu.configs.danet_config import danet_params

    # --camroute blanks the route-raster input plane (the camera-route
    # cascade protocol, BENCH_r3_cascade_camroute.json): route geometry is
    # only reachable through the rendered camera, so encoder quality is
    # load-bearing at scale.
    danet_cfg = danet_params(in_route_blank=bool(args.camroute))
    danet_vars = None
    if args.encoder:
        from cadre_tpu.utils.checkpoint import load_danet_checkpoint

        danet_vars = load_danet_checkpoint(args.encoder, danet_cfg)
    agent = CadreAgent.create(jax.random.PRNGKey(args.seed),
                              danet_cfg=danet_cfg,
                              danet_vars=danet_vars, bf16_encoder=True)

    leg_len = (args.leg_min, args.leg_max)
    # camroute implies the blind-route obs too (the host protocol masks the
    # privileged dis/theta measurements as well as the raster input plane)
    env_cfg = JaxEnvConfig(n_hazards=args.hazards,
                           blind_route=bool(args.camroute),
                           priority_routes=bool(args.priority_routes))
    bank = make_route_bank(args.routes, seed=args.seed,
                           route_legs=args.route_legs, route_leg_len=leg_len)
    env = JaxDrivingEnv(bank, num_envs=args.num_envs, config=env_cfg)
    rollout_cfg = RolloutConfig(num_steps=args.steps)
    iteration, init_carry = make_device_iteration(agent, env, rollout_cfg,
                                                  TrainConfig())
    jit_it = jax.jit(iteration, donate_argnums=(2, 3))
    opt_state = make_optimizer(agent.ppo_cfg).init(agent.params)
    rng = jax.random.PRNGKey(args.seed + 1)
    rng, k0 = jax.random.split(rng)
    carry = init_carry(agent.danet_vars, k0)
    params = agent.params

    os.makedirs(args.workdir, exist_ok=True)
    steps_per_iter = args.steps * args.num_envs
    rows, snaps = [], []
    train_wall = None
    snap_offset = 0
    if args.resume and not args.eval_only:
        # Warm start: continue training from the newest snapshot in the
        # workdir (policy banks only — the optimizer state restarts, which
        # matches the reference's non-checkpointed Adam, SURVEY §5.4).
        # New snapshots number on from the last index so the ensemble eval
        # picks up the newest members.
        import glob
        import re

        existing = sorted(glob.glob(os.path.join(args.workdir,
                                                 "snap_*.msgpack")))
        if existing:
            agent.load_snapshot(existing[-1])
            params = agent.params
            snap_offset = int(
                re.search(r"snap_(\d+)", existing[-1]).group(1))
            if os.path.exists(existing[-1] + ".opt"):
                # exact Adam resume when the prior run saved its
                # optimizer state (see the include_opt save below)
                import jax.numpy as jnp

                from cadre_tpu.utils import checkpoint as ckpt

                opt_state = jax.tree.map(
                    jnp.asarray,
                    ckpt.load_pytree(existing[-1] + ".opt", opt_state))
                print("resume: optimizer state restored", flush=True)
            print(f"resume: warm-started from {existing[-1]} "
                  f"(snap offset {snap_offset})", flush=True)
    if args.eval_only:
        # Recovery path: training already ran (snapshots on disk) but the
        # process died before/at eval. Reuse the snapshots; reconstruct the
        # printed training curve from --train-log if given.
        import glob
        import re

        snaps = sorted(glob.glob(os.path.join(args.workdir,
                                              "snap_*.msgpack")))
        if args.train_log and os.path.exists(args.train_log):
            pat = re.compile(r"iter (\d+): (\d+) steps/s, eps (\d+), "
                             r"completion ([\d.]+)%")
            seen = {}
            for line in open(args.train_log):
                m = pat.search(line)
                if m and int(m.group(1)) not in seen:
                    i = int(m.group(1))
                    seen[i] = dict(
                        iteration=i, env_steps=(i + 1) * steps_per_iter,
                        env_steps_per_sec=float(m.group(2)),
                        episodes_done=float(m.group(3)),
                        mean_completion=round(float(m.group(4)) / 100, 4))
            rows = [seen[i] for i in sorted(seen)]
        if args.prev and os.path.exists(args.prev):
            # Reuse the prior artifact's training section verbatim — for
            # re-running ONLY the eval under current code (e.g. the eval
            # env once terminated on overspeed, a training-only rule:
            # env_wrapper.py:435-441).
            with open(args.prev) as f:
                prev_doc = json.load(f)
            rows = prev_doc["train"]["rows"]
            train_wall = prev_doc["train"]["wall_s"]
        print(f"eval-only: {len(snaps)} snapshots, {len(rows)} curve rows",
              flush=True)
    t_start = time.time()
    for i in range(0 if args.eval_only else args.iterations):
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        params, opt_state, carry, m = jit_it(params, agent.danet_vars,
                                             opt_state, carry, k)
        float(m.checksum)                       # device sync (tunnel fetch)
        dt = time.perf_counter() - t0
        eps = float(m.episodes_done)
        row = dict(iteration=i,
                   env_steps=(i + 1) * steps_per_iter,
                   env_steps_per_sec=round(steps_per_iter / dt, 1),
                   value_loss=round(float(m.value_loss), 4),
                   episodes_done=eps,
                   mean_completion=round(
                       float(m.completion_sum) / max(eps, 1.0), 4),
                   steer_reward=round(float(m.mean_steer_reward), 4),
                   throttle_reward=round(float(m.mean_throttle_reward), 4),
                   error_hist={ERROR_CODES[c]: int(v) for c, v in
                               enumerate(np.asarray(m.error_hist)) if v},
                   red_lights=int(m.red_lights))
        rows.append(row)
        if (i + 1) % args.log_every == 0 or i == 0:
            print(f"iter {i}: {row['env_steps_per_sec']:.0f} steps/s, "
                  f"eps {eps:.0f}, completion {row['mean_completion']:.2%}",
                  flush=True)
        if (i + 1) % args.snap_every == 0:
            agent.params = params
            path = os.path.join(
                args.workdir, f"snap_{snap_offset + i + 1:05d}.msgpack")
            agent.save_snapshot(path)
            snaps.append(path)
    if not args.eval_only:
        train_wall = time.time() - t_start
        if snaps:
            # persist the final Adam state next to the last snapshot so a
            # later --resume is an exact optimizer resume
            from cadre_tpu.utils import checkpoint as ckpt

            ckpt.save_pytree(snaps[-1] + ".opt", opt_state)

    # ---- held-out on-device ensemble eval (the eval.py protocol) ----
    agent.params = params
    eval_bank = make_route_bank(args.routes, seed=args.seed + 1000,
                                route_legs=args.route_legs,
                                route_leg_len=leg_len)
    # eval-mode env (training=False): d_max_eval widening, no early
    # termination on static collision/overspeed — the host eval protocol
    # (scripts/cascade_proof.py eval arm / eval_agent_config.py:51-57)
    eval_env = JaxDrivingEnv(eval_bank, num_envs=args.eval_envs,
                             config=dataclasses.replace(
                                 env_cfg, training=False,
                                 priority_routes=False))
    members = snaps[-args.eval_members:] if snaps else []
    episodes = []
    if members:
        episodes = evaluate_device(agent, eval_env, members,
                                   max_steps=args.eval_steps,
                                   seed=args.seed + 7)
    errors = collections.Counter(e["error"] for e in episodes)
    mean = lambda k: (round(float(np.mean([e[k] for e in episodes])), 4)  # noqa: E731
                      if episodes else None)

    artifact = dict(
        experiment=("device-resident scale run: cascade PPO over "
                    "JaxDrivingEnv, frozen "
                    + ("trained" if args.encoder else "random")
                    + " encoder"),
        config=dict(iterations=args.iterations, num_envs=args.num_envs,
                    steps_per_iter=args.steps, routes=args.routes,
                    route_legs=args.route_legs, leg_len=leg_len,
                    hazards=args.hazards, camroute=bool(args.camroute),
                    encoder=args.encoder, seed=args.seed,
                    # attest encoder identity + code version per run so a
                    # multi-seed artifact can detect mixed-encoder arms
                    # (ADVICE r4 medium: provenance must live in the JSON,
                    # not a side-channel status note)
                    encoder_sha256=_sha256(args.encoder),
                    code_rev=_git_rev(),
                    total_env_steps=args.iterations * steps_per_iter,
                    resumed_from_iteration=snap_offset or None),
        train=dict(wall_s=round(train_wall, 1) if train_wall else None,
                   median_env_steps_per_sec=round(float(np.median(
                       [r["env_steps_per_sec"] for r in rows[1:]])), 1)
                   if len(rows) > 1 else None,
                   # keep every 5th row (plus the last) to bound the file;
                   # eval-only rows are already log-thinned — keep them all
                   rows=rows if args.eval_only else
                   [r for j, r in enumerate(rows)
                    if j % 5 == 4 or j == len(rows) - 1]),
        eval=dict(members=len(members), episodes=len(episodes),
                  mean_completion=mean("completion"),
                  mean_driving_score=mean("driving_score"),
                  red_lights=sum(e.get("red_lights", 0) for e in episodes),
                  stops=sum(e.get("stops", 0) for e in episodes),
                  error_histogram=dict(errors),
                  rows=episodes),
        prior_floor=dict(
            host_dense_ensemble_completion=22.26,      # BENCH_r3_..._dense
            host_camroute_ensemble_completion=35.3,    # BENCH_r3_..._camroute
            device_150iter_train_completion=0.45),     # BENCH_r2_device_env
    )
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("WROTE", args.out, "eval completion", mean("completion"),
          "driving score", mean("driving_score"), dict(errors), flush=True)
    return artifact


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=1500)
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--routes", type=int, default=16)
    p.add_argument("--route-legs", type=int, default=3)
    p.add_argument("--leg-min", type=float, default=40.0)
    p.add_argument("--leg-max", type=float, default=90.0)
    p.add_argument("--hazards", type=int, default=0,
                   help="Scenario-3 crossing pedestrians per episode")
    p.add_argument("--priority-routes", action="store_true",
                   help="in-graph priority route curriculum "
                        "(PriorityRouteIndexer semantics) for training; "
                        "the held-out eval stays uniform")
    p.add_argument("--encoder", default=None,
                   help="optional msgpack DANet checkpoint (frozen)")
    p.add_argument("--camroute", action="store_true",
                   help="blank the route-raster input plane "
                        "(DANetParams.in_route_blank): the camera-route "
                        "cascade protocol at device scale")
    p.add_argument("--snap-every", type=int, default=100)
    p.add_argument("--eval-members", type=int, default=8)
    p.add_argument("--eval-envs", type=int, default=8)
    p.add_argument("--eval-steps", type=int, default=4000)
    p.add_argument("--log-every", type=int, default=25)
    p.add_argument("--eval-only", action="store_true",
                   help="skip training; eval existing workdir snapshots")
    p.add_argument("--resume", action="store_true",
                   help="warm-start training from the newest workdir "
                        "snapshot; new snapshots number on from it")
    p.add_argument("--prev", default=None,
                   help="with --eval-only: prior arm artifact whose train "
                        "section is kept verbatim (re-eval under current "
                        "code)")
    p.add_argument("--train-log", default=None,
                   help="with --eval-only: driver log to reconstruct the "
                        "training curve from (iter N: ... lines)")
    p.add_argument("--workdir", default="/tmp/device_scale")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="/tmp/device_scale/result.json")
    args = p.parse_args()
    run(args)


if __name__ == "__main__":
    main()
