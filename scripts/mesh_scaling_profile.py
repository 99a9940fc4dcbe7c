"""Root-cause the virtual-mesh weak-scaling collapse (VERDICT r4 item 3).

BENCH_r4_mesh_scaling.json showed aggregate env-steps/s FALLING 25.2 ->
6.3 from 1 -> 8 virtual devices on this 1-core host, where a flat curve
was expected. This script separates the candidate causes with direct
measurements per mesh size:

- compile_s:            one-time XLA compile (excluded from throughput)
- iter_s:               per-iteration wall times (list + median) — the
                        r4 number was a single 3-iteration aggregate, so
                        one scheduler hiccup could skew it
- null_collective_us:   per-call wall time of a trivial jitted psum over
                        the same mesh — isolates per-launch dispatch +
                        cross-device-thread rendezvous cost from real work
- ctx_switches:         involuntary+voluntary context-switch deltas over
                        the timed region (resource.getrusage) — N device
                        threads spin-waiting on collective rendezvous
                        while sharing ONE physical core shows up here
- threads:              OS thread count after warmup (device runtime
                        threads scale with the forced device count)
- hlo_collectives:      op histogram of the PARTITIONED compiled module
                        (all-reduce / all-gather / collective-permute /
                        all-to-all) — detects the alternative hypothesis
                        that GSPMD all-gathers env state every step

Interpretation key (written into BENCH_NOTES.md): if null_collective_us
and ctx_switches blow up with device count while hlo_collectives stays at
the handful of psums the training step intentionally performs, the
collapse is host-emulation thread contention (spin-wait rendezvous on one
core), which does NOT exist on real multi-chip hardware — each TPU has
its own host core budget and ICI collectives are DMA, not thread
barriers. If instead hlo_collectives shows per-step all-gathers of env
state, that is a repo bug reproducible on real ICI.

Run: python scripts/mesh_scaling_profile.py [--iters 6]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def _one(n: int, iters: int, compile_only: bool = False) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import resource
    import time

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cadre_tpu.configs.agent_config import RolloutConfig, TrainConfig
    from cadre_tpu.configs.danet_config import danet_params
    from cadre_tpu.envs.jax_env import (
        JaxDrivingEnv,
        JaxEnvConfig,
        make_route_bank,
    )
    from cadre_tpu.parallel.mesh import make_mesh
    from cadre_tpu.rl.agent import CadreAgent
    from cadre_tpu.rl.device_rollout import make_device_iteration
    from cadre_tpu.rl.ppo import make_optimizer

    envs_per_device = 4
    steps = 32
    num_envs = envs_per_device * n
    mesh = make_mesh(n)
    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=danet_params(
        da_feature_channel=32, inter_att_dims=24, z_dims=16))
    bank = make_route_bank(3, seed=0)
    env = JaxDrivingEnv(bank, num_envs=num_envs,
                        config=JaxEnvConfig(render=True))
    iteration, init_carry = make_device_iteration(
        agent, env, RolloutConfig(num_steps=steps), TrainConfig(ppo_epoch=1),
        mesh=mesh)

    carry = init_carry(agent.danet_vars, jax.random.PRNGKey(1))
    opt_state = make_optimizer(agent.ppo_cfg).init(agent.params)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    carry = jax.tree.map(
        lambda x: jax.device_put(x, data if np.ndim(x) >= 1
                                 and np.shape(x)[0] == num_envs else repl),
        carry)
    carry = carry._replace(feat_hist=jax.device_put(
        carry.feat_hist, NamedSharding(mesh, P(None, "data"))))
    params = jax.device_put(agent.params, repl)
    danet_vars = jax.device_put(agent.danet_vars, repl)
    opt_state = jax.device_put(opt_state, repl)

    # ---- compile phase, measured alone; collect the partitioned HLO ----
    jit_it = jax.jit(iteration, donate_argnums=(2, 3))
    t0 = time.perf_counter()
    lowered = jit_it.lower(params, danet_vars, opt_state, carry,
                           jax.random.PRNGKey(2))
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    hlo = compiled.as_text()
    coll = {}
    for op in ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter"):
        # count op INSTANCES (lines defining the op), not mentions
        coll[op] = sum(1 for ln in hlo.splitlines()
                       if f" {op}(" in ln or f" {op}-start(" in ln)

    if compile_only:
        print(json.dumps(dict(
            devices=n, num_envs=num_envs, envs_per_device=envs_per_device,
            steps_per_iter_per_env=steps, compile_s=round(compile_s, 1),
            compile_only=True, hlo_collectives=coll)))
        return

    # ---- warmup one real call (donation consumes carry/opt_state) ----
    params, opt_state, carry, m = jit_it(params, danet_vars, opt_state,
                                         carry, jax.random.PRNGKey(2))
    float(m.checksum)

    # ---- null-collective probe: tiny psum over the same mesh ----
    from jax.experimental.shard_map import shard_map

    tiny = jax.device_put(jnp.arange(n * 4, dtype=jnp.float32),
                          NamedSharding(mesh, P("data")))

    @jax.jit
    def null_psum(x):
        return shard_map(
            lambda v: jax.lax.psum(v, "data"),
            mesh=mesh, in_specs=P("data"), out_specs=P())(x)

    null_psum(tiny).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(50):
        r = null_psum(tiny)
    r.block_until_ready()
    null_us = (time.perf_counter() - t0) / 50 * 1e6

    # ---- timed iterations, per-iteration, with context-switch deltas ----
    ru0 = resource.getrusage(resource.RUSAGE_SELF)
    iter_s = []
    for i in range(iters):
        t0 = time.perf_counter()
        params, opt_state, carry, m = jit_it(params, danet_vars, opt_state,
                                             carry, jax.random.PRNGKey(3 + i))
        float(m.checksum)
        iter_s.append(round(time.perf_counter() - t0, 3))
    ru1 = resource.getrusage(resource.RUSAGE_SELF)
    assert int(np.asarray(m.error_hist).sum()) == float(m.episodes_done), \
        "per-episode accounting diverged under partitioning"

    try:
        threads = len(os.listdir("/proc/self/task"))
    except OSError:
        threads = None
    med = float(np.median(iter_s))
    print(json.dumps(dict(
        devices=n, num_envs=num_envs, envs_per_device=envs_per_device,
        steps_per_iter_per_env=steps,
        compile_s=round(compile_s, 1),
        iter_s=iter_s,
        median_iter_s=round(med, 3),
        aggregate_env_steps_per_sec=round(steps * num_envs / med, 1),
        null_collective_us=round(null_us, 1),
        ctx_switches=dict(
            voluntary=ru1.ru_nvcsw - ru0.ru_nvcsw,
            involuntary=ru1.ru_nivcsw - ru0.ru_nivcsw),
        threads=threads,
        hlo_collectives=coll)))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--child", type=int, default=None)
    p.add_argument("--compile-only", action="store_true",
                   help="lower+compile and report the collective "
                        "histogram only (no execution — immune to the "
                        "1-core rendezvous starvation)")
    p.add_argument("--out", default="BENCH_r5_mesh_profile.json")
    args = p.parse_args()
    if args.child is not None:
        _one(args.child, args.iters, args.compile_only)
        return
    rows = []
    for n in (1, 2, 4, 8):
        cmd = [sys.executable, __file__, "--child", str(n),
               "--iters", str(args.iters)]
        if args.compile_only:
            cmd.append("--compile-only")
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1800,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not line:
            # XLA CPU in-process collectives CHECK-fail after a hard 40 s
            # rendezvous termination when device threads starve on one
            # physical core — record the failure as data, don't abort
            # the sweep (it IS the weak-scaling story)
            reason = "unknown"
            if "Termination timeout" in out.stderr:
                reason = ("XLA CPU collective rendezvous termination "
                          "(40 s hard limit; device threads starved on "
                          "1 physical core)")
            rows.append(dict(devices=n, failed=reason,
                             stderr_tail=out.stderr[-400:]))
            print(f"devices={n} FAILED: {reason}", flush=True)
            continue
        rows.append(json.loads(line[-1]))
        print(line[-1], flush=True)
    with open(args.out, "w") as f:
        json.dump(dict(
            experiment=("weak-scaling ROOT-CAUSE profile over the virtual "
                        "CPU mesh (1 physical core): per-phase timing, "
                        "null-collective dispatch probe, context-switch "
                        "deltas, partitioned-HLO collective histogram; "
                        "see module docstring for the interpretation key"),
            host_physical_cores=os.cpu_count(),
            rows=rows), f, indent=1)
    print(f"WROTE {args.out}")


if __name__ == "__main__":
    main()
