"""The on-device iteration under GSPMD: envs sharded over the data axis of
an 8-device mesh, params replicated — the multi-chip shape of the
device-resident training path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


@pytest.mark.slow
def test_device_iteration_sharded_over_env_axis():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from cadre_tpu.rl.device_rollout import make_device_iteration
    from cadre_tpu.rl.ppo import make_optimizer

    mesh = make_mesh(8)
    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=danet_params(
        da_feature_channel=32, inter_att_dims=24, z_dims=16))
    bank = make_route_bank(3, seed=0)
    env = JaxDrivingEnv(bank, num_envs=8, config=JaxEnvConfig())
    rollout_cfg = RolloutConfig(num_steps=8)
    iteration, init_carry = make_device_iteration(
        agent, env, rollout_cfg, TrainConfig(ppo_epoch=1), mesh=mesh)

    carry = init_carry(agent.danet_vars, jax.random.PRNGKey(1))
    opt_state = make_optimizer(agent.ppo_cfg).init(agent.params)

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    shard_carry = jax.tree.map(
        lambda x: jax.device_put(x, data if np.ndim(x) >= 1
                                 and np.shape(x)[0] == 8 else repl), carry)
    # feat_hist is [seq, N, F] — shard its env axis (axis 1)
    fh = jax.device_put(carry.feat_hist, NamedSharding(mesh, P(None, "data")))
    shard_carry = shard_carry._replace(feat_hist=fh)
    params = jax.device_put(agent.params, repl)
    danet_vars = jax.device_put(agent.danet_vars, repl)
    opt_state = jax.device_put(opt_state, repl)

    jit_it = jax.jit(iteration)
    params2, opt_state2, carry2, m = jit_it(
        params, danet_vars, opt_state, shard_carry, jax.random.PRNGKey(2))
    assert np.isfinite(float(m.value_loss))
    assert np.isfinite(float(m.checksum))
    # params must come back replicated and updated
    delta = jax.tree_util.tree_reduce(
        lambda acc, ab: acc + float(jnp.abs(ab).sum()),
        jax.tree.map(lambda a, b: a - b, params2, params), 0.0)
    assert delta > 0.0
    # env state stays sharded over the data axis
    s = carry2.env_state.pos.sharding
    assert s.is_equivalent_to(data, carry2.env_state.pos.ndim)
