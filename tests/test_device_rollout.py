"""On-device rollout+update loop over JaxDrivingEnv
(cadre_tpu/rl/device_rollout.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadre_tpu.configs.agent_config import RolloutConfig, TrainConfig
from cadre_tpu.configs.danet_config import danet_params
from cadre_tpu.envs.jax_env import (
    JaxDrivingEnv,
    JaxEnvConfig,
    make_route_bank,
)
from cadre_tpu.rl.agent import CadreAgent


@pytest.mark.slow
def test_device_iteration_trains_and_is_finite():
    from cadre_tpu.rl.device_rollout import make_device_iteration
    from cadre_tpu.rl.ppo import make_optimizer

    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=danet_params(
        da_feature_channel=32, inter_att_dims=24, z_dims=16))
    bank = make_route_bank(3, seed=0)
    env = JaxDrivingEnv(bank, num_envs=2, config=JaxEnvConfig())
    rollout_cfg = RolloutConfig(num_steps=10)
    iteration, init_carry = make_device_iteration(
        agent, env, rollout_cfg, TrainConfig(ppo_epoch=2))
    jit_it = jax.jit(iteration)
    opt_state = make_optimizer(agent.ppo_cfg).init(agent.params)
    carry = init_carry(agent.danet_vars, jax.random.PRNGKey(1))

    params0 = agent.params
    params, opt_state, carry, m = jit_it(
        params0, agent.danet_vars, opt_state, carry, jax.random.PRNGKey(2))
    params, opt_state, carry, m = jit_it(
        params, agent.danet_vars, opt_state, carry, jax.random.PRNGKey(3))

    # finite metrics, params actually updated, carry keeps moving
    for leaf in [m.value_loss, m.policy_loss, m.entropy_loss,
                 m.mean_steer_reward, m.mean_throttle_reward]:
        assert np.isfinite(float(leaf))
    delta = jax.tree_util.tree_reduce(
        lambda acc, ab: acc + float(jnp.abs(ab).sum()),
        jax.tree.map(lambda a, b: a - b, params, params0), 0.0)
    assert delta > 0.0
    assert int(np.asarray(carry.env_state.step).min()) > 0
    # rollout features are the production 530-dim cascade features
    assert carry.feat_hist.shape == (rollout_cfg.seq_length, 2,
                                     agent.obs_dim)
