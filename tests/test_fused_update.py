"""Fused whole-iteration update tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cadre_tpu.configs.agent_config import RolloutConfig, TrainConfig
from cadre_tpu.configs.danet_config import danet_params
from cadre_tpu.envs.fake_env import FakeDrivingEnv
from cadre_tpu.envs.vec_env import VecDrivingEnv
from cadre_tpu.models.policy import PolicyBankDef
from cadre_tpu.rl.agent import CadreAgent
from cadre_tpu.rl.fused_update import make_fused_iteration_update
from cadre_tpu.rl.ppo import PPOConfig, make_optimizer
from cadre_tpu.rl.rollout import create_batched_rollout, insert_batch
from cadre_tpu.rl.vec_train import train_vec

SMALL = danet_params(image_height=64, image_width=96, feat_h=2, feat_w=3,
                     da_feature_channel=64, inter_att_dims=48, z_dims=32)


def _filled_buffer(key, t, n, seq, f, nout):
    buf = create_batched_rollout(t, n, seq, f)
    ks = jax.random.split(key, t)
    for i in range(t):
        kk = jax.random.split(ks[i], 5)
        buf = insert_batch(
            buf, jax.random.normal(kk[0], (n, seq, f)),
            jax.random.randint(kk[1], (n,), 0, nout),
            -jnp.abs(jax.random.normal(kk[2], (n,))),
            jax.random.normal(kk[3], (n,)) * 0.1,
            jax.random.normal(kk[4], (n,)),
            jnp.ones((n,)),
            (jnp.zeros((n, f)), jnp.zeros((n, f))),
            jax.random.randint(kk[1], (n,), 0, 4))
    return buf


def test_fused_update_runs_and_improves():
    f, t, n, seq = 12, 6, 4, 3
    steer = PolicyBankDef(4, 5, f)
    throttle = PolicyBankDef(4, 3, f)
    params = {"steer": steer.init_params(jax.random.PRNGKey(0)),
              "throttle": throttle.init_params(jax.random.PRNGKey(1))}
    cfg = PPOConfig(ppo_epoch=2, num_steps=t, seq_length=seq)
    rcfg = RolloutConfig(num_steps=t, mini_batch_num=2, seq_length=seq,
                         feature_dims=f)
    opt_state = make_optimizer(cfg).init(params)
    fused = make_fused_iteration_update(steer, throttle, cfg, rcfg)
    sb = _filled_buffer(jax.random.PRNGKey(2), t, n, seq, f, 5)
    tb = _filled_buffer(jax.random.PRNGKey(3), t, n, seq, f, 3)
    nv = (jnp.zeros((n,)), jnp.zeros((n,)))
    p1, o1, aux1 = fused(params, opt_state, sb, tb, nv,
                         jax.random.PRNGKey(4))
    assert np.isfinite(float(aux1.value_loss))
    # params moved
    l0 = jax.tree_util.tree_leaves(params)[0]
    l1 = jax.tree_util.tree_leaves(p1)[0]
    assert not np.allclose(np.asarray(l0), np.asarray(l1))
    # a few more fused iterations reduce the value loss on the same data
    aux_prev = aux1
    for i in range(4):
        p1, o1, aux_prev = fused(p1, o1, sb, tb, nv,
                                 jax.random.PRNGKey(5 + i))
    assert float(aux_prev.value_loss) < float(aux1.value_loss)


def test_train_vec_fused_path(tmp_path):
    vec = VecDrivingEnv([
        lambda i=i: FakeDrivingEnv(episode_length=10, seq_length=3,
                                   height=64, width=96, seed=i)
        for i in range(3)])
    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=SMALL)
    rollout_cfg = RolloutConfig(num_steps=6, mini_batch_num=2, seq_length=3,
                                feature_dims=agent.obs_dim)
    stats = train_vec(vec, agent, rollout_cfg,
                      TrainConfig(ppo_epoch=2, log_interval=1,
                                  save_interval=10),
                      iterations=2, fused_update=True)
    assert len(stats) == 2
    assert all(np.isfinite(s.value_loss) for s in stats)
