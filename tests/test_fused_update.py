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


def test_sharded_update_matches_single_device_full_batch():
    """Manual-SPMD update (shard_map: per-device minibatches + psum-mean
    grads) must equal the single-device update when both use ONE full
    minibatch per epoch: the union of per-device minibatches is then the
    global batch, so psum-mean(local grads) == global full-batch grad
    (Shared_grad_buffers semantics, ppo_agent/models.py:219-258)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cadre_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    f, t, n, seq = 12, 4, 8, 3
    steer = PolicyBankDef(4, 5, f)
    throttle = PolicyBankDef(4, 3, f)
    params = {"steer": steer.init_params(jax.random.PRNGKey(0)),
              "throttle": throttle.init_params(jax.random.PRNGKey(1))}
    cfg = PPOConfig(ppo_epoch=1, num_steps=t, seq_length=seq)
    rcfg = RolloutConfig(num_steps=t, mini_batch_num=1, seq_length=seq,
                         feature_dims=f)
    opt_state = make_optimizer(cfg).init(params)
    sb = _filled_buffer(jax.random.PRNGKey(2), t, n, seq, f, 5)
    tb = _filled_buffer(jax.random.PRNGKey(3), t, n, seq, f, 3)
    nv = (jnp.zeros((n,)), jnp.zeros((n,)))

    single = make_fused_iteration_update(steer, throttle, cfg, rcfg)
    p1, _, aux1 = single(params, opt_state, sb, tb, nv,
                         jax.random.PRNGKey(4))

    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    put = lambda tree, s: jax.tree.map(  # noqa: E731
        lambda x: jax.device_put(x, s), tree)
    put_buf = lambda tree: jax.tree.map(  # noqa: E731
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(None, "data"))
            if getattr(x, "ndim", 0) >= 2 else repl), tree)
    sharded = make_fused_iteration_update(steer, throttle, cfg, rcfg,
                                          mesh=mesh)
    p2, _, aux2 = sharded(
        put(params, repl), put(opt_state, repl), put_buf(sb),
        put_buf(tb), put(nv, NamedSharding(mesh, P("data"))),
        jax.device_put(jax.random.PRNGKey(4), repl))

    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    assert np.isfinite(float(aux2.value_loss))


def test_sharded_update_partitioned_hlo_has_no_allgather():
    """The regression the shard_map path exists to prevent: GSPMD turning
    the minibatch gathers into per-field all-gathers of the rollout
    buffers (BENCH_r5_mesh_profile.json: 20 all-gathers at n=2)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cadre_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    f, t, n, seq = 12, 4, 8, 3
    steer = PolicyBankDef(4, 5, f)
    throttle = PolicyBankDef(4, 3, f)
    params = {"steer": steer.init_params(jax.random.PRNGKey(0)),
              "throttle": throttle.init_params(jax.random.PRNGKey(1))}
    cfg = PPOConfig(ppo_epoch=2, num_steps=t, seq_length=seq)
    rcfg = RolloutConfig(num_steps=t, mini_batch_num=2, seq_length=seq,
                         feature_dims=f)
    opt_state = make_optimizer(cfg).init(params)
    sb = _filled_buffer(jax.random.PRNGKey(2), t, n, seq, f, 5)
    tb = _filled_buffer(jax.random.PRNGKey(3), t, n, seq, f, 3)
    nv = (jnp.zeros((n,)), jnp.zeros((n,)))
    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    put = lambda tree, s: jax.tree.map(  # noqa: E731
        lambda x: jax.device_put(x, s), tree)
    put_buf = lambda tree: jax.tree.map(  # noqa: E731
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(None, "data"))
            if getattr(x, "ndim", 0) >= 2 else repl), tree)
    sharded = make_fused_iteration_update(steer, throttle, cfg, rcfg,
                                          mesh=mesh)
    args = (put(params, repl), put(opt_state, repl), put_buf(sb),
            put_buf(tb), put(nv, NamedSharding(mesh, P("data"))),
            jax.device_put(jax.random.PRNGKey(4), repl))
    hlo = jax.jit(sharded).lower(*args).compile().as_text()
    n_ag = sum(1 for ln in hlo.splitlines()
               if " all-gather(" in ln or " all-gather-start(" in ln)
    assert n_ag == 0, f"update still all-gathers rollout buffers ({n_ag})"


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
