"""Vectorized env/trainer tests."""
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
from cadre_tpu.rl.rollout import (
    batched_returns,
    compute_gae,
    create_batched_rollout,
    gather_minibatch_batched,
    insert_batch,
)
from cadre_tpu.rl.vec_train import train_vec

SMALL = danet_params(image_height=64, image_width=96, feat_h=2, feat_w=3,
                     da_feature_channel=64, inter_att_dims=48, z_dims=32)


def test_act_batch_matches_act_seq():
    """Batched dense-all-banks act must equal per-env act_seq selection."""
    f = 12
    bank = PolicyBankDef(4, 5, f)
    params = bank.init_params(jax.random.PRNGKey(0))
    t, n = 3, 6
    obs = jax.random.normal(jax.random.PRNGKey(1), (t, n, f))
    carry = (jnp.zeros((n, f)), jnp.zeros((n, f)))
    commands = jnp.asarray([0, 1, 2, 3, 1, 0])
    rng = jax.random.PRNGKey(2)
    out, new_carry = bank.act_batch(params, commands, obs, carry, rng)
    assert out.action.shape == (n,)
    # values/logits must match per-env evaluation with the env's own bank
    for i in range(int(n)):
        obs_i = obs[:, i:i + 1]
        carry_i = (carry[0][i:i + 1], carry[1][i:i + 1])
        out_i, carry_i2 = bank.act_seq(params, int(commands[i]), obs_i,
                                       carry_i, rng)
        np.testing.assert_allclose(float(out.value[i]),
                                   float(out_i.value[0]), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.logits[i]),
                                   np.asarray(out_i.logits[0]), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_carry[0][i]),
                                   np.asarray(carry_i2[0][0]), rtol=1e-4,
                                   atol=1e-5)


def test_batched_rollout_and_gae():
    t, n, seq, f = 5, 3, 2, 4
    buf = create_batched_rollout(t, n, seq, f)
    for i in range(t):
        buf = insert_batch(
            buf, jnp.ones((n, seq, f)) * i, jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,)), jnp.ones((n,)) * 0.1, jnp.ones((n,)) * (i + 1),
            jnp.ones((n,)), (jnp.zeros((n, f)), jnp.zeros((n, f))),
            jnp.zeros((n,), jnp.int32))
    returns, adv = batched_returns(buf, jnp.zeros((n,)), 0.99, 0.95)
    assert returns.shape == (t, n)
    # each env identical -> per-env GAE equals single-env GAE
    r1, a1 = compute_gae(buf.reward[:t, 0], buf.value[:t, 0],
                         buf.mask[:t, 0], jnp.asarray(0.0), 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(returns[:, 1]), np.asarray(r1),
                               rtol=1e-5)
    mb = gather_minibatch_batched(buf, returns, adv,
                                  jnp.arange(t * n)[:8])
    assert mb.obs_seq.shape == (seq, 8, f)


def test_train_vec_fake_envs(tmp_path):
    vec = VecDrivingEnv([
        lambda i=i: FakeDrivingEnv(episode_length=10, seq_length=3,
                                   height=64, width=96, seed=i)
        for i in range(4)])
    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=SMALL)
    rollout_cfg = RolloutConfig(num_steps=6, mini_batch_num=2, seq_length=3,
                                feature_dims=agent.obs_dim)
    train_cfg = TrainConfig(ppo_epoch=2, log_interval=1, save_interval=1)
    stats = train_vec(vec, agent, rollout_cfg, train_cfg, iterations=2,
                      work_dir=str(tmp_path))
    assert len(stats) == 2
    assert all(np.isfinite(s.value_loss) for s in stats)
    assert stats[0].env_steps == 24
    import os

    assert os.path.exists(tmp_path / "models" / "ppo_model_0.msgpack")


def test_incremental_features_match_full_recompute():
    """Device-resident shifted feature history must equal full-window
    recompute (deterministic encoder, matching env window semantics)."""
    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=SMALL)
    n, t, h, w = 3, 3, 64, 96
    rng = np.random.RandomState(0)

    def make_tick(step):
        rgb = rng.randint(0, 255, (n, t, h, w, 3)).astype(np.uint8)
        route = (rng.rand(n, t, w, h) * 255).astype(np.uint8)
        meas = rng.rand(n, t, 3).astype(np.float32)
        return {"rgb": rgb, "route_fig": route, "measurements": meas,
                "command": np.zeros(n, np.int32)}

    ticks = [make_tick(i) for i in range(4)]
    # simulate the env's shifting window: tick k+1 shares frames 1..T-1
    for k in range(1, 4):
        ticks[k]["rgb"][:, :-1] = ticks[k - 1]["rgb"][:, 1:]
        ticks[k]["route_fig"][:, :-1] = ticks[k - 1]["route_fig"][:, 1:]
        ticks[k]["measurements"][:, :-1] = ticks[k - 1]["measurements"][:, 1:]

    hidden = (jnp.zeros((n, agent.obs_dim)), jnp.zeros((n, agent.obs_dim)))
    feat_hist = None
    for k, tick in enumerate(ticks):
        _, _, _, feat_hist = agent.act_vec_incremental(
            tick, feat_hist, hidden, jax.random.PRNGKey(k),
            refresh=(k == 0))
        full_feats, *_ = agent.act_vec(tick, hidden, jax.random.PRNGKey(k))
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(feat_hist, (1, 0, 2))),
            np.asarray(full_feats), rtol=2e-4, atol=2e-5)


def test_fused_tick_matches_incremental_plus_store():
    """The deferred-store fused tick (agent.act_vec_store) must produce
    bit-identical actions AND rollout buffers to the prior two-dispatch
    path (act_vec_incremental + insert_batch). (The incremental encoder
    itself differs from full-window recompute by ~3e-3 in values — an
    XLA batch-shape numeric, present since round 1 — so the comparison
    target is the incremental path, not act_vec.)"""
    from cadre_tpu.rl.rollout import create_batched_rollout, insert_batch

    def mkenv():
        return VecDrivingEnv([
            (lambda k=k: FakeDrivingEnv(episode_length=12, seq_length=3,
                                        height=64, width=96, seed=k))
            for k in range(2)])

    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=SMALL)
    n, t_steps, seq, f = 2, 6, 3, agent.obs_dim
    hidden = (jnp.zeros((n, f)), jnp.zeros((n, f)))
    rng = jax.random.PRNGKey(7)
    controls = [[0.0, 0.5, 0.0]] * n

    # reference run: old incremental act + separate store dispatch. The
    # hidden carry ADVANCES each tick (update_hidden=True semantics): the
    # store must record the pre-act carry of each transition, which the
    # deferred-store path has to thread through `pending`.
    env = mkenv()
    tick = env.reset()
    sb0 = create_batched_rollout(t_steps, n, seq, f)
    tb0 = create_batched_rollout(t_steps, n, seq, f)
    r, hist, need, acts0, hid = rng, None, True, [], hidden
    for step in range(t_steps):
        r, key = jax.random.split(r)
        so, to_, hid_new, hist = agent.act_vec_incremental(tick, hist, hid,
                                                           key, refresh=need)
        need = False
        acts0.append(np.asarray(so.action))
        feats = jnp.transpose(hist, (1, 0, 2))
        cmds = jnp.asarray(tick["command"], jnp.int32)
        tick, rewards, dones, infos = env.step(controls)
        if np.any(dones):
            need = True
        sb0 = insert_batch(sb0, feats, so.action, so.log_prob, so.value,
                           jnp.asarray(rewards[:, 0]), jnp.ones((n,)),
                           hid, cmds)
        tb0 = insert_batch(tb0, feats, to_.action, to_.log_prob, to_.value,
                           jnp.asarray(rewards[:, 1]), jnp.ones((n,)),
                           hid, cmds)
        hid = hid_new

    # fused run: same seeds, deferred store inside the act dispatch
    env = mkenv()
    tick = env.reset()
    sb1 = create_batched_rollout(t_steps, n, seq, f)
    tb1 = create_batched_rollout(t_steps, n, seq, f)
    r, hist, need, pend, acts1, hid = rng, None, True, None, [], hidden
    for step in range(t_steps):
        r, key = jax.random.split(r)
        so, to_, hid_new, hist, sb1, tb1 = agent.act_vec_store(
            tick, hist, hid, key, sb1, tb1,
            pend or agent.zero_pending(n), store=pend is not None,
            refresh=need)
        need = False
        acts1.append(np.asarray(so.action))
        cmds = np.asarray(tick["command"], np.int32)
        tick, rewards, dones, infos = env.step(controls)
        if np.any(dones):
            need = True
        pend = (so, to_, cmds, np.asarray(rewards, np.float32),
                np.ones(n, np.float32), np.ones(n, np.float32), hid)
        hid = hid_new
    # flush the final pending transition (the bootstrap dispatch's role)
    r, key = jax.random.split(r)
    _, _, _, hist, sb1, tb1 = agent.act_vec_store(
        tick, hist, hid, key, sb1, tb1, pend, store=True, refresh=need)

    np.testing.assert_array_equal(np.stack(acts0), np.stack(acts1))
    for a, b in zip(jax.tree_util.tree_leaves((sb0, tb0)),
                    jax.tree_util.tree_leaves((sb1, tb1))):
        if np.asarray(a).dtype == np.int32 and np.asarray(a).ndim == 0:
            continue                      # ring pointers advance differently
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)
