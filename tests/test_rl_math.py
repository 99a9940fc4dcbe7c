"""Unit tests for the RL math layer: GAE, distributions, rollout, PPO loss."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cadre_tpu.models.policy import LSTMModel, PolicyBankDef
from cadre_tpu.rl.distributions import (
    categorical_entropy,
    categorical_log_prob,
    categorical_sample,
    normal_entropy,
    normal_log_prob,
    ordinal_logits,
)
from cadre_tpu.rl.ppo import PPOConfig, make_update_fn, ppo_loss
from cadre_tpu.rl.rollout import (
    Minibatch,
    compute_gae,
    create_rollout,
    gather_minibatch,
    insert,
    minibatch_indices,
    normalize_advantages,
    rollout_returns,
)


def test_gae_matches_reference_loop():
    """lax.scan GAE vs the reference's python recursion (storage.py:68-76)."""
    rng = np.random.RandomState(0)
    T = 16
    reward = rng.randn(T).astype(np.float32)
    value = rng.randn(T).astype(np.float32)
    mask = (rng.rand(T) > 0.2).astype(np.float32)
    next_value = np.float32(0.37)
    gamma, tau = 0.99, 0.95

    value_ext = np.concatenate([value, [next_value]])
    returns_ref = np.zeros(T, np.float32)
    gae = 0.0
    for step in reversed(range(T)):
        delta = reward[step] + gamma * value_ext[step + 1] * mask[step] - \
            value_ext[step]
        gae = delta + gamma * tau * mask[step] * gae
        returns_ref[step] = gae + value_ext[step]

    returns, adv = compute_gae(jnp.asarray(reward), jnp.asarray(value),
                               jnp.asarray(mask), jnp.asarray(next_value),
                               gamma, tau)
    np.testing.assert_allclose(np.asarray(returns), returns_ref, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(adv), returns_ref - value,
                               rtol=1e-4, atol=1e-5)


def test_categorical_logprob_entropy():
    logits = jnp.asarray([[1.0, 2.0, 0.5], [0.0, 0.0, 0.0]])
    action = jnp.asarray([1, 2])
    lp = categorical_log_prob(logits, action)
    p = np.exp(np.asarray(logits)) / np.exp(np.asarray(logits)).sum(
        -1, keepdims=True)
    np.testing.assert_allclose(np.asarray(lp),
                               np.log(p[np.arange(2), [1, 2]]), rtol=1e-5)
    ent = categorical_entropy(logits)
    np.testing.assert_allclose(np.asarray(ent), -(p * np.log(p)).sum(-1),
                               rtol=1e-5)


def test_categorical_sampling_distribution():
    logits = jnp.log(jnp.asarray([0.7, 0.2, 0.1]))
    samples = categorical_sample(jnp.broadcast_to(logits, (20000, 3)),
                                 jax.random.PRNGKey(0))
    freq = np.bincount(np.asarray(samples), minlength=3) / 20000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.02)


def test_ordinal_logits_monotone_peak():
    raw = jnp.asarray([[3.0, 3.0, -3.0, -3.0]])
    logits = ordinal_logits(raw)
    assert int(jnp.argmax(logits)) == 1  # peak where sigmoid flips


def test_normal_logprob_matches_scipy_form():
    mean = jnp.asarray([[0.5, -0.5]])
    logstd = jnp.asarray([[0.1, 0.2]])
    action = jnp.asarray([[0.3, 0.0]])
    lp = normal_log_prob(mean, logstd, action)
    var = np.exp(2 * np.asarray(logstd))
    ref = (-0.5 * (np.asarray(action - mean) ** 2 / var)
           - np.asarray(logstd) - 0.5 * np.log(2 * np.pi)).sum(-1)
    np.testing.assert_allclose(np.asarray(lp), ref, rtol=1e-5)
    ent = normal_entropy(logstd)
    np.testing.assert_allclose(
        np.asarray(ent),
        (0.5 + 0.5 * np.log(2 * np.pi) + np.asarray(logstd)).sum(-1),
        rtol=1e-5)


def test_rollout_insert_and_ring():
    buf = create_rollout(num_steps=4, seq_length=2, feature_dims=3)
    obs = jnp.ones((2, 3))
    hidden = (jnp.ones((1, 3)) * 0.5, jnp.ones((1, 3)) * 0.25)
    for i in range(5):
        buf = insert(buf, obs * i, i % 2, 0.1 * i, 0.2 * i, 1.0, 1.0,
                     hidden, i % 4)
    assert int(buf.step) == 0  # wrapped (4+1 inserts mod 5)
    np.testing.assert_allclose(np.asarray(buf.obs[2]), 2.0 * np.ones((2, 3)))
    # hidden written at step+1 while step < T
    np.testing.assert_allclose(np.asarray(buf.hn[1]), 0.5 * np.ones(3))
    np.testing.assert_allclose(np.asarray(buf.cn[4]), 0.25 * np.ones(3))


def test_minibatch_indices_partition():
    idx = minibatch_indices(jax.random.PRNGKey(0), 200, 2)
    assert idx.shape == (2, 100)
    all_idx = np.sort(np.asarray(idx).ravel())
    np.testing.assert_array_equal(all_idx, np.arange(200))


@pytest.fixture(scope="module")
def small_banks():
    feature = 16
    steer_def = PolicyBankDef(num_commands=4, num_outputs=33,
                              feature_dim=feature)
    throttle_def = PolicyBankDef(num_commands=4, num_outputs=3,
                                 feature_dim=feature)
    steer_params = steer_def.init_params(jax.random.PRNGKey(0))
    throttle_params = throttle_def.init_params(jax.random.PRNGKey(1))
    return steer_def, throttle_def, steer_params, throttle_params


def _synthetic_minibatch(rng, feature, batch, seq, num_outputs):
    ks = jax.random.split(rng, 8)
    return Minibatch(
        obs_seq=jax.random.normal(ks[0], (seq, batch, feature)),
        action=jax.random.randint(ks[1], (batch,), 0, num_outputs),
        old_value=jax.random.normal(ks[2], (batch,)),
        returns=jax.random.normal(ks[3], (batch,)),
        mask=jnp.ones((batch,)),
        old_log_prob=-jnp.abs(jax.random.normal(ks[4], (batch,))),
        advantage=jax.random.normal(ks[5], (batch,)),
        hidden=(jax.random.normal(ks[6], (batch, feature)) * 0.1,
                jax.random.normal(ks[7], (batch, feature)) * 0.1),
        command=jax.random.randint(ks[1], (batch,), 0, 4),
    )


def test_bank_act_and_masked_eval_consistency(small_banks):
    """evaluate_masked must agree with per-command evaluation."""
    steer_def, _, steer_params, _ = small_banks
    feature, batch, seq = 16, 6, 3
    mb = _synthetic_minibatch(jax.random.PRNGKey(2), feature, batch, seq, 33)
    values, lps, ents = steer_def.evaluate_masked(
        steer_params, mb.obs_seq, mb.hidden, mb.action, mb.command)
    assert values.shape == (batch,)

    # manual: evaluate each sample against its own command bank via act path
    for i in range(batch):
        c = int(mb.command[i])
        obs_i = mb.obs_seq[:, i:i + 1, :]
        hid_i = (mb.hidden[0][i:i + 1], mb.hidden[1][i:i + 1])
        v_i = _eval_single(steer_def, steer_params, c, obs_i, hid_i,
                           mb.action[i:i + 1])
        np.testing.assert_allclose(float(values[i]), float(v_i), rtol=1e-4,
                                   atol=1e-5)


def _eval_single(bank_def, params, command, obs_seq, hidden, action):
    sel = jax.tree.map(lambda p: p[command], params)
    ac, lstm = bank_def.make_modules()
    feat = lstm.apply({"params": sel["lstm"]}, obs_seq, hidden,
                      method=LSTMModel.unroll)[1]
    logits, value = ac.apply({"params": sel["ac"]}, feat)
    return value[0, 0]


def test_ppo_loss_and_update(small_banks):
    steer_def, throttle_def, steer_params, throttle_params = small_banks
    params = {"steer": steer_params, "throttle": throttle_params}
    cfg = PPOConfig(num_steps=8, seq_length=3)
    mb_s = _synthetic_minibatch(jax.random.PRNGKey(3), 16, 8, 3, 33)
    mb_t = _synthetic_minibatch(jax.random.PRNGKey(4), 16, 8, 3, 3)

    total, aux = ppo_loss(params, steer_def, throttle_def, mb_s, mb_t, cfg)
    assert np.isfinite(float(total))
    expected = float(aux.value_loss + aux.action_loss - aux.entropy_loss)
    np.testing.assert_allclose(float(total), expected, rtol=1e-6)

    import optax
    from cadre_tpu.rl.ppo import make_optimizer
    opt_state = make_optimizer(cfg).init(params)
    update = jax.jit(make_update_fn(steer_def, throttle_def, cfg))
    new_params, new_opt_state, aux2 = update(params, opt_state, mb_s, mb_t)
    # params changed
    leaf0 = jax.tree_util.tree_leaves(params)[0]
    leaf1 = jax.tree_util.tree_leaves(new_params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_rollout_end_to_end_gae(small_banks):
    buf = create_rollout(num_steps=8, seq_length=2, feature_dims=4)
    for i in range(8):
        buf = insert(buf, jnp.ones((2, 4)) * i, 0, -0.5, 0.1 * i, 1.0,
                     1.0 if i < 7 else 0.0,
                     (jnp.zeros((1, 4)), jnp.zeros((1, 4))), 0)
    returns, adv = rollout_returns(buf, jnp.asarray(0.0), 0.99, 0.95)
    assert returns.shape == (8,)
    adv_n = normalize_advantages(adv)
    assert abs(float(adv_n.mean())) < 1e-5
    mb = gather_minibatch(buf, returns, adv_n,
                          minibatch_indices(jax.random.PRNGKey(0), 8, 2)[0])
    assert mb.obs_seq.shape == (2, 4, 4)


def test_ordinal_policy_bank_acts_and_updates():
    """The reference's dormant ordinal transform (distributions.py:68-79)
    exposed as a working option: act + masked evaluation + grads flow."""
    f = 10
    bank = PolicyBankDef(num_commands=4, num_outputs=7, feature_dim=f,
                         ordinal=True)
    params = bank.init_params(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, f))
    carry = (jnp.zeros((3, f)), jnp.zeros((3, f)))
    out, _ = bank.act_batch(params, jnp.asarray([0, 1, 2]), obs, carry,
                            jax.random.PRNGKey(2))
    assert out.action.shape == (3,)
    assert np.isfinite(np.asarray(out.log_prob)).all()
    values, lps, ents = bank.evaluate_masked(
        params, obs, carry, out.action, jnp.asarray([0, 1, 2]))
    assert np.isfinite(np.asarray(lps)).all()

    def loss(p):
        _, lps, _ = bank.evaluate_masked(p, obs, carry, out.action,
                                         jnp.asarray([0, 1, 2]))
        return -lps.sum()

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_transformer_memory_bank():
    """Beyond-parity transformer memory: act + masked eval + grads."""
    f = 12
    bank = PolicyBankDef(num_commands=4, num_outputs=5, feature_dim=f,
                         memory="transformer")
    params = bank.init_params(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 3, f))  # [T,N,F]
    carry = (jnp.zeros((3, f)), jnp.zeros((3, f)))
    out, _ = bank.act_batch(params, jnp.asarray([0, 1, 2]), obs, carry,
                            jax.random.PRNGKey(2))
    assert out.action.shape == (3,)
    assert np.isfinite(np.asarray(out.log_prob)).all()
    # causality: changing the OLDEST frame must not change nothing... it may
    # (full window feeds the final token); but changing a FUTURE frame can't
    # exist here. Instead check window-only memory: same last frames, carry
    # ignored -> same output regardless of carry
    carry2 = (jnp.ones((3, f)), jnp.ones((3, f)))
    out2, _ = bank.act_batch(params, jnp.asarray([0, 1, 2]), obs, carry2,
                             jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(out2.logits), atol=1e-6)

    def loss(p):
        _, lps, _ = bank.evaluate_masked(p, obs, carry, out.action,
                                         jnp.asarray([0, 1, 2]))
        return -lps.sum()

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_batched_ring_pointer_resets_between_iterations():
    """The vec path must reset its ring pointer each iteration: the
    reference defines but never calls after_update (storage.py:60-66), so
    its rows drift by one per episode — we keep corrected semantics."""
    from cadre_tpu.rl.rollout import (
        after_update_batched,
        create_batched_rollout,
        insert_batch,
    )

    t, n, seq, f = 4, 2, 3, 5
    buf = create_batched_rollout(t, n, seq, f)
    zeros = dict(
        obs=jnp.zeros((n, seq, f)), action=jnp.zeros((n,), jnp.int32),
        log_prob=jnp.zeros((n,)), value=jnp.zeros((n,)),
        mask=jnp.ones((n,)),
        hidden=(jnp.zeros((n, f)), jnp.zeros((n, f))),
        command=jnp.zeros((n,), jnp.int32))
    for k in range(t):
        buf = insert_batch(buf, reward=jnp.full((n,), float(k)), **zeros)
    assert int(buf.step) == t            # pointer past the last row
    buf = after_update_batched(buf)
    assert int(buf.step) == 0
    # second iteration lands at rows 0..t-1 again, in time order
    for k in range(t):
        buf = insert_batch(buf, reward=jnp.full((n,), 10.0 + k), **zeros)
    np.testing.assert_allclose(np.asarray(buf.reward[:t, 0]),
                               [10.0, 11.0, 12.0, 13.0])
