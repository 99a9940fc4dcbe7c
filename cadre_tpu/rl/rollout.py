"""Rollout storage as an immutable pytree + lax.scan GAE.

Behavioral contract from ppo_agent/storage.py:
  - Per-signal buffer (one each for steer and throttle) with [T+1] slots:
    obs [T+1, seq, F], action/log_prob/value/reward/mask/command [T+1],
    LSTM hidden (hn, cn) [T+1, F]; insert ring-advances step mod (T+1)
    (:45-58); hidden is stored at step+1 (the state *entering* the next step).
  - compute_returns: GAE(gamma, tau) reverse recursion (:68-86) — here a
    single lax.scan instead of the python loop.
  - feed_forward_generator: random minibatches over [0, T); obs permuted
    [B, seq, F] -> [seq, B, F] for LSTM unrolling (:93-120).

TPU-first: the buffer is a frozen dataclass of arrays; `insert` is a pure
function using .at[] updates (device-side, jit-able); minibatching uses a
permutation from an explicit rng.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import chex
import jax
import jax.numpy as jnp


@chex.dataclass(frozen=True)
class Rollout:
    obs: jax.Array          # [T+1, seq, F]
    action: jax.Array       # [T+1] int32
    log_prob: jax.Array     # [T+1]
    value: jax.Array        # [T+1]
    reward: jax.Array       # [T+1]
    mask: jax.Array         # [T+1]  (1.0 = not done after this step)
    command: jax.Array      # [T+1] int32
    hn: jax.Array           # [T+1, F]
    cn: jax.Array           # [T+1, F]
    step: jax.Array         # scalar int32 ring pointer

    @property
    def num_steps(self) -> int:
        return self.obs.shape[0] - 1

    @property
    def seq_length(self) -> int:
        return self.obs.shape[1]


def create_rollout(num_steps: int, seq_length: int, feature_dims: int,
                   hidden_size: int | None = None) -> Rollout:
    hidden_size = hidden_size or feature_dims
    t1 = num_steps + 1
    return Rollout(
        obs=jnp.zeros((t1, seq_length, feature_dims)),
        action=jnp.zeros((t1,), jnp.int32),
        log_prob=jnp.zeros((t1,)),
        value=jnp.zeros((t1,)),
        reward=jnp.zeros((t1,)),
        mask=jnp.zeros((t1,)),
        command=jnp.zeros((t1,), jnp.int32),
        hn=jnp.zeros((t1, hidden_size)),
        cn=jnp.zeros((t1, hidden_size)),
        step=jnp.zeros((), jnp.int32),
    )


def insert(buf: Rollout, obs, action, log_prob, value, reward, mask,
           hidden, command) -> Rollout:
    """Pure insert at the ring pointer (storage.py:45-58).

    hidden (hn, cn) is written to slot step+1 only while step < T, matching
    the reference's guard.
    """
    s = buf.step
    t = buf.num_steps
    store_hidden = s < t
    sp1 = jnp.minimum(s + 1, t)
    hn, cn = hidden
    new = Rollout(
        obs=buf.obs.at[s].set(obs),
        action=buf.action.at[s].set(jnp.asarray(action, jnp.int32).reshape(())),
        log_prob=buf.log_prob.at[s].set(jnp.reshape(log_prob, ())),
        value=buf.value.at[s].set(jnp.reshape(value, ())),
        reward=buf.reward.at[s].set(jnp.reshape(reward, ())),
        mask=buf.mask.at[s].set(jnp.reshape(mask, ())),
        command=buf.command.at[s].set(jnp.asarray(command, jnp.int32).reshape(())),
        hn=jnp.where(store_hidden, buf.hn.at[sp1].set(jnp.reshape(hn, (-1,))),
                     buf.hn),
        cn=jnp.where(store_hidden, buf.cn.at[sp1].set(jnp.reshape(cn, (-1,))),
                     buf.cn),
        step=(s + 1) % (t + 1),
    )
    return new


def after_update(buf: Rollout, hidden) -> Rollout:
    """Reset ring pointer; seed slot-0 hidden from the live LSTM state
    (storage.py:60-66)."""
    hn, cn = hidden
    return buf.replace(
        step=jnp.zeros((), jnp.int32),
        hn=buf.hn.at[0].set(jnp.reshape(hn, (-1,))),
        cn=buf.cn.at[0].set(jnp.reshape(cn, (-1,))),
    )


def compute_gae(reward: jax.Array, value: jax.Array, mask: jax.Array,
                next_value: jax.Array, gamma: float, tau: float
                ) -> Tuple[jax.Array, jax.Array]:
    """GAE returns/advantages via reversed lax.scan (storage.py:68-76).

    reward/value/mask: [T] (slots 0..T-1); next_value: scalar bootstrap.
    Returns (returns [T], advantages [T]) with
      delta_t = r_t + gamma * V_{t+1} * m_t - V_t
      gae_t   = delta_t + gamma * tau * m_t * gae_{t+1}.
    """
    value_tp1 = jnp.concatenate([value[1:], jnp.reshape(next_value, (1,))])

    def scan_fn(gae, inp):
        r, v, v_next, m = inp
        delta = r + gamma * v_next * m - v
        gae = delta + gamma * tau * m * gae
        return gae, gae

    _, adv_rev = jax.lax.scan(
        scan_fn, jnp.zeros_like(next_value).reshape(()),
        (reward[::-1], value[::-1], value_tp1[::-1], mask[::-1]))
    adv = adv_rev[::-1]
    return adv + value, adv


def rollout_returns(buf: Rollout, next_value: jax.Array, gamma: float,
                    tau: float):
    """Apply GAE over the buffer's first T slots (value[-1] <- bootstrap)."""
    t = buf.num_steps
    return compute_gae(buf.reward[:t], buf.value[:t], buf.mask[:t],
                       next_value, gamma, tau)


def normalize_advantages(adv: jax.Array) -> jax.Array:
    """(adv - mean) / (std + 1e-8) (ppo_agent/train.py:85-88)."""
    return (adv - adv.mean()) / (adv.std() + 1e-8)


@chex.dataclass(frozen=True)
class BatchedRollout:
    """[T+1, N, ...] multi-env rollout (the vectorized trainer's storage)."""

    obs: jax.Array          # [T+1, N, seq, F]
    action: jax.Array       # [T+1, N]
    log_prob: jax.Array
    value: jax.Array
    reward: jax.Array
    mask: jax.Array
    command: jax.Array
    hn: jax.Array           # [T+1, N, F]
    cn: jax.Array
    step: jax.Array

    @property
    def num_steps(self) -> int:
        return self.obs.shape[0] - 1

    @property
    def num_envs(self) -> int:
        return self.obs.shape[1]


def create_batched_rollout(num_steps: int, num_envs: int, seq_length: int,
                           feature_dims: int) -> BatchedRollout:
    t1, n, f = num_steps + 1, num_envs, feature_dims
    return BatchedRollout(
        obs=jnp.zeros((t1, n, seq_length, f)),
        action=jnp.zeros((t1, n), jnp.int32),
        log_prob=jnp.zeros((t1, n)),
        value=jnp.zeros((t1, n)),
        reward=jnp.zeros((t1, n)),
        mask=jnp.zeros((t1, n)),
        command=jnp.zeros((t1, n), jnp.int32),
        hn=jnp.zeros((t1, n, f)),
        cn=jnp.zeros((t1, n, f)),
        step=jnp.zeros((), jnp.int32),
    )


def after_update_batched(buf: BatchedRollout,
                         hidden=None) -> BatchedRollout:
    """Reset the ring pointer between iterations (storage.py:60-66).

    The reference DEFINES after_update but never calls it, so its write
    pointer drifts by one row per episode (row t_steps written, GAE reading
    a rotated window with one stale row). We keep the corrected semantics —
    every iteration's transitions land at rows 0..t-1 in time order."""
    hn_cn = {}
    if hidden is not None:
        hn, cn = hidden
        hn_cn = dict(hn=buf.hn.at[0].set(hn), cn=buf.cn.at[0].set(cn))
    return buf.replace(step=jnp.zeros((), jnp.int32), **hn_cn)


def insert_batch(buf: BatchedRollout, obs, action, log_prob, value, reward,
                 mask, hidden, command) -> BatchedRollout:
    """Batched insert at the ring pointer; all args have leading [N]."""
    s = buf.step
    t = buf.num_steps
    sp1 = jnp.minimum(s + 1, t)
    store_hidden = s < t
    hn, cn = hidden
    return BatchedRollout(
        obs=buf.obs.at[s].set(obs),
        action=buf.action.at[s].set(jnp.asarray(action, jnp.int32)),
        log_prob=buf.log_prob.at[s].set(log_prob),
        value=buf.value.at[s].set(value),
        reward=buf.reward.at[s].set(reward),
        mask=buf.mask.at[s].set(mask),
        command=buf.command.at[s].set(jnp.asarray(command, jnp.int32)),
        hn=jnp.where(store_hidden, buf.hn.at[sp1].set(hn), buf.hn),
        cn=jnp.where(store_hidden, buf.cn.at[sp1].set(cn), buf.cn),
        step=(s + 1) % (t + 1),
    )


def batched_returns(buf: BatchedRollout, next_value: jax.Array, gamma: float,
                    tau: float):
    """GAE per env (vmapped over N). next_value: [N]."""
    t = buf.num_steps
    fn = jax.vmap(compute_gae, in_axes=(1, 1, 1, 0, None, None),
                  out_axes=1)
    return fn(buf.reward[:t], buf.value[:t], buf.mask[:t], next_value,
              gamma, tau)


def gather_minibatch_batched(buf: BatchedRollout, returns: jax.Array,
                             adv: jax.Array, flat_idx: jax.Array
                             ) -> "Minibatch":
    """flat_idx over T*N rows of the flattened [T,N] rollout."""
    t, n = buf.num_steps, buf.num_envs

    def flat(x):
        return x[:t].reshape((t * n,) + x.shape[2:])

    obs = flat(buf.obs)[flat_idx]                      # [B, seq, F]
    return Minibatch(
        obs_seq=jnp.transpose(obs, (1, 0, 2)),
        action=flat(buf.action)[flat_idx],
        old_value=flat(buf.value)[flat_idx],
        returns=returns.reshape(-1)[flat_idx],
        mask=flat(buf.mask)[flat_idx],
        old_log_prob=flat(buf.log_prob)[flat_idx],
        advantage=adv.reshape(-1)[flat_idx],
        hidden=(flat(buf.hn)[flat_idx], flat(buf.cn)[flat_idx]),
        command=flat(buf.command)[flat_idx],
    )


class Minibatch(NamedTuple):
    obs_seq: jax.Array      # [seq, B, F]
    action: jax.Array       # [B]
    old_value: jax.Array    # [B]
    returns: jax.Array      # [B]
    mask: jax.Array         # [B]
    old_log_prob: jax.Array  # [B]
    advantage: jax.Array    # [B]
    hidden: Tuple[jax.Array, jax.Array]  # ([B,F], [B,F])
    command: jax.Array      # [B]


def gather_minibatch(buf: Rollout, returns: jax.Array, adv: jax.Array,
                     indices: jax.Array) -> Minibatch:
    """Materialize one minibatch (storage.py:98-120); obs -> [seq, B, F]."""
    return Minibatch(
        obs_seq=jnp.transpose(buf.obs[indices], (1, 0, 2)),
        action=buf.action[indices],
        old_value=buf.value[indices],
        returns=returns[indices],
        mask=buf.mask[indices],
        old_log_prob=buf.log_prob[indices],
        advantage=adv[indices],
        hidden=(buf.hn[indices], buf.cn[indices]),
        command=buf.command[indices],
    )


def minibatch_indices(rng: jax.Array, num_steps: int,
                      mini_batch_num: int) -> jax.Array:
    """Random permutation split into mini_batch_num chunks: [M, B]."""
    perm = jax.random.permutation(rng, num_steps)
    size = num_steps // mini_batch_num
    return perm[: size * mini_batch_num].reshape(mini_batch_num, size)
