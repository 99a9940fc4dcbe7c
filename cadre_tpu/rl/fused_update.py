"""Whole-iteration PPO update fused into one jitted program.

The reference's update phase is a python loop of ppo_epoch x minibatch
steps, each a separate device round trip (train.py:93-110). Here the entire
phase — GAE for both signals, advantage normalization, epoch permutations,
and every minibatch's gradient/clip/Adam step — is one lax.scan inside one
jit: a single dispatch per training iteration, with rollout buffers resident
on device. This is the dispatch-bound fix for remote/low-latency-sensitive
deployments and the idiomatic XLA shape for the update loop generally.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from cadre_tpu.configs.agent_config import RolloutConfig
from cadre_tpu.models.policy import PolicyBankDef
from cadre_tpu.rl.ppo import LossAux, PPOConfig, make_optimizer, ppo_loss
from cadre_tpu.rl.rollout import (
    BatchedRollout,
    batched_returns,
    gather_minibatch_batched,
    normalize_advantages,
)


def make_fused_iteration_update(steer_def: PolicyBankDef,
                                throttle_def: PolicyBankDef,
                                cfg: PPOConfig,
                                rollout_cfg: RolloutConfig) -> Callable:
    """Returns jitted
    (params, opt_state, steer_buf, throttle_buf, next_values, rng)
    -> (params, opt_state, LossAux means)."""
    opt = make_optimizer(cfg)
    n_epochs = cfg.ppo_epoch
    n_mb = rollout_cfg.mini_batch_num

    def run(params, opt_state, steer_buf: BatchedRollout,
            throttle_buf: BatchedRollout, next_values, rng):
        next_steer, next_throttle = next_values
        s_ret, s_adv = batched_returns(steer_buf, next_steer, cfg.gamma,
                                       cfg.tau)
        t_ret, t_adv = batched_returns(throttle_buf, next_throttle,
                                       cfg.gamma, cfg.tau)
        s_adv = normalize_advantages(s_adv)
        t_adv = normalize_advantages(t_adv)

        total_rows = steer_buf.num_steps * steer_buf.num_envs
        mb_size = total_rows // n_mb

        def make_perms(key):
            keys = jax.random.split(key, n_epochs)
            perms = jax.vmap(
                lambda k: jax.random.permutation(k, total_rows))(keys)
            return perms[:, : mb_size * n_mb].reshape(
                n_epochs * n_mb, mb_size)

        rs, rt = jax.random.split(rng)
        s_idx = make_perms(rs)   # [E*M, B]
        t_idx = make_perms(rt)

        def minibatch_step(carry, idx_pair):
            params, opt_state = carry
            si, ti = idx_pair
            s_mb = gather_minibatch_batched(steer_buf, s_ret, s_adv, si)
            t_mb = gather_minibatch_batched(throttle_buf, t_ret, t_adv, ti)
            (_, aux), grads = jax.value_and_grad(ppo_loss, has_aux=True)(
                params, steer_def, throttle_def, s_mb, t_mb, cfg)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), aux

        (params, opt_state), auxes = jax.lax.scan(
            minibatch_step, (params, opt_state), (s_idx, t_idx))
        aux = LossAux(*(jnp.mean(x) for x in auxes))
        return params, opt_state, aux

    return jax.jit(run)
