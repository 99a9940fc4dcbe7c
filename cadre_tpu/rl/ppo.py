"""Clipped-surrogate PPO update for the dual steer/throttle command banks.

Behavioral contract from ppo_agent/agent.py:166-237 (update_policy):
  - For each signal (steer, throttle): evaluate ALL command banks on the
    minibatch, mask by command equality, sum — giving per-sample value,
    log-prob, entropy from the sample's own command bank.
  - ratio clip at `clip` (0.1); clipped value loss 0.5*max(sq, sq_clipped);
    losses summed over the two signals.
  - total = value_coeff*value + clip_coeff*action - ent_coeff*entropy
    (coefficients from config_files/agent_config.py:43-46).
Gradient flow (the reference's chief/worker protocol, chief.py:8-27 +
models.py:219-258): worker grads are SUMMED across the N processes, global-
norm-clipped at 250, then Adam(3e-4). The TPU equivalent is a psum over the
`data` mesh axis inside one jitted update — `make_update_fn(axis_name=...)`.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from cadre_tpu.models.policy import PolicyBankDef
from cadre_tpu.rl.rollout import Minibatch


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Hyperparameters (config_files/agent_config.py:17-58)."""

    clip: float = 0.1
    clip_coeff: float = 1.0
    value_coeff: float = 0.1
    ent_coeff: float = 0.01
    lr: float = 3e-4
    max_grad_norm: float = 250.0
    ppo_epoch: int = 4
    mini_batch_num: int = 2
    gamma: float = 0.99
    tau: float = 0.95
    use_adv_norm: bool = True
    num_steps: int = 200
    seq_length: int = 8


class LossAux(NamedTuple):
    value_loss: jax.Array
    action_loss: jax.Array
    entropy_loss: jax.Array


def _signal_loss(bank_def: PolicyBankDef, bank_params, mb: Minibatch,
                 clip: float):
    """One signal's clipped surrogate + clipped value loss + entropy."""
    values, log_prob, entropy = bank_def.evaluate_masked(
        bank_params, mb.obs_seq, mb.hidden, mb.action, mb.command)
    ratio = jnp.exp(log_prob - mb.old_log_prob)
    surr1 = ratio * mb.advantage
    surr2 = jnp.clip(ratio, 1.0 - clip, 1.0 + clip) * mb.advantage
    action_loss = -jnp.minimum(surr1, surr2).mean()

    v_clipped = mb.old_value + jnp.clip(values - mb.old_value, -clip, clip)
    v_losses = (values - mb.returns) ** 2
    v_losses_clipped = (v_clipped - mb.returns) ** 2
    value_loss = 0.5 * jnp.maximum(v_losses, v_losses_clipped).mean()
    return value_loss, action_loss, entropy.mean()


def ppo_loss(params, steer_def: PolicyBankDef, throttle_def: PolicyBankDef,
             steer_mb: Minibatch, throttle_mb: Minibatch, cfg: PPOConfig):
    """Total loss over both signals (agent.py:184-229)."""
    sv, sa, se = _signal_loss(steer_def, params["steer"], steer_mb, cfg.clip)
    tv, ta, te = _signal_loss(throttle_def, params["throttle"], throttle_mb,
                              cfg.clip)
    value_loss = (sv + tv) * cfg.value_coeff
    action_loss = (sa + ta) * cfg.clip_coeff
    ent_loss = (se + te) * cfg.ent_coeff
    total = value_loss + action_loss - ent_loss
    return total, LossAux(value_loss, action_loss, ent_loss)


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    """clip-by-global-norm(250) then Adam(3e-4) — the chief's update
    (chief.py:16-21, main.py:55)."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr),
    )


def make_update_fn(steer_def: PolicyBankDef, throttle_def: PolicyBankDef,
                   cfg: PPOConfig, axis_name: Optional[str] = None
                   ) -> Callable:
    """Build the jittable minibatch update.

    With `axis_name`, gradients are psum-SUMMED over the mesh axis before
    clipping — matching the reference's sum-then-clip-then-Adam ordering
    (Shared_grad_buffers.add_gradient sums, chief clips the sum at 250).
    """
    opt = make_optimizer(cfg)

    def update(params, opt_state, steer_mb: Minibatch,
               throttle_mb: Minibatch):
        (_, aux), grads = jax.value_and_grad(ppo_loss, has_aux=True)(
            params, steer_def, throttle_def, steer_mb, throttle_mb, cfg)
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    return update
