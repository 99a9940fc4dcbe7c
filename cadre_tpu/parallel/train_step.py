"""Data-parallel PPO train step over a device mesh.

Replaces the reference's chief/worker gradient protocol (ppo_agent/chief.py:
8-27 + Shared_grad_buffers, models.py:219-258): N workers each compute grads
on their minibatch shard; grads are SUMMED (psum over `data`), globally
clipped at 250, and Adam-stepped — all inside one jitted shard_map program.
Params and optimizer state stay replicated, so the reference's explicit
"pull new weights" step (train.py:110) disappears.
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cadre_tpu.models.policy import PolicyBankDef
from cadre_tpu.rl.ppo import PPOConfig, make_update_fn
from cadre_tpu.rl.rollout import Minibatch

try:  # jax >= 0.6 exports shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _mb_specs(axis: str):
    """Minibatch shards over the batch axis; obs_seq has batch at axis 1."""
    return Minibatch(
        obs_seq=P(None, axis, None),
        action=P(axis),
        old_value=P(axis),
        returns=P(axis),
        mask=P(axis),
        old_log_prob=P(axis),
        advantage=P(axis),
        hidden=(P(axis, None), P(axis, None)),
        command=P(axis),
    )


def shard_minibatch(mesh: Mesh, mb: Minibatch,
                    axis_name: str = "data") -> Minibatch:
    """Place a host minibatch with field-appropriate batch sharding."""

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    a = P(axis_name)
    return Minibatch(
        obs_seq=put(mb.obs_seq, P(None, axis_name, None)),
        action=put(mb.action, a),
        old_value=put(mb.old_value, a),
        returns=put(mb.returns, a),
        mask=put(mb.mask, a),
        old_log_prob=put(mb.old_log_prob, a),
        advantage=put(mb.advantage, a),
        hidden=(put(mb.hidden[0], P(axis_name, None)),
                put(mb.hidden[1], P(axis_name, None))),
        command=put(mb.command, a),
    )


def make_distributed_update(steer_def: PolicyBankDef,
                            throttle_def: PolicyBankDef,
                            cfg: PPOConfig, mesh: Mesh,
                            axis_name: str = "data") -> Callable:
    """jit(shard_map(update)): params replicated, minibatch sharded.

    Matches the reference's sum-then-clip-then-Adam ordering; the aux losses
    are pmean-ed so every shard reports the global value.
    """
    update = make_update_fn(steer_def, throttle_def, cfg,
                            axis_name=axis_name)

    def wrapped(params, opt_state, steer_mb, throttle_mb):
        params, opt_state, aux = update(params, opt_state, steer_mb,
                                        throttle_mb)
        aux = jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), aux)
        return params, opt_state, aux

    mb_spec = _mb_specs(axis_name)
    fn = shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(P(), P(), mb_spec, mb_spec),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
