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
                                rollout_cfg: RolloutConfig,
                                mesh=None,
                                axis_name: str = "data") -> Callable:
    """Returns jitted
    (params, opt_state, steer_buf, throttle_buf, next_values, rng)
    -> (params, opt_state, LossAux means).

    With `mesh`, the update runs as manual SPMD (shard_map over the env
    axis): each device shuffles and minibatches its OWN rollout rows and
    gradients are psum-averaged per minibatch step — the reference's
    distributed semantics exactly (each worker samples its own
    minibatches and Shared_grad_buffers sums them,
    ppo_agent/models.py:219-258 + train.py:93-110). Without it, plain
    GSPMD turns the global row permutation into per-field all-gathers of
    the whole rollout and every device redundantly computes every
    minibatch (r5 mesh profile: 20 all-gathers at n=2, aggregate
    throughput FALLING with device count — BENCH_r5_mesh_profile.json)."""
    opt = make_optimizer(cfg)
    n_epochs = cfg.ppo_epoch
    n_mb = rollout_cfg.mini_batch_num

    def run(params, opt_state, steer_buf: BatchedRollout,
            throttle_buf: BatchedRollout, next_values, rng):
        sharded = mesh is not None
        if sharded:
            # decorrelate per-device permutations; everything else about
            # the key usage matches the single-device path
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        def pmean(x):
            return jax.lax.pmean(x, axis_name) if sharded else x

        def gnorm(adv):
            """Advantage normalization with GLOBAL moments (matches the
            single-device normalize_advantages when sharded: mean/std
            over every env on every device, via psum)."""
            if not sharded:
                return normalize_advantages(adv)
            n = jax.lax.psum(jnp.asarray(adv.size, jnp.float32), axis_name)
            mean = jax.lax.psum(adv.sum(), axis_name) / n
            var = jax.lax.psum(((adv - mean) ** 2).sum(), axis_name) / n
            return (adv - mean) / (jnp.sqrt(var) + 1e-8)

        next_steer, next_throttle = next_values
        s_ret, s_adv = batched_returns(steer_buf, next_steer, cfg.gamma,
                                       cfg.tau)
        t_ret, t_adv = batched_returns(throttle_buf, next_throttle,
                                       cfg.gamma, cfg.tau)
        s_adv = gnorm(s_adv)
        t_adv = gnorm(t_adv)

        # inside shard_map these are the LOCAL shapes: each device
        # minibatches its own rows
        total_rows = steer_buf.num_steps * steer_buf.num_envs
        eff_mb = min(n_mb, total_rows)
        mb_size = total_rows // eff_mb

        def make_perms(key):
            keys = jax.random.split(key, n_epochs)
            perms = jax.vmap(
                lambda k: jax.random.permutation(k, total_rows))(keys)
            return perms[:, : mb_size * eff_mb].reshape(
                n_epochs * eff_mb, mb_size)

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
            grads = pmean(grads)       # Shared_grad_buffers psum-mean
            aux = pmean(aux)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), aux

        (params, opt_state), auxes = jax.lax.scan(
            minibatch_step, (params, opt_state), (s_idx, t_idx))
        aux = LossAux(*(jnp.mean(x) for x in auxes))
        return params, opt_state, aux

    if mesh is None:
        return jax.jit(run)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def sharded_entry(params, opt_state, steer_buf, throttle_buf,
                      next_values, rng):
        # rollout leaves are [T+1, N, ...] (shard the env axis); scalar
        # leaves (the insert cursor) stay replicated
        def buf_spec(x):
            return P(None, axis_name) if getattr(x, "ndim", 0) >= 2 else P()

        in_specs = (P(), P(),
                    jax.tree.map(buf_spec, steer_buf),
                    jax.tree.map(buf_spec, throttle_buf),
                    jax.tree.map(lambda _: P(axis_name), next_values),
                    P())
        sm = shard_map(run, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(), P(), P()), check_vma=False)
        return sm(params, opt_state, steer_buf, throttle_buf,
                  next_values, rng)

    return jax.jit(sharded_entry)
