"""Distributed PPO update on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cadre_tpu.models.policy import PolicyBankDef
from cadre_tpu.parallel.mesh import make_mesh
from cadre_tpu.parallel.train_step import shard_minibatch
from cadre_tpu.parallel.train_step import make_distributed_update
from cadre_tpu.rl.ppo import PPOConfig, make_optimizer, make_update_fn, ppo_loss
from cadre_tpu.rl.rollout import Minibatch


F = 16


def _mk_mb(key, nout, batch=16, seq=3):
    ks = jax.random.split(key, 8)
    return Minibatch(
        obs_seq=jax.random.normal(ks[0], (seq, batch, F)),
        action=jax.random.randint(ks[1], (batch,), 0, nout),
        old_value=jax.random.normal(ks[2], (batch,)),
        returns=jax.random.normal(ks[3], (batch,)),
        mask=jnp.ones((batch,)),
        old_log_prob=-jnp.abs(jax.random.normal(ks[4], (batch,))),
        advantage=jax.random.normal(ks[5], (batch,)),
        hidden=(jnp.zeros((batch, F)), jnp.zeros((batch, F))),
        command=jax.random.randint(ks[6], (batch,), 0, 4),
    )


def test_distributed_update_runs_and_matches_manual_sum(mesh8):
    """8-shard psum-sum-clip-Adam vs manually summed single-device grads."""
    steer = PolicyBankDef(4, 5, F)
    throttle = PolicyBankDef(4, 3, F)
    params = {"steer": steer.init_params(jax.random.PRNGKey(0)),
              "throttle": throttle.init_params(jax.random.PRNGKey(1))}
    cfg = PPOConfig()
    opt_state = make_optimizer(cfg).init(params)
    mb_s = _mk_mb(jax.random.PRNGKey(2), 5)
    mb_t = _mk_mb(jax.random.PRNGKey(3), 3)

    dist_update = make_distributed_update(steer, throttle, cfg, mesh8)
    new_params, _, aux = dist_update(params, opt_state,
                                     shard_minibatch(mesh8, mb_s),
                                     shard_minibatch(mesh8, mb_t))

    # manual: sum of per-shard grads == 8 shards of batch 2
    import optax
    grads_sum = None
    for i in range(8):
        sl = slice(2 * i, 2 * i + 2)

        def shard(mb):
            return Minibatch(mb.obs_seq[:, sl], mb.action[sl],
                             mb.old_value[sl], mb.returns[sl], mb.mask[sl],
                             mb.old_log_prob[sl], mb.advantage[sl],
                             (mb.hidden[0][sl], mb.hidden[1][sl]),
                             mb.command[sl])

        g = jax.grad(lambda p: ppo_loss(p, steer, throttle, shard(mb_s),
                                        shard(mb_t), cfg)[0])(params)
        grads_sum = g if grads_sum is None else jax.tree.map(
            jnp.add, grads_sum, g)
    opt = make_optimizer(cfg)
    updates, _ = opt.update(grads_sum, opt.init(params), params)
    manual_params = optax.apply_updates(params, updates)

    for a, b in zip(jax.tree_util.tree_leaves(new_params),
                    jax.tree_util.tree_leaves(manual_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-5)


def test_single_vs_distributed_aux_finite(mesh8):
    steer = PolicyBankDef(4, 5, F)
    throttle = PolicyBankDef(4, 3, F)
    params = {"steer": steer.init_params(jax.random.PRNGKey(0)),
              "throttle": throttle.init_params(jax.random.PRNGKey(1))}
    cfg = PPOConfig()
    opt_state = make_optimizer(cfg).init(params)
    dist_update = make_distributed_update(steer, throttle, cfg, mesh8)
    _, _, aux = dist_update(params, opt_state,
                            shard_minibatch(mesh8, _mk_mb(jax.random.PRNGKey(4), 5)),
                            shard_minibatch(mesh8, _mk_mb(jax.random.PRNGKey(5), 3)))
    for x in aux:
        assert np.isfinite(float(x))


def test_multihost_helpers_single_host(monkeypatch):
    """initialize_multihost must no-op cleanly on a single host (the
    reference's NCCL env:// init is likewise skipped when WORLD_SIZE is
    unset, experiments_builder.py:99-101) and is_chief matches process 0.

    The axon tunnel environment exports TPU_WORKER_HOSTNAMES=localhost in
    every shell, so the single-host condition is established by scrubbing
    the env rather than asserting on it."""
    from cadre_tpu.parallel.multihost import initialize_multihost, is_chief

    for var in ("JAX_COORDINATOR", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_multihost() is False
    assert is_chief() is True

    # explicit-but-unreachable coordinator must not raise — it either
    # refuses (returns False) or the backend rejects it internally
    assert initialize_multihost(num_processes=0) is False
