"""Vectorized multi-env PPO training — the high-throughput path.

Replaces the reference's N sim-locked worker processes + chief
(SURVEY §2.7 data-parallel row) with: N host envs stepped behind ONE batched
act dispatch per tick, batched [T, N] rollouts, vmapped GAE, and PPO
minibatches over the T*N sample pool (optionally sharded over a device
mesh — `make_distributed_update` — where the psum IS the chief).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cadre_tpu.configs.agent_config import (
    RolloutConfig,
    TrainConfig,
    convert_action,
)
from cadre_tpu.rl.agent import CadreAgent
from cadre_tpu.rl.rollout import (
    BatchedRollout,
    after_update_batched,
    batched_returns,
    create_batched_rollout,
    gather_minibatch_batched,
    insert_batch,
    normalize_advantages,
)
from cadre_tpu.utils.logger import logger
from cadre_tpu.utils.profiling import PhaseTimer


@dataclasses.dataclass
class VecEpisodeStats:
    iteration: int
    value_loss: float
    policy_loss: float
    entropy_loss: float
    env_steps: int
    env_steps_per_sec: float
    mean_steer_reward: float
    mean_throttle_reward: float
    episodes_finished: int
    mean_completion: float


def train_vec(vec_env, agent: CadreAgent,
              rollout_cfg: Optional[RolloutConfig] = None,
              train_cfg: Optional[TrainConfig] = None,
              iterations: int = 100, seed: int = 0,
              work_dir: Optional[str] = None,
              iteration_hook: Optional[Callable] = None,
              fused_update: bool = True,
              incremental_features: bool = True,
              mesh=None) -> List[VecEpisodeStats]:
    """`fused_update` runs the whole GAE+epochs update phase as ONE jitted
    program (rl/fused_update.py) — one dispatch per iteration instead of
    ppo_epoch x mini_batch_num. `incremental_features` keeps the frame-
    feature history on device and ships only the newest frame per tick
    (refreshing the full window after any env reset).

    `mesh` runs each PPO minibatch update as shard_map over the mesh's
    'data' axis (parallel/train_step.make_distributed_update): grads are
    psum-med across shards in-XLA — the chief + Shared_grad_buffers
    topology of reference main.py:57-70 with the collective as the chief.
    Takes precedence over `fused_update` (which is a single-device program).
    """
    rollout_cfg = rollout_cfg or RolloutConfig()
    train_cfg = train_cfg or TrainConfig()
    n = vec_env.num_envs
    t_steps = rollout_cfg.num_steps
    f = agent.obs_dim

    steer_buf = create_batched_rollout(t_steps, n, rollout_cfg.seq_length, f)
    throttle_buf = create_batched_rollout(t_steps, n, rollout_cfg.seq_length,
                                          f)

    @jax.jit
    def store(sb, tb, feats, s_out, t_out, rewards, s_mask, t_mask, hidden,
              commands):
        sb = insert_batch(sb, feats, s_out.action, s_out.log_prob,
                          s_out.value, rewards[:, 0], s_mask, hidden,
                          commands)
        tb = insert_batch(tb, feats, t_out.action, t_out.log_prob,
                          t_out.value, rewards[:, 1], t_mask, hidden,
                          commands)
        return sb, tb
    hidden = (jnp.zeros((n, f)), jnp.zeros((n, f)))
    rng = jax.random.PRNGKey(seed)
    tick = vec_env.reset()
    stats_log: List[VecEpisodeStats] = []
    import os

    model_dir = None
    if work_dir is not None:
        model_dir = os.path.join(work_dir, "models")
        os.makedirs(model_dir, exist_ok=True)

    fused_fn = None
    if fused_update:
        from cadre_tpu.rl.fused_update import make_fused_iteration_update

        import dataclasses as _dc

        ppo_cfg = _dc.replace(agent.ppo_cfg,
                              ppo_epoch=train_cfg.ppo_epoch,
                              gamma=rollout_cfg.gamma, tau=rollout_cfg.tau)
        fused_fn = make_fused_iteration_update(
            agent.steer_def, agent.throttle_def, ppo_cfg, rollout_cfg)

    dist_fn = None
    if mesh is not None:
        from cadre_tpu.parallel.train_step import (
            make_distributed_update,
            shard_minibatch,
        )

        dist_fn = make_distributed_update(agent.steer_def,
                                          agent.throttle_def,
                                          agent.ppo_cfg, mesh)
        fused_fn = None

    timer = PhaseTimer()
    feat_hist = None          # [T, N, F] device-resident (incremental path)
    need_refresh = True
    for it in range(iterations):
        t0 = time.time()
        reward_sums = np.zeros(2)
        pending = None        # previous tick's outputs, stored next dispatch
        for step in range(t_steps):
            rng, key = jax.random.split(rng)
            commands = np.asarray(tick["command"], np.int32)
            with timer.phase("act"):
                if incremental_features:
                    # fused tick: the store of transition k rides inside
                    # the act dispatch of tick k+1 — one program execution
                    # per tick (each execution is a full round trip on a
                    # remote-TPU link)
                    steer_out, throttle_out, hidden_new, feat_hist, \
                        steer_buf, throttle_buf = agent.act_vec_store(
                            tick, feat_hist, hidden, key, steer_buf,
                            throttle_buf,
                            pending or agent.zero_pending(n),
                            store=pending is not None,
                            refresh=need_refresh)
                    need_refresh = False
                else:
                    feats, steer_out, throttle_out, hidden_new = \
                        agent.act_vec(tick, hidden, key)
                # ONE host round trip for both action vectors
                steer_a, throttle_a = jax.device_get(
                    (steer_out.action, throttle_out.action))
            controls = [convert_action(int(sa), int(ta))
                        for sa, ta in zip(steer_a, throttle_a)]
            with timer.phase("env"):
                tick, rewards, dones, infos = vec_env.step(controls)
            if incremental_features and bool(np.any(dones)):
                need_refresh = True  # reset envs restart their histories
            steer_done = np.asarray(
                [i["action_done"][0] for i in infos], np.float32)
            throttle_done = np.asarray(
                [i["action_done"][1] for i in infos], np.float32)
            reward_sums += rewards.mean(0)

            if incremental_features:
                # `hidden` is still this tick's act-INPUT carry here (the
                # update_hidden advance happens below); the deferred store
                # must record it, not the post-act carry
                pending = (steer_out, throttle_out, commands,
                           np.asarray(rewards, np.float32),
                           1.0 - steer_done, 1.0 - throttle_done, hidden)
            else:
                steer_buf, throttle_buf = store(
                    steer_buf, throttle_buf, feats, steer_out, throttle_out,
                    jnp.asarray(rewards, jnp.float32),
                    jnp.asarray(1.0 - steer_done),
                    jnp.asarray(1.0 - throttle_done),
                    hidden, jnp.asarray(commands, jnp.int32))
            # reference semantics: stale zero hidden carry (agent.py:38-40)
            if agent.update_hidden:
                hidden = hidden_new

        # bootstrap from the live post-rollout observation; the same
        # dispatch flushes the final pending transition into the buffers
        rng, key = jax.random.split(rng)
        if incremental_features:
            steer_fin, throttle_fin, _, feat_hist, steer_buf, \
                throttle_buf = agent.act_vec_store(
                    tick, feat_hist, hidden, key, steer_buf, throttle_buf,
                    pending, store=True, refresh=need_refresh)
            need_refresh = True  # history now includes the bootstrap frame
        else:
            _, steer_fin, throttle_fin, _ = agent.act_vec(tick, hidden, key)

        if fused_fn is not None:
            rng, key = jax.random.split(rng)
            with timer.phase("update"):
                agent.params, agent.opt_state, aux = fused_fn(
                    agent.params, agent.opt_state, steer_buf, throttle_buf,
                    (steer_fin.value, throttle_fin.value), key)
                vl, pl, el = map(float, jax.device_get(
                    (aux.value_loss, aux.action_loss, aux.entropy_loss)))
        else:
            s_ret, s_adv = batched_returns(steer_buf, steer_fin.value,
                                           rollout_cfg.gamma, rollout_cfg.tau)
            t_ret, t_adv = batched_returns(throttle_buf, throttle_fin.value,
                                           rollout_cfg.gamma, rollout_cfg.tau)
            if train_cfg.use_adv_norm:
                s_adv = normalize_advantages(s_adv)
                t_adv = normalize_advantages(t_adv)

            losses = []
            total_rows = t_steps * n
            mb_size = total_rows // rollout_cfg.mini_batch_num
            for _ in range(train_cfg.ppo_epoch):
                rng, k1, k2 = jax.random.split(rng, 3)
                s_perm = jax.random.permutation(k1, total_rows)
                t_perm = jax.random.permutation(k2, total_rows)
                for m in range(rollout_cfg.mini_batch_num):
                    sl = slice(m * mb_size, (m + 1) * mb_size)
                    with timer.phase("update"):
                        s_mb = gather_minibatch_batched(
                            steer_buf, s_ret, s_adv, s_perm[sl])
                        t_mb = gather_minibatch_batched(
                            throttle_buf, t_ret, t_adv, t_perm[sl])
                        if dist_fn is not None:
                            agent.params, agent.opt_state, aux = dist_fn(
                                agent.params, agent.opt_state,
                                shard_minibatch(mesh, s_mb),
                                shard_minibatch(mesh, t_mb))
                            losses.append((float(aux.value_loss),
                                           float(aux.action_loss),
                                           float(aux.entropy_loss)))
                        else:
                            losses.append(agent.update_policy(s_mb, t_mb))
            vl, pl, el = [float(np.mean([l[i] for l in losses]))
                          for i in range(3)]

        # reset ring pointers so next iteration's rows land at 0..t-1
        # (the reference defines but never calls after_update — see
        # rollout.after_update_batched)
        steer_buf = after_update_batched(steer_buf)
        throttle_buf = after_update_batched(throttle_buf)

        dt = time.time() - t0
        eps = vec_env.pop_episode_stats()
        stats = VecEpisodeStats(
            iteration=it, value_loss=vl, policy_loss=pl, entropy_loss=el,
            env_steps=t_steps * n, env_steps_per_sec=t_steps * n / dt,
            mean_steer_reward=float(reward_sums[0]),
            mean_throttle_reward=float(reward_sums[1]),
            episodes_finished=len(eps),
            mean_completion=float(np.mean([e["completion"] for e in eps]))
            if eps else 0.0)
        stats_log.append(stats)
        if iteration_hook:
            iteration_hook(stats)
        if it % train_cfg.log_interval == 0:
            rep = timer.report()
            phases = " ".join(f"{k}={v['mean_ms']:.1f}ms"
                              for k, v in rep.items())
            timer.reset()
            logger.log(
                f"iter {it}: {stats.env_steps_per_sec:.0f} env-steps/s, "
                f"value {vl:.4f}, policy {pl:.4f}, ent {el:.4f}, "
                f"{stats.episodes_finished} eps done "
                f"(mean completion {stats.mean_completion:.1f}%) [{phases}]")
        if model_dir is not None and it % train_cfg.save_interval == 0:
            agent.save_snapshot(
                f"{model_dir}/ppo_model_{it}.msgpack")
    return stats_log
