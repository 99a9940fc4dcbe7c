"""RL training loops: rollout collection -> GAE -> PPO epochs.

Contract: ppo_agent/train.py:14-127 — per worker: collect `num_steps`
transitions into dual steer/throttle rollouts, compute GAE + advantage
normalization, run `ppo_epoch` x minibatch updates, log losses every
`log_interval` episodes and snapshot every `save_interval`.

Divergence from the reference (documented): the reference bootstraps the
final value from `rollout.obs[-1]`, a slot never written during the episode
(storage.py:88-91 + train.py:76-79 — stale/zero features). We bootstrap from
the value of the actual post-rollout observation, which is what GAE
specifies. The chief/TrafficLight barrier (train.py:101-110) is replaced by
the psum inside the distributed update — workers are lock-step by
construction on a mesh.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, List, Optional

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
    Rollout,
    after_update,
    create_rollout,
    gather_minibatch,
    insert,
    minibatch_indices,
    normalize_advantages,
    rollout_returns,
)
from cadre_tpu.utils.logger import logger


@dataclasses.dataclass
class EpisodeStats:
    episode: int
    value_loss: float
    policy_loss: float
    entropy_loss: float
    steer_reward: float
    throttle_reward: float
    env_steps: int
    sps: float


def collect_rollout(env, agent: CadreAgent, steer_buf: Rollout,
                    throttle_buf: Rollout, obs: Dict[str, Any],
                    num_steps: int, rng: jax.Array):
    """One num_steps rollout (train.py:55-75). Returns (obs, done, bufs,
    reward sums, final_values)."""
    steer_sum = throttle_sum = 0.0
    done = False
    out = None
    for step in range(num_steps):
        rng, key = jax.random.split(rng)
        command = obs["command"]
        out = agent.act(obs, key)
        control = convert_action(int(out.steer_action),
                                 int(out.throttle_action))
        obs, reward, done, info = env.step(control)
        steer_done, throttle_done = info["action_done"]
        steer_sum += float(reward[0])
        throttle_sum += float(reward[1])

        steer_buf = insert(
            steer_buf, out.features, out.steer_action, out.steer_log_prob,
            out.steer_value, reward[0], 0.0 if steer_done else 1.0,
            out.hidden, command)
        throttle_buf = insert(
            throttle_buf, out.features, out.throttle_action,
            out.throttle_log_prob, out.throttle_value, reward[1],
            0.0 if throttle_done else 1.0, out.hidden, command)
        if done:
            obs = env.reset()

    # bootstrap values from the live post-rollout observation
    rng, key = jax.random.split(rng)
    if done:
        next_steer = jnp.zeros(())
        next_throttle = jnp.zeros(())
    else:
        final = agent.act(obs, key)
        next_steer = final.steer_value
        next_throttle = final.throttle_value
    return obs, done, steer_buf, throttle_buf, (steer_sum, throttle_sum), \
        (next_steer, next_throttle)


def ppo_update_epochs(agent: CadreAgent, steer_buf: Rollout,
                      throttle_buf: Rollout, next_values, train_cfg,
                      rollout_cfg, rng: jax.Array):
    """GAE + advantage norm + ppo_epoch x minibatch updates
    (train.py:76-110)."""
    next_steer, next_throttle = next_values
    s_ret, s_adv = rollout_returns(steer_buf, next_steer, rollout_cfg.gamma,
                                   rollout_cfg.tau)
    t_ret, t_adv = rollout_returns(throttle_buf, next_throttle,
                                   rollout_cfg.gamma, rollout_cfg.tau)
    if train_cfg.use_adv_norm:
        s_adv = normalize_advantages(s_adv)
        t_adv = normalize_advantages(t_adv)

    losses = []
    for _ in range(train_cfg.ppo_epoch):
        rng, k1, k2 = jax.random.split(rng, 3)
        s_idx = minibatch_indices(k1, rollout_cfg.num_steps,
                                  rollout_cfg.mini_batch_num)
        t_idx = minibatch_indices(k2, rollout_cfg.num_steps,
                                  rollout_cfg.mini_batch_num)
        for m in range(rollout_cfg.mini_batch_num):
            s_mb = gather_minibatch(steer_buf, s_ret, s_adv, s_idx[m])
            t_mb = gather_minibatch(throttle_buf, t_ret, t_adv, t_idx[m])
            losses.append(agent.update_policy(s_mb, t_mb))
    return [float(np.mean([l[i] for l in losses])) for i in range(3)]


def train(env, agent: CadreAgent, rollout_cfg: Optional[RolloutConfig] = None,
          train_cfg: Optional[TrainConfig] = None, rank: int = 0,
          work_dir: Optional[str] = None, seed: int = 0,
          episode_hook: Optional[Callable[[EpisodeStats], None]] = None,
          max_episode: Optional[int] = None) -> List[EpisodeStats]:
    """Single-worker training loop (the reference's train() body)."""
    rollout_cfg = rollout_cfg or RolloutConfig()
    train_cfg = train_cfg or TrainConfig()
    episodes = max_episode if max_episode is not None else \
        train_cfg.max_episode
    feature = agent.obs_dim
    steer_buf = create_rollout(rollout_cfg.num_steps, rollout_cfg.seq_length,
                               feature)
    throttle_buf = create_rollout(rollout_cfg.num_steps,
                                  rollout_cfg.seq_length, feature)
    model_dir = None
    if work_dir is not None:
        model_dir = os.path.join(work_dir, str(rank), "models")
        os.makedirs(model_dir, exist_ok=True)

    rng = jax.random.PRNGKey(seed + rank)
    obs = env.reset()
    stats_log: List[EpisodeStats] = []
    for episode in range(episodes):
        t0 = time.time()
        rng, k1, k2 = jax.random.split(rng, 3)
        obs, done, steer_buf, throttle_buf, sums, next_values = \
            collect_rollout(env, agent, steer_buf, throttle_buf, obs,
                            rollout_cfg.num_steps, k1)
        vl, pl, el = ppo_update_epochs(agent, steer_buf, throttle_buf,
                                       next_values, train_cfg, rollout_cfg,
                                       k2)
        steer_buf = after_update(steer_buf, agent.hidden_state)
        throttle_buf = after_update(throttle_buf, agent.hidden_state)
        dt = time.time() - t0
        stats = EpisodeStats(episode, vl, pl, el, sums[0], sums[1],
                             rollout_cfg.num_steps,
                             rollout_cfg.num_steps / dt)
        stats_log.append(stats)
        if episode_hook:
            episode_hook(stats)

        if episode % train_cfg.log_interval == 0 and rank == 0:
            logger.log(
                f"Episode: {episode}, value loss: {vl:.4f}, policy loss: "
                f"{pl:.4f}, entropy loss: {el:.4f}, steer R: {sums[0]:.1f}, "
                f"throttle R: {sums[1]:.1f}, {stats.sps:.1f} steps/s")
            logger.record_tabular("episode", episode)
            logger.record_tabular("value_loss", vl)
            logger.record_tabular("policy_loss", pl)
            logger.record_tabular("entropy_loss", el)
            logger.record_tabular("steer_reward", sums[0])
            logger.record_tabular("throttle_reward", sums[1])
            logger.record_tabular("steps_per_sec", stats.sps)
            logger.dump_tabular()

        if model_dir is not None and episode % train_cfg.save_interval == 0 \
                and rank == 0:
            agent.save_snapshot(
                os.path.join(model_dir, f"ppo_model_{episode}.msgpack"))
    return stats_log
