"""Fully on-device PPO training over the device-resident JaxDrivingEnv.

One `lax.scan` per iteration runs the ENTIRE rollout — synthetic camera +
route-figure rendering, frozen-encoder features, per-command policy act,
env dynamics/reward, rollout storage — followed by the fused GAE + PPO-epoch
update (rl/fused_update.py), all inside ONE jitted program. The host's only
job is dispatching the next iteration: this is the TPU-native answer to the
reference's sim-locked 10 Hz worker loop (SURVEY §3.1 hot loop;
ppo_agent/train.py:53-110), where every env step cost a CARLA RPC + an IPC
hop. BASELINE's "5k aggregate env-steps/s" north star is measured here, not
extrapolated — see scripts/bench_device_env.py.

The cascade semantics are the production ones: 8-frame feature histories
(re-tiled from the first frame after an auto-reset, matching reset()'s
history prefill), stale-zero LSTM carry per act (the reference's documented
behavior), decomposed steer/throttle rewards, per-signal masks from
action_done, and value bootstrap zeroed on done (agent.py:143-164).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from cadre_tpu.configs.agent_config import (
    STEER_CONTROL,
    THROTTLE_CONTROL,
    RolloutConfig,
    TrainConfig,
)
from cadre_tpu.envs.jax_env import JaxDrivingEnv, _step_one
from cadre_tpu.rl.agent import CadreAgent, latent_features, preprocess_obs
from cadre_tpu.rl.fused_update import make_fused_iteration_update
from cadre_tpu.rl.rollout import BatchedRollout


class DeviceCarry(NamedTuple):
    """Cross-iteration state (all device-resident)."""

    env_state: NamedTuple            # JaxEnvState, batched [N]
    obs: dict                        # rgb/route_fig/measurements/command [N]
    feat_hist: jnp.ndarray           # [seq, N, F]
    done_prev: jnp.ndarray           # [N] bool — last step ended an episode


class IterationMetrics(NamedTuple):
    value_loss: jnp.ndarray
    policy_loss: jnp.ndarray
    entropy_loss: jnp.ndarray
    mean_steer_reward: jnp.ndarray
    mean_throttle_reward: jnp.ndarray
    episodes_done: jnp.ndarray
    completion_sum: jnp.ndarray      # sum of completion at done steps
    error_hist: jnp.ndarray          # [10] f32 done-step counts per ERROR_CODE
    red_lights: jnp.ndarray          # red-light infractions over done episodes
    checksum: jnp.ndarray            # data-dependent scalar (anti-DCE sync)


def make_device_iteration(agent: CadreAgent, env: JaxDrivingEnv,
                          rollout_cfg: Optional[RolloutConfig] = None,
                          train_cfg: Optional[TrainConfig] = None,
                          mesh=None, data_axis: str = "data"):
    """Returns (iteration, init_carry):

    iteration(params, danet_vars, opt_state, carry, rng) ->
        (params, opt_state, carry, IterationMetrics)   [jittable]
    init_carry(danet_vars, key) -> DeviceCarry

    Pass `mesh` when the env axis is sharded over a device mesh: the PPO
    update then runs as manual SPMD (per-device minibatches + psum-mean
    grads, rl/fused_update.py) instead of letting GSPMD all-gather the
    rollout buffers to every device. The rollout scan itself is
    per-env-elementwise and shards cleanly either way.
    """
    rollout_cfg = rollout_cfg or RolloutConfig()
    train_cfg = train_cfg or TrainConfig()
    n = env.num_envs
    t_steps = rollout_cfg.num_steps
    seq = rollout_cfg.seq_length
    f = agent.obs_dim
    cfg, bank = env.cfg, env.bank
    blank = agent.danet_cfg.in_route_blank

    ppo_cfg = dataclasses.replace(agent.ppo_cfg,
                                  ppo_epoch=train_cfg.ppo_epoch,
                                  gamma=rollout_cfg.gamma,
                                  tau=rollout_cfg.tau)
    fused = make_fused_iteration_update(agent.steer_def, agent.throttle_def,
                                        ppo_cfg, rollout_cfg,
                                        mesh=mesh, axis_name=data_axis)
    steer_lut = jnp.asarray(STEER_CONTROL, jnp.float32)
    throttle_lut = jnp.asarray(THROTTLE_CONTROL, jnp.float32)

    def encode(danet_vars, obs):
        x = preprocess_obs(obs["rgb"], obs["route_fig"], blank_route=blank)
        return latent_features(agent.danet, danet_vars, x,
                               obs["measurements"])

    def advance_hist(feat_hist, feats, done_prev):
        """Roll the newest features in; after an auto-reset the window is
        re-tiled from the fresh first frame (reset()'s history prefill,
        env_wrapper.py:687-689)."""
        rolled = jnp.concatenate([feat_hist[1:], feats[None]], axis=0)
        tiled = jnp.broadcast_to(feats[None], feat_hist.shape)
        return jnp.where(done_prev[None, :, None], tiled, rolled)

    def zeroed_hidden(done_prev):
        # the reference act path reads a zero LSTM carry every step
        # (agent.py:38-40,123-124) — replicate, so "hidden" is just zeros
        del done_prev
        return (jnp.zeros((n, f)), jnp.zeros((n, f)))

    def env_step(env_state, controls):
        return jax.vmap(lambda s, c: _step_one(cfg, bank, s, c))(
            env_state, controls)

    def iteration(params, danet_vars, opt_state, carry: DeviceCarry, rng):
        k_scan, k_boot, k_up = jax.random.split(rng, 3)

        def step_fn(c, key):
            env_state, obs, feat_hist, done_prev = c
            feats = encode(danet_vars, obs)
            feat_hist = advance_hist(feat_hist, feats, done_prev)
            hidden = zeroed_hidden(done_prev)
            commands = obs["command"]
            s_out, t_out, _ = agent._act_from_hist(
                params, feat_hist, commands, hidden, key)
            controls = jnp.concatenate(
                [steer_lut[s_out.action][:, None],
                 throttle_lut[t_out.action]], axis=-1)
            env_state, out = env_step(env_state, controls)
            obs2 = dict(rgb=out.rgb, route_fig=out.route_fig,
                        measurements=out.measurements, command=out.command)
            ys = dict(
                obs=jnp.transpose(feat_hist, (1, 0, 2)),    # [N, seq, F]
                s_action=s_out.action, s_logp=s_out.log_prob,
                s_value=s_out.value,
                t_action=t_out.action, t_logp=t_out.log_prob,
                t_value=t_out.value,
                reward=out.rewards,                          # [N, 2]
                s_mask=1.0 - out.action_done[:, 0].astype(jnp.float32),
                t_mask=1.0 - out.action_done[:, 1].astype(jnp.float32),
                hn=hidden[0], cn=hidden[1], command=commands,
                done=out.done, completion=out.completion,
                error_code=out.error_code, red=out.infractions[:, 0])
            return (env_state, obs2, feat_hist, out.done), ys

        keys = jax.random.split(k_scan, t_steps)
        c0 = (carry.env_state, carry.obs, carry.feat_hist, carry.done_prev)
        (env_state, obs, feat_hist, done_prev), ys = jax.lax.scan(
            step_fn, c0, keys)

        def to_buf(action, logp, value, reward, mask):
            pad = lambda x: jnp.concatenate(                 # noqa: E731
                [x, jnp.zeros_like(x[:1])], axis=0)
            return BatchedRollout(
                obs=pad(ys["obs"]), action=pad(action), log_prob=pad(logp),
                value=pad(value), reward=pad(reward), mask=pad(mask),
                command=pad(ys["command"]), hn=pad(ys["hn"]),
                cn=pad(ys["cn"]), step=jnp.zeros((), jnp.int32))

        steer_buf = to_buf(ys["s_action"], ys["s_logp"], ys["s_value"],
                           ys["reward"][:, :, 0], ys["s_mask"])
        throttle_buf = to_buf(ys["t_action"], ys["t_logp"], ys["t_value"],
                              ys["reward"][:, :, 1], ys["t_mask"])

        # bootstrap values of the post-rollout obs, zeroed on done
        # (agent.py:143-164 via get_value semantics)
        feats = encode(danet_vars, obs)
        fh = advance_hist(feat_hist, feats, done_prev)
        s_out, t_out, _ = agent._act_from_hist(
            params, fh, obs["command"], zeroed_hidden(done_prev), k_boot)
        live = 1.0 - done_prev.astype(jnp.float32)
        next_values = (s_out.value * live, t_out.value * live)

        params, opt_state, aux = fused(params, opt_state, steer_buf,
                                       throttle_buf, next_values, k_up)

        # NOTE the carry keeps the PRE-bootstrap history: the invariant is
        # "feat_hist holds frames strictly before carry.obs", so the next
        # iteration's first step rolls obs's features in exactly once (fh
        # above is local to the bootstrap).
        done_f = ys["done"].astype(jnp.float32)
        metrics = IterationMetrics(
            value_loss=aux.value_loss, policy_loss=aux.action_loss,
            entropy_loss=aux.entropy_loss,
            mean_steer_reward=ys["reward"][:, :, 0].mean(),
            mean_throttle_reward=ys["reward"][:, :, 1].mean(),
            episodes_done=done_f.sum(),
            completion_sum=(ys["completion"] * done_f).sum(),
            error_hist=(jax.nn.one_hot(ys["error_code"], 10)
                        * done_f[..., None]).sum(axis=(0, 1)),
            red_lights=(ys["red"].astype(jnp.float32) * done_f).sum(),
            checksum=ys["reward"].sum()
            + jax.tree_util.tree_leaves(params)[0].sum())
        return params, opt_state, DeviceCarry(env_state, obs, feat_hist,
                                              done_prev), metrics

    def init_carry(danet_vars, key) -> DeviceCarry:
        env_state, obs = env.reset(key)
        feats = encode(danet_vars, obs)
        feat_hist = jnp.broadcast_to(feats[None], (seq, n, f)).copy()
        return DeviceCarry(env_state, obs, feat_hist,
                           jnp.zeros((n,), bool))

    return iteration, init_carry


def train_device(agent: CadreAgent, env: JaxDrivingEnv,
                 iterations: int = 10,
                 rollout_cfg: Optional[RolloutConfig] = None,
                 train_cfg: Optional[TrainConfig] = None,
                 seed: int = 0, log_fn=print
                 ) -> Tuple[dict, list]:
    """Convenience loop: jits the iteration once, then one dispatch per
    iteration. Returns (final params, per-iteration metric dicts)."""
    import time

    from cadre_tpu.rl.ppo import make_optimizer

    rollout_cfg = rollout_cfg or RolloutConfig()
    iteration, init_carry = make_device_iteration(agent, env, rollout_cfg,
                                                  train_cfg)
    jit_it = jax.jit(iteration, donate_argnums=(2, 3))
    opt = make_optimizer(agent.ppo_cfg)
    opt_state = opt.init(agent.params)
    rng = jax.random.PRNGKey(seed)
    rng, k0 = jax.random.split(rng)
    carry = init_carry(agent.danet_vars, k0)
    params = agent.params
    steps_per_iter = rollout_cfg.num_steps * env.num_envs
    out = []
    for i in range(iterations):
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        params, opt_state, carry, m = jit_it(params, agent.danet_vars,
                                             opt_state, carry, k)
        float(m.checksum)            # device sync (tunnel-safe fetch)
        dt = time.perf_counter() - t0
        row = dict(iteration=i, env_steps_per_sec=steps_per_iter / dt,
                   value_loss=float(m.value_loss),
                   policy_loss=float(m.policy_loss),
                   episodes_done=float(m.episodes_done),
                   mean_completion=float(m.completion_sum)
                   / max(float(m.episodes_done), 1.0),
                   steer_reward=float(m.mean_steer_reward),
                   throttle_reward=float(m.mean_throttle_reward))
        out.append(row)
        if log_fn is not None:
            log_fn(f"device iter {i}: {row['env_steps_per_sec']:.0f} "
                   f"env-steps/s, value {row['value_loss']:.4f}, "
                   f"eps {row['episodes_done']:.0f}, "
                   f"completion {row['mean_completion']:.2%}")
    agent.params = params
    return params, out
