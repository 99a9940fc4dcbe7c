"""On-device K-checkpoint ensemble evaluation over JaxDrivingEnv.

The reference eval protocol (eval.py:12-64 + agent.py:83-95): every member
acts on the same observation, each discrete (steer, throttle) pair converts
through the control LUTs, the K controls are averaged, and a mean brake
below 0.5 is zeroed. Here the members are a vmap axis and the whole
episode batch runs inside lax.scan on device — N envs x K members per step
with one host fetch per eval, not one per member per tick.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cadre_tpu.configs.agent_config import (
    STEER_CONTROL,
    THROTTLE_CONTROL,
    RolloutConfig,
)
from cadre_tpu.envs.jax_env import ERROR_CODES, JaxDrivingEnv, _step_one
from cadre_tpu.rl.agent import CadreAgent, EnsembleAgent, latent_features, \
    preprocess_obs


def evaluate_device(agent: CadreAgent, env: JaxDrivingEnv,
                    snapshot_paths: Sequence[str], max_steps: int = 2000,
                    seed: int = 0, seq_length: Optional[int] = None,
                    route_ids: Optional[Sequence[int]] = None
                    ) -> List[dict]:
    """Run `max_steps` batched ensemble steps; returns one dict per finished
    episode: {completion, error, steps}.

    With `route_ids` (len == env.num_envs), env i is pinned to that route
    and only its FIRST finished episode is reported — the sequential
    RouteIndexer eval protocol (route_indexer.py:6-41, one episode per
    eval route), with `route_id` added to each row."""
    if env.cfg.training:
        # Structural eval-hygiene lock: the eval protocol is ALWAYS
        # eval-mode (no overspeed/static-collision early termination,
        # d_max_eval widening — env_wrapper.py:435-441,462-476). A
        # training-mode env leaking in here once corrupted a round-3
        # artifact (223/242 camroute episodes cut short on "exceed
        # speed"); coerce rather than trust every caller.
        env = JaxDrivingEnv(env.bank, num_envs=env.num_envs,
                            config=dataclasses.replace(
                                env.cfg, training=False))
    banks = [EnsembleAgent._load(p, agent) for p in snapshot_paths]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *banks)
    k = len(banks)
    n = env.num_envs
    seq = seq_length or RolloutConfig().seq_length
    f = agent.obs_dim
    cfg, bank = env.cfg, env.bank
    blank = agent.danet_cfg.in_route_blank
    steer_lut = jnp.asarray(STEER_CONTROL, jnp.float32)
    throttle_lut = jnp.asarray(THROTTLE_CONTROL, jnp.float32)

    # `member_bank`/`encoder_vars` are jit ARGUMENTS, not closure constants:
    # closing over the stacked checkpoints + encoder weights bakes them into
    # the HLO as literals, which overflows remote-compile request limits
    # (observed as HTTP 413 on the axon tunnel at K=8 members).
    @jax.jit
    def run(key, member_bank, encoder_vars):
        def encode(obs):
            x = preprocess_obs(obs["rgb"], obs["route_fig"],
                               blank_route=blank)
            return latent_features(agent.danet, encoder_vars, x,
                                   obs["measurements"])

        def member_act(params, feat_hist, commands, key):
            s_out, t_out, _ = agent._act_from_hist(
                params, feat_hist, commands,
                (jnp.zeros((n, f)), jnp.zeros((n, f))), key)
            return s_out.action, t_out.action

        act_k = jax.vmap(member_act, in_axes=(0, None, None, 0))

        def step_fn(carry, key):
            env_state, obs, feat_hist, done_prev = carry
            feats = encode(obs)
            rolled = jnp.concatenate([feat_hist[1:], feats[None]], axis=0)
            tiled = jnp.broadcast_to(feats[None], feat_hist.shape)
            feat_hist = jnp.where(done_prev[None, :, None], tiled, rolled)
            sa, ta = act_k(member_bank, feat_hist, obs["command"],
                           jax.random.split(key, k))
            # avg_action (agent.py:83-95): mean of converted controls,
            # brake < 0.5 -> 0
            controls = jnp.concatenate(
                [steer_lut[sa][..., None], throttle_lut[ta]], axis=-1)
            mean_c = controls.mean(axis=0)                      # [N, 3]
            brake = jnp.where(mean_c[:, 2] < 0.5, 0.0, mean_c[:, 2])
            mean_c = mean_c.at[:, 2].set(brake)
            env_state, out = jax.vmap(
                lambda s, c: _step_one(cfg, bank, s, c))(env_state, mean_c)
            obs2 = dict(rgb=out.rgb, route_fig=out.route_fig,
                        measurements=out.measurements, command=out.command)
            return ((env_state, obs2, feat_hist, out.done),
                    (out.done, out.completion, out.error_code,
                     out.infractions))

        k0, k1 = jax.random.split(key)
        if route_ids is not None:
            env_state, obs = env.reset_routes(
                k0, jnp.asarray(route_ids, jnp.int32))
        else:
            env_state, obs = env.reset(k0)
        feat_hist = jnp.broadcast_to(encode(obs)[None], (seq, n, f))
        carry = (env_state, obs, feat_hist, jnp.zeros((n,), bool))
        _, ys = jax.lax.scan(step_fn, carry,
                             jax.random.split(k1, max_steps))
        return ys

    done, completion, err, infractions = jax.device_get(
        run(jax.random.PRNGKey(seed), stacked, agent.danet_vars))
    # full penalty table (statistics_manager.py:22-26 via envs/scoring.py):
    # collision 0.65/0.60/0.50 (the device env ends the episode on the
    # first collision, so at most one applies) composed with 0.70 per red
    # light and 0.80 per stop infraction accumulated in-episode by the
    # in-graph criteria (envs/jax_env.py::_red_light_check/_stop_sign_check)
    penalty_by_code = {1: 0.65, 2: 0.60, 3: 0.50}
    episodes = []
    start = np.zeros(n, np.int64)
    finished = np.zeros(n, bool)
    for t in range(max_steps):
        for i in np.nonzero(done[t])[0]:
            if route_ids is not None and finished[i]:
                continue       # sequential protocol: one episode per route
            finished[i] = True
            code = int(err[t, i])
            comp = float(completion[t, i])
            n_red = int(infractions[t, i, 0])
            n_stop = int(infractions[t, i, 1])
            pen = (penalty_by_code.get(code, 1.0)
                   * 0.70 ** n_red * 0.80 ** n_stop)
            row = dict(
                completion=comp,
                error=ERROR_CODES.get(code, str(code)),
                steps=int(t - start[i]),
                red_lights=n_red, stops=n_stop,
                driving_score=100.0 * comp * pen)
            if route_ids is not None:
                row["route_id"] = int(route_ids[i])
            episodes.append(row)
            start[i] = t
    return episodes
