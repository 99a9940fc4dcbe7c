"""Scripted expert for the device-resident env (pure JAX, scan-composable).

The host `OracleExpert` (envs/expert.py ≙ statics/vae_agent.py:262+ pure
pursuit + PID speed + obstacle/light braking) rewritten as a pure function
of `JaxEnvState` so it runs INSIDE the device rollout scan. Two jobs:

1. Capability bound: the expert's completion rate on a route bank is the
   ceiling any policy limited to the same control LUTs can reach — if the
   expert completes ~100% where RL plateaus at 30%, the corner floor is a
   learning problem, not an env/controllability problem
   (VERDICT r2 "What's weak" #2).
2. Device-rate data collection: expert-driven frames for perception
   pretraining at device env speed instead of the host's ~65 steps/s.

Controls are quantized to the production LUTs (agent_config.py:7-21:
33-bin steer, {coast, brake, throttle-0.6}) so the bound is honest about
actuator granularity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cadre_tpu.configs.agent_config import STEER_CONTROL, THROTTLE_CONTROL
from cadre_tpu.envs.jax_env import (
    JaxEnvConfig,
    JaxEnvState,
    RouteBank,
    _FAR,
    _heading,
    _light_phases,
    _nearest_obstacle_ahead,
    _route_window,
)

_STEER_LUT = jnp.asarray(STEER_CONTROL, jnp.float32)
_THROTTLE_LUT = jnp.asarray(THROTTLE_CONTROL, jnp.float32)


def expert_action(cfg: JaxEnvConfig, bank: RouteBank, state: JaxEnvState,
                  lookahead: int = 3, target_speed: float = 7.0,
                  brake_distance: float = 6.0,
                  obey_lights: bool = True):
    """(steer_idx, throttle_idx) LUT indices for one env's state.

    Pure pursuit on the planner window's `lookahead` node (expert.py:53-64),
    bang-bang speed control at the LUT's granularity, obstacle braking
    inside `brake_distance`, and red/yellow-light braking within 12 m of an
    upcoming stop line (expert.py:76-79)."""
    w, valid, _ = _route_window(cfg, bank, state, cfg.window)
    target = w[lookahead]
    fwd = _heading(state.yaw)
    rel = target - state.pos
    cross = fwd[0] * rel[1] - fwd[1] * rel[0]
    dot = jnp.maximum(rel @ fwd, 1e-3)
    steer = jnp.clip(jnp.arctan2(cross, dot) * 4.0 / jnp.pi, -1.0, 1.0)
    steer_idx = jnp.argmin(jnp.abs(_STEER_LUT - steer))

    obstacle = _nearest_obstacle_ahead(state)
    brake_obs = (obstacle > 0.0) & (obstacle < brake_distance)

    # red/yellow light ahead within 12 m in our direction of travel
    lights = bank.lights[state.route_id]
    lvalid = lights[:, 0] < _FAR / 2
    phase = _light_phases(cfg, lights, state.step)
    rel_l = lights[:, :2] - state.pos[None]
    d_l = jnp.linalg.norm(rel_l, axis=-1)
    ahead = (rel_l @ fwd) > 0.0
    same_dir = (lights[:, 3:5] @ fwd) > 0.0
    stopworthy = lvalid & ahead & same_dir & (d_l < 12.0) & (phase >= 1)
    brake_light = jnp.any(stopworthy) & jnp.asarray(obey_lights)

    over = state.speed > target_speed
    throttle_idx = jnp.where(brake_obs | brake_light, 1,
                             jnp.where(over, 0, 2))
    return steer_idx.astype(jnp.int32), throttle_idx.astype(jnp.int32)


def expert_control(cfg: JaxEnvConfig, bank: RouteBank, state: JaxEnvState,
                   **kw) -> jnp.ndarray:
    """[3] f32 (steer, throttle, brake) through the LUTs."""
    si, ti = expert_action(cfg, bank, state, **kw)
    return jnp.concatenate([_STEER_LUT[si][None], _THROTTLE_LUT[ti]])


def expert_episode_stats(bank: RouteBank, num_envs: int = 16,
                         steps: int = 1500, seed: int = 0,
                         config: JaxEnvConfig | None = None, **kw):
    """Run the expert over a batch of envs for `steps` ticks inside one
    scan; returns (completions, error_codes) arrays over finished episodes
    — the capability bound for the bank."""
    from cadre_tpu.envs.jax_env import JaxDrivingEnv, _step_one

    cfg = config or JaxEnvConfig(render=False)
    env = JaxDrivingEnv(bank, num_envs=num_envs, config=cfg)

    @jax.jit
    def run(key):
        env_state, _ = env.reset(key)

        def step_fn(env_state, _):
            controls = jax.vmap(
                lambda s: expert_control(cfg, bank, s, **kw))(env_state)
            env_state, out = jax.vmap(
                lambda s, c: _step_one(cfg, bank, s, c))(env_state,
                                                         controls)
            return env_state, (out.done, out.completion, out.error_code)

        _, ys = jax.lax.scan(step_fn, env_state, None, length=steps)
        return ys

    import numpy as np

    done, comp, err = jax.device_get(run(jax.random.PRNGKey(seed)))
    m = np.asarray(done)
    return np.asarray(comp)[m], np.asarray(err)[m]
