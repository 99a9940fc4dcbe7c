"""Host-vs-device infraction parity (VERDICT r2 item 3).

The device env's in-graph red-light / stop-sign criteria
(cadre_tpu/envs/jax_env.py::_red_light_check/_stop_sign_check) must score
EXACTLY like the host criteria (envs/traffic_lights.py, the ports of
atomic_criteria.py:1836-2075/:2076+): the same scripted trajectory is run
through both, and the infraction counts and composed driving-score
penalties must agree.
"""
import jax
import jax.numpy as jnp
import numpy as np

from cadre_tpu.configs.agent_config import RolloutConfig  # noqa: F401
from cadre_tpu.envs.criteria import VehicleSnapshot
from cadre_tpu.envs.jax_env import (
    CYCLE,
    GREEN_TIME,
    YELLOW_TIME,
    JaxEnvConfig,
    RouteBank,
    _reset_one,
    _step_one,
)
from cadre_tpu.envs.scoring import (
    PENALTY_STOP,
    PENALTY_TRAFFIC_LIGHT,
)
from cadre_tpu.envs.traffic_lights import (
    RunningRedLightCriterion,
    RunningStopCriterion,
    StopLine,
    StopSignInfo,
    TrafficLightInfo,
)

_DT = 0.1


def _straight_bank(length=80, light=None, sign=None) -> RouteBank:
    """One straight +x route with an optional light/stop sign record."""
    n = length + 1
    dense = np.stack([np.arange(n, dtype=np.float32),
                      np.zeros(n, np.float32)], axis=-1)
    routes = np.zeros((1, n + 80, 2), np.float32)
    routes[0, :n] = dense
    routes[0, n:] = dense[-1]
    cum = np.concatenate([[0.0], np.cumsum(
        np.hypot(*(np.diff(dense, axis=0).T)))]) / length
    cums = np.ones((1, n + 80), np.float32)
    cums[0, :n] = cum
    lights = np.full((1, 8, 5), 1e8, np.float32)
    if light is not None:
        x, phase = light
        lights[0, 0] = [x, 0.0, phase, 1.0, 0.0]
    signs = np.full((1, 2, 5), 1e8, np.float32)
    if sign is not None:
        signs[0, 0] = [sign, 0.0, 2.0, 1.75, 0.0]
    return RouteBank(jnp.asarray(routes), jnp.asarray([n], np.int32),
                     jnp.asarray(cums), jnp.asarray(lights),
                     jnp.asarray(signs),
                     jnp.asarray(np.full((1, 1, 6), 1e8, np.float32)))


def _run_device(bank, controls_fn, steps=120):
    """Script the device env; returns (traj [(pos, yaw, speed)], red_count,
    stop_count, any_done)."""
    cfg = JaxEnvConfig(training=False, n_vehicles=0, n_walkers=0,
                       randomize_weather=False, render=False)
    state = _reset_one(cfg, bank, jax.random.PRNGKey(3))
    step = jax.jit(lambda s, c: _step_one(cfg, bank, s, c))
    traj, done_any = [], False
    infr = np.zeros(2, np.int64)
    for k in range(steps):
        state, out = step(state, jnp.asarray(controls_fn(k), jnp.float32))
        done_any = done_any or bool(out.done)
        # out.infractions is the PRE-auto-reset episode count; state's copy
        # is zeroed once `done` resets the episode
        infr = np.asarray(out.infractions)
        if bool(out.done):
            break                 # state is already the auto-reset episode
        traj.append((np.asarray(state.pos), float(state.yaw),
                     float(state.speed), k + 1))
    return traj, int(infr[0]), int(infr[1]), done_any


def _replay_host(traj, criterion, light=None):
    """Feed the device trajectory through a host criterion tick-for-tick."""
    for pos, yaw, speed, step in traj:
        if light is not None:
            light.state = light.state_at(step * _DT)
        criterion.update(VehicleSnapshot(pos=pos, yaw=yaw, speed=speed))
    return criterion


def _crossing_time(traj, line_x):
    """First tick whose tail segment straddles the stop line at x=line_x
    (same tail geometry as both criteria)."""
    for pos, yaw, speed, step in traj:
        fwd = np.array([np.cos(np.radians(yaw)), np.sin(np.radians(yaw))])
        close = pos - 0.8 * 2.45 * fwd
        far = pos - (2.45 + 1.0) * fwd
        if min(close[0], far[0]) <= line_x <= max(close[0], far[0]):
            return step * _DT
    return None


def test_red_light_device_matches_host():
    throttle = lambda k: [0.0, 0.6, 0.0]  # noqa: E731
    # pass 1: trajectory only (phase can't affect dynamics), find crossing
    bank0 = _straight_bank(light=(30.0, 0.0))
    traj, _, _, _ = _run_device(bank0, throttle)
    t_cross = _crossing_time(traj, 30.0)
    assert t_cross is not None, "scripted run never crossed the stop line"

    # pass 2 (red at crossing): device fires once, host fires once
    phase_red = (GREEN_TIME + YELLOW_TIME + 0.2 - t_cross) % CYCLE
    bank = _straight_bank(light=(30.0, phase_red))
    traj, red, stop, _ = _run_device(bank, throttle)
    assert (red, stop) == (1, 0)
    light = TrafficLightInfo(
        uid=1, center=np.array([30.0, 0.0]),
        stop_lines=[StopLine(pos=np.array([30.0, 0.0]),
                             dir=np.array([1.0, 0.0]))],
        phase=phase_red)
    crit = _replay_host(traj, RunningRedLightCriterion([light]), light)
    assert crit.actual_value == 1
    # composed penalties agree (statistics_manager.py:22-26)
    assert PENALTY_TRAFFIC_LIGHT ** red == PENALTY_TRAFFIC_LIGHT

    # pass 3 (green at crossing): neither fires
    phase_green = (1.0 - t_cross) % CYCLE
    bank = _straight_bank(light=(30.0, phase_green))
    traj, red, stop, _ = _run_device(bank, throttle)
    assert (red, stop) == (0, 0)
    light = TrafficLightInfo(
        uid=1, center=np.array([30.0, 0.0]),
        stop_lines=[StopLine(pos=np.array([30.0, 0.0]),
                             dir=np.array([1.0, 0.0]))],
        phase=phase_green)
    crit = _replay_host(traj, RunningRedLightCriterion([light]), light)
    assert crit.actual_value == 0


def test_stop_sign_device_matches_host():
    sign_x = 30.0
    blow_through = lambda k: [0.0, 0.6, 0.0]  # noqa: E731

    def stop_then_go(k):
        if k < 30:
            return [0.0, 0.6, 0.0]
        if k < 60:
            return [0.0, 0.0, 1.0]
        return [0.0, 0.6, 0.0]

    for controls, expect in ((blow_through, 1), (stop_then_go, 0)):
        bank = _straight_bank(sign=sign_x)
        traj, red, stop, _ = _run_device(bank, controls, steps=160)
        assert (red, stop) == (0, expect), controls.__name__ \
            if hasattr(controls, "__name__") else str(expect)
        sign = StopSignInfo(uid=1, center=np.array([sign_x, 0.0]),
                            extent=np.array([2.0, 1.75]), yaw=0.0)
        crit = _replay_host(traj, RunningStopCriterion([sign]))
        assert crit.actual_value == expect
        assert PENALTY_STOP ** stop == PENALTY_STOP ** expect


def test_infractions_reset_with_episode():
    """Auto-reset zeroes the per-episode infraction counters."""
    bank = _straight_bank(length=40, light=(20.0, 0.0))
    cfg = JaxEnvConfig(training=False, n_vehicles=0, n_walkers=0,
                       randomize_weather=False, render=False)
    state = _reset_one(cfg, bank, jax.random.PRNGKey(0))
    step = jax.jit(lambda s, c: _step_one(cfg, bank, s, c))
    ctrl = jnp.asarray([0.0, 0.6, 0.0], jnp.float32)
    for _ in range(400):
        state, out = step(state, ctrl)
        if bool(out.done):
            break
    assert bool(out.done)
    assert int(state.infractions.sum()) == 0  # fresh episode state
    assert int(state.last_red) == -1
