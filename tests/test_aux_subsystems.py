"""Aux subsystem tests: profiling, watchdog, driving score, scenarios."""
import time

import numpy as np
import pytest

from cadre_tpu.envs.criteria import (
    CollisionCriterion,
    RouteCompletionCriterion,
    VehicleSnapshot,
)
from cadre_tpu.envs.events import TrafficEvent, TrafficEventType
from cadre_tpu.envs.scenarios import (
    SCENARIO_BEHAVIORS,
    ScenarioManager,
    ScenarioTrigger,
)
from cadre_tpu.envs.scoring import StatisticsManager, score_route
from cadre_tpu.envs.sim_env import SimDrivingEnv
from cadre_tpu.utils.profiling import (
    PerformanceCounter,
    PhaseTimer,
    ThroughputMeter,
)
from cadre_tpu.utils.watchdog import Watchdog


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("env"):
        time.sleep(0.01)
    with t.phase("env"):
        time.sleep(0.01)
    with t.phase("device"):
        pass
    rep = t.report()
    assert rep["env"]["count"] == 2
    assert rep["env"]["mean_ms"] >= 9.0
    assert "device" in rep


def test_performance_counter():
    c = PerformanceCounter()
    for r in [1.0, 2.0, 3.0]:
        c.update(r)
    assert c.count == 3
    np.testing.assert_allclose(c.mean_reward, 2.0)


def test_throughput_meter():
    m = ThroughputMeter(alpha=1.0)
    m.tick(10)
    time.sleep(0.02)
    m.tick(10)
    assert 100 < m.rate < 1000


def test_watchdog_fires_and_pets():
    w = Watchdog(timeout=0.05)
    w.start()
    for _ in range(4):
        time.sleep(0.02)
        w.update()
    assert not w.failed
    time.sleep(0.12)
    assert w.failed
    assert w.get_status() is False
    w.stop()


def test_driving_score():
    route = np.array([[float(i), 0.0] for i in range(101)])
    comp = RouteCompletionCriterion(route)
    coll = CollisionCriterion()
    # drive half the route, one vehicle collision + one red light
    comp.update(VehicleSnapshot(pos=np.array([49.0, 0.0]), yaw=0, speed=5))
    coll.list_traffic_events.append(
        TrafficEvent(TrafficEventType.COLLISION_VEHICLE))
    coll.list_traffic_events.append(
        TrafficEvent(TrafficEventType.TRAFFIC_LIGHT_INFRACTION))
    rec = score_route("r0", [comp, coll])
    np.testing.assert_allclose(rec.penalty, 0.6 * 0.7)
    np.testing.assert_allclose(rec.score, rec.completion * 0.42)
    sm = StatisticsManager()
    sm.add(rec)
    g = sm.global_record()
    assert g["routes"] == 1
    np.testing.assert_allclose(g["score_composed"], rec.score)


def test_scenario_trigger_spawns_crossing():
    env = SimDrivingEnv(seed=0, seq_length=2)
    env.reset()
    n0 = len(env._obstacles)
    trig = ScenarioTrigger("dynamic_object_crossing", env._pos.copy())
    mgr = ScenarioManager([trig], rng=np.random.RandomState(0))
    env._scenario_manager = mgr
    env.step([0.0, 0.3, 0.0])
    assert trig.fired
    # adversary + the Scenario3 vision-blocker prop
    assert len(env._obstacles) == n0 + 2
    walker = next(o for o in env._obstacles if o.kind == "walker")
    p0 = walker.pos.copy()
    env.step([0.0, 0.3, 0.0])
    assert not np.allclose(walker.pos, p0)  # crossing is moving


def test_control_loss_injects_noise():
    env = SimDrivingEnv(seed=1, seq_length=2)
    env.reset()
    trig = ScenarioTrigger("control_loss", env._pos.copy())
    env._scenario_manager = ScenarioManager([trig],
                                            rng=np.random.RandomState(0))
    env.step([0.0, 0.5, 0.0])
    assert env._control_noise != 0.0


def test_all_behavior_kinds_buildable():
    env = SimDrivingEnv(seed=2, seq_length=2)
    env.reset()
    kinds = set(SCENARIO_BEHAVIORS.values())
    triggers = [ScenarioTrigger(k, env._pos.copy()) for k in kinds]
    mgr = ScenarioManager(triggers, rng=np.random.RandomState(0))
    env._scenario_manager = mgr
    env.step([0.0, 0.3, 0.0])
    assert all(t.fired for t in triggers)
    assert len(mgr.active) >= len(kinds) - 1  # control_loss may finish fast


def test_weather_presets_change_render():
    from cadre_tpu.envs.sim_env import WEATHER_PRESETS

    assert len(WEATHER_PRESETS) >= 15  # the reference collects 15+ weathers
    imgs = {}
    for wname in ["ClearNoon", "HardRainNight"]:
        env = SimDrivingEnv(seed=0, seq_length=2, weather=wname)
        tick = env.reset()
        imgs[wname] = np.asarray(tick["rgb"][-1], np.int64)
    # night render is much darker than noon
    assert imgs["HardRainNight"].mean() < imgs["ClearNoon"].mean() - 20


def test_randomized_weather_on_reset():
    env = SimDrivingEnv(seed=3, seq_length=2, randomize_weather=True)
    seen = set()
    for _ in range(6):
        env.reset()
        seen.add(env.weather)
    assert len(seen) >= 2


def test_snapshot_with_optimizer_state(tmp_path):
    import jax

    from cadre_tpu.configs.danet_config import danet_params
    from cadre_tpu.rl.agent import CadreAgent

    small = danet_params(image_height=64, image_width=96, feat_h=2, feat_w=3,
                         da_feature_channel=64, inter_att_dims=48, z_dims=32)
    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=small)
    p = str(tmp_path / "snap.msgpack")
    agent.save_snapshot(p, include_opt=True)
    import os

    assert os.path.exists(p + ".opt")
    agent.load_snapshot(p, include_opt=True)


def test_scenario_sampling_and_no_repeat():
    route = np.stack([np.arange(50.0), np.zeros(50)], axis=1)
    anns = [
        {"type": "Scenario1", "x": 10.0, "y": 0.0},
        {"type": "Scenario3", "x": 10.5, "y": 0.0},   # same trigger spot
        {"type": "Scenario1", "x": 30.0, "y": 0.0},   # repeated kind
        {"type": "Scenario4", "x": 40.0, "y": 0.0},
        {"type": "Scenario4", "x": 200.0, "y": 90.0},  # off route
    ]
    rng = np.random.RandomState(0)
    mgr = ScenarioManager.from_annotations(anns, route, rng=rng)
    assert len(mgr.triggers) == 4  # all on-route candidates kept by default

    mgr = ScenarioManager.from_annotations(anns, route, rng=rng, sample=True)
    kinds_at_10 = [t for t in mgr.triggers if t.pos[0] < 20]
    assert len(kinds_at_10) == 1   # one candidate sampled per location
    assert len(mgr.triggers) == 3

    mgr = ScenarioManager.from_annotations(anns, route,
                                           rng=np.random.RandomState(0),
                                           no_repeat=True)
    kinds = [t.kind for t in mgr.triggers]
    assert len(kinds) == len(set(kinds))  # each kind at most once
    assert len(mgr.triggers) == 3


def test_atomic_behavior_primitives():
    import math

    from cadre_tpu.envs.scenarios import (
        AccelerateToCatchUpBehavior,
        IdleBehavior,
        KeepVelocityBehavior,
        LaneChangeBehavior,
        SyncArrivalBehavior,
    )
    from cadre_tpu.envs.sim_env import SimObstacle

    class _Env:
        dt = 0.1
        _pos = np.zeros(2)
        _yaw = 0.0
        _speed = 5.0

    env = _Env()

    idle = IdleBehavior(duration=3)
    assert idle.tick(env) and idle.tick(env) and not idle.tick(env)

    ob = SimObstacle(pos=np.zeros(2), heading=0.0)
    kv = KeepVelocityBehavior(ob, speed=10.0, distance=2.0)
    assert kv.tick(env)           # moved 1 m of the 2 m budget
    assert not kv.tick(env)
    np.testing.assert_allclose(ob.pos, [2.0, 0.0], atol=1e-9)

    ob = SimObstacle(pos=np.zeros(2), heading=0.0, speed=10.0)
    lc = LaneChangeBehavior(ob, offset=3.5, duration=5)
    while lc.tick(env):
        pass
    np.testing.assert_allclose(ob.pos[1], 3.5, atol=1e-9)  # full shift left

    ob = SimObstacle(pos=np.array([-5.0, 0.0]), heading=0.0, speed=0.0)
    acc = AccelerateToCatchUpBehavior(ob, max_speed=20.0, throttle_inc=5.0,
                                      trigger_gap=2.0)
    ticks = 0
    while acc.tick(env) and ticks < 100:
        ticks += 1
    assert ticks < 100 and ob.pos[0] >= 2.0   # overtook the ego

    target = np.array([10.0, 10.0])
    ob = SimObstacle(pos=np.array([10.0, -10.0]), speed=0.0)
    sync = SyncArrivalBehavior(ob, target)
    sync.tick(env)
    # heading solved toward the target, speed matched to the ego's ETA
    assert abs(ob.heading - math.pi / 2) < 1e-6
    eta_ego = np.hypot(10, 10) / 5.0          # ~2.83 s
    assert abs(ob.speed - 20.0 / eta_ego) < 1.0
