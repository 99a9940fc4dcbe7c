"""Traffic-light/stop-sign subsystem: geometry, state, criteria, sim wiring.

Covers the reference semantics of atomic_criteria.py:1836-2075 (geometric
stop-line crossing, APPROACH_LIGHT, once-per-light debounce) and
carla_data_provider.py:309-414 (group annotation, state forcing).
"""
import math

import numpy as np
import pytest

from cadre_tpu.envs.events import TrafficEventType
from cadre_tpu.envs.criteria import VehicleSnapshot, default_criteria
from cadre_tpu.envs.traffic_lights import (
    CYCLE,
    GREEN,
    GREEN_TIME,
    RED,
    RED_TIME,
    YELLOW,
    YELLOW_TIME,
    RunningRedLightCriterion,
    RunningStopCriterion,
    StopLine,
    StopSignInfo,
    TrafficLightInfo,
    annotate_light_group,
    lights_at_route_corners,
    nearest_light_ahead,
    reset_lights,
    update_light_states,
)


def _light(center=(0.0, 0.0), direction=(1.0, 0.0), uid=1):
    sl = StopLine(pos=np.asarray(center, float),
                  dir=np.asarray(direction, float), lane_width=3.5)
    return TrafficLightInfo(uid=uid, center=np.asarray(center, float),
                            stop_lines=[sl])


def _drive_through(crit, x0=-8.0, x1=6.0, step=0.3, speed=5.0):
    x = x0
    while x < x1:
        crit.update(VehicleSnapshot(pos=np.array([x, 0.01]), yaw=0.0,
                                    speed=speed, forward=np.array([1.0, 0.0])))
        x += step


def test_cycle_state_machine():
    tl = _light()
    assert tl.state_at(0.1) == GREEN
    assert tl.state_at(GREEN_TIME + 0.1) == YELLOW
    assert tl.state_at(GREEN_TIME + YELLOW_TIME + 0.1) == RED
    assert tl.state_at(CYCLE + 0.1) == GREEN           # wraps
    assert CYCLE == GREEN_TIME + YELLOW_TIME + RED_TIME
    tl.frozen = RED
    assert tl.state_at(0.1) == RED


def test_red_light_infraction_once_per_light():
    tl = _light()
    tl.state = RED
    crit = RunningRedLightCriterion([tl])
    _drive_through(crit)
    infractions = [e for e in crit.list_traffic_events
                   if e.get_type() == TrafficEventType.TRAFFIC_LIGHT_INFRACTION]
    assert len(infractions) == 1            # debounced via _last_red_light_id
    assert crit.test_status == "FAILURE"
    assert crit.actual_value == 1
    # continuing well past the light adds nothing
    _drive_through(crit, x0=6.0, x1=20.0)
    infractions = [e for e in crit.list_traffic_events
                   if e.get_type() == TrafficEventType.TRAFFIC_LIGHT_INFRACTION]
    assert len(infractions) == 1


def test_green_light_no_infraction_but_approach_events():
    tl = _light()
    tl.state = GREEN
    crit = RunningRedLightCriterion([tl])
    _drive_through(crit)
    types = [e.get_type() for e in crit.list_traffic_events]
    assert TrafficEventType.TRAFFIC_LIGHT_INFRACTION not in types
    approaches = [e for e in crit.list_traffic_events
                  if e.get_type() == TrafficEventType.APPROACH_LIGHT]
    assert approaches                        # emitted while within 10 m
    assert all(e.get_dict()["distance"] <= 10.0 + 1e-6 for e in approaches)
    assert approaches[0].get_dict()["state"] == GREEN


def test_opposite_direction_ignored():
    # a light serving the opposing lane (dir -x) must not fire for an ego
    # driving +x over the same line
    tl = _light(direction=(-1.0, 0.0))
    tl.state = RED
    crit = RunningRedLightCriterion([tl])
    _drive_through(crit)
    assert crit.list_traffic_events == []


def test_lateral_offset_ignored():
    # ego on a parallel lane 5 m to the side: outside 0.8*lane_width
    tl = _light()
    tl.state = RED
    crit = RunningRedLightCriterion([tl])
    x = -8.0
    while x < 6.0:
        crit.update(VehicleSnapshot(pos=np.array([x, 5.0]), yaw=0.0,
                                    speed=5.0, forward=np.array([1.0, 0.0])))
        x += 0.3
    types = [e.get_type() for e in crit.list_traffic_events]
    assert TrafficEventType.TRAFFIC_LIGHT_INFRACTION not in types


def test_stop_sign_infraction_and_compliance():
    sign = StopSignInfo(uid=7, center=np.array([0.0, 0.0]),
                        extent=np.array([2.0, 2.0]))

    # roll through without stopping -> infraction on leaving the influence
    crit = RunningStopCriterion([sign])
    x = -30.0
    while x < 40.0:
        crit.update(VehicleSnapshot(pos=np.array([x, 0.0]), yaw=0.0,
                                    speed=6.0, forward=np.array([1.0, 0.0])))
        x += 1.0
    stops = [e for e in crit.list_traffic_events
             if e.get_type() == TrafficEventType.STOP_INFRACTION]
    assert len(stops) == 1 and crit.actual_value == 1

    # full stop inside the box -> clean
    crit2 = RunningStopCriterion([sign])
    x = -30.0
    while x < 40.0:
        speed = 0.05 if abs(x) < 1.0 else 6.0
        crit2.update(VehicleSnapshot(pos=np.array([x, 0.0]), yaw=0.0,
                                     speed=speed,
                                     forward=np.array([1.0, 0.0])))
        x += 1.0
    assert all(e.get_type() != TrafficEventType.STOP_INFRACTION
               for e in crit2.list_traffic_events)


def test_annotate_light_group_roles():
    ref = _light(direction=(1.0, 0.0), uid=1)
    left = _light(direction=(0.0, 1.0), uid=2)       # +90
    opposite = _light(direction=(-1.0, 0.0), uid=3)  # 180
    right = _light(direction=(0.0, -1.0), uid=4)     # 270
    ann = annotate_light_group(ref, [ref, left, opposite, right])
    assert [tl.uid for tl in ann["ref"]] == [1]
    assert [tl.uid for tl in ann["left"]] == [2]
    assert [tl.uid for tl in ann["opposite"]] == [3]
    assert [tl.uid for tl in ann["right"]] == [4]


def test_update_and_reset_light_states():
    ref = _light(uid=1)
    opp = _light(direction=(-1.0, 0.0), uid=2)
    ann = annotate_light_group(ref, [ref, opp])
    params = update_light_states(ref, ann, {"ego": RED, "opposite": GREEN},
                                 freeze=True)
    assert ref.state == RED and ref.frozen == RED
    assert opp.state == GREEN and opp.frozen == GREEN
    assert ref.state_at(GREEN_TIME + 0.1) == RED     # frozen overrides cycle
    reset_lights(params)
    assert ref.frozen is None and opp.frozen is None


def test_default_criteria_wires_geometric_tests():
    route = np.stack([np.linspace(0, 50, 51), np.zeros(51)], axis=1)
    tl = _light(center=(25.0, 0.0))
    tl.frozen = RED
    tl.state = RED
    crits = default_criteria(route, lights=[tl])
    red = next(c for c in crits if c.name == "RunningRedLightTest")
    assert isinstance(red, RunningRedLightCriterion)
    _drive_through(red, x0=18.0, x1=32.0)
    assert red.actual_value == 1


def test_lights_at_route_corners_and_nearest():
    kp = np.array([[0.0, 0.0], [60.0, 0.0], [60.0, 60.0]])
    rng = np.random.RandomState(0)
    lights = lights_at_route_corners(kp, kp, rng)
    assert len(lights) == 1
    tl = lights[0]
    np.testing.assert_allclose(tl.stop_lines[0].dir, [1.0, 0.0])
    np.testing.assert_allclose(tl.center, [52.0, 0.0])   # 8 m setback

    tl.state = RED
    cls, dist = nearest_light_ahead(lights, np.array([40.0, 0.0]),
                                    np.array([1.0, 0.0]))
    assert cls == 3 and abs(dist - 12.0) < 1e-6
    # behind the ego -> none
    cls, dist = nearest_light_ahead(lights, np.array([55.0, 0.0]),
                                    np.array([1.0, 0.0]))
    assert cls == 0 and dist == -1.0


def test_nearest_light_frustum_consistency():
    """Labels must match camera visibility: a light outside the 90-degree
    frustum (or inside the near plane) is 'none' even when it is within
    range in the forward half-plane."""
    lights = [_light(center=(5.0, 20.0))]   # 80 deg off-axis, 20.6 m away
    lights[0].state = RED
    cls, dist = nearest_light_ahead(lights, np.array([0.0, 0.0]),
                                    np.array([1.0, 0.0]))
    assert cls == 0 and dist == -1.0
    # same light rotated into view (45 deg boundary is inclusive)
    cls, dist = nearest_light_ahead(lights, np.array([0.0, 0.0]),
                                    np.array([0.0, 1.0]))
    assert cls == 3
    # inside the near plane (< 1.5 m forward) -> not renderable -> none
    near = [_light(center=(1.0, 0.0))]
    near[0].state = RED
    cls, dist = nearest_light_ahead(near, np.array([0.0, 0.0]),
                                    np.array([1.0, 0.0]))
    assert cls == 0 and dist == -1.0
    # normalization: an unnormalized fwd vector gives the same answer
    seen = [_light(center=(10.0, 3.0))]
    seen[0].state = YELLOW
    a = nearest_light_ahead(seen, np.array([0.0, 0.0]),
                            np.array([1.0, 0.0]))
    b = nearest_light_ahead(seen, np.array([0.0, 0.0]),
                            np.array([3.0, 0.0]))
    assert a == b and a[0] == 2


def test_sim_env_emits_red_light_infraction():
    from cadre_tpu.envs.sim_env import SimDrivingEnv

    env = SimDrivingEnv(seed=5, render_camera=False)
    env.reset()
    assert env._lights, "synthetic corner routes must synthesize lights"
    tl = env._lights[0]
    tl.frozen = RED
    sl = tl.stop_lines[0]
    # teleport the ego 8 m before the stop line, aligned with the lane
    env._pos = sl.pos - 8.0 * sl.dir
    env._yaw = math.degrees(math.atan2(sl.dir[1], sl.dir[0]))
    env._speed = 6.0
    events = []
    for _ in range(60):
        # modest throttle: the overspeed terminator fires at >9 m/s
        tick, rewards, done, info = env.step([0.0, 0.35, 0.0])
        events.extend(tick["new_event_list"])
        if done:
            break
    types = [e.get_type() for e in events]
    assert TrafficEventType.TRAFFIC_LIGHT_INFRACTION in types
    assert TrafficEventType.APPROACH_LIGHT in types


def test_sim_env_light_ground_truth_and_rendering():
    from cadre_tpu.envs.sim_env import SimDrivingEnv

    env = SimDrivingEnv(seed=5)
    env.reset()
    tl = env._lights[0]
    tl.frozen = RED
    tl.state = RED
    sl = tl.stop_lines[0]
    env._pos = sl.pos - 10.0 * sl.dir
    env._yaw = math.degrees(math.atan2(sl.dir[1], sl.dir[0]))
    tick = env._world_tick()
    assert tick["light_state"] == 3            # red
    assert 0 < tick["light_dist"] <= 25.0
    rgb = tick["rgb"]
    # the red head must be visible: saturated-red pixels above the horizon
    reds = (rgb[:, :, 0].astype(int) - rgb[:, :, 2].astype(int) > 120)
    assert reds.any()

    tl.frozen = GREEN
    tl.state = GREEN
    tick = env._world_tick()
    assert tick["light_state"] == 1
    greens = (rgbize := tick["rgb"])[:, :, 1].astype(int) \
        - rgbize[:, :, 0].astype(int) > 120
    assert greens.any()
