"""Per-scenario-type behavior coverage on the kinematic sim.

VERDICT flagged Scenarios 4/7/8/9 as aliases; each type now has distinct
semantics (vehicle-turning arc; signal-junction light hack per subtype
direction left/opposite/right; unsignalized sync-arrival conflict), plus the
atomic trigger-condition library and sequence composition.
"""
import math

import numpy as np

from cadre_tpu.envs.scenarios import (
    SCENARIO_BEHAVIORS,
    _BEHAVIOR_BUILDERS,
    ChangeAutoPilotBehavior,
    ConditionBehavior,
    DriveDistance,
    IdleBehavior,
    InTriggerDistanceToLocation,
    InTriggerDistanceToVehicle,
    KeepVelocityBehavior,
    NoSignalJunctionBehavior,
    ScenarioManager,
    ScenarioTrigger,
    SequenceBehavior,
    SignalJunctionBehavior,
    StandStill,
    VehicleTurningBehavior,
    WaitEndIntersection,
    WaypointFollowerBehavior,
)
from cadre_tpu.envs.sim_env import SimDrivingEnv, SimObstacle
from cadre_tpu.envs.traffic_lights import GREEN, RED


def _env(seed=3, lights=True):
    env = SimDrivingEnv(seed=seed, render_camera=False,
                        with_traffic_lights=lights)
    env.reset()
    return env


def test_every_scenario_type_has_a_builder():
    assert set(SCENARIO_BEHAVIORS) == {f"Scenario{i}" for i in range(1, 11)}
    for key in SCENARIO_BEHAVIORS.values():
        assert key in _BEHAVIOR_BUILDERS
    # 7/8/9 are distinct subtypes, not aliases
    assert len({SCENARIO_BEHAVIORS[f"Scenario{i}"] for i in (7, 8, 9)}) == 3


def test_vehicle_turning_crosses_ego_lane():
    env = _env()
    n0 = len(env._obstacles)
    beh = VehicleTurningBehavior(env)
    ob = env._obstacles[-1]
    assert len(env._obstacles) == n0 + 1 and ob.kind == "cyclist"
    yaw = math.radians(env._yaw)
    fwd = np.array([math.cos(yaw), math.sin(yaw)])
    left = np.array([-fwd[1], fwd[0]])
    lat0 = float((ob.pos - env._pos) @ left)
    assert lat0 > 5.0                     # starts left of the lane
    lats = []
    for _ in range(200):
        if not beh.tick(env):
            break
        lats.append(float((ob.pos - env._pos) @ left))
    # the arc carried it across the ego lane to the far side
    assert min(lats) < -3.0
    assert any(abs(v) < 1.5 for v in lats)  # passed through the lane


def test_signal_junction_forces_lights_and_restores():
    env = _env(seed=5)
    assert env._lights
    # put the ego on approach to the first light so it is "ahead"
    tl = env._lights[0]
    sl = tl.stop_lines[0]
    env._pos = sl.pos - 15.0 * sl.dir
    env._yaw = math.degrees(math.atan2(sl.dir[1], sl.dir[0]))
    tl.state = GREEN

    beh = SignalJunctionBehavior(env, "left")
    assert tl.frozen == RED               # phase 1: ego light forced red
    conflict = env._obstacles[-1]
    d0 = float(np.hypot(*(conflict.pos - env._pos)))
    for _ in range(int(beh.RED_TIME / env.dt)):
        beh.tick(env)
    assert tl.frozen == GREEN             # phase 2: ego group green
    for _ in range(int(beh.RESET_TIME / env.dt)):
        beh.tick(env)
    assert tl.frozen is None              # junction restored
    d1 = float(np.hypot(*(conflict.pos - env._pos)))
    assert d1 < d0                        # the conflict vehicle approached


def test_signal_junction_subtype_sides():
    env = _env(seed=5)
    tl = env._lights[0]
    sl = tl.stop_lines[0]
    env._pos = sl.pos - 15.0 * sl.dir
    env._yaw = math.degrees(math.atan2(sl.dir[1], sl.dir[0]))
    fwd = sl.dir
    left = np.array([-fwd[1], fwd[0]])
    sides = {}
    for direction in ("left", "right", "opposite"):
        n0 = len(env._obstacles)
        SignalJunctionBehavior(env, direction)
        ob = env._obstacles[-1]
        assert len(env._obstacles) == n0 + 1
        rel = ob.pos - env._pos
        sides[direction] = (float(rel @ left), float(rel @ fwd))
    assert sides["left"][0] > 10.0        # spawned on the ego's left
    assert sides["right"][0] < -10.0      # ... right
    assert sides["opposite"][1] > 20.0    # ... ahead, beyond the junction
    assert abs(sides["opposite"][0]) < 5.0


def test_no_signal_junction_sync_arrival():
    env = _env()
    beh = NoSignalJunctionBehavior(env)
    ob = env._obstacles[-1]
    env._speed = 5.0
    d0 = float(np.hypot(*(ob.pos - env._pos)))
    for _ in range(30):
        if not beh.tick(env):
            break
    assert float(np.hypot(*(ob.pos - env._pos))) < d0


def test_waypoint_follower_tracks_polyline():
    env = _env()
    ob = env.spawn_scenario_actor("vehicle", env._pos + [5.0, 0.0])
    wps = np.array([ob.pos + [10.0, 0.0], ob.pos + [10.0, 10.0]])
    beh = WaypointFollowerBehavior(ob, wps, speed=5.0)
    steps = 0
    while beh.tick(env) and steps < 200:
        steps += 1
    np.testing.assert_allclose(ob.pos, wps[-1], atol=1.0)


def test_change_autopilot_releases_to_env():
    env = _env()
    ob = env.spawn_scenario_actor("walker", env._pos + [8.0, 2.0],
                                  heading=0.0)
    ob.managed = True
    beh = ChangeAutoPilotBehavior(ob, speed=2.0)
    assert beh.tick(env) is False         # one-shot
    assert ob.speed == 2.0 and not ob.managed


def test_trigger_conditions():
    env = _env()
    a = SimObstacle(pos=env._pos + np.array([30.0, 0.0]))
    assert not InTriggerDistanceToVehicle("ego", a, 20.0)(env)
    a.pos = env._pos + np.array([10.0, 0.0])
    assert InTriggerDistanceToVehicle("ego", a, 20.0)(env)

    assert InTriggerDistanceToLocation("ego", env._pos + 1.0, 5.0)(env)

    dd = DriveDistance("ego", 5.0)
    assert not dd(env)
    env._pos = env._pos + np.array([6.0, 0.0])
    assert dd(env)

    ss = StandStill("ego", duration=0.3)
    env._speed = 0.0
    assert not ss(env) and not ss(env)
    assert ss(env)                         # 3 ticks * 0.1 s

    junction = env._pos + np.array([5.0, 0.0])
    wei = WaitEndIntersection(junction, radius=8.0)
    assert not wei(env)                    # inside from the start counts
    env._pos = junction + np.array([20.0, 0.0])
    assert wei(env)                        # entered then left


def test_sequence_and_condition_composition():
    env = _env()
    ob = env.spawn_scenario_actor("vehicle", env._pos + [6.0, 0.0],
                                  heading=0.0)
    fired = []
    seq = SequenceBehavior([
        ConditionBehavior(DriveDistance("ego", 2.0)),
        IdleBehavior(duration=2),
        KeepVelocityBehavior(ob, speed=3.0, distance=1.0),
    ])
    # condition unsatisfied: sequence stays on the gate; the actor does not
    # move until the keep-velocity leg is reached
    p0 = ob.pos.copy()
    assert seq.tick(env)
    np.testing.assert_allclose(ob.pos, p0)
    env._pos = env._pos + np.array([3.0, 0.0])
    assert seq.tick(env)                   # gate passes -> idle starts
    np.testing.assert_allclose(ob.pos, p0)
    assert seq.tick(env)                   # idle finishes
    for _ in range(10):
        if not seq.tick(env):
            break
    assert float(np.hypot(*(ob.pos - p0))) >= 1.0   # keep-velocity drove it
    assert not seq.tick(env)               # fully finished


def test_manager_runs_signal_junction_from_annotation():
    env = SimDrivingEnv(seed=5, render_camera=False)
    env.reset()
    ann = [{"type": "Scenario8", "x": float(env._pos[0] + 6.0),
            "y": float(env._pos[1])}]
    mgr = ScenarioManager.from_annotations(ann, env._route_xy,
                                           rng=np.random.RandomState(0))
    env._scenario_manager = mgr
    n0 = len(env._obstacles)
    for _ in range(12):
        env.step([0.0, 0.3, 0.0])
    assert len(env._obstacles) == n0 + 1   # the conflict vehicle spawned
    assert mgr.triggers[0].fired


def test_weather_behavior_darkens_scene():
    env = SimDrivingEnv(seed=3, animate_weather=True, sun_altitude=70.0)
    env.reset()
    img0 = env._render_rgb()
    # run the sun down (~30 deg/min at 10 Hz)
    for _ in range(400):
        env.step([0.0, 0.1, 0.0])
    assert env._sun_altitude < 70.0
    env._sun_altitude = 5.0            # near the horizon
    img1 = env._render_rgb()
    ground0 = img0[90:].astype(float).mean()
    ground1 = img1[90:].astype(float).mean()
    assert ground1 < ground0 * 0.6     # visibly darker below the horizon
    # a fresh episode restores the configured sun (modulo the 7 history
    # prefill steps, each of which legitimately ticks the animation)
    env.reset()
    assert env._sun_altitude > 69.0


def test_velocity_ramp_stop_and_handbrake():
    from cadre_tpu.envs.scenarios import (
        AccelerateToVelocityBehavior,
        HandBrakeVehicleBehavior,
        StopVehicleBehavior,
    )

    env = _env()
    ob = env.spawn_scenario_actor("vehicle", env._pos + [20, 0], speed=0.0)
    beh = AccelerateToVelocityBehavior(ob, target_velocity=4.0,
                                       throttle_inc=1.0)
    for _ in range(10):
        if not beh.tick(env):
            break
    assert ob.speed == 4.0

    stop = StopVehicleBehavior(ob, brake_decel=10.0)
    for _ in range(20):
        if not stop.tick(env):
            break
    assert ob.speed == 0.0

    ob.speed = 3.0
    hb = HandBrakeVehicleBehavior(ob, duration=3)
    assert ob.speed == 0.0 and ob.managed
    for _ in range(3):
        hb.tick(env)
    assert ob.speed == 3.0 and not ob.managed


def test_transform_setter_destroy_and_init_speed():
    from cadre_tpu.envs.scenarios import (
        ActorDestroyBehavior,
        ActorTransformSetterBehavior,
        SetInitSpeedBehavior,
    )

    env = _env()
    ob = env.spawn_scenario_actor("vehicle", env._pos + [20, 0])
    tgt = env._pos + np.array([5.0, 5.0])
    assert ActorTransformSetterBehavior(ob, tgt, heading=1.0).tick(env) \
        is False
    np.testing.assert_allclose(ob.pos, tgt)
    assert ob.heading == 1.0

    SetInitSpeedBehavior(ob, 6.0)
    assert ob.speed == 6.0 and not ob.managed

    n0 = len(env._obstacles)
    ActorDestroyBehavior(ob).tick(env)
    assert len(env._obstacles) == n0 - 1
    assert all(o is not ob for o in env._obstacles)


def test_actor_source_and_sink_flow():
    from cadre_tpu.envs.scenarios import (
        ActorSinkBehavior,
        ActorSourceBehavior,
    )

    env = _env()
    far = env._pos + np.array([200.0, 0.0])
    src = ActorSourceBehavior(far, heading=0.0, speed=8.0, interval=0.2)
    for _ in range(10):
        assert src.tick(env)              # the source drives its flow
    assert len(src.spawned) >= 2          # flow spawns repeatedly
    # spacing: never two actors within 4 m of the source simultaneously
    sink = ActorSinkBehavior(src.spawned[0].pos, radius=5.0)
    n0 = len(env._obstacles)
    assert sink.tick(env)
    assert len(env._obstacles) < n0       # at least one despawned


def test_light_setter_and_wait_for_state():
    from cadre_tpu.envs.scenarios import (
        TrafficLightStateSetterBehavior,
        WaitForTrafficLightState,
    )

    env = _env()
    light = env._lights[0]
    cond = WaitForTrafficLightState(light, RED)
    TrafficLightStateSetterBehavior(light, RED)
    assert light.frozen == RED and cond(env)
    light.frozen = GREEN
    assert not cond(env)


def test_add_noise_to_vehicle_perturbs_ego_controls():
    from cadre_tpu.envs.scenarios import AddNoiseToVehicleBehavior

    env = _env(lights=False)
    beh = AddNoiseToVehicleBehavior(steer_noise=0.0, throttle_noise=1.0,
                                    duration=30)
    beh.set_parameters(0.0, 1.0)
    env._scenario_manager = ScenarioManager(
        [ScenarioTrigger("noise", at_tick=1,
                         builder=lambda e, rng: beh)])
    for _ in range(10):
        env.step([0.0, 0.0, 0.0])         # zero throttle commanded
    assert env._speed > 0.1               # noise throttled the ego
    for _ in range(30):
        env.step([0.0, 0.0, 1.0])
    assert env._throttle_noise == 0.0     # expired and reset


def test_time_to_arrival_region_and_relative_velocity():
    from cadre_tpu.envs.scenarios import (
        InTimeToArrivalToLocation,
        InTimeToArrivalToVehicle,
        InTriggerRegion,
        RelativeVelocityToOtherActor,
        TriggerVelocity,
    )

    env = _env(lights=False)
    ob = env.spawn_scenario_actor("vehicle", env._pos + [10, 0], speed=5.0)
    assert InTimeToArrivalToLocation(ob, ob.pos + [4.0, 0.0], 2.0)(env)
    assert not InTimeToArrivalToLocation(ob, ob.pos + [100.0, 0.0],
                                         2.0)(env)
    env._speed = 5.0
    assert InTimeToArrivalToVehicle("ego", ob, 2.0)(env)
    p = env._pos
    assert InTriggerRegion("ego", p[0] - 1, p[0] + 1, p[1] - 1,
                           p[1] + 1)(env)
    assert not InTriggerRegion(ob, p[0] - 1, p[0] + 1, p[1] - 1,
                               p[1] + 1)(env)
    assert TriggerVelocity(ob, 4.0)(env)
    assert not TriggerVelocity(ob, 6.0)(env)
    ob.speed = 1.0
    assert RelativeVelocityToOtherActor("ego", ob, 3.0)(env)
    assert not RelativeVelocityToOtherActor(ob, "ego", 3.0)(env)


def test_parallel_behavior_policies():
    from cadre_tpu.envs.scenarios import ParallelBehavior

    env = _env(lights=False)
    one = ParallelBehavior([IdleBehavior(2), IdleBehavior(10)],
                           success_on_one=True)
    assert one.tick(env)                  # both still running
    assert not one.tick(env)              # first finished -> whole done
    allp = ParallelBehavior([IdleBehavior(2), IdleBehavior(4)],
                            success_on_one=False)
    ticks = 0
    while allp.tick(env):
        ticks += 1
    assert ticks == 3                     # runs until the longest finishes


def test_basic_agent_drives_to_target():
    from cadre_tpu.envs.scenarios import BasicAgentBehavior

    env = _env(lights=False)
    ob = env.spawn_scenario_actor("vehicle", env._pos + [10, 10])
    target = env._pos + np.array([10.0, -10.0])
    beh = BasicAgentBehavior(ob, target, speed=10.0)
    for _ in range(200):
        if not beh.tick(env):
            break
    assert float(np.hypot(*(ob.pos - target))) < 1.5


def test_released_vehicle_keeps_integrating():
    """A finished owned behavior releases its actor back to the env
    integrator: the vehicle continues at its speed instead of freezing
    (CARLA actors persist after their behavior subtree completes)."""
    env = _env(lights=False)
    ob = env.spawn_scenario_actor("vehicle", env._pos + np.array([20.0, 0.0]),
                                  heading=0.0, speed=5.0)
    beh = KeepVelocityBehavior(ob, speed=5.0, distance=1.0)  # finishes fast
    assert ob.managed
    while beh.tick(env):
        pass
    assert not ob.managed and getattr(ob, "_owner", None) is None
    p0 = ob.pos.copy()
    for _ in range(5):
        env.step([0.0, 0.0, 1.0])
    moved = float(np.hypot(*(ob.pos - p0)))
    assert moved > 5 * 5.0 * env.dt * 0.9, \
        "released vehicle must self-integrate at its speed"


def test_lane_change_steal_then_release_continues_motion():
    """OSC semantics: a LaneChangeAction stealing an init-speed entity must
    not freeze it after the lane change completes."""
    from cadre_tpu.envs.scenarios import LaneChangeBehavior

    env = _env(lights=False)
    ob = env.spawn_scenario_actor("vehicle", env._pos + np.array([15.0, 0.0]),
                                  heading=0.0, speed=4.0)
    keep = KeepVelocityBehavior(ob, speed=4.0, distance=float("inf"))
    lane = LaneChangeBehavior(ob, offset=3.5, duration=5)
    assert keep.tick(env) is False          # ownership stolen
    while lane.tick(env):
        pass
    assert not ob.managed                   # released on completion
    p0 = ob.pos.copy()
    for _ in range(4):
        env.step([0.0, 0.0, 1.0])
    assert float(np.hypot(*(ob.pos - p0))) > 4 * 4.0 * env.dt * 0.9


def test_handbrake_restores_ownership_truth():
    """HandBrake on an owned actor must NOT force managed=False on expiry
    (that re-enables the env integrator on top of the owner)."""
    from cadre_tpu.envs.scenarios import HandBrakeVehicleBehavior

    env = _env(lights=False)
    ob = env.spawn_scenario_actor("walker", env._pos + np.array([10.0, 3.0]),
                                  heading=math.pi / 2, speed=1.5)
    keep = KeepVelocityBehavior(ob, speed=1.5, distance=float("inf"))
    hb = HandBrakeVehicleBehavior(ob, duration=3)
    while hb.tick(env):
        pass
    assert ob.managed, "owner still holds the actor after handbrake expiry"
    assert ob.speed == 1.5
    # and an unowned actor is handed back to the integrator
    ob2 = env.spawn_scenario_actor("walker", env._pos + np.array([10.0, -3.0]),
                                   heading=0.0, speed=1.0)
    ob2.managed = False
    hb2 = HandBrakeVehicleBehavior(ob2, duration=2)
    while hb2.tick(env):
        pass
    assert not ob2.managed


def test_long_tail_proximity_conditions():
    """WalkerCollision / HasBeenOccupied / TooFarAway / Rectify
    (atomic_trigger_conditions.py:280-463)."""
    from cadre_tpu.envs.scenarios import (
        HasBeenOccupied,
        Rectify,
        TooFarAway,
        WalkerCollision,
    )

    env = _env(lights=False)
    walker = env.spawn_scenario_actor("walker", env._pos + [30, 30])
    assert not WalkerCollision(walker)(env)
    assert not HasBeenOccupied(walker)(env)
    car = env.spawn_scenario_actor("vehicle", walker.pos + [1.5, 0.0])
    assert WalkerCollision(walker)(env)          # vehicle within 2 m
    assert HasBeenOccupied(walker)(env)          # anything within 5 m
    assert not WalkerCollision(car)(env)         # walker doesn't count
    assert TooFarAway(walker)(env)               # 42 m from the ego
    near = env.spawn_scenario_actor("vehicle", env._pos + [5, 0])
    assert not TooFarAway(near)(env)
    status = [""]
    assert Rectify(status, "msg")(env) and status[0] == "msg"


def test_acceleration_and_time_of_day_conditions():
    from cadre_tpu.envs.scenarios import (
        TimeOfDayComparison,
        TriggerAcceleration,
    )

    env = _env(lights=False)
    ob = env.spawn_scenario_actor("vehicle", env._pos + [10, 0], speed=0.0)
    cond = TriggerAcceleration(ob, 2.0)
    assert not cond(env)                         # first sample primes
    ob.speed = 1.0                               # 10 m/s^2 over one tick
    assert cond(env)

    # reset pre-fills the 8-frame history, so the sim clock starts ~0.8 s
    t0 = env._step_count * env.dt
    tod = TimeOfDayComparison(t0 + 0.5)
    assert not tod(env)
    for _ in range(6):
        env.step([0.0, 0.0, 0.0])
    assert tod(env)


def test_route_relative_conditions():
    """InTriggerDistanceToNextIntersection /
    InTriggerDistanceToLocationAlongRoute
    (atomic_trigger_conditions.py:838-929)."""
    from cadre_tpu.envs.scenarios import (
        InTriggerDistanceToLocationAlongRoute,
        InTriggerDistanceToNextIntersection,
        _route_corners,
    )

    env = _env(lights=False)
    corners = _route_corners(np.asarray(env._route_xy))
    assert len(corners) >= 1                     # 3-leg synthetic route
    d0 = float(np.hypot(*(corners - env._pos).T).min())
    assert InTriggerDistanceToNextIntersection("ego", d0 + 5.0)(env)
    assert not InTriggerDistanceToNextIntersection("ego", d0 - 5.0)(env)

    dense = np.asarray(env._route_xy)
    ahead = dense[min(15, len(dense) - 1)]       # 15 m along the route
    cond = InTriggerDistanceToLocationAlongRoute("ego", ahead, 20.0)
    assert cond(env)
    far = dense[min(45, len(dense) - 1)]
    assert not InTriggerDistanceToLocationAlongRoute("ego", far, 20.0)(env)


def test_cut_in_conditions():
    """WaitUntilInFront / InTimeToArrivalToVehicleSideLane
    (atomic_trigger_conditions.py:1059-1206)."""
    from cadre_tpu.envs.scenarios import (
        InTimeToArrivalToVehicleSideLane,
        WaitUntilInFront,
    )

    env = _env(lights=False)
    other = env.spawn_scenario_actor("vehicle", env._pos + [10, 0],
                                     heading=0.0)
    behind = env.spawn_scenario_actor("vehicle", env._pos + [2, 0],
                                      heading=0.0)
    front = env.spawn_scenario_actor("vehicle", other.pos + [8, 0],
                                     heading=0.0)
    assert WaitUntilInFront(front, other)(env)
    assert not WaitUntilInFront(behind, other)(env)

    # closing on the other's LEFT lane point (side_lane='right' quirk)
    chaser = env.spawn_scenario_actor(
        "vehicle", other.pos + [-3.5, 3.5], heading=0.0, speed=6.0)
    assert InTimeToArrivalToVehicleSideLane(chaser, other, 3.0, "right")(env)
    assert not InTimeToArrivalToVehicleSideLane(chaser, other, 0.2,
                                                "right")(env)


def test_blackboard_and_recorder_behaviors():
    from cadre_tpu.envs.scenarios import (
        SetBlackboardVariableBehavior,
        StartRecorderBehavior,
        StopRecorderBehavior,
        WaitForBlackboardVariable,
    )

    env = _env(lights=False)
    cond = WaitForBlackboardVariable("flag")
    assert not cond(env)
    assert not SetBlackboardVariableBehavior("flag").tick(env)
    assert cond(env)

    class _Client:
        def start_recorder(self, name):
            self.recorder_file = name

        def stop_recorder(self):
            self.recorder_file = None

    env.client = _Client()
    assert not StartRecorderBehavior("ep0.log").tick(env)
    assert env.client.recorder_file == "ep0.log"
    assert not StopRecorderBehavior().tick(env)
    assert env.client.recorder_file is None
