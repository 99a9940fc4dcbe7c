"""Trigger-driven adversarial scenario behaviors for the simulator.

The reference instantiates Scenario1-10 py_trees behaviors at route trigger
points (route_scenario.py:55-66,368-435; srunner/scenarios/*): ControlLoss,
FollowLeadingVehicle, DynamicObjectCrossing, VehicleTurningRoute,
OtherLeadingVehicle, ManeuverOppositeDirection, Signal/NoSignalJunction
crossings. Here each is a small tick-driven state machine (SURVEY §7 step 7
recommends exactly this over a py_trees port) acting on the kinematic sim:
spawning/steering obstacle actors or perturbing ego controls when the ego
reaches the trigger.

CARLA-backed envs get these behaviors from the server-side traffic instead;
the JSON trigger format is shared (route_parser.parse_scenario_file).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

TRIGGER_RADIUS = 12.0

# scenario-type -> behavior key (NUMBER_CLASS_TRANSLATION,
# route_scenario.py:55-66)
SCENARIO_BEHAVIORS = {
    "Scenario1": "control_loss",
    "Scenario2": "follow_leading_vehicle",
    "Scenario3": "dynamic_object_crossing",
    "Scenario4": "vehicle_turning_route",
    "Scenario5": "other_leading_vehicle",
    "Scenario6": "maneuver_opposite_direction",
    "Scenario7": "signal_junction_crossing",
    "Scenario8": "signal_junction_crossing",
    "Scenario9": "signal_junction_crossing",
    "Scenario10": "no_signal_junction_crossing",
}


@dataclasses.dataclass
class ScenarioTrigger:
    """Fires when the ego reaches `pos` (distance trigger) or at sim tick
    `at_tick` (time trigger, OpenSCENARIO SimulationTimeCondition). `builder`
    overrides the registry lookup with a custom behavior factory."""

    kind: str
    pos: Optional[np.ndarray] = None
    fired: bool = False
    at_tick: Optional[int] = None
    builder: Optional[Any] = None
    radius: float = TRIGGER_RADIUS   # per-trigger distance tolerance


class ScenarioBehavior:
    """Active behavior; `tick(env)` returns False when finished."""

    def tick(self, env) -> bool:  # pragma: no cover
        raise NotImplementedError


class ControlLossBehavior(ScenarioBehavior):
    """Scenario1: inject steering noise pulses (control_loss.py)."""

    def __init__(self, rng: np.random.RandomState, duration: int = 25):
        self._rng = rng
        self._remaining = duration

    def tick(self, env) -> bool:
        env._control_noise = float(self._rng.uniform(-0.25, 0.25))
        self._remaining -= 1
        if self._remaining <= 0:
            env._control_noise = 0.0
            return False
        return True


class LeadingVehicleBehavior(ScenarioBehavior):
    """Scenario2/5: slow vehicle ahead following the route."""

    def __init__(self, env, speed: float = 3.0, gap: float = 15.0):
        route = env._route_xy
        # place the leader `gap` meters ahead of the ego along the route
        d = np.hypot(route[:, 0] - env._pos[0], route[:, 1] - env._pos[1])
        i0 = int(np.argmin(d))
        idx = min(i0 + int(gap), len(route) - 1)
        self._ob = env.spawn_scenario_actor("vehicle", route[idx],
                                            speed=speed)
        self._ob.managed = True
        self._route = route
        self._i = idx

    def tick(self, env) -> bool:
        # advance along the route at the behavior speed
        if self._i >= len(self._route) - 1:
            return False
        step = self._ob.speed * env.dt
        nxt = self._route[min(self._i + 1, len(self._route) - 1)]
        d = nxt - self._ob.pos
        dist = float(np.hypot(*d))
        if dist < step:
            self._i += 1
        else:
            self._ob.pos = self._ob.pos + d / max(dist, 1e-6) * step
        return True


class CrossingBehavior(ScenarioBehavior):
    """Scenario3/4: object crosses the route ahead of the ego
    (object_crash_vehicle.py DynamicObjectCrossing)."""

    def __init__(self, env, kind: str = "walker", ahead: float = 12.0,
                 lateral: float = 8.0, speed: float = 1.6):
        yaw = math.radians(env._yaw)
        fwd = np.array([math.cos(yaw), math.sin(yaw)])
        left = np.array([-fwd[1], fwd[0]])
        start = env._pos + fwd * ahead + left * lateral
        heading = math.atan2(-left[1], -left[0])
        self._ob = env.spawn_scenario_actor(kind, start, heading=heading,
                                            speed=speed)
        self._ob.managed = True
        self._travel = 2 * lateral

    def tick(self, env) -> bool:
        step = self._ob.speed * env.dt
        self._ob.pos = self._ob.pos + step * np.array(
            [math.cos(self._ob.heading), math.sin(self._ob.heading)])
        self._travel -= step
        return self._travel > 0


class OppositeVehicleBehavior(ScenarioBehavior):
    """Scenario6/7-10: vehicle approaching against the ego's direction."""

    def __init__(self, env, ahead: float = 30.0, speed: float = 6.0,
                 lateral: float = 1.5):
        yaw = math.radians(env._yaw)
        fwd = np.array([math.cos(yaw), math.sin(yaw)])
        left = np.array([-fwd[1], fwd[0]])
        start = env._pos + fwd * ahead + left * lateral
        self._ob = env.spawn_scenario_actor(
            "vehicle", start, heading=math.atan2(-fwd[1], -fwd[0]),
            speed=speed)
        self._ob.managed = True
        self._life = int(2 * ahead / max(speed * env.dt, 1e-6))

    def tick(self, env) -> bool:
        step = self._ob.speed * env.dt
        self._ob.pos = self._ob.pos + step * np.array(
            [math.cos(self._ob.heading), math.sin(self._ob.heading)])
        self._life -= 1
        return self._life > 0


def _advance(ob, dt: float) -> None:
    ob.pos = ob.pos + ob.speed * dt * np.array(
        [math.cos(ob.heading), math.sin(ob.heading)])


class OwnedActorBehavior(ScenarioBehavior):
    """Base for atomic behaviors that integrate a shared actor handle.

    Last writer wins: taking ownership marks the actor managed and records
    this behavior as its owner; a behavior that has lost ownership (another
    behavior took the actor over, e.g. a storyboard SpeedAction retargeting
    an init-speed entity) finishes on its next tick instead of
    double-advancing the actor.
    """

    def _own(self, ob) -> None:
        self._ob = ob
        ob.managed = True
        ob._owner = self

    def _owned(self) -> bool:
        return getattr(self._ob, "_owner", self) is self


class IdleBehavior(ScenarioBehavior):
    """Atomic Idle (atomic_behaviors.py): hold for N ticks, then finish."""

    def __init__(self, duration: int = 10):
        self._remaining = duration

    def tick(self, env) -> bool:
        self._remaining -= 1
        return self._remaining > 0


class KeepVelocityBehavior(OwnedActorBehavior):
    """Atomic KeepVelocity: drive an actor at a constant speed along its
    heading for a distance (or until the env episode ends)."""

    def __init__(self, ob, speed: float, distance: float = 50.0):
        self._own(ob)
        self._ob.speed = speed
        self._travel = distance

    def tick(self, env) -> bool:
        if not self._owned():
            return False
        _advance(self._ob, env.dt)
        self._travel -= self._ob.speed * env.dt
        return self._travel > 0


class LaneChangeBehavior(OwnedActorBehavior):
    """Atomic LaneChange: lateral shift of `offset` meters while holding
    forward speed (constant-rate blend over `duration` ticks)."""

    def __init__(self, ob, offset: float = 3.5, duration: int = 20):
        self._own(ob)
        self._rate = offset / max(duration, 1)
        self._remaining = duration
        # lateral direction: left of the actor's heading
        self._left = np.array([-math.sin(ob.heading), math.cos(ob.heading)])

    def tick(self, env) -> bool:
        if not self._owned():
            return False
        _advance(self._ob, env.dt)
        self._ob.pos = self._ob.pos + self._left * self._rate
        self._remaining -= 1
        return self._remaining > 0


class AccelerateToCatchUpBehavior(OwnedActorBehavior):
    """Atomic AccelerateToCatchUp: ramp the actor's speed by `throttle_inc`
    per tick until it is `trigger_gap` meters past the ego, then finish."""

    def __init__(self, ob, max_speed: float = 12.0,
                 throttle_inc: float = 0.5, trigger_gap: float = 8.0):
        self._own(ob)
        self._max = max_speed
        self._inc = throttle_inc
        self._gap = trigger_gap

    def tick(self, env) -> bool:
        if not self._owned():
            return False
        self._ob.speed = min(self._max, self._ob.speed + self._inc)
        _advance(self._ob, env.dt)
        fwd = np.array([math.cos(math.radians(env._yaw)),
                        math.sin(math.radians(env._yaw))])
        ahead = float(np.dot(self._ob.pos - env._pos, fwd))
        return ahead < self._gap


class SyncArrivalBehavior(OwnedActorBehavior):
    """Atomic SyncArrival: continuously re-solve the actor's speed so it
    reaches `target` at the same time the ego does (the junction-crossing
    conflict generator)."""

    def __init__(self, ob, target: np.ndarray, max_speed: float = 15.0):
        self._own(ob)
        self._target = np.asarray(target, float)
        self._max = max_speed
        d = self._target - ob.pos
        self._ob.heading = math.atan2(d[1], d[0])

    def tick(self, env) -> bool:
        if not self._owned():
            return False
        d_actor = float(np.hypot(*(self._target - self._ob.pos)))
        if d_actor < 1.0:
            return False
        d_ego = float(np.hypot(*(self._target - env._pos)))
        ego_speed = max(float(getattr(env, "_speed", 1.0)), 0.5)
        eta_ego = d_ego / ego_speed
        self._ob.speed = float(np.clip(d_actor / max(eta_ego, env.dt),
                                       0.0, self._max))
        _advance(self._ob, env.dt)
        return True


_BEHAVIOR_BUILDERS = {
    "control_loss": lambda env, rng: ControlLossBehavior(rng),
    "follow_leading_vehicle": lambda env, rng: LeadingVehicleBehavior(env),
    "other_leading_vehicle": lambda env, rng: LeadingVehicleBehavior(
        env, speed=5.0, gap=25.0),
    "dynamic_object_crossing": lambda env, rng: CrossingBehavior(env),
    "vehicle_turning_route": lambda env, rng: CrossingBehavior(
        env, kind="vehicle", speed=3.0),
    "maneuver_opposite_direction": lambda env, rng: OppositeVehicleBehavior(
        env),
    "signal_junction_crossing": lambda env, rng: OppositeVehicleBehavior(
        env, ahead=25.0),
    "no_signal_junction_crossing": lambda env, rng: OppositeVehicleBehavior(
        env, ahead=20.0, speed=7.0),
}


class ScenarioManager:
    """Holds triggers for one episode; fires behaviors as the ego arrives
    (the ScenarioTriggerer role, route_scenario.py:515-560)."""

    def __init__(self, triggers: Sequence[ScenarioTrigger],
                 rng: Optional[np.random.RandomState] = None):
        self.triggers = list(triggers)
        self.active: List[ScenarioBehavior] = []
        self._rng = rng or np.random.RandomState()

    @classmethod
    def from_annotations(cls, annotations: Sequence[Dict[str, Any]],
                         route_xy: np.ndarray, max_dist: float = 15.0,
                         rng: Optional[np.random.RandomState] = None,
                         sample: bool = False,
                         no_repeat: bool = False) -> "ScenarioManager":
        """Match scenario JSON trigger transforms to route waypoints
        (scan_route_for_scenarios role, route_scenario.py:235-243).

        `sample=True` keeps ONE candidate per trigger location, chosen at
        random (the `_scenario_sampling` role, route_scenario.py:315-366).
        `no_repeat=True` additionally instantiates each scenario kind at
        most once per episode (the no_repeat_route_scenario.py variant,
        which avoids spawning the same scenario class repeatedly).
        """
        rng = rng or np.random.RandomState()
        on_route = []
        for ann in annotations:
            kind = SCENARIO_BEHAVIORS.get(ann.get("type", ""))
            if kind is None:
                continue
            pos = np.array([ann["x"], ann["y"]])
            d = np.hypot(route_xy[:, 0] - pos[0], route_xy[:, 1] - pos[1])
            if d.min() <= max_dist:
                on_route.append((kind, pos))
        if sample:
            # cluster candidates that share a trigger location; keep one
            groups: List[List[tuple]] = []
            for kind, pos in on_route:
                for g in groups:
                    if float(np.hypot(*(g[0][1] - pos))) < 2.0:
                        g.append((kind, pos))
                        break
                else:
                    groups.append([(kind, pos)])
            on_route = [g[rng.randint(len(g))] for g in groups]
        triggers = []
        used_kinds = set()
        for kind, pos in on_route:
            if no_repeat and kind in used_kinds:
                continue
            used_kinds.add(kind)
            triggers.append(ScenarioTrigger(kind, pos))
        return cls(triggers, rng)

    def tick(self, env) -> None:
        self._ticks = getattr(self, "_ticks", 0) + 1
        for trig in self.triggers:
            if trig.fired:
                continue
            hit = (trig.at_tick is not None and self._ticks >= trig.at_tick) \
                or (trig.pos is not None and float(
                    np.hypot(*(trig.pos - env._pos))) < trig.radius)
            if hit:
                trig.fired = True
                builder = trig.builder or _BEHAVIOR_BUILDERS[trig.kind]
                self.active.append(builder(env, self._rng))
        self.active = [b for b in self.active if b.tick(env)]
