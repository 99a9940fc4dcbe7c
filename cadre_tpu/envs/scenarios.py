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
    kind: str
    pos: np.ndarray
    fired: bool = False


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
        from cadre_tpu.envs.sim_env import SimObstacle

        route = env._route_xy
        # place the leader `gap` meters ahead of the ego along the route
        d = np.hypot(route[:, 0] - env._pos[0], route[:, 1] - env._pos[1])
        i0 = int(np.argmin(d))
        idx = min(i0 + int(gap), len(route) - 1)
        self._ob = SimObstacle(pos=route[idx].astype(float).copy(),
                               radius=1.2, kind="vehicle", speed=speed)
        self._route = route
        self._i = idx
        env._obstacles.append(self._ob)

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
        from cadre_tpu.envs.sim_env import SimObstacle

        yaw = math.radians(env._yaw)
        fwd = np.array([math.cos(yaw), math.sin(yaw)])
        left = np.array([-fwd[1], fwd[0]])
        start = env._pos + fwd * ahead + left * lateral
        heading = math.atan2(-left[1], -left[0])
        self._ob = SimObstacle(pos=start, radius=0.4 if kind == "walker"
                               else 1.2, kind=kind, speed=speed,
                               heading=heading)
        self._travel = 2 * lateral
        env._obstacles.append(self._ob)

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
        from cadre_tpu.envs.sim_env import SimObstacle

        yaw = math.radians(env._yaw)
        fwd = np.array([math.cos(yaw), math.sin(yaw)])
        left = np.array([-fwd[1], fwd[0]])
        start = env._pos + fwd * ahead + left * lateral
        self._ob = SimObstacle(pos=start, radius=1.2, kind="vehicle",
                               speed=speed,
                               heading=math.atan2(-fwd[1], -fwd[0]))
        self._life = int(2 * ahead / max(speed * env.dt, 1e-6))
        env._obstacles.append(self._ob)

    def tick(self, env) -> bool:
        step = self._ob.speed * env.dt
        self._ob.pos = self._ob.pos + step * np.array(
            [math.cos(self._ob.heading), math.sin(self._ob.heading)])
        self._life -= 1
        return self._life > 0


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
        for trig in self.triggers:
            if not trig.fired and float(
                    np.hypot(*(trig.pos - env._pos))) < TRIGGER_RADIUS:
                trig.fired = True
                builder = _BEHAVIOR_BUILDERS[trig.kind]
                self.active.append(builder(env, self._rng))
        self.active = [b for b in self.active if b.tick(env)]
