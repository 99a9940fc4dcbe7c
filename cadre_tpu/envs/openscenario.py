"""Minimal OpenSCENARIO (.xosc) reader for the simulator.

The reference vendors a full OpenSCENARIO parser
(scenario_runner/srunner/tools/openscenario_parser.py, ~1,061 LoC) that
converts XOSC documents into CARLA py_trees behaviors; the CADRE training
path never uses it. This module provides the capability at the scale the
rest of this framework operates: the ASAM OpenSCENARIO 1.0 subset that maps
onto our tick-driven behavior primitives (envs/scenarios.py) —

  Entities/ScenarioObject ................ actor roster
  Init TeleportAction (WorldPosition) .... actor spawn pose
  Init/Event SpeedAction ................. KeepVelocityBehavior
  LateralAction/LaneChangeAction ......... LaneChangeBehavior
  StartTrigger SimulationTimeCondition ... time trigger (at_tick)
  StartTrigger ReachPositionCondition .... distance trigger (pos)

`load_openscenario(path)` -> OpenScenarioConfig;
`build_manager(cfg, env)` spawns the actors into a SimDrivingEnv-compatible
env and returns a ScenarioManager whose triggers fire the mapped behaviors.
"""
from __future__ import annotations

import dataclasses
import math
import xml.etree.ElementTree as ET
from typing import Any, Dict, List, Optional

import numpy as np

from cadre_tpu.envs.scenarios import (
    KeepVelocityBehavior,
    LaneChangeBehavior,
    ScenarioManager,
    ScenarioTrigger,
)


@dataclasses.dataclass
class OscEntity:
    name: str
    kind: str = "vehicle"          # 'vehicle' | 'walker'
    pos: Optional[np.ndarray] = None
    heading: float = 0.0
    speed: float = 0.0             # Init SpeedAction


@dataclasses.dataclass
class OscEvent:
    entity: str
    action: str                    # 'speed' | 'lane_change'
    value: float                   # target speed / lane offset (meters)
    at_time: Optional[float] = None      # SimulationTimeCondition (s)
    at_pos: Optional[np.ndarray] = None  # ReachPositionCondition
    tolerance: Optional[float] = None    # ReachPositionCondition tolerance (m)


@dataclasses.dataclass
class OpenScenarioConfig:
    entities: Dict[str, OscEntity]
    events: List[OscEvent]


def _world_position(node) -> tuple:
    wp = node.find(".//WorldPosition")
    if wp is None:
        return None, 0.0
    pos = np.array([float(wp.get("x", 0)), float(wp.get("y", 0))])
    return pos, float(wp.get("h", 0))


def _speed_target(node) -> Optional[float]:
    tgt = node.find(".//AbsoluteTargetSpeed")
    return float(tgt.get("value")) if tgt is not None else None


def load_openscenario(path: str) -> OpenScenarioConfig:
    root = ET.parse(path).getroot()

    entities: Dict[str, OscEntity] = {}
    for obj in root.iterfind(".//Entities/ScenarioObject"):
        name = obj.get("name")
        kind = "walker" if obj.find("Pedestrian") is not None else "vehicle"
        entities[name] = OscEntity(name=name, kind=kind)

    # Init: spawn poses + initial speeds
    for private in root.iterfind(".//Storyboard/Init/Actions/Private"):
        ent = entities.get(private.get("entityRef"))
        if ent is None:
            continue
        tele = private.find(".//TeleportAction")
        if tele is not None:
            ent.pos, ent.heading = _world_position(tele)
        speed = private.find(".//SpeedAction")
        if speed is not None:
            v = _speed_target(speed)
            if v is not None:
                ent.speed = v

    # Storyboard events
    events: List[OscEvent] = []
    for group in root.iterfind(".//ManeuverGroup"):
        actor_ref = group.find(".//Actors/EntityRef")
        default_entity = actor_ref.get("entityRef") if actor_ref is not None \
            else None
        for event in group.iterfind(".//Event"):
            at_time: Optional[float] = None
            at_pos: Optional[np.ndarray] = None
            tolerance: Optional[float] = None
            cond = event.find(".//StartTrigger//SimulationTimeCondition")
            if cond is not None:
                at_time = float(cond.get("value", 0))
            reach = event.find(".//StartTrigger//ReachPositionCondition")
            if reach is not None:
                at_pos, _ = _world_position(reach)
                tol = reach.get("tolerance")
                tolerance = float(tol) if tol is not None else None
            for action in event.iterfind("Action"):
                speed = action.find(".//SpeedAction")
                lane = action.find(".//LaneChangeAction")
                if speed is not None:
                    v = _speed_target(speed)
                    if v is not None:
                        events.append(OscEvent(default_entity, "speed", v,
                                               at_time, at_pos, tolerance))
                elif lane is not None:
                    tgt = lane.find(".//RelativeTargetLane")
                    lanes = int(tgt.get("value", 1)) if tgt is not None else 1
                    events.append(OscEvent(default_entity, "lane_change",
                                           3.5 * lanes, at_time, at_pos,
                                           tolerance))
    return OpenScenarioConfig(entities=entities, events=events)


def build_manager(cfg: OpenScenarioConfig, env,
                  dt: Optional[float] = None,
                  ego_name: str = "hero") -> ScenarioManager:
    """Spawn non-ego entities as sim obstacles and wire storyboard events as
    ScenarioManager triggers over the behavior primitives."""
    from cadre_tpu.envs.sim_env import SimObstacle

    dt = dt if dt is not None else env.dt
    actors: Dict[str, Any] = {}
    triggers: List[ScenarioTrigger] = []
    for name, ent in cfg.entities.items():
        if name == ego_name or ent.pos is None:
            continue
        spawn = getattr(env, "spawn_scenario_actor", None)
        if spawn is not None:
            ob = spawn(ent.kind, ent.pos, heading=ent.heading,
                       speed=ent.speed)
        else:
            ob = SimObstacle(pos=ent.pos.astype(float).copy(),
                             radius=0.4 if ent.kind == "walker" else 1.2,
                             kind=ent.kind, speed=ent.speed,
                             heading=ent.heading)
            env._obstacles.append(ob)
        actors[name] = ob
        if ent.speed > 0:
            # OpenSCENARIO Init SpeedAction applies at scenario start: the
            # entity drives at its init speed until a storyboard event
            # retargets it (the reference parser does the same).
            def init_builder(ob=ob, v=ent.speed):
                def build(env, rng):
                    return KeepVelocityBehavior(ob, speed=v,
                                                distance=math.inf)
                return build
            triggers.append(ScenarioTrigger(
                kind="xosc:init_speed", at_tick=1, builder=init_builder()))
    for ev in cfg.events:
        ob = actors.get(ev.entity)
        if ob is None:
            continue

        def make_builder(ob=ob, ev=ev):
            def build(env, rng):
                if ev.action == "speed":
                    return KeepVelocityBehavior(ob, speed=ev.value,
                                                distance=math.inf)
                return LaneChangeBehavior(ob, offset=ev.value)
            return build

        at_tick = None if ev.at_time is None else max(
            1, int(round(ev.at_time / dt)))
        from cadre_tpu.envs.scenarios import TRIGGER_RADIUS

        triggers.append(ScenarioTrigger(
            kind=f"xosc:{ev.action}", pos=ev.at_pos, at_tick=at_tick,
            builder=make_builder(),
            radius=ev.tolerance if ev.tolerance is not None
            else TRIGGER_RADIUS))
    return ScenarioManager(triggers)
