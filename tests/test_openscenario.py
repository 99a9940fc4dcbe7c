"""Minimal OpenSCENARIO (.xosc) reader -> behavior-primitive mapping."""
import numpy as np

from cadre_tpu.envs.openscenario import build_manager, load_openscenario

XOSC = """<?xml version="1.0"?>
<OpenSCENARIO>
  <Entities>
    <ScenarioObject name="hero"><Vehicle name="ego"/></ScenarioObject>
    <ScenarioObject name="adversary"><Vehicle name="car"/></ScenarioObject>
    <ScenarioObject name="crosser"><Pedestrian name="ped"/></ScenarioObject>
  </Entities>
  <Storyboard>
    <Init>
      <Actions>
        <Private entityRef="adversary">
          <PrivateAction><TeleportAction><Position>
            <WorldPosition x="20" y="0" z="0" h="0"/>
          </Position></TeleportAction></PrivateAction>
          <PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionTarget><AbsoluteTargetSpeed value="2.0"/></SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction>
        </Private>
        <Private entityRef="crosser">
          <PrivateAction><TeleportAction><Position>
            <WorldPosition x="30" y="5" z="0" h="-1.5708"/>
          </Position></TeleportAction></PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="mg">
        <Actors><EntityRef entityRef="adversary"/></Actors>
        <Maneuver name="m"><Event name="speed_up" priority="overwrite">
          <Action name="go"><PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionTarget><AbsoluteTargetSpeed value="8.0"/></SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup><Condition name="t">
            <ByValueCondition>
              <SimulationTimeCondition value="0.5" rule="greaterThan"/>
            </ByValueCondition>
          </Condition></ConditionGroup></StartTrigger>
        </Event></Maneuver>
      </ManeuverGroup>
      <ManeuverGroup name="mg2">
        <Actors><EntityRef entityRef="adversary"/></Actors>
        <Maneuver name="m2"><Event name="swerve" priority="parallel">
          <Action name="lane"><PrivateAction><LateralAction><LaneChangeAction>
            <LaneChangeTarget><RelativeTargetLane entityRef="adversary" value="1"/></LaneChangeTarget>
          </LaneChangeAction></LateralAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup><Condition name="p">
            <ByEntityCondition>
              <TriggeringEntities rule="any"><EntityRef entityRef="hero"/></TriggeringEntities>
              <EntityCondition><ReachPositionCondition tolerance="2">
                <Position><WorldPosition x="5" y="0"/></Position>
              </ReachPositionCondition></EntityCondition>
            </ByEntityCondition>
          </Condition></ConditionGroup></StartTrigger>
        </Event></Maneuver>
      </ManeuverGroup>
    </Act></Story>
  </Storyboard>
</OpenSCENARIO>
"""


def test_load_openscenario(tmp_path):
    path = tmp_path / "scenario.xosc"
    path.write_text(XOSC)
    cfg = load_openscenario(str(path))
    assert set(cfg.entities) == {"hero", "adversary", "crosser"}
    adv = cfg.entities["adversary"]
    np.testing.assert_allclose(adv.pos, [20.0, 0.0])
    assert adv.speed == 2.0
    assert cfg.entities["crosser"].kind == "walker"
    assert len(cfg.events) == 2
    speed_ev = next(e for e in cfg.events if e.action == "speed")
    assert speed_ev.value == 8.0 and speed_ev.at_time == 0.5
    lane_ev = next(e for e in cfg.events if e.action == "lane_change")
    np.testing.assert_allclose(lane_ev.at_pos, [5.0, 0.0])


def test_build_manager_fires_events(tmp_path):
    path = tmp_path / "scenario.xosc"
    path.write_text(XOSC)
    cfg = load_openscenario(str(path))

    class _Env:
        dt = 0.1
        _pos = np.zeros(2)
        _yaw = 0.0
        _obstacles = []

    env = _Env()
    mgr = build_manager(cfg, env)
    assert len(env._obstacles) == 2         # adversary + crosser spawned
    adv = env._obstacles[0]
    assert adv.speed == 2.0

    for _ in range(4):                      # 0.4 s: time trigger not yet
        mgr.tick(env)
    assert adv.speed == 2.0
    # Init SpeedAction applies at scenario start: the adversary has been
    # driving at 2 m/s since tick 1 (0.4 s -> +0.8 m), exactly once per tick
    np.testing.assert_allclose(float(adv.pos[0]), 20.0 + 2.0 * 4 * env.dt)
    mgr.tick(env)                           # 0.5 s: SpeedAction fires
    assert adv.speed == 8.0
    x_before = float(adv.pos[0])
    mgr.tick(env)                           # single-advance at the new speed
    np.testing.assert_allclose(float(adv.pos[0]) - x_before, 8.0 * env.dt)

    # the reach-position trigger declares tolerance="2": the ego 5 m away
    # must NOT fire it ...
    for _ in range(5):
        mgr.tick(env)
    np.testing.assert_allclose(float(adv.pos[1]), 0.0, atol=1e-9)
    # ... but within 2 m it does; run the lane change to completion
    env._pos = np.array([4.5, 0.0])
    for _ in range(30):
        mgr.tick(env)
    np.testing.assert_allclose(float(adv.pos[1]), 3.5, atol=1e-6)


XOSC_EXT = """<?xml version="1.0"?>
<OpenSCENARIO>
  <ParameterDeclarations>
    <ParameterDeclaration name="advSpeed" parameterType="double" value="3.0"/>
    <ParameterDeclaration name="startX" parameterType="double" value="25"/>
  </ParameterDeclarations>
  <Entities>
    <ScenarioObject name="hero"><Vehicle name="ego"/></ScenarioObject>
    <ScenarioObject name="adversary"><Vehicle name="car"/></ScenarioObject>
  </Entities>
  <Storyboard>
    <Init><Actions>
      <Private entityRef="adversary">
        <PrivateAction><TeleportAction><Position>
          <WorldPosition x="$startX" y="0" z="0" h="0"/>
        </Position></TeleportAction></PrivateAction>
        <PrivateAction><LongitudinalAction><SpeedAction>
          <SpeedActionTarget><AbsoluteTargetSpeed value="$advSpeed"/></SpeedActionTarget>
        </SpeedAction></LongitudinalAction></PrivateAction>
      </Private>
    </Actions></Init>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="mg">
        <Actors><EntityRef entityRef="adversary"/></Actors>
        <Maneuver name="m">
          <Event name="brake_when_ego_fast" priority="overwrite">
            <Action name="stopnow"><PrivateAction><LongitudinalAction><SpeedAction>
              <SpeedActionTarget><AbsoluteTargetSpeed value="0.0"/></SpeedActionTarget>
            </SpeedAction></LongitudinalAction></PrivateAction></Action>
            <StartTrigger><ConditionGroup><Condition name="fast">
              <ByEntityCondition>
                <TriggeringEntities rule="any"><EntityRef entityRef="hero"/></TriggeringEntities>
                <EntityCondition><SpeedCondition value="4.0" rule="greaterThan"/></EntityCondition>
              </ByEntityCondition>
            </Condition></ConditionGroup></StartTrigger>
          </Event>
          <Event name="teleport_after" priority="overwrite">
            <Action name="jump"><PrivateAction><TeleportAction><Position>
              <WorldPosition x="100" y="7" z="0" h="1.5708"/>
            </Position></TeleportAction></PrivateAction></Action>
            <StartTrigger><ConditionGroup><Condition name="chain">
              <ByValueCondition>
                <StoryboardElementStateCondition storyboardElementType="event"
                  storyboardElementRef="brake_when_ego_fast" state="completeState"/>
              </ByValueCondition>
            </Condition></ConditionGroup></StartTrigger>
          </Event>
        </Maneuver>
      </ManeuverGroup>
    </Act></Story>
  </Storyboard>
</OpenSCENARIO>
"""


def test_parameters_conditions_and_element_state_chaining(tmp_path):
    """$parameter substitution, entity SpeedCondition gating, and
    StoryboardElementStateCondition chaining through blackboard flags."""
    path = tmp_path / "ext.xosc"
    path.write_text(XOSC_EXT)
    cfg = load_openscenario(str(path))
    adv = cfg.entities["adversary"]
    np.testing.assert_allclose(adv.pos, [25.0, 0.0])   # $startX
    assert adv.speed == 3.0                             # $advSpeed
    specs = {e.name: e for e in cfg.events}
    assert specs["brake_when_ego_fast"].cond["type"] == "speed"
    assert specs["teleport_after"].cond["type"] == "element_state"

    class _Env:
        dt = 0.1
        _pos = np.zeros(2)
        _yaw = 0.0
        _speed = 0.0
        _obstacles = []

    env = _Env()
    mgr = build_manager(cfg, env)
    ob = env._obstacles[0]
    for _ in range(5):
        mgr.tick(env)
    assert ob.speed == 3.0                  # ego slow: nothing fired
    env._speed = 5.0                        # SpeedCondition satisfied
    for _ in range(3):
        mgr.tick(env)
    assert ob.speed == 0.0                  # brake event ran
    assert env.blackboard["xosc:brake_when_ego_fast:done"]
    for _ in range(3):
        mgr.tick(env)                       # chained teleport fires next
    np.testing.assert_allclose(ob.pos, [100.0, 7.0])
    assert env.blackboard["xosc:teleport_after:done"]


def test_stop_trigger_aborts_event(tmp_path):
    """Event StopTrigger: the lane change aborts when the stop condition
    (ego standstill already satisfied) fires first."""
    xosc = """<?xml version="1.0"?>
<OpenSCENARIO>
  <Entities>
    <ScenarioObject name="hero"><Vehicle name="ego"/></ScenarioObject>
    <ScenarioObject name="adversary"><Vehicle name="car"/></ScenarioObject>
  </Entities>
  <Storyboard>
    <Init><Actions>
      <Private entityRef="adversary">
        <PrivateAction><TeleportAction><Position>
          <WorldPosition x="10" y="0" z="0" h="0"/>
        </Position></TeleportAction></PrivateAction>
      </Private>
    </Actions></Init>
    <Story name="s"><Act name="a"><ManeuverGroup name="mg">
      <Actors><EntityRef entityRef="adversary"/></Actors>
      <Maneuver name="m"><Event name="swerve" priority="overwrite">
        <Action name="lane"><PrivateAction><LateralAction><LaneChangeAction>
          <LaneChangeTarget><RelativeTargetLane entityRef="adversary" value="1"/></LaneChangeTarget>
        </LaneChangeAction></LateralAction></PrivateAction></Action>
        <StartTrigger><ConditionGroup><Condition name="t">
          <ByValueCondition><SimulationTimeCondition value="0.1" rule="greaterThan"/></ByValueCondition>
        </Condition></ConditionGroup></StartTrigger>
        <StopTrigger><ConditionGroup><Condition name="halt">
          <ByEntityCondition>
            <TriggeringEntities rule="any"><EntityRef entityRef="adversary"/></TriggeringEntities>
            <EntityCondition><StandStillCondition duration="0.2"/></EntityCondition>
          </ByEntityCondition>
        </Condition></ConditionGroup></StopTrigger>
      </Event></Maneuver>
    </ManeuverGroup></Act></Story>
  </Storyboard>
</OpenSCENARIO>
"""
    path = tmp_path / "stop.xosc"
    path.write_text(xosc)
    cfg = load_openscenario(str(path))
    ev = cfg.events[0]
    assert ev.stop is not None and ev.stop["type"] == "standstill"

    class _Env:
        dt = 0.1
        _pos = np.zeros(2)
        _yaw = 0.0
        _speed = 0.0
        _obstacles = []

    env = _Env()
    mgr = build_manager(cfg, env)
    ob = env._obstacles[0]
    # adversary is stationary, so the standstill stop condition fires
    # within 2 ticks of the event starting — lane change never completes
    for _ in range(30):
        mgr.tick(env)
    assert abs(float(ob.pos[1])) < 3.0      # aborted well short of 3.5


def test_condition_long_tail_parsing(tmp_path):
    """TimeHeadway / RelativeSpeed / Acceleration / Collision / Offroad /
    TrafficSignal / TimeOfDay / UserDefinedValue condition specs
    (openscenario_parser.py convert_condition_to_atomic:590-894)."""
    xosc = """<?xml version="1.0"?>
<OpenSCENARIO>
  <Entities>
    <ScenarioObject name="hero"><Vehicle name="ego"/></ScenarioObject>
    <ScenarioObject name="npc"><Vehicle name="car"/></ScenarioObject>
  </Entities>
  <Storyboard>
    <Init><Actions>
      <Private entityRef="npc">
        <PrivateAction><TeleportAction><Position>
          <WorldPosition x="10" y="0" h="0"/>
        </Position></TeleportAction></PrivateAction>
      </Private>
    </Actions></Init>
    <Story name="s"><Act name="a"><ManeuverGroup name="mg">
      <Actors><EntityRef entityRef="npc"/></Actors>
      <Maneuver name="m">
        <Event name="e_headway" priority="overwrite">
          <Action name="a1"><PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionDynamics dynamicsShape="step"/>
            <SpeedActionTarget><AbsoluteTargetSpeed value="3"/></SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup><Condition name="c1">
            <ByEntityCondition>
              <TriggeringEntities rule="any"><EntityRef entityRef="npc"/></TriggeringEntities>
              <EntityCondition><TimeHeadwayCondition entityRef="hero" value="2.0" rule="lessThan"/></EntityCondition>
            </ByEntityCondition>
          </Condition></ConditionGroup></StartTrigger>
        </Event>
        <Event name="e_relspeed" priority="overwrite">
          <Action name="a2"><PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionDynamics dynamicsShape="step"/>
            <SpeedActionTarget><AbsoluteTargetSpeed value="4"/></SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup><Condition name="c2">
            <ByEntityCondition>
              <TriggeringEntities rule="any"><EntityRef entityRef="npc"/></TriggeringEntities>
              <EntityCondition><RelativeSpeedCondition entityRef="hero" value="1.0" rule="greaterThan"/></EntityCondition>
            </ByEntityCondition>
          </Condition></ConditionGroup></StartTrigger>
        </Event>
        <Event name="e_accel" priority="overwrite">
          <Action name="a3"><PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionDynamics dynamicsShape="step"/>
            <SpeedActionTarget><AbsoluteTargetSpeed value="5"/></SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup><Condition name="c3">
            <ByEntityCondition>
              <TriggeringEntities rule="any"><EntityRef entityRef="npc"/></TriggeringEntities>
              <EntityCondition><AccelerationCondition value="3.0" rule="greaterThan"/></EntityCondition>
            </ByEntityCondition>
          </Condition></ConditionGroup></StartTrigger>
        </Event>
        <Event name="e_coll" priority="overwrite">
          <Action name="a4"><PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionDynamics dynamicsShape="step"/>
            <SpeedActionTarget><AbsoluteTargetSpeed value="0"/></SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup><Condition name="c4">
            <ByEntityCondition>
              <TriggeringEntities rule="any"><EntityRef entityRef="npc"/></TriggeringEntities>
              <EntityCondition><CollisionCondition><EntityRef entityRef="hero"/></CollisionCondition></EntityCondition>
            </ByEntityCondition>
          </Condition></ConditionGroup></StartTrigger>
        </Event>
        <Event name="e_offroad" priority="overwrite">
          <Action name="a5"><PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionDynamics dynamicsShape="step"/>
            <SpeedActionTarget><AbsoluteTargetSpeed value="1"/></SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup><Condition name="c5">
            <ByEntityCondition>
              <TriggeringEntities rule="any"><EntityRef entityRef="npc"/></TriggeringEntities>
              <EntityCondition><OffroadCondition duration="1"/></EntityCondition>
            </ByEntityCondition>
          </Condition></ConditionGroup></StartTrigger>
        </Event>
        <Event name="e_signal" priority="overwrite">
          <Action name="a6"><PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionDynamics dynamicsShape="step"/>
            <SpeedActionTarget><AbsoluteTargetSpeed value="2"/></SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup><Condition name="c6">
            <ByValueCondition><TrafficSignalCondition name="id=0" state="green"/></ByValueCondition>
          </Condition></ConditionGroup></StartTrigger>
        </Event>
        <Event name="e_tod" priority="overwrite">
          <Action name="a7"><PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionDynamics dynamicsShape="step"/>
            <SpeedActionTarget><AbsoluteTargetSpeed value="2"/></SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup><Condition name="c7">
            <ByValueCondition><TimeOfDayCondition dateTime="2020-01-01T00:00:05" rule="greaterThan"/></ByValueCondition>
          </Condition></ConditionGroup></StartTrigger>
        </Event>
        <Event name="e_user" priority="overwrite">
          <Action name="a8"><PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionDynamics dynamicsShape="step"/>
            <SpeedActionTarget><AbsoluteTargetSpeed value="2"/></SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup><Condition name="c8">
            <ByValueCondition><UserDefinedValueCondition name="go" value="true" rule="equalTo"/></ByValueCondition>
          </Condition></ConditionGroup></StartTrigger>
        </Event>
      </Maneuver>
    </ManeuverGroup></Act></Story>
  </Storyboard>
</OpenSCENARIO>
"""
    path = tmp_path / "conds.xosc"
    path.write_text(xosc)
    cfg = load_openscenario(str(path))
    specs = {e.name: e.cond for e in cfg.events}
    assert specs["e_headway"] == dict(type="headway", entity="npc",
                                      other="hero", value=2.0)
    assert specs["e_relspeed"]["type"] == "relative_speed"
    assert specs["e_accel"] == dict(type="acceleration", entity="npc",
                                    value=3.0)
    assert specs["e_coll"] == dict(type="collision", entity="npc",
                                   other="hero")
    assert specs["e_offroad"] == dict(type="offroad", entity="npc")
    assert specs["e_signal"] == dict(type="traffic_signal", name="id=0",
                                     state="green")
    assert specs["e_tod"] == dict(type="time_of_day", value=5.0)
    assert specs["e_user"] == dict(type="user_value", name="go",
                                   value="true")


def test_headway_and_collision_conditions_fire(tmp_path):
    from cadre_tpu.envs.scenarios import CollisionCondition, TimeHeadway

    class _Ob:
        def __init__(self, pos, speed=0.0):
            self.pos = np.asarray(pos, float)
            self.speed = speed
            self.kind = "vehicle"
            self.radius = 1.2

    class _Env:
        dt = 0.1
        _pos = np.zeros(2)
        _speed = 5.0
        _obstacles = []

    env = _Env()
    far = _Ob([100.0, 0.0])
    near = _Ob([5.0, 0.0])
    # ego at 5 m/s: headway to far = 20 s, to near = 1 s
    assert not TimeHeadway("ego", far, 2.0)(env)
    assert TimeHeadway("ego", near, 2.0)(env)
    # collision: circles (1.2 + 1.2) touch only for the 2 m gap
    assert not CollisionCondition("ego", far)(env)
    assert CollisionCondition("ego", _Ob([2.0, 0.0]))(env)
    # any-collision form scans the obstacle list
    env._obstacles = [far, near]
    assert not CollisionCondition(far)(env)
    env._obstacles = [far, _Ob([99.0, 0.0])]
    assert CollisionCondition(far)(env)


def test_routing_actions_drive_actor(tmp_path):
    """AssignRouteAction hands a waypoint plan to the actor's controller;
    AcquirePositionAction plans to a single target
    (openscenario_parser.py:1037-1053)."""
    xosc = """<?xml version="1.0"?>
<OpenSCENARIO>
  <Entities>
    <ScenarioObject name="hero"><Vehicle name="ego"/></ScenarioObject>
    <ScenarioObject name="npc"><Vehicle name="car"/></ScenarioObject>
  </Entities>
  <Storyboard>
    <Init><Actions>
      <Private entityRef="npc">
        <PrivateAction><TeleportAction><Position>
          <WorldPosition x="0" y="5" h="0"/>
        </Position></TeleportAction></PrivateAction>
        <PrivateAction><LongitudinalAction><SpeedAction>
          <SpeedActionDynamics dynamicsShape="step"/>
          <SpeedActionTarget><AbsoluteTargetSpeed value="4"/></SpeedActionTarget>
        </SpeedAction></LongitudinalAction></PrivateAction>
      </Private>
    </Actions></Init>
    <Story name="s"><Act name="a"><ManeuverGroup name="mg">
      <Actors><EntityRef entityRef="npc"/></Actors>
      <Maneuver name="m">
        <Event name="route" priority="overwrite">
          <Action name="r"><PrivateAction><RoutingAction>
            <AssignRouteAction><Route name="rt">
              <Waypoint routeStrategy="shortest"><Position>
                <WorldPosition x="10" y="5"/>
              </Position></Waypoint>
              <Waypoint routeStrategy="shortest"><Position>
                <WorldPosition x="10" y="15"/>
              </Position></Waypoint>
            </Route></AssignRouteAction>
          </RoutingAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup><Condition name="t">
            <ByValueCondition><SimulationTimeCondition value="0.0" rule="greaterThan"/></ByValueCondition>
          </Condition></ConditionGroup></StartTrigger>
        </Event>
      </Maneuver>
    </ManeuverGroup></Act></Story>
  </Storyboard>
</OpenSCENARIO>
"""
    path = tmp_path / "route.xosc"
    path.write_text(xosc)
    cfg = load_openscenario(str(path))
    ev = next(e for e in cfg.events if e.action == "route")
    assert len(ev.extra["waypoints"]) == 2

    class _Env:
        dt = 0.1
        _pos = np.zeros(2)
        _yaw = 0.0
        _speed = 0.0
        _obstacles = []

    env = _Env()
    mgr = build_manager(cfg, env)
    npc = env._obstacles[0]
    # UpdateAllActorControlsBehavior (installed by build_manager) advances
    # the retargeted controller — no owning behavior needed
    for _ in range(400):
        mgr.tick(env)
    # follows the L-shaped plan: ends near (10, 15), having moved in +x
    # then +y
    assert float(npc.pos[0]) > 8.0
    assert float(npc.pos[1]) > 10.0


def test_relative_positions_and_act_trigger(tmp_path):
    """RelativeWorldPosition / RelativeObjectPosition teleports resolve
    against entity init poses; an Act-level StartTrigger gates every event
    inside the act (openscenario_parser.py:434-509 + Act handling)."""
    xosc = """<?xml version="1.0"?>
<OpenSCENARIO>
  <Entities>
    <ScenarioObject name="hero"><Vehicle name="ego"/></ScenarioObject>
    <ScenarioObject name="npc"><Vehicle name="car"/></ScenarioObject>
  </Entities>
  <Storyboard>
    <Init><Actions>
      <Private entityRef="npc">
        <PrivateAction><TeleportAction><Position>
          <WorldPosition x="10" y="0" h="1.5707963"/>
        </Position></TeleportAction></PrivateAction>
      </Private>
    </Actions></Init>
    <Story name="s"><Act name="a">
      <ManeuverGroup name="mg">
        <Actors><EntityRef entityRef="npc"/></Actors>
        <Maneuver name="m">
          <Event name="tele_rel" priority="overwrite">
            <Action name="t1"><PrivateAction><TeleportAction><Position>
              <RelativeObjectPosition entityRef="npc" dx="5" dy="0"/>
            </Position></TeleportAction></PrivateAction></Action>
            <StartTrigger><ConditionGroup><Condition name="t">
              <ByValueCondition><SimulationTimeCondition value="0.0" rule="greaterThan"/></ByValueCondition>
            </Condition></ConditionGroup></StartTrigger>
          </Event>
        </Maneuver>
      </ManeuverGroup>
      <StartTrigger><ConditionGroup><Condition name="actstart">
        <ByValueCondition><SimulationTimeCondition value="0.5" rule="greaterThan"/></ByValueCondition>
      </Condition></ConditionGroup></StartTrigger>
    </Act></Story>
  </Storyboard>
</OpenSCENARIO>
"""
    path = tmp_path / "rel.xosc"
    path.write_text(xosc)
    cfg = load_openscenario(str(path))
    ev = cfg.events[0]
    # npc heading +90deg: entity-frame dx=5 -> world +y
    assert np.allclose(ev.extra["pos"], [10.0, 5.0], atol=1e-4)
    assert ev.act_cond == dict(type="time", value=0.5)

    class _Env:
        dt = 0.1
        _pos = np.zeros(2)
        _yaw = 0.0
        _speed = 0.0
        _obstacles = []

    env = _Env()
    mgr = build_manager(cfg, env)
    npc = env._obstacles[0]
    # act gate (0.5 s = 5 ticks) holds the teleport back...
    for _ in range(3):
        mgr.tick(env)
    assert float(npc.pos[1]) < 1.0
    # ...then it fires
    for _ in range(10):
        mgr.tick(env)
    assert np.allclose(npc.pos, [10.0, 5.0], atol=1e-4)


def test_speed_action_dynamics_bounds(tmp_path):
    """SpeedActionDynamics dynamicsDimension distance/time bounds the speed
    hold (openscenario_parser.py:957-963)."""
    xosc = """<?xml version="1.0"?>
<OpenSCENARIO>
  <Entities>
    <ScenarioObject name="hero"><Vehicle name="ego"/></ScenarioObject>
    <ScenarioObject name="npc"><Vehicle name="car"/></ScenarioObject>
  </Entities>
  <Storyboard>
    <Init><Actions>
      <Private entityRef="npc">
        <PrivateAction><TeleportAction><Position>
          <WorldPosition x="0" y="0" h="0"/>
        </Position></TeleportAction></PrivateAction>
      </Private>
    </Actions></Init>
    <Story name="s"><Act name="a"><ManeuverGroup name="mg">
      <Actors><EntityRef entityRef="npc"/></Actors>
      <Maneuver name="m">
        <Event name="bounded" priority="overwrite">
          <Action name="sp"><PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionDynamics dynamicsShape="step" dynamicsDimension="distance" value="8"/>
            <SpeedActionTarget><AbsoluteTargetSpeed value="4"/></SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup><Condition name="t">
            <ByValueCondition><SimulationTimeCondition value="0.0" rule="greaterThan"/></ByValueCondition>
          </Condition></ConditionGroup></StartTrigger>
        </Event>
      </Maneuver>
    </ManeuverGroup></Act></Story>
  </Storyboard>
</OpenSCENARIO>
"""
    path = tmp_path / "dyn.xosc"
    path.write_text(xosc)
    cfg = load_openscenario(str(path))
    ev = cfg.events[0]
    assert ev.extra["distance"] == 8.0

    class _Env:
        dt = 0.1
        _pos = np.zeros(2)
        _yaw = 0.0
        _speed = 0.0
        _obstacles = []

    env = _Env()
    mgr = build_manager(cfg, env)
    npc = env._obstacles[0]
    for _ in range(60):
        mgr.tick(env)
    # drove exactly the 8 m bound (not 4 m/s * 6 s = 24 m)
    assert 7.0 <= float(npc.pos[0]) <= 9.5
