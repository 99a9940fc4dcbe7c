"""Actor-controller plugin layer (srunner actorcontrols/ equivalents)."""
import math

import numpy as np
import pytest

from cadre_tpu.envs.actor_controls import (
    ActorControl,
    ChangeActorTargetSpeedBehavior,
    ChangeActorWaypointsBehavior,
    ChangeActorWaypointsToReachPositionBehavior,
    ControlledActorBehavior,
    ExternalControl,
    NpcVehicleControl,
    PedestrianControl,
    SimpleVehicleControl,
    VehicleLongitudinalControl,
)
from cadre_tpu.envs.sim_env import SimObstacle


class _Env:
    dt = 0.1
    _obstacles = []
    _lights = []


def _ob(kind="vehicle", pos=(0.0, 0.0), heading=0.0, speed=0.0):
    return SimObstacle(pos=np.asarray(pos, float), kind=kind,
                       heading=heading, speed=speed)


def test_default_dispatch_by_actor_kind():
    assert isinstance(ActorControl(_ob("walker")).controller,
                      PedestrianControl)
    assert isinstance(ActorControl(_ob("vehicle")).controller,
                      NpcVehicleControl)
    assert isinstance(ActorControl(_ob("static")).controller,
                      ExternalControl)


def test_kind_validation():
    with pytest.raises(RuntimeError):
        PedestrianControl(_ob("vehicle"))
    with pytest.raises(RuntimeError):
        NpcVehicleControl(_ob("walker"))


def test_pedestrian_follows_waypoints_and_stops():
    env, ob = _Env(), _ob("walker")
    c = PedestrianControl(ob)
    c.update_target_speed(2.0)
    c.update_waypoints([[1.0, 0.0], [1.0, 1.0]])
    for _ in range(40):
        c.run_step(env)
        if c.check_reached_waypoint_goal():
            break
    assert c.check_reached_waypoint_goal()
    np.testing.assert_allclose(ob.pos, [1.0, 1.0], atol=0.3)
    c.run_step(env)
    assert ob.speed == 0.0


def test_npc_vehicle_yaw_rate_limited_and_brakes():
    env, ob = _Env(), _ob("vehicle")
    c = NpcVehicleControl(ob)
    c.update_target_speed(5.0)
    # waypoint 90 degrees to the left: heading must turn gradually
    c.update_waypoints([[0.0, 20.0]])
    c.run_step(env)
    assert 0.0 < ob.heading <= c.MAX_YAW_RATE * env.dt + 1e-9
    for _ in range(200):
        c.run_step(env)
        if c.check_reached_waypoint_goal():
            break
    assert c.check_reached_waypoint_goal()
    c.run_step(env)
    assert ob.speed == 0.0                 # brakes at plan end


def test_npc_init_speed_applies_instantly():
    env, ob = _Env(), _ob("vehicle")
    c = NpcVehicleControl(ob)
    c.update_target_speed(7.0)
    c.set_init_speed()
    c.run_step(env)
    assert ob.speed == 7.0


def test_simple_vehicle_accel_limit_and_obstacle_stop():
    env = _Env()
    ob = _ob("vehicle")
    blocker = _ob("vehicle", pos=(4.0, 0.0))
    env._obstacles = [ob, blocker]
    c = SimpleVehicleControl(ob, args={
        "max_acceleration": "2.0", "consider_obstacles": "true",
        "proximity_threshold": "10.0"})
    c.update_target_speed(8.0)
    c.run_step(env)
    assert ob.speed == 0.0                  # blocked straight ahead
    blocker.pos = np.array([0.0, 50.0])     # clear the lane
    c.run_step(env)
    assert ob.speed == pytest.approx(2.0 * env.dt)   # accel-limited ramp


def test_simple_vehicle_red_light_stop():
    class _Light:
        state = "red"
        pos = (5.0, 0.0)

    env = _Env()
    env._lights = [_Light()]
    ob = _ob("vehicle", speed=3.0)
    c = SimpleVehicleControl(ob, args={"consider_trafficlights": "true",
                                       "max_deceleration": "100"})
    c.update_target_speed(8.0)
    c.run_step(env)
    assert ob.speed == 0.0
    env._lights[0].state = "green"
    c.run_step(env)
    assert ob.speed > 0.0


def test_longitudinal_control_keeps_heading():
    env = _Env()
    ob = _ob("vehicle", heading=math.pi / 2)
    c = VehicleLongitudinalControl(ob)
    c.update_target_speed(4.0)
    c.update_waypoints([[100.0, 0.0]])      # ignored: lateral untouched
    for _ in range(10):
        c.run_step(env)
    assert ob.heading == math.pi / 2
    np.testing.assert_allclose(ob.pos, [0.0, 4.0], atol=1e-6)


def test_facade_timestamp_dedup():
    ob = _ob("vehicle")
    ac = ActorControl(ob)
    ac.update_target_speed(5.0, start_time=1.0)
    ac.update_target_speed(9.0, start_time=1.0)   # duplicate: dropped
    assert ac.controller.target_speed == 5.0
    ac.update_target_speed(9.0, start_time=2.0)
    assert ac.controller.target_speed == 9.0
    ac.update_waypoints([[1.0, 0.0]], start_time=3.0)
    ac.update_waypoints([[2.0, 0.0]], start_time=3.0)
    assert ac.controller.waypoints[0][0] == 1.0


def test_custom_controller_module_import():
    ob = _ob("static")
    ac = ActorControl(
        ob, "cadre_tpu.envs.actor_controls.VehicleLongitudinalControl")
    assert isinstance(ac.controller, VehicleLongitudinalControl)


def test_controlled_actor_behavior_ownership_and_finish():
    env = _Env()
    ob = _ob("walker")
    b = ControlledActorBehavior(ob, target_speed=2.0,
                                waypoints=[[1.0, 0.0]])
    assert ob.managed and ob._control is b.control
    alive = True
    for _ in range(20):
        alive = b.tick(env)
        if not alive:
            break
    assert not alive                        # finished at the waypoint goal
    assert not ob.managed                   # ownership released


def test_change_target_speed_and_waypoints_behaviors():
    env = _Env()
    ob = _ob("vehicle")
    # no controller yet: the behavior attaches a kind default and becomes
    # its owner-stepper (reference RUNNING + UpdateAllActorControls)
    b = ChangeActorTargetSpeedBehavior(ob, 6.0, init_speed=True)
    assert b.tick(env) is True
    control = ob._control
    assert control.controller.target_speed == 6.0
    assert ob.speed == 6.0                   # init_speed applied + stepped
    # controller exists now: plan updates are one-shot, the owner drives
    assert ChangeActorWaypointsBehavior(ob, [[3.0, 0.0]]).tick(env) is False
    assert ob._control is control            # reuses the controller
    assert b.tick(env) is True               # the owner keeps stepping
    assert ob.speed == 6.0
    ChangeActorWaypointsToReachPositionBehavior(ob, (9.0, 0.0)).tick(env)
    np.testing.assert_allclose(control.controller.waypoints[0], [9.0, 0.0])


def test_controller_replacement_resets_previous():
    env = _Env()
    ob = _ob("vehicle")
    b1 = ControlledActorBehavior(ob, target_speed=3.0)
    first = ob._control
    b2 = ControlledActorBehavior(
        ob, "cadre_tpu.envs.actor_controls.ExternalControl")
    assert ob._control is not first
    # last-writer-wins: the first behavior lost ownership and finishes
    assert b1.tick(env) is False
    assert b2.tick(env) is True              # empty plan: runs forever


def test_osc_assign_controller_action(tmp_path):
    from cadre_tpu.envs.openscenario import build_manager, load_openscenario

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
      <Maneuver name="m"><Event name="ctrl" priority="overwrite">
        <Action name="assign"><PrivateAction><ControllerAction>
          <AssignControllerAction>
            <Controller name="long"><Properties>
              <Property name="module"
 value="cadre_tpu.envs.actor_controls.VehicleLongitudinalControl"/>
              <Property name="target_speed" value="5.0"/>
            </Properties></Controller>
          </AssignControllerAction>
        </ControllerAction></PrivateAction></Action>
        <StartTrigger><ConditionGroup><Condition name="t">
          <ByValueCondition>
            <SimulationTimeCondition value="0.0" rule="greaterThan"/>
          </ByValueCondition>
        </Condition></ConditionGroup></StartTrigger>
      </Event></Maneuver>
    </ManeuverGroup></Act></Story>
  </Storyboard>
</OpenSCENARIO>
"""
    path = tmp_path / "ctrl.xosc"
    path.write_text(xosc)
    cfg = load_openscenario(str(path))
    ev = next(e for e in cfg.events if e.action == "assign_controller")
    assert ev.extra["module"].endswith("VehicleLongitudinalControl")
    assert ev.extra["args"]["target_speed"] == "5.0"

    class _E:
        dt = 0.1
        _pos = np.zeros(2)
        _yaw = 0.0
        _obstacles = []

    env = _E()
    mgr = build_manager(cfg, env)
    npc = env._obstacles[0]
    for _ in range(12):
        mgr.tick(env)
    assert isinstance(npc._control.controller, VehicleLongitudinalControl)
    assert npc._control.controller.target_speed == 5.0
    assert npc.pos[0] > 10.0                 # the plugin drives the actor


def test_osc_catalog_reference_resolution(tmp_path):
    """CatalogReference grafting: vehicle + controller entries resolved
    from a catalog directory, with ParameterAssignments overriding the
    entry's ParameterDeclarations defaults."""
    from cadre_tpu.envs.openscenario import load_openscenario

    cat_dir = tmp_path / "catalogs"
    cat_dir.mkdir()
    (cat_dir / "my_catalog.xosc").write_text("""<?xml version="1.0"?>
<OpenSCENARIO>
  <Catalog name="VehicleCatalog">
    <Vehicle name="sedan" vehicleCategory="car"/>
    <Pedestrian name="jaywalker"/>
  </Catalog>
  <Catalog name="ControllerCatalog">
    <Controller name="longctrl">
      <ParameterDeclarations>
        <ParameterDeclaration name="Speed" parameterType="double" value="2.0"/>
      </ParameterDeclarations>
      <Properties>
        <Property name="module"
 value="cadre_tpu.envs.actor_controls.VehicleLongitudinalControl"/>
        <Property name="target_speed" value="$Speed"/>
      </Properties>
    </Controller>
  </Catalog>
</OpenSCENARIO>
""")
    (tmp_path / "main.xosc").write_text("""<?xml version="1.0"?>
<OpenSCENARIO>
  <CatalogLocations>
    <VehicleCatalog><Directory path="catalogs"/></VehicleCatalog>
    <ControllerCatalog><Directory path="catalogs"/></ControllerCatalog>
  </CatalogLocations>
  <Entities>
    <ScenarioObject name="hero"><Vehicle name="ego"/></ScenarioObject>
    <ScenarioObject name="npc">
      <CatalogReference catalogName="VehicleCatalog" entryName="sedan"/>
    </ScenarioObject>
    <ScenarioObject name="walker1">
      <CatalogReference catalogName="VehicleCatalog" entryName="jaywalker"/>
    </ScenarioObject>
  </Entities>
  <Storyboard>
    <Init><Actions>
      <Private entityRef="npc">
        <PrivateAction><TeleportAction><Position>
          <WorldPosition x="12" y="0" h="0"/>
        </Position></TeleportAction></PrivateAction>
      </Private>
    </Actions></Init>
    <Story name="s"><Act name="a"><ManeuverGroup name="mg">
      <Actors><EntityRef entityRef="npc"/></Actors>
      <Maneuver name="m"><Event name="ctrl" priority="overwrite">
        <Action name="assign"><PrivateAction><ControllerAction>
          <AssignControllerAction>
            <CatalogReference catalogName="ControllerCatalog"
                              entryName="longctrl">
              <ParameterAssignments>
                <ParameterAssignment parameterRef="Speed" value="7.5"/>
              </ParameterAssignments>
            </CatalogReference>
          </AssignControllerAction>
        </ControllerAction></PrivateAction></Action>
        <StartTrigger><ConditionGroup><Condition name="t">
          <ByValueCondition>
            <SimulationTimeCondition value="0.0" rule="greaterThan"/>
          </ByValueCondition>
        </Condition></ConditionGroup></StartTrigger>
      </Event></Maneuver>
    </ManeuverGroup></Act></Story>
  </Storyboard>
</OpenSCENARIO>
""")
    cfg = load_openscenario(str(tmp_path / "main.xosc"))
    assert cfg.entities["npc"].kind == "vehicle"
    assert cfg.entities["walker1"].kind == "walker"
    ev = next(e for e in cfg.events if e.action == "assign_controller")
    assert ev.extra["module"].endswith("VehicleLongitudinalControl")
    # ParameterAssignment 7.5 overrides the declaration default 2.0
    assert ev.extra["args"]["target_speed"] == "7.5"
