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
