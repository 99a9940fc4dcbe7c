"""srunner autoagents family (npc/dummy/human) over the AutonomousAgent
contract (srunner/autoagents/*.py)."""
import numpy as np

from cadre_tpu.envs.autoagents import DummyAgent, HumanAgent, NpcAgent
from cadre_tpu.envs.autonomous_agent import validate_sensor_configuration


def test_sensor_suites_validate():
    for agent in (DummyAgent(), NpcAgent(), HumanAgent(input_source=set)):
        validate_sensor_configuration(agent.sensors())


def test_dummy_agent_full_stop(capsys):
    agent = DummyAgent()
    ctrl = agent.run_step({"Left": (3, np.zeros((200, 300, 3)))}, 0.0)
    assert ctrl == [0.0, 0.0, 0.0]
    agent.verbose = True
    agent.run_step({"Left": (3, np.zeros((200, 300, 3)))}, 0.1)
    assert "shape (200, 300, 3)" in capsys.readouterr().out


def test_npc_agent_follows_plan():
    agent = NpcAgent()
    # no route yet: stand still
    assert agent.run_step({"GPS": (0, np.zeros(2))}, 0.0) == [0.0, 0.0, 0.0]

    plan = [((0.0, 0.0), 0), ((20.0, 0.0), 0), ((40.0, 0.0), 0),
            ((60.0, 0.0), 0), ((80.0, 0.0), 0)]
    agent.set_global_plan(plan, plan)
    pos = np.array([0.0, 0.0])
    heading = 0.0
    speed = 0.0
    dt = 0.1
    for _ in range(400):
        data = {"GPS": (0, pos.copy()),
                "IMU": (0, np.array([0.0, 0.0, heading])),
                "speed": (0, {"speed": speed})}
        steer, throttle, brake = agent.run_step(data, 0.0)
        speed = max(0.0, speed + (3.0 * throttle - 8.0 * brake) * dt)
        heading += steer * 1.0 * dt
        pos += speed * dt * np.array([np.cos(heading), np.sin(heading)])
    # drove the straight plan to its end and braked there
    assert pos[0] > 70.0
    assert abs(pos[1]) < 5.0
    assert agent.run_step({"GPS": (0, pos), "speed": (0, {"speed": 0.0})},
                          0.0)[2] == 1.0  # plan exhausted: brake


def test_human_agent_keyboard_mapping():
    pressed = set()
    agent = HumanAgent(input_source=lambda: pressed)
    assert agent.run_step({}, 0.0) == [0.0, 0.0, 0.0]
    pressed.update({"w"})
    assert agent.run_step({}, 0.0)[1] == 0.6
    pressed.update({"a"})
    steer = agent.run_step({}, 0.0)[0]
    assert steer < 0.0                       # ramping left
    for _ in range(30):
        steer = agent.run_step({}, 0.0)[0]
    assert steer == -0.7                     # capped at full lock
    pressed.clear()
    pressed.add("space")
    ctrl = agent.run_step({}, 0.0)
    assert ctrl[0] == 0.0 and ctrl[2] == 1.0  # recentred + hand brake


def test_npc_agent_completes_live_env_route():
    """NpcAgent drives a real SimDrivingEnv route to completion through
    the sensor contract (npc_agent.py's BasicAgent role)."""
    import math

    from cadre_tpu.envs.sim_env import SimDrivingEnv

    env = SimDrivingEnv(seed=7)
    env.reset()
    plan = [((float(x), float(y)), 0) for x, y in env._route_xy[::10]]
    agent = NpcAgent()
    agent.set_global_plan(plan, plan)
    done, info = False, {}
    for i in range(3000):
        data = {"GPS": (i, env._pos.copy()),
                "IMU": (i, np.array([0.0, 0.0, math.radians(env._yaw)])),
                "speed": (i, {"speed": env._speed})}
        _, _, done, info = env.step(agent.run_step(data, i * env.dt))
        if done:
            break
    assert done and info.get("error_message") == "success", info
