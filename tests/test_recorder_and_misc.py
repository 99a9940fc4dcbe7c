"""Recorder/replay, visualization, and autonomous-agent container tests."""
import os

import numpy as np
import pytest

from cadre_tpu.envs.autonomous_agent import (
    AutonomousAgent,
    Track,
    validate_sensor_configuration,
)
from cadre_tpu.envs.carla_env import DEFAULT_SENSORS
from cadre_tpu.envs.expert import OracleExpert
from cadre_tpu.envs.recorder import (
    load_replay_log,
    make_replay_env,
    record_episodes,
)
from cadre_tpu.envs.sim_env import SimDrivingEnv
from cadre_tpu.perception.visualize import (
    colorize_seg,
    dump_visualizations,
    visualization_grid,
)


def test_record_and_replay(tmp_path):
    env = SimDrivingEnv(seed=0, seq_length=3)
    expert = OracleExpert()
    path = str(tmp_path / "log.npz")
    record_episodes(env, expert.act, 12, path)
    log = load_replay_log(path)
    assert len(log) == 12
    assert log[0]["rgb"].shape == (3, 144, 256, 3)

    replay = make_replay_env(path, episode_length=10)
    tick = replay.reset()
    assert tick["rgb"].shape == (3, 144, 256, 3)
    for _ in range(10):
        tick, r, done, info = replay.step([0.0, 0.5, 0.0])
    assert done


def test_visualization_grid_and_dump(tmp_path):
    rng = np.random.RandomState(0)
    batch = {"x": rng.rand(2, 32, 48, 4).astype(np.float32),
             "camera_seg": rng.randint(0, 8, (2, 32, 48))}
    outputs = {"camera": rng.rand(2, 32, 48, 8).astype(np.float32),
               "route": rng.rand(2, 32, 48, 1).astype(np.float32)}
    grid = visualization_grid(batch, outputs, 0)
    assert grid.shape == (32, 48 * 4, 3)
    d = dump_visualizations(batch, outputs, str(tmp_path), epoch=3,
                            max_samples=2)
    assert d is not None
    assert os.path.exists(os.path.join(d, "sample_0.png"))
    assert os.path.exists(os.path.join(d, "sample_1.png"))


def test_colorize_seg_bounds():
    seg = np.array([[0, 7], [3, 99]])
    img = colorize_seg(seg)
    assert img.shape == (2, 2, 3)
    assert img.dtype == np.uint8


def test_sensor_validation():
    validate_sensor_configuration(DEFAULT_SENSORS)  # reference set is legal
    with pytest.raises(ValueError, match="duplicated"):
        validate_sensor_configuration(DEFAULT_SENSORS + [DEFAULT_SENSORS[0]])
    with pytest.raises(ValueError, match="illegal sensor type"):
        validate_sensor_configuration([{"id": "x", "type": "sensor.bogus"}])
    with pytest.raises(ValueError, match="exceeds 3 m"):
        validate_sensor_configuration(
            [{"id": "c", "type": "sensor.camera.rgb", "x": 5.0}])
    with pytest.raises(ValueError, match="MAP track"):
        validate_sensor_configuration(
            [{"id": "m", "type": "sensor.opendrive_map"}], Track.SENSORS)


def test_autonomous_agent_contract():
    class MyAgent(AutonomousAgent):
        def sensors(self):
            return [DEFAULT_SENSORS[0]]

        def run_step(self, input_data, timestamp):
            return [0.0, 0.5, 0.0]

    agent = MyAgent()
    validate_sensor_configuration(agent.sensors())
    assert agent.run_step({}, 0.0) == [0.0, 0.5, 0.0]
    # set_global_plan downsamples
    plan = [({"lat": 49.0, "lon": 8.0}, None) for _ in range(5)]
    coords = [(np.array([float(i * 30), 0.0]), None) for i in range(5)]
    agent.set_global_plan(plan, coords)
    assert agent._global_plan is not None
    assert len(agent._global_plan) <= 5


def test_write_criteria_csv(tmp_path):
    """Per-criterion CSV rows (scenario_manager.py:85-91 header +
    result_writer.py:44-58 actual_value rows)."""
    from cadre_tpu.envs.criteria import Criterion
    from cadre_tpu.envs.scoring import write_criteria_csv

    crits = []
    for i in range(7):
        c = Criterion()
        c.actual_value = float(i)
        crits.append(c)
    path = str(tmp_path / "criteria_results.csv")
    write_criteria_csv(path, crits)
    write_criteria_csv(path, crits)          # append, header once
    rows = open(path).read().strip().splitlines()
    assert rows[0] == ",".join(c.name for c in crits)
    assert len(rows) == 3
    assert rows[1] == "0.0,1.0,2.0,3.0,4.0,5.0,6.0"
