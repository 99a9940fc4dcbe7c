"""Perception label support (VERDICT r2 weak #3): every seg class the
8-class head predicts must have sim-renderer support, and collection-time
light cycles must give all 4 light states nonzero label mass."""
import numpy as np

from cadre_tpu.envs.expert import OracleExpert
from cadre_tpu.envs.sim_env import SimDrivingEnv, roadside_props


def _drive_frames(env, n=400):
    expert = OracleExpert()
    tick = env.reset()
    segs, lights = [], []
    for _ in range(n):
        rgb, seg = env._render_rgb(with_seg=True)
        segs.append(seg)
        lights.append(int(tick.get("light_state", 0)))
        tick, _, done, _ = env.step(expert.act(env, tick))
        if done:
            tick = env.reset()
    return np.stack(segs), np.asarray(lights)


def test_all_eight_seg_classes_have_support():
    # slow traffic so the expert closes in on cars within the frame budget
    # (background vehicles drive the route now — test_npc_traffic.py)
    env = SimDrivingEnv(seed=3, vehicle_num=(4, 4), seq_length=1,
                        npc_cruise=(1.0, 2.5))
    segs, _ = _drive_frames(env, n=300)
    counts = np.bincount(segs.ravel(), minlength=8)
    # 0 sky/unlabeled, 1 road, 2 car, 3 person, 4 building, 5 pole/sign,
    # 6 vegetation, 7 road line (Config/auto_danet.py:123-130)
    assert (counts > 0).all(), counts


def test_balanced_light_cycle_covers_every_state():
    env = SimDrivingEnv(seed=5, vehicle_num=(0, 0), seq_length=1,
                        light_times=(3.0, 3.0, 3.0))
    _, lights = _drive_frames(env, n=500)
    counts = np.bincount(lights, minlength=4)
    assert (counts[1:] > 0).all(), counts   # green/yellow/red all labeled


def test_roadside_props_deterministic_and_typed():
    dense = np.stack([np.arange(200, dtype=np.float32),
                      np.zeros(200, np.float32)], axis=-1)
    a = roadside_props(dense, np.random.RandomState(0))
    b = roadside_props(dense, np.random.RandomState(0))
    np.testing.assert_array_equal(a, b)
    assert set(np.unique(a[:, 4])) <= {4.0, 5.0, 6.0}
    assert len(a) >= 5
