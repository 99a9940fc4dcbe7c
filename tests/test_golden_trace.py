"""Golden-trace regression lock for the reward/termination pipeline.

SURVEY §7 'Hard parts': the decomposed reward's event diffing and
turn-detection state machine drive learning dynamics and are easy to break
silently. This test replays a fixed control script in a seeded simulator
and asserts the exact reward trace + termination against values captured
from the verified round-1 implementation. If a change legitimately alters
these semantics, regenerate with:
  python -m tests.test_golden_trace
"""
import json
import os

import numpy as np
import pytest

from cadre_tpu.envs.sim_env import SimDrivingEnv

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_trace.json")

CONTROL_SCRIPT = (
    [[0.0, 0.6, 0.0]] * 40          # accelerate straight
    + [[0.3, 0.6, 0.0]] * 10        # drift right
    + [[-0.3, 0.6, 0.0]] * 10       # recover
    + [[0.0, 0.0, 1.0]] * 10        # brake
    + [[0.0, 0.8, 0.0]] * 50        # overspeed attempt
)


def run_trace():
    env = SimDrivingEnv(seed=1234, seq_length=2)
    env.reset()
    rewards, dones = [], []
    for control in CONTROL_SCRIPT:
        _, r, done, info = env.step(control)
        rewards.append([round(float(r[0]), 5), round(float(r[1]), 5)])
        dones.append(bool(done))
        if done:
            break
    return {"rewards": rewards, "dones": dones,
            "end": info["error_message"]}


def test_reward_trace_matches_golden():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("golden trace not generated")
    golden = json.load(open(GOLDEN_PATH))
    trace = run_trace()
    assert trace["end"] == golden["end"]
    assert trace["dones"] == golden["dones"]
    np.testing.assert_allclose(np.asarray(trace["rewards"]),
                               np.asarray(golden["rewards"]),
                               rtol=1e-4, atol=1e-4)


if __name__ == "__main__":
    json.dump(run_trace(), open(GOLDEN_PATH, "w"), indent=0)
    print(f"wrote {GOLDEN_PATH}")
