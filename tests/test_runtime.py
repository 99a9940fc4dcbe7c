"""Native runtime tests: shm ring correctness + process-pool vec env."""
import os
import struct
import time

import numpy as np
import pytest

from cadre_tpu.runtime.shm_ring import ShmRing


def test_ring_roundtrip():
    ring = ShmRing(f"/test_ring_{os.getpid()}", n_slots=4, frame_bytes=64,
                   create=True)
    try:
        data = np.arange(64, dtype=np.uint8)
        ring.write(data)
        out = ring.read(timeout_ms=100)
        np.testing.assert_array_equal(np.frombuffer(out, np.uint8), data)
        assert ring.read(timeout_ms=10) is None  # empty again
    finally:
        ring.close()


def test_ring_attach_and_batch():
    name = f"/test_ring2_{os.getpid()}"
    ring = ShmRing(name, n_slots=8, frame_bytes=16, create=True)
    try:
        other = ShmRing(name)  # attach
        for i in range(5):
            other.write(np.full(16, i, np.uint8))
        assert ring.available == 5
        batch = ring.read_batch(10, timeout_ms=100)
        assert batch.shape == (5, 16)
        np.testing.assert_array_equal(batch[:, 0], np.arange(5))
        other.close()
    finally:
        ring.close()


def test_ring_overwrite_latest_wins():
    ring = ShmRing(f"/test_ring3_{os.getpid()}", n_slots=2, frame_bytes=8,
                   create=True)
    try:
        for i in range(5):  # overfill: only the last 2 survive
            ring.write(np.full(8, i, np.uint8))
        vals = []
        while True:
            out = ring.read(timeout_ms=10)
            if out is None:
                break
            vals.append(out[0])
        assert vals[-1] == 4
        assert len(vals) <= 2
    finally:
        ring.close()


def _make_fake_env(seed):
    from cadre_tpu.envs.fake_env import FakeDrivingEnv

    return FakeDrivingEnv(episode_length=6, seq_length=3, height=64,
                          width=96, seed=seed)


def test_proc_vec_env_fake():
    import functools

    from cadre_tpu.runtime.proc_vec_env import ProcVecDrivingEnv

    # env factories must be picklable (spawn workers)
    vec = ProcVecDrivingEnv(
        [functools.partial(_make_fake_env, i) for i in range(3)],
        seq_length=3, height=64, width=96)
    try:
        tick = vec.reset()
        assert tick["rgb"].shape == (3, 3, 64, 96, 3)
        for _ in range(6):
            tick, rewards, dones, infos = vec.step(
                [[0.0, 0.5, 0.0]] * 3)
        assert rewards.shape == (3, 2)
        assert dones.all()  # all envs hit episode_length simultaneously
        stats = vec.pop_episode_stats()
        assert len(stats) == 3
        assert stats[0]["completion"] == 100.0
    finally:
        vec.close()


class _CrashAfter:
    """Env wrapper that hard-kills its worker process after N steps."""

    def __init__(self, inner, crash_at):
        self._inner = inner
        self._crash_at = crash_at
        self._n = 0

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def reset(self):
        return self._inner.reset()

    def step(self, control):
        self._n += 1
        if self._n == self._crash_at:
            import os as _os

            _os._exit(1)          # simulate a dead CARLA server / worker
        return self._inner.step(control)


def _make_crashy_env(seed, crash_at):
    return _CrashAfter(_make_fake_env(seed), crash_at)


def test_proc_vec_env_respawns_dead_worker():
    """Elastic recovery: a killed worker is respawned and its slot reports
    an episode boundary instead of hanging the barrier (the reference's
    chief would wait forever, SURVEY §5.3)."""
    import functools

    from cadre_tpu.runtime.proc_vec_env import ProcVecDrivingEnv

    vec = ProcVecDrivingEnv(
        [functools.partial(_make_fake_env, 0),
         functools.partial(_make_crashy_env, 1, 2)],
        seq_length=3, height=64, width=96, timeout_s=30.0)
    try:
        vec.reset()
        saw_restart = False
        for _ in range(5):
            tick, rewards, dones, infos = vec.step([[0.0, 0.5, 0.0]] * 2)
            assert tick["rgb"].shape == (2, 3, 64, 96, 3)
            if infos[1]["error_message"] == "worker restarted":
                saw_restart = True
                assert dones[1]
        assert saw_restart
        assert vec._respawns[1] >= 1
        stats = vec.pop_episode_stats()
        assert any(s["error_message"] == "worker restarted" for s in stats)
    finally:
        vec.close()
