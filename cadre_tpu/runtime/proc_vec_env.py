"""Process-pool vectorized env over shared-memory rings.

N env worker processes each own one driving env (the reference's
one-process-per-CARLA-server topology, main.py:63-70) and exchange
fixed-size frames with the trainer through the native shm ring
(ringbuf.cpp): an action mailbox per worker (trainer -> worker) and an
observation ring per worker (worker -> trainer). All workers step
concurrently; the trainer's gather is a batched memcpy, not pickling.

Interface-compatible with cadre_tpu.envs.vec_env.VecDrivingEnv.
"""
from __future__ import annotations

import multiprocessing as mp
import os
import pickle
import struct
import time
from typing import Any, Callable, Dict, List, Sequence

import numpy as np

from cadre_tpu.runtime.shm_ring import ShmRing

_OP_RESET = 0.0
_OP_STEP = 1.0
_OP_CLOSE = 2.0


class _TickCodec:
    """Fixed-layout tick_data <-> bytes."""

    def __init__(self, seq: int, h: int, w: int):
        self.seq, self.h, self.w = seq, h, w
        self.rgb_n = seq * h * w * 3
        self.route_n = seq * w * h  # route raster is [seq, 256, 144] = [seq,w,h]
        self.meas_n = seq * 3 * 4
        # trailing: command i32, rewards 2f32, done u8, action_done 2u8,
        # completion f32, pad to 4
        self.tail_n = 4 + 8 + 1 + 2 + 4 + 1
        self.frame_bytes = (self.rgb_n + self.route_n + self.meas_n
                            + self.tail_n)

    def encode(self, tick: Dict[str, Any], rewards, done, action_done,
               completion: float) -> bytes:
        parts = [
            np.ascontiguousarray(tick["rgb"], np.uint8).tobytes(),
            np.ascontiguousarray(tick["route_fig"], np.uint8).tobytes(),
            np.ascontiguousarray(tick["measurements"],
                                 np.float32).tobytes(),
            struct.pack("<i2fB2BfB", int(tick["command"]),
                        float(rewards[0]), float(rewards[1]), int(done),
                        int(action_done[0]), int(action_done[1]),
                        float(completion), 0),
        ]
        return b"".join(parts)

    def decode(self, buf: bytes):
        o = 0
        rgb = np.frombuffer(buf, np.uint8, self.rgb_n, o).reshape(
            self.seq, self.h, self.w, 3)
        o += self.rgb_n
        route = np.frombuffer(buf, np.uint8, self.route_n, o).reshape(
            self.seq, self.w, self.h)
        o += self.route_n
        meas = np.frombuffer(buf, np.float32, self.seq * 3, o).reshape(
            self.seq, 3)
        o += self.meas_n
        command, r0, r1, done, ad0, ad1, completion, _ = struct.unpack_from(
            "<i2fB2BfB", buf, o)
        return ({"rgb": rgb, "route_fig": route, "measurements": meas,
                 "command": command},
                np.array([r0, r1], np.float32), bool(done), (ad0, ad1),
                completion)


def _worker_main(env_fn_bytes: bytes, obs_name: str, act_name: str,
                 seq: int, h: int, w: int) -> None:
    env = pickle.loads(env_fn_bytes)()
    codec = _TickCodec(seq, h, w)
    obs_ring = ShmRing(obs_name)
    act_ring = ShmRing(act_name)
    completion = 0.0
    while True:
        frame = act_ring.read(timeout_ms=60_000)
        if frame is None:
            continue
        op, steer, throttle, brake = struct.unpack_from("<4f", frame)
        if op == _OP_CLOSE:
            break
        if op == _OP_RESET:
            tick = env.reset()
            obs_ring.write(codec.encode(tick, (0.0, 0.0), False, (0, 0),
                                        0.0))
            continue
        tick, rewards, done, info = env.step([steer, throttle, brake])
        if done:
            completion = getattr(env, "completion_ratio", 0.0)
            tick = env.reset()
        obs_ring.write(codec.encode(tick, rewards, done,
                                    info["action_done"], completion))


class ProcVecDrivingEnv:
    """`max_respawns_per_worker > 0` adds elastic recovery: a worker that
    dies or times out is terminated and respawned with fresh rings, and its
    slot reports done=True ("worker restarted") so the trainer treats the
    lost episode as a boundary. The reference has no equivalent — a dead
    worker hangs its chief barrier forever (SURVEY §5.3)."""

    def __init__(self, env_fns: Sequence[Callable[[], Any]],
                 seq_length: int = 8, height: int = 144, width: int = 256,
                 timeout_s: float = 120.0, max_respawns_per_worker: int = 3):
        self.num_envs = len(env_fns)
        self._codec = _TickCodec(seq_length, height, width)
        self._dims = (seq_length, height, width)
        self._timeout_ms = int(timeout_s * 1000)
        self._env_fn_bytes = [pickle.dumps(fn) for fn in env_fns]
        self._max_respawns = max_respawns_per_worker
        self._respawns = [0] * self.num_envs
        self.episode_stats: List[Dict[str, Any]] = []
        self._episode_returns = np.zeros((self.num_envs, 2))

        self._base = f"/cadre_{os.getpid()}_{int(time.time() * 1000) % 100_000}"
        self._ctx = mp.get_context("spawn")
        self._gen = [0] * self.num_envs   # ring-name generation per worker
        self._obs_rings: List[ShmRing] = [None] * self.num_envs
        self._act_rings: List[ShmRing] = [None] * self.num_envs
        self._procs: List[mp.Process] = [None] * self.num_envs
        for i in range(self.num_envs):
            self._spawn(i)

    def _spawn(self, i: int) -> None:
        seq, h, w = self._dims
        obs_name = f"{self._base}_obs{i}g{self._gen[i]}"
        act_name = f"{self._base}_act{i}g{self._gen[i]}"
        self._obs_rings[i] = ShmRing(
            obs_name, n_slots=2, frame_bytes=self._codec.frame_bytes,
            create=True)
        self._act_rings[i] = ShmRing(
            act_name, n_slots=2, frame_bytes=16, create=True)
        p = self._ctx.Process(
            target=_worker_main,
            args=(self._env_fn_bytes[i], obs_name, act_name, seq, h, w),
            daemon=True)
        p.start()
        self._procs[i] = p

    def _respawn(self, i: int):
        """Kill worker i, bring up a replacement, and return its reset tick
        (or None if the replacement also fails)."""
        self._respawns[i] += 1
        p = self._procs[i]
        if p is not None and p.is_alive():
            p.terminate()
            p.join(timeout=5)
        for ring in (self._obs_rings[i], self._act_rings[i]):
            try:
                ring.close()
            except Exception:
                pass
        self._gen[i] += 1
        self._spawn(i)
        self._act_rings[i].write(struct.pack("<4f", _OP_RESET, 0, 0, 0))
        return self._read_obs(i)

    def _read_obs(self, i: int):
        """Ring read in 1 s slices, checking worker liveness between them:
        a dead worker is detected in ~1 s instead of the full hang
        timeout."""
        deadline = time.time() + self._timeout_ms / 1000.0
        while True:
            remaining_ms = int((deadline - time.time()) * 1000)
            if remaining_ms <= 0:
                return None
            buf = self._obs_rings[i].read(
                timeout_ms=min(1000, remaining_ms))
            if buf is not None:
                return buf
            if not self._procs[i].is_alive():
                return None

    def _gather(self):
        ticks, rewards, dones, infos = [], [], [], []
        for i in range(self.num_envs):
            buf = self._read_obs(i)
            restarted = False
            while buf is None and self._respawns[i] < self._max_respawns:
                restarted = True
                buf = self._respawn(i)
            if buf is None:
                raise TimeoutError(
                    f"env worker {i} did not respond "
                    f"(after {self._respawns[i]} respawns)")
            tick, r, done, action_done, completion = self._codec.decode(buf)
            if restarted:
                # the in-flight episode is lost; surface a boundary
                done, r, action_done = True, np.zeros(2, np.float32), (1, 1)
            self._episode_returns[i] += r
            err = "worker restarted" if restarted else ""
            if done:
                self.episode_stats.append({
                    "env": i,
                    "steer_return": float(self._episode_returns[i][0]),
                    "throttle_return": float(self._episode_returns[i][1]),
                    "completion": completion,
                    "error_message": err,
                })
                self._episode_returns[i] = 0.0
            ticks.append(tick)
            rewards.append(r)
            dones.append(done)
            infos.append({"action_done": action_done, "error_message": err})
        stacked = {
            "rgb": np.stack([t["rgb"] for t in ticks]),
            "route_fig": np.stack([t["route_fig"] for t in ticks]),
            "measurements": np.stack([t["measurements"] for t in ticks]),
            "command": np.asarray([t["command"] for t in ticks], np.int32),
        }
        return stacked, np.stack(rewards), np.asarray(dones, bool), infos

    def reset(self):
        for ring in self._act_rings:
            ring.write(struct.pack("<4f", _OP_RESET, 0, 0, 0))
        stacked, *_ = self._gather()
        return stacked

    def step(self, controls: Sequence[Sequence[float]]):
        for ring, c in zip(self._act_rings, controls):
            ring.write(struct.pack("<4f", _OP_STEP, float(c[0]),
                                   float(c[1]), float(c[2])))
        return self._gather()

    def pop_episode_stats(self) -> List[Dict[str, Any]]:
        out = self.episode_stats
        self.episode_stats = []
        return out

    def close(self) -> None:
        for ring in self._act_rings:
            try:
                ring.write(struct.pack("<4f", _OP_CLOSE, 0, 0, 0))
            except Exception:
                pass
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        for ring in self._obs_rings + self._act_rings:
            ring.close()
