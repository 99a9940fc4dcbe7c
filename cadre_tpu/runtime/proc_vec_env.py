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
    def __init__(self, env_fns: Sequence[Callable[[], Any]],
                 seq_length: int = 8, height: int = 144, width: int = 256,
                 timeout_s: float = 120.0):
        self.num_envs = len(env_fns)
        self._codec = _TickCodec(seq_length, height, width)
        self._timeout_ms = int(timeout_s * 1000)
        self.episode_stats: List[Dict[str, Any]] = []
        self._episode_returns = np.zeros((self.num_envs, 2))

        base = f"/cadre_{os.getpid()}_{int(time.time() * 1000) % 100_000}"
        ctx = mp.get_context("spawn")
        self._obs_rings: List[ShmRing] = []
        self._act_rings: List[ShmRing] = []
        self._procs: List[mp.Process] = []
        for i, fn in enumerate(env_fns):
            obs_name = f"{base}_obs{i}"
            act_name = f"{base}_act{i}"
            self._obs_rings.append(ShmRing(
                obs_name, n_slots=2, frame_bytes=self._codec.frame_bytes,
                create=True))
            self._act_rings.append(ShmRing(
                act_name, n_slots=2, frame_bytes=16, create=True))
            p = ctx.Process(
                target=_worker_main,
                args=(pickle.dumps(fn), obs_name, act_name, seq_length,
                      height, width),
                daemon=True)
            p.start()
            self._procs.append(p)

    def _gather(self):
        ticks, rewards, dones, infos = [], [], [], []
        for i, ring in enumerate(self._obs_rings):
            buf = ring.read(timeout_ms=self._timeout_ms)
            if buf is None:
                raise TimeoutError(f"env worker {i} did not respond")
            tick, r, done, action_done, completion = self._codec.decode(buf)
            self._episode_returns[i] += r
            if done:
                self.episode_stats.append({
                    "env": i,
                    "steer_return": float(self._episode_returns[i][0]),
                    "throttle_return": float(self._episode_returns[i][1]),
                    "completion": completion,
                    "error_message": "",
                })
                self._episode_returns[i] = 0.0
            ticks.append(tick)
            rewards.append(r)
            dones.append(done)
            infos.append({"action_done": action_done, "error_message": ""})
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
