"""CARLA simulator facade: cached actor state + lifecycle management.

Contract: srunner/scenariomanager/carla_data_provider.py:34-1165 — a global
registry caching actor velocity/location/transform refreshed once per tick
(RPC amortization), world/client/traffic-manager handles, blueprint
creation, batch spawning, hero lookup, and cleanup between episodes (the
anti-slowdown reset, env_wrapper.py:582-599).

`carla` is imported lazily — this module is importable without the simulator
installed.
"""
from __future__ import annotations

import threading
from typing import Any, Dict, List, Optional


def _carla():
    import carla  # deferred: only needed when a server is used

    return carla


class CarlaProvider:
    """Instance-based (not global-singleton) provider; one per env."""

    def __init__(self):
        self._client = None
        self._world = None
        self._map = None
        self._tm_port: Optional[int] = None
        self._sync = True
        self._actors: List[Any] = []
        self._velocities: Dict[int, float] = {}
        self._transforms: Dict[int, Any] = {}
        self._lock = threading.Lock()
        self.training = True

    # ---------------- registry ----------------

    def set_client(self, client) -> None:
        self._client = client

    def set_world(self, world) -> None:
        self._world = world
        self._map = world.get_map()

    def set_tm_port(self, port: int) -> None:
        self._tm_port = port

    @property
    def world(self):
        return self._world

    @property
    def map(self):
        return self._map

    # ---------------- per-tick cache ----------------

    def on_tick(self) -> None:
        with self._lock:
            for actor in self._actors:
                if actor is None or not actor.is_alive:
                    continue
                aid = actor.id
                v = actor.get_velocity()
                self._velocities[aid] = (v.x ** 2 + v.y ** 2
                                         + v.z ** 2) ** 0.5
                self._transforms[aid] = actor.get_transform()

    def get_velocity(self, actor) -> float:
        return self._velocities.get(actor.id, 0.0)

    def get_transform(self, actor):
        return self._transforms.get(actor.id) or actor.get_transform()

    def get_location(self, actor):
        return self.get_transform(actor).location

    # ---------------- spawning ----------------

    def register(self, actor) -> Any:
        with self._lock:
            self._actors.append(actor)
        return actor

    def create_blueprint(self, model: str, rolename: str = "scenario"):
        carla = _carla()
        lib = self._world.get_blueprint_library()
        bps = lib.filter(model)
        if not bps:
            raise ValueError(f"no blueprint matches {model!r}")
        bp = bps[0]
        if bp.has_attribute("role_name"):
            bp.set_attribute("role_name", rolename)
        if bp.has_attribute("color"):
            bp.set_attribute(
                "color", bp.get_attribute("color").recommended_values[0])
        return bp

    def spawn_actor(self, model: str, transform, rolename: str = "scenario",
                    autopilot: bool = False):
        carla = _carla()
        bp = self.create_blueprint(model, rolename)
        actor = self._world.try_spawn_actor(bp, transform)
        if actor is None:
            return None
        if autopilot and self._tm_port is not None:
            actor.set_autopilot(True, self._tm_port)
        return self.register(actor)

    def spawn_background_traffic(self, n_vehicles: int, n_walkers: int,
                                 tm_port: Optional[int] = None) -> None:
        """Batch-spawn autopilot vehicles + wandering walkers
        (carla_data_provider.py:931-1044 behavior)."""
        carla = _carla()
        tm_port = tm_port or self._tm_port
        spawn_points = list(self._map.get_spawn_points())
        import random

        random.shuffle(spawn_points)
        for tf in spawn_points[:n_vehicles]:
            actor = self.spawn_actor("vehicle.*", tf, autopilot=True)
        for _ in range(n_walkers):
            loc = self._world.get_random_location_from_navigation()
            if loc is None:
                continue
            bp = self.create_blueprint("walker.pedestrian.*", "walker")
            walker = self._world.try_spawn_actor(
                bp, carla.Transform(loc))
            if walker is not None:
                self.register(walker)

    # ---------------- cleanup ----------------

    def cleanup(self) -> None:
        with self._lock:
            for actor in self._actors:
                try:
                    if actor is not None and actor.is_alive:
                        actor.destroy()
                except RuntimeError:
                    pass
            self._actors = []
            self._velocities = {}
            self._transforms = {}


class GameTime:
    """Sim-clock accumulated from snapshot timestamps
    (srunner/scenariomanager/timer.py:17-80)."""

    def __init__(self):
        self._time = 0.0
        self._frame = 0
        self._initialized = False

    def on_tick(self, timestamp) -> None:
        if not self._initialized or timestamp.frame > self._frame:
            frames = timestamp.frame - self._frame if self._initialized else 1
            self._time += frames * timestamp.delta_seconds
            self._frame = timestamp.frame
            self._initialized = True

    def restart(self) -> None:
        self._time = 0.0
        self._frame = 0
        self._initialized = False

    @property
    def time(self) -> float:
        return self._time
