"""GPS-space route planner.

Contract: leaderboard/team_code/planner.py:240-355 — a deque of
(position, RoadOption) built from the global plan (GPS lat/lon de-meaned and
scaled to meters); `run_step(gps)` pops waypoints passed within
`min_distance`, returns (near_node, near_command, route_list <= max_distance
of cumulative length ahead).
"""
from __future__ import annotations

from collections import deque
from typing import List, Sequence, Tuple

import numpy as np

from cadre_tpu.envs.road_option import RoadOption

# CARLA gps -> meters conversion used by the reference (planner.py:248-249)
GPS_MEAN = np.array([49.0, 49.0])
GPS_SCALE = np.array([111324.60662786, 111324.60662786])


class RoutePlanner:
    def __init__(self, min_distance: float, max_distance: float):
        self.route: deque = deque()
        self.min_distance = min_distance
        self.max_distance = max_distance
        self.mean = GPS_MEAN.copy()
        self.scale = GPS_SCALE.copy()

    def set_route(self, global_plan: Sequence[Tuple], gps: bool = False
                  ) -> None:
        """global_plan: [({'lat','lon'} | (x, y), RoadOption), ...]."""
        self.route.clear()
        for pos, cmd in global_plan:
            if gps:
                p = np.array([pos["lat"], pos["lon"]], dtype=np.float64)
                p = (p - self.mean) * self.scale
            else:
                p = np.asarray(pos, dtype=np.float64)[:2] - self.mean
            self.route.append((p, cmd))

    def set_route_meters(self, points: Sequence[Tuple[float, float]],
                         commands: Sequence[RoadOption]) -> None:
        """Direct meter-space route (for simulators that skip GPS encoding)."""
        self.mean = np.zeros(2)
        self.scale = np.ones(2)
        self.route.clear()
        for p, c in zip(points, commands):
            self.route.append((np.asarray(p, dtype=np.float64), c))

    def run_step(self, gps: np.ndarray
                 ) -> Tuple[np.ndarray, RoadOption, List[np.ndarray]]:
        """(near_node, near_command, route_list ahead) (planner.py:312-355)."""
        to_pop = 0
        farthest_in_range = -np.inf
        cumulative = 0.0
        route_list = [self.route[0][0]]

        if len(self.route) == 1:
            return self.route[0][0], self.route[0][1], route_list

        for i in range(1, len(self.route)):
            if cumulative > self.max_distance:
                break
            cumulative += float(np.hypot(*(self.route[i][0]
                                           - self.route[i - 1][0])))
            distance = float(np.hypot(*(self.route[i][0] - gps)))
            if distance <= self.min_distance and distance > farthest_in_range:
                farthest_in_range = distance
                to_pop = i
            route_list.append(self.route[i][0])

        for _ in range(to_pop):
            if len(self.route) > 2:
                self.route.popleft()
                del route_list[0]
        return self.route[1][0], self.route[1][1], route_list
