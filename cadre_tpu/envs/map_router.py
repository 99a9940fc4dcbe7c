"""Map-aware dense route tracing.

The reference's `interpolate_trajectory` (leaderboard/leaderboard/utils/
route_manipulation.py:132-169) delegates to the CARLA egg's
`agents.navigation.global_route_planner.GlobalRoutePlanner` for a
1 m-resolution dense trace between route keypoints. This module implements
the same algorithm directly against the CARLA *map API* (`get_topology()`,
`waypoint.next()`), so the framework needs no `agents` package on
PYTHONPATH and the dense-trace branch is exercisable in CI against a stub
map with real topology (tests/carla_stub.py::GridTownMap).

Algorithm (mirroring the egg's planner structure, re-derived):
  1. Build a directed lane graph from `map.get_topology()` — one edge per
     (segment-entry, segment-exit) waypoint pair — densified by walking
     `entry.next(resolution)` toward the exit.
  2. Dijkstra between the graph nodes nearest the query endpoints.
  3. Assign RoadOptions: LANEFOLLOW on non-junction edges; on junction
     edges, LEFT/RIGHT/STRAIGHT from the signed entry->exit heading change
     (the egg's _turn_decision threshold is ~35 degrees).
"""
from __future__ import annotations

import heapq
import math
from typing import Any, Dict, List, Tuple

import numpy as np

from cadre_tpu.envs.road_option import RoadOption

# heading-change threshold separating STRAIGHT from LEFT/RIGHT at junctions
TURN_THRESHOLD_DEG = 35.0


def _xy(wp) -> Tuple[float, float]:
    loc = wp.transform.location
    return (float(loc.x), float(loc.y))


def _node_key(wp) -> Tuple[int, int]:
    """Quantized node id (0.5 m grid) so topology endpoints that coincide
    spatially (exit of one segment == entry of the next) share a node."""
    x, y = _xy(wp)
    return (int(round(x * 2.0)), int(round(y * 2.0)))


class MapRouter:
    """Dense start->end route tracer over a CARLA map's lane topology."""

    def __init__(self, carla_map, resolution: float = 1.0,
                 max_edge_steps: int = 4000):
        self._map = carla_map
        self.resolution = float(resolution)
        self._edges: List[Dict[str, Any]] = []
        self._adj: Dict[Tuple[int, int], List[int]] = {}
        self._nodes: Dict[Tuple[int, int], Tuple[float, float]] = {}
        for begin, end in carla_map.get_topology():
            wps = self._densify(begin, end, max_edge_steps)
            if len(wps) < 2:
                continue
            a, b = _node_key(begin), _node_key(end)
            length = sum(
                math.dist(_xy(p), _xy(q)) for p, q in zip(wps, wps[1:]))
            is_junction = any(
                bool(getattr(w, "is_junction", False)) for w in wps)
            idx = len(self._edges)
            self._edges.append(dict(src=a, dst=b, wps=wps, length=length,
                                    junction=is_junction,
                                    xy=np.asarray([_xy(w) for w in wps])))
            self._adj.setdefault(a, []).append(idx)
            self._nodes[a] = _xy(begin)
            self._nodes[b] = _xy(end)
        self._alive, self._coalive = self._prune_dead_ends()

    def _prune_dead_ends(self):
        """Edges that can reach a cycle (`alive`) / be reached from one
        (`coalive`). Real CARLA maps are closed networks where every edge
        is both; synthetic grids grow dead-end boundary stubs, which are
        valid route *destinations* but hopeless route *origins* (and vice
        versa for source-only stubs)."""
        radj: Dict[Tuple[int, int], List[int]] = {}
        for ei, e in enumerate(self._edges):
            radj.setdefault(e["dst"], []).append(ei)
        alive = set(range(len(self._edges)))
        changed = True
        while changed:
            changed = False
            for ei in list(alive):
                if not any(ej in alive
                           for ej in self._adj.get(self._edges[ei]["dst"],
                                                   ())):
                    alive.discard(ei)
                    changed = True
        coalive = set(range(len(self._edges)))
        changed = True
        while changed:
            changed = False
            for ei in list(coalive):
                if not any(ej in coalive
                           for ej in radj.get(self._edges[ei]["src"], ())):
                    coalive.discard(ei)
                    changed = True
        return alive, coalive

    def _densify(self, begin, end, max_steps: int) -> List[Any]:
        """Walk begin.next(resolution) toward end, as the egg's planner
        densifies each topology segment."""
        target = _xy(end)
        wps = [begin]
        cur = begin
        for _ in range(max_steps):
            if math.dist(_xy(cur), target) <= self.resolution:
                break
            nxt = cur.next(self.resolution)
            if not nxt:
                break
            # at a junction entry next() fans out; follow the branch that
            # closes on THIS edge's exit waypoint
            cur = min(nxt, key=lambda w: math.dist(_xy(w), target))
            if math.dist(_xy(cur), _xy(wps[-1])) < 1e-6:
                break
            wps.append(cur)
        wps.append(end)
        return wps

    def _shortest_edges(self, src: Tuple[int, int], dst: Tuple[int, int]
                        ) -> List[int]:
        """Dijkstra over edge lengths; returns the edge-index path."""
        best: Dict[Tuple[int, int], float] = {src: 0.0}
        back: Dict[Tuple[int, int], Tuple[Tuple[int, int], int]] = {}
        heap: List[Tuple[float, Tuple[int, int]]] = [(0.0, src)]
        seen = set()
        while heap:
            d, node = heapq.heappop(heap)
            if node in seen:
                continue
            seen.add(node)
            if node == dst:
                break
            for ei in self._adj.get(node, ()):
                e = self._edges[ei]
                nd = d + e["length"]
                if nd < best.get(e["dst"], float("inf")):
                    best[e["dst"]] = nd
                    back[e["dst"]] = (node, ei)
                    heapq.heappush(heap, (nd, e["dst"]))
        if dst not in back and dst != src:
            raise ValueError(f"no route between topology nodes {src}->{dst}")
        path: List[int] = []
        node = dst
        while node != src:
            node, ei = back[node]
            path.append(ei)
        path.reverse()
        return path

    @staticmethod
    def _edge_option(e: Dict[str, Any]) -> RoadOption:
        if not e["junction"]:
            return RoadOption.LANEFOLLOW
        wps = e["wps"]
        (x0, y0), (x1, y1) = _xy(wps[0]), _xy(wps[1])
        (x2, y2), (x3, y3) = _xy(wps[-2]), _xy(wps[-1])
        h_in = math.atan2(y1 - y0, x1 - x0)
        h_out = math.atan2(y3 - y2, x3 - x2)
        diff = math.degrees((h_out - h_in + math.pi) % (2 * math.pi)
                            - math.pi)
        if abs(diff) < TURN_THRESHOLD_DEG:
            return RoadOption.STRAIGHT
        # CARLA's frame is left-handed (+y to the RIGHT of +x), so a
        # positive heading change is a RIGHT turn — verified against the
        # reference's named turn routes (Nocrash_right_turn_route.xml:
        # yaw_out - yaw_in = +90 on all 33 routes; _left_: -90)
        return RoadOption.RIGHT if diff > 0 else RoadOption.LEFT

    def _nearest_edge_points(self, x: float, y: float, k: int,
                             allowed=None) -> List[Tuple[float, int, int]]:
        """k closest (distance, edge index, dense-point index) to (x, y),
        at most one candidate per edge, sorted by distance; `allowed`
        restricts the edge set (empty/None means all edges)."""
        cands: List[Tuple[float, int, int]] = []
        for ei, e in enumerate(self._edges):
            if allowed and ei not in allowed:
                continue
            d2 = ((e["xy"][:, 0] - x) ** 2 + (e["xy"][:, 1] - y) ** 2)
            i = int(d2.argmin())
            cands.append((float(d2[i]), ei, i))
        cands.sort()
        return cands[:k]

    def trace_route(self, origin, destination) -> List[Tuple[Any, RoadOption]]:
        """Dense (waypoint, RoadOption) trace — the egg planner's public
        surface consumed by route_manipulation.interpolate_trajectory.
        Anchored on the lane POINTS nearest the query endpoints (mid-edge
        starts/ends included), as the egg's planner does. Unlike the egg's
        maps, synthetic topologies can hold dead-end stubs (grid boundary
        extensions): when the nearest anchor pair admits no path, fall back
        through the next-nearest candidate anchors before giving up."""
        ox, oy = float(origin.x), float(origin.y)
        dx, dy = float(destination.x), float(destination.y)
        # nearest candidates overall (covers origin+destination on the
        # same dead-end edge) plus nearest escape-capable / reachable ones
        src = {c[1]: c for c in
               self._nearest_edge_points(ox, oy, 4, self._alive)
               + self._nearest_edge_points(ox, oy, 2)}.values()
        dst = {c[1]: c for c in
               self._nearest_edge_points(dx, dy, 4, self._coalive)
               + self._nearest_edge_points(dx, dy, 2)}.values()
        pairs = sorted(((ds + dd, se, si, de, di)
                        for ds, se, si in src for dd, de, di in dst))
        last_err: Exception = ValueError("empty topology")
        for _, se, si, de, di in pairs:
            if se == de and si <= di:
                e = self._edges[se]
                opt = self._edge_option(e)
                return [(w, opt) for w in e["wps"][si:di + 1]]
            e0, e1 = self._edges[se], self._edges[de]
            try:
                mid = self._shortest_edges(e0["dst"], e1["src"])
            except ValueError as err:
                last_err = err
                continue
            out: List[Tuple[Any, RoadOption]] = [
                (w, self._edge_option(e0)) for w in e0["wps"][si:]]
            for ei in mid:
                e = self._edges[ei]
                opt = self._edge_option(e)
                out.extend((w, opt) for w in e["wps"][1:])  # de-dup joints
            out.extend(
                (w, self._edge_option(e1)) for w in e1["wps"][1:di + 1])
            return out
        raise last_err
