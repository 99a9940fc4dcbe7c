"""Generate NoCrash-style route XMLs + scenario JSONs for the simulator.

The reference ships CARLA Town01/02 route files (nocrash_route/*.xml);
for CARLA runs you point --routes at those. This generator produces
equivalent-format routes over a synthetic Manhattan-grid town so the full
training/eval stack (curriculum indexer, scenarios, criteria) runs without
CARLA assets.

Usage: python scripts/gen_routes.py --out routes/ [--seed 0]
"""
from __future__ import annotations

import argparse
import json
import os
import xml.etree.ElementTree as ET

import numpy as np

BLOCK = 60.0   # grid block size (m)
GRID = 5       # intersections per side


def _grid_point(i: int, j: int) -> np.ndarray:
    return np.array([i * BLOCK, j * BLOCK])


def _make_route(rng, kind: str) -> list:
    """Waypoints for one route of the given maneuver family."""
    i, j = rng.randint(1, GRID - 1), rng.randint(1, GRID - 1)
    di, dj = [(1, 0), (-1, 0), (0, 1), (0, -1)][rng.randint(4)]
    p0 = _grid_point(i, j)
    p1 = p0 + np.array([di, dj]) * BLOCK
    pts = [p0, p1]
    heading = np.array([di, dj])
    if kind == "straight":
        pts.append(p1 + heading * BLOCK)
    elif kind in ("left", "right"):
        turn = np.array([-heading[1], heading[0]]) if kind == "left" \
            else np.array([heading[1], -heading[0]])
        pts.append(p1 + turn * BLOCK)
    else:  # follow_lane: several legs with alternating turns
        cur = p1
        h = heading
        for _ in range(3):
            t = rng.choice([-1, 1])
            h = np.array([-h[1] * t, h[0] * t])
            cur = cur + h * BLOCK
            pts.append(cur.copy())
    return pts


def write_routes(path: str, routes: list, town: str = "SimTown") -> None:
    root = ET.Element("routes")
    for rid, pts in enumerate(routes):
        r = ET.SubElement(root, "route", id=str(rid), map=town)
        for p in pts:
            ET.SubElement(r, "waypoint", x=str(float(p[0])),
                          y=str(float(p[1])), z="0.0", yaw="0.0",
                          pitch="0.0", roll="0.0")
    ET.ElementTree(root).write(path, xml_declaration=True)


def write_scenarios(path: str, routes_by_file: dict, rng) -> None:
    """Trigger annotations sampled along the generated routes."""
    events = []
    for pts_list in routes_by_file.values():
        for pts in pts_list:
            for p0, p1 in zip(pts[:-1], pts[1:]):
                mid = (np.asarray(p0) + np.asarray(p1)) / 2
                stype = "Scenario" + str(rng.randint(1, 11))
                events.append({
                    "available_event_configurations": [
                        {"transform": {"x": float(mid[0]),
                                       "y": float(mid[1]),
                                       "z": 0.0, "yaw": 0.0}}],
                    "scenario_type": stype,
                })
    blob = {"available_scenarios": [{"SimTown": events}]}
    with open(path, "w") as f:
        json.dump(blob, f, indent=1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="routes")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--per-family", type=int, default=4)
    args = p.parse_args()
    rng = np.random.RandomState(args.seed)
    os.makedirs(args.out, exist_ok=True)

    families = {
        "nocrash_follow_lane.xml": "follow_lane",
        "nocrash_right_turn.xml": "right",
        "nocrash_left_turn.xml": "left",
        "nocrash_straight.xml": "straight",
        "nocrash_eval.xml": "follow_lane",
    }
    routes_by_file = {}
    for fname, kind in families.items():
        routes = [_make_route(rng, kind) for _ in range(args.per_family)]
        write_routes(os.path.join(args.out, fname), routes)
        routes_by_file[fname] = routes
        print(f"wrote {fname}: {len(routes)} routes")
    write_scenarios(os.path.join(args.out, "scenarios.json"),
                    routes_by_file, rng)
    print("wrote scenarios.json")


if __name__ == "__main__":
    main()
