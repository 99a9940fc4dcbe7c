"""Quantify the town-grid approximation (VERDICT r4 item 5).

envs/town_maps.py replaces the CARLA OpenDRIVE maps with complete
axis-aligned road grids clustered from the reference's own on-road data.
This script turns the documented caveat ("traced routes are therefore
sometimes shorter than CARLA's") into numbers, per eval/train route:

- euclid_m:   straight keypoint-polyline length (hard lower bound on ANY
              routed length, real or grid)
- l1_m:       Manhattan keypoint distance — on an axis-aligned COMPLETE
              grid the shortest routed path equals ~L1, so traced_m/l1_m
              near 1.0 means the tracer takes the direct grid path; the
              REAL town (missing interior links) can only be >= L1, never
              shorter (route_manipulation.py:132-169 dense traces follow
              actual lanes)
- traced_m:   the grid tracer's dense route length (what the device-twin
              eval divides completion by)
- junctions:  heading changes > 30 deg along the trace
- start/end_heading_match: does the trace leave/arrive within 45 deg of
              the XML keypoint yaw (CARLA's intended lane direction)?
- support_frac: fraction of trace points within EPS of a reference
              on-road datum (scenario trigger transforms + route
              endpoints) — trace length riding UNATTESTED grid edges is
              the direct exposure to grid-vs-real divergence

Bias direction (written into BENCH_NOTES.md): real routed length >=
traced length on every route (complete grid can only shortcut, never
detour), and completion = covered/total, so any divergence biases
completion and driving score UP on the device twin relative to CARLA.
The support_frac and ratio tables bound how much.

Run: python scripts/quantify_grid_approx.py [--out BENCH_r5_grid_fidelity.json]
"""
from __future__ import annotations

import argparse
import glob
import json
import math
import os

import numpy as np

REF = "/root/reference"
EPS = 5.0  # m — attestation radius (roads are ~3.5 m lanes)


def _collect_reference_points(town: str) -> np.ndarray:
    """Every on-road (x, y) the reference data pins for `town`:
    scenario trigger transforms + NoCrash route keypoints."""
    pts = []
    for path in glob.glob(f"{REF}/nocrash_scenarios/**/*.json",
                          recursive=True):
        with open(path) as f:
            doc = json.load(f)
        for block in doc.get("available_scenarios", []):
            for tname, scens in block.items():
                if tname != town:
                    continue
                for scen in scens:
                    for ev in scen.get("available_event_configurations", []):
                        tf = ev.get("transform")
                        if tf:
                            pts.append((float(tf["x"]), float(tf["y"])))
                        for other in ev.get("other_actors", {}).values():
                            if isinstance(other, list):
                                for o in other:
                                    pts.append((float(o["x"]), float(o["y"])))
    import xml.etree.ElementTree as ET

    for path in glob.glob(f"{REF}/nocrash_route/**/*.xml", recursive=True):
        root = ET.parse(path).getroot()
        for route in root.iter("route"):
            if route.get("map") != town:
                continue
            for wp in route.iter("waypoint"):
                pts.append((float(wp.get("x")), float(wp.get("y"))))
    return np.asarray(pts, float) if pts else np.zeros((0, 2))


def _routes(path: str):
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    for route in root.iter("route"):
        wps = [(float(w.get("x")), float(w.get("y")), float(w.get("yaw")))
               for w in route.iter("waypoint")]
        yield route.get("id"), route.get("map"), wps


def _polyline_len(pts: np.ndarray) -> float:
    return float(np.linalg.norm(np.diff(pts, axis=0), axis=1).sum())


def _junction_turns(pts: np.ndarray) -> int:
    """Count 90-deg turns. Corner arcs are ~12-point beziers, so
    per-segment heading deltas never exceed 30 deg — instead quantize
    headings to the nearest cardinal and count transitions between
    stable (>=5-segment) runs."""
    d = np.diff(pts, axis=0)
    keep = np.linalg.norm(d, axis=1) > 1e-6
    d = d[keep]
    if len(d) < 2:
        return 0
    h = np.arctan2(d[:, 1], d[:, 0])
    q = np.round(h / (np.pi / 2)).astype(int) % 4
    runs = []
    start = 0
    for i in range(1, len(q) + 1):
        if i == len(q) or q[i] != q[start]:
            if i - start >= 5:
                if not runs or runs[-1] != q[start]:
                    runs.append(q[start])
            start = i
    return max(len(runs) - 1, 0)


def _heading_match(seg: np.ndarray, yaw_deg: float) -> bool:
    if len(seg) < 2:
        return False
    v = seg[-1] - seg[0]
    if np.linalg.norm(v) < 1e-6:
        return False
    h = math.degrees(math.atan2(v[1], v[0]))
    return abs((h - yaw_deg + 180) % 360 - 180) <= 45


def _support_frac(trace: np.ndarray, ref_pts: np.ndarray) -> float:
    if not len(ref_pts) or not len(trace):
        return 0.0
    # chunked nearest-point distance (552 x ~500 is tiny)
    d = np.sqrt(((trace[:, None, :] - ref_pts[None, :, :]) ** 2).sum(-1))
    return float((d.min(axis=1) <= EPS).mean())


def main():
    from cadre_tpu.envs.town_maps import town_map, trace_dense_route

    p = argparse.ArgumentParser()
    p.add_argument("--out", default="BENCH_r5_grid_fidelity.json")
    args = p.parse_args()

    xml_sets = {
        "eval_Town01": f"{REF}/nocrash_route/eval_routes/Nocrash_Town01.xml",
        "eval_Town02": f"{REF}/nocrash_route/eval_routes/Nocrash_Town02.xml",
        "train_Town01_follow_lane":
            f"{REF}/nocrash_route/Nocrash_follow_lane_turn_route.xml",
        "train_Town01_right": f"{REF}/nocrash_route/Nocrash_right_turn_route.xml",
        "train_Town01_left": f"{REF}/nocrash_route/Nocrash_left_turn_route.xml",
        "train_Town01_straight":
            f"{REF}/nocrash_route/Nocrash_straight_turn_route.xml",
    }
    ref_pts = {t: _collect_reference_points(t) for t in ("Town01", "Town02")}
    tables = {}
    for set_name, path in xml_sets.items():
        rows = []
        for rid, town, wps in _routes(path):
            kp = np.asarray([(x, y) for x, y, _ in wps])
            tmap = town_map(town)
            trace = trace_dense_route(tmap, kp)
            euclid = _polyline_len(kp)
            l1 = float(np.abs(np.diff(kp, axis=0)).sum())
            traced = _polyline_len(trace)
            head = len(trace) >= 12
            rows.append(dict(
                route=rid, town=town,
                euclid_m=round(euclid, 1), l1_m=round(l1, 1),
                traced_m=round(traced, 1),
                ratio_traced_l1=round(traced / max(l1, 1e-6), 3),
                junctions=_junction_turns(trace),
                start_heading_match=_heading_match(trace[:12], wps[0][2])
                if head else None,
                end_heading_match=_heading_match(trace[-12:], wps[-1][2])
                if head else None,
                support_frac=round(
                    _support_frac(trace, ref_pts[town]), 3)))
        r = rows
        n_pts = int(len(ref_pts[rows[0]["town"]])) if rows else 0
        tables[set_name] = dict(
            n_routes=len(r),
            reference_points_for_town=n_pts,
            traced_m_total=round(sum(x["traced_m"] for x in r), 1),
            mean_ratio_traced_l1=round(
                float(np.mean([x["ratio_traced_l1"] for x in r])), 3),
            min_ratio_traced_l1=round(
                float(np.min([x["ratio_traced_l1"] for x in r])), 3),
            frac_routes_below_l1=round(
                float(np.mean([x["ratio_traced_l1"] < 0.999 for x in r])), 3),
            start_heading_match_frac=round(float(np.mean(
                [bool(x["start_heading_match"]) for x in r])), 3),
            end_heading_match_frac=round(float(np.mean(
                [bool(x["end_heading_match"]) for x in r])), 3),
            mean_support_frac=round(
                float(np.mean([x["support_frac"] for x in r])), 3),
            mean_junctions=round(
                float(np.mean([x["junctions"] for x in r])), 2),
            routes=rows)

    artifact = dict(
        experiment=("town-grid approximation fidelity vs the reference's "
                    "own on-road data (VERDICT r4 item 5); see module "
                    "docstring for metric definitions and the bias "
                    "argument"),
        attestation_radius_m=EPS,
        bias_statement=(
            "the complete grid can only SHORTCUT relative to the real "
            "town (real routed length >= L1 >= traced when links are "
            "missing), so completion and driving score on the device "
            "twin are biased UP by up to the real/traced length ratio; "
            "ratio_traced_l1 ~= 1.0 and high support_frac bound the "
            "traced geometry itself as faithful — the unbounded residual "
            "is real-town links ABSENT from the grid, whose magnitude "
            "requires the OpenDRIVE map (environmental limit)"),
        tables=tables)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("WROTE", args.out)
    for name, t in tables.items():
        print(f"{name}: n={t['n_routes']} traced_total={t['traced_m_total']}m "
              f"ratio_l1={t['mean_ratio_traced_l1']} "
              f"(min {t['min_ratio_traced_l1']}) "
              f"support={t['mean_support_frac']} "
              f"headings {t['start_heading_match_frac']}/"
              f"{t['end_heading_match_frac']} "
              f"junctions/route={t['mean_junctions']}")


if __name__ == "__main__":
    main()
