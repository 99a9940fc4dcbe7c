"""Assemble the cascade-proof results (VERDICT round-1 items 2 + 8) into
BENCH_r2_cascade.json.

Reads the work dir produced by scripts/run_cascade_proof.sh /
scripts/cascade_proof.py: driver.log (HOLDOUT + ENSEMBLE lines),
trained.jsonl / random.jsonl training curves — and emits one artifact with
the pretrain quality, both completion curves, the ensemble eval protocol
results, and the trained-minus-random gap.
"""
from __future__ import annotations

import argparse
import json
import os
import re

import numpy as np


def read_curve(path):
    if not os.path.exists(path):
        return None
    rows = [json.loads(line) for line in open(path)]
    comp = np.array([r["mean_completion"] for r in rows
                     if r["episodes_finished"] > 0])
    k = max(1, len(comp) // 3)
    return {
        "iterations": len(rows),
        "env_steps": int(sum(r["env_steps"] for r in rows)),
        "median_env_steps_per_sec": float(np.median(
            [r["env_steps_per_sec"] for r in rows[1:]])) if len(rows) > 1
        else None,
        "completion_curve": [round(float(r["mean_completion"]), 2)
                             for r in rows],
        "episodes_finished": int(sum(r["episodes_finished"] for r in rows)),
        "final_third_completion_mean": float(comp[-k:].mean())
        if len(comp) else 0.0,
        "final_third_completion_std": float(comp[-k:].std())
        if len(comp) else 0.0,
        "best_completion": float(comp.max()) if len(comp) else 0.0,
    }


def scan_log(log_paths):
    holdout, ensembles = None, {}
    for lp in log_paths:
        if not os.path.exists(lp):
            continue
        for line in open(lp, errors="replace"):
            m = re.match(r"HOLDOUT (\{.*\})", line.strip())
            if m:
                holdout = json.loads(m.group(1))
            m = re.match(r"ENSEMBLE (\{.*\})", line.strip())
            if m:
                rec = json.loads(m.group(1))
                ensembles[rec["arm"]] = rec
    return holdout, ensembles


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work-dir", default="/tmp/cascade_proof")
    p.add_argument("--out", default="BENCH_r2_cascade.json")
    p.add_argument("--extra-log", default=None,
                   help="additional driver.log to scan (e.g. the pretrain "
                        "log when the RL arms ran in a different work dir)")
    p.add_argument("--blind", action="store_true",
                   help="label the artifact as the blind-route variant "
                        "(privileged dis/theta masked from the policy obs)")
    p.add_argument("--geom", action="store_true",
                   help="assemble the pred_route_geom arm (blind-route RL "
                        "with an encoder pretrained under dis/theta latent "
                        "supervision); compares against the arms in "
                        "--baseline")
    p.add_argument("--baseline", default="BENCH_r2_cascade_blind.json",
                   help="prior blind-route artifact to compare the geom "
                        "arm against")
    p.add_argument("--camera-route", action="store_true",
                   help="label the artifact as the camera-route variant "
                        "(route-raster input plane blanked; route geometry "
                        "must be perceived from camera pixels) and attach "
                        "the probe-gate result")
    p.add_argument("--route-note", default=None,
                   help="free-text route-distribution note appended to the "
                        "variant label (e.g. junction-dense legs)")
    args = p.parse_args()
    w = args.work_dir
    logs = [os.path.join(w, "driver.log"), os.path.join(w, "driver.log.1")]
    if args.extra_log:
        logs.append(args.extra_log)
    holdout, ensembles = scan_log(logs)
    trained = read_curve(os.path.join(w, "trained.jsonl"))
    random_ = read_curve(os.path.join(w, "random.jsonl"))
    if args.geom:
        baseline = json.load(open(args.baseline))
        probe_path = os.path.join(w, "latent_probe.json")
        probe = json.load(open(probe_path)) \
            if os.path.exists(probe_path) else None
        out = {
            "experiment":
                "cascade proof, round 3: blind-route RL with an encoder "
                "pretrained under pred_route_geom (dis/theta latent "
                "supervision). Baseline arms (stock trained encoder, "
                f"random encoder) from {args.baseline}.",
            "pretrain_holdout": holdout,
            "latent_probe": probe,
            "geom_arm": trained,
            "geom_ensemble": ensembles.get("trained"),
            "baseline_trained_final_third":
                baseline["trained_arm"]["final_third_completion_mean"],
            "baseline_random_final_third":
                baseline["random_arm"]["final_third_completion_mean"],
            "baseline_ensemble": baseline.get("ensemble_eval"),
        }
        if trained:
            out["gap_geom_vs_random_final_third"] = round(
                trained["final_third_completion_mean"]
                - out["baseline_random_final_third"], 2)
            out["gap_geom_vs_stock_trained_final_third"] = round(
                trained["final_third_completion_mean"]
                - out["baseline_trained_final_third"], 2)
        if "trained" in ensembles:
            for k, arm in (("gap_geom_ensemble_completion_vs_random",
                            "random"),
                           ("gap_geom_ensemble_completion_vs_stock",
                            "trained")):
                out[k] = round(
                    ensembles["trained"]["mean_completion"]
                    - baseline["ensemble_eval"][arm]["mean_completion"], 2)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({k: v for k, v in out.items()
                          if not isinstance(v, (dict, list)) or v is None},
                         indent=1))
        print(f"wrote {args.out}")
        return
    if args.camera_route:
        variant = "CAMERA-ROUTE (route-raster input plane blanked AND " \
            "dis/theta masked from the policy obs; route geometry must be " \
            "perceived from the camera's painted ribbon, so a random " \
            "encoder's projection carries no route signal)"
    elif args.blind:
        variant = "BLIND-ROUTE (dis/theta masked from the policy obs; " \
            "route geometry only reaches the policy through the " \
            "camera/route-fig -> encoder path)"
    else:
        variant = "base protocol"
    if args.route_note:
        variant += f" — {args.route_note}"
    out = {
        "experiment": "cascade proof: trained frozen CoPM encoder vs random "
                      "frozen encoder, same PPO config (VERDICT r1 item 2) "
                      f"— {variant}",
        "protocol": {
            "pretrain": "12k expert frames, 20 epochs, held-out shard "
                        "per-class eval",
            "rl": "8 SimDrivingEnvs (camera-only hazards), 120 iterations "
                  "x 200 steps, fused PPO updates, frozen encoder"
                  + (", blind-route obs" if args.blind else ""),
            "eval": "8-checkpoint vmapped ensemble, 25 episodes with "
                    "traffic (eval_agent_config.py:51-57 protocol), "
                    "driving score penalty table",
        },
        "pretrain_holdout": holdout,
        "trained_arm": trained,
        "random_arm": random_,
        "ensemble_eval": ensembles,
    }
    if args.camera_route:
        probe_path = os.path.join(w, "latent_probe.json")
        if os.path.exists(probe_path):
            out["latent_probe"] = json.load(open(probe_path))
    if trained and random_:
        out["gap_final_third_completion"] = round(
            trained["final_third_completion_mean"]
            - random_["final_third_completion_mean"], 2)
    if {"trained", "random"} <= set(ensembles):
        out["gap_ensemble_completion"] = round(
            ensembles["trained"]["mean_completion"]
            - ensembles["random"]["mean_completion"], 2)
        out["gap_ensemble_driving_score"] = round(
            ensembles["trained"]["mean_driving_score"]
            - ensembles["random"]["mean_driving_score"], 2)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, dict) or k == "ensemble_eval"},
                     indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
