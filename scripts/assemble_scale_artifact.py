"""Assemble BENCH_r2_scale.json from the device-scale experiment arms.

Reads the per-arm JSONs written by scripts/run_device_scale.py (standard /
dense / hazards / camroute_trained / camroute_random, whichever exist under
--workdir), plus the throughput sweep (sweep.jsonl), and writes one artifact
with per-arm training-curve summaries, held-out ensemble-eval results, and
the trained-vs-random camroute comparison at 9.6M env-steps.

Usage: python scripts/assemble_scale_artifact.py \
    [--workdir /tmp/device_scale] [--out BENCH_r2_scale.json]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

ARMS = ["standard", "standard_traffic", "standard_traffic_ext", "dense",
        "hazards", "camroute_trained", "camroute_random"]


def summarize_arm(doc: dict) -> dict:
    rows = doc["train"]["rows"]
    comps = [r["mean_completion"] for r in rows if r["episodes_done"] > 0]
    third = max(1, len(comps) // 3)
    return dict(
        config=doc["config"],
        train=dict(
            wall_s=doc["train"]["wall_s"],
            median_env_steps_per_sec=doc["train"][
                "median_env_steps_per_sec"],
            total_env_steps=doc["config"]["total_env_steps"],
            first_third_mean_completion=round(
                float(np.mean(comps[:third])), 4) if comps else None,
            final_third_mean_completion=round(
                float(np.mean(comps[-third:])), 4) if comps else None,
            best_iteration_completion=round(max(comps), 4)
            if comps else None,
        ),
        eval={k: doc["eval"][k] for k in
              ("members", "episodes", "mean_completion",
               "mean_driving_score", "error_histogram")},
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/device_scale")
    p.add_argument("--out", default="BENCH_r2_scale.json")
    args = p.parse_args()

    arms = {}
    for arm in ARMS:
        path = os.path.join(args.workdir, f"{arm}.json")
        if os.path.exists(path):
            with open(path) as f:
                arms[arm] = summarize_arm(json.load(f))

    sweep = []
    sweep_path = os.path.join(args.workdir, "sweep.jsonl")
    if os.path.exists(sweep_path):
        with open(sweep_path) as f:
            sweep = [json.loads(line) for line in f if line.strip()]

    cascade = None
    if "camroute_trained" in arms and "camroute_random" in arms:
        t, r = arms["camroute_trained"], arms["camroute_random"]

        def gap(key):
            tv = t["eval"][key]
            rv = r["eval"][key]
            return round(tv - rv, 4) if None not in (tv, rv) else None

        cascade = dict(
            protocol=("camera-route (route-raster input plane blanked; "
                      "geometry only reachable through the camera) at "
                      "9.6M env-steps/arm on the device-resident path — "
                      "the BENCH_r3_cascade_camroute.json protocol at "
                      "~50x the step budget"),
            ensemble_completion_gap=gap("mean_completion"),
            ensemble_driving_score_gap=gap("mean_driving_score"),
        )

    artifact = dict(
        experiment=("device-resident scale study: cascade PPO at 9.6M "
                    "env-steps/arm (1500 iterations x 32 envs x 200 "
                    "steps) with the route-length-scaled episode timeout "
                    "active, held-out on-device K=8 ensemble eval per arm"),
        findings=dict(
            corner_floor=(
                "BROKEN by the standard_traffic arm (in-graph NPC "
                "car-following traffic + red-light stops, 9.6M steps, "
                "random encoder): eval completion 0.73 vs the 0.20-0.45 "
                "round-2 plateau, 50/115 episodes complete the full "
                "route, and the error histogram contains ZERO route "
                "deviations/timeouts — remaining failures are traffic "
                "interactions (collisions), not corners"),
            collision_rate_vs_budget=(
                "standard_traffic_ext warm-starts the winner arm "
                "(snap_01500 + saved policy banks) for 1500 MORE "
                "iterations: at 19.2M cumulative env-steps the held-out "
                "ensemble eval reaches 0.855 completion / 72.5 driving "
                "score (9.6M: 0.731 / 55.9) with successes 55/81 and the "
                "collision rate roughly HALVED (65/115 episodes -> 26/81) "
                "— still zero route deviations/timeouts. Collision "
                "avoidance is budget-bound, not capability-bound"),
            camroute_reeval=(
                "both camroute arms' evals were re-run under current "
                "code: the originals terminated EVAL episodes on "
                "overspeed, a training-only rule (env_wrapper.py:435-441, "
                "223/242 camroute_trained episodes ended 'exceed speed'), "
                "and predate the in-graph NPC traffic default. Under the "
                "shared corrected protocol (training sections kept "
                "verbatim; NOTE eval now has moving traffic the arms "
                "never trained against): trained 0.552 completion / 38.4 "
                "score vs random 0.152 / 15.0 — the camera-route cascade "
                "gap at 9.6M steps is +0.40 completion / +23.4 driving "
                "score, single seed per arm (the multi-seed grid is "
                "BENCH_r3_cascade_stats.json)"),
        ),
        prior_floors=dict(
            host_dense_ensemble_completion=22.26,
            host_camroute_ensemble_completion=35.3,
            device_150iter_train_completion=45.8),
        arms=arms,
        throughput_sweep=sweep,
        camroute_cascade=cascade,
    )
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("WROTE", args.out)
    for arm, s in arms.items():
        print(f"  {arm}: final-third train completion "
              f"{s['train']['final_third_mean_completion']}, eval "
              f"completion {s['eval']['mean_completion']}, driving score "
              f"{s['eval']['mean_driving_score']}, errors "
              f"{s['eval']['error_histogram']}")
    if cascade:
        print("  camroute trained-vs-random: completion gap "
              f"{cascade['ensemble_completion_gap']}, driving score gap "
              f"{cascade['ensemble_driving_score_gap']}")


if __name__ == "__main__":
    main()
