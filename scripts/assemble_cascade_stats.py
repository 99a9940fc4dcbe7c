"""Assemble BENCH_r3_cascade_stats.json from the multi-seed cascade runs.

Reads /tmp/device_scale/stats/{trained,random}_s{seed}.json (written by
scripts/run_cascade_stats.sh -> run_device_scale.py) and reports, per arm,
mean +/- 95% CI over seeds for the held-out ensemble eval metrics, plus the
trained-minus-random gap with its CI (Welch, normal approximation over
seed means). Pre-registered primary metric: ensemble mean driving score
(it won in both round-2 single-seed artifacts); the README cascade claim
stands only if the gap CI excludes zero.

Usage: python scripts/assemble_cascade_stats.py [--statsdir ...] [--out ...]
"""
from __future__ import annotations

import argparse
import glob
import json
import math
import os

import numpy as np

METRICS = ["mean_completion", "mean_driving_score"]


def _tcrit(df: float) -> float:
    """Two-sided 95% Student-t critical value (z=1.96 understates CIs at
    n=5 seeds/arm — t(4)=2.78)."""
    from scipy.stats import t

    return float(t.ppf(0.975, max(df, 1.0)))


def _ci(vals):
    v = np.asarray(vals, float)
    n = len(v)
    mean = float(np.mean(v))
    if n < 2:
        return dict(n=n, mean=round(mean, 4), ci95=None, values=list(v))
    sem = float(np.std(v, ddof=1)) / math.sqrt(n)
    return dict(n=n, mean=round(mean, 4),
                ci95=round(_tcrit(n - 1) * sem, 4),
                values=[round(float(x), 4) for x in v])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--statsdir", default="/tmp/device_scale/stats")
    p.add_argument("--out", default="BENCH_r3_cascade_stats.json")
    args = p.parse_args()

    arms = {}
    budgets = []  # one per row: a partial/--resume grid must not silently
    camroute = False  # misreport the rest (rows can differ; assert below)
    for arm in ("trained", "random"):
        rows = []
        for path in sorted(glob.glob(
                os.path.join(args.statsdir, f"{arm}_s*.json"))):
            with open(path) as f:
                doc = json.load(f)
            cfg = doc["config"]
            total_iters = (cfg.get("resumed_from_iteration") or 0) + \
                cfg["iterations"]
            budgets.append(dict(
                iterations=total_iters,
                num_envs=cfg["num_envs"],
                steps_per_iter=cfg["steps_per_iter"],
                env_steps_per_seed=(total_iters * cfg["num_envs"]
                                    * cfg["steps_per_iter"])))
            camroute = camroute or bool(cfg.get("camroute"))
            seed = doc["config"].get("seed")
            ev = doc["eval"]
            rows.append(dict(seed=seed,
                             episodes=ev.get("episodes"),
                             error_histogram=ev.get("error_histogram"),
                             **{m: ev.get(m) for m in METRICS}))
        if rows:
            arms[arm] = dict(
                seeds=rows,
                **{m: _ci([r[m] for r in rows if r[m] is not None])
                   for m in METRICS})

    budget = budgets[0] if budgets else None
    if budgets and any(b != budget for b in budgets):
        budget = dict(
            MIXED_BUDGETS_ACROSS_ROWS=True,
            env_steps_per_seed_min=min(
                b["env_steps_per_seed"] for b in budgets),
            env_steps_per_seed_max=max(
                b["env_steps_per_seed"] for b in budgets),
            per_row=budgets)
        print("WARNING: rows ran with differing budgets; "
              "artifact records min/max + per-row budgets")

    gaps = {}
    if "trained" in arms and "random" in arms:
        for m in METRICS:
            t = arms["trained"][m]
            r = arms["random"][m]
            if t["n"] >= 2 and r["n"] >= 2:
                # Welch CI on the difference of seed means, with the
                # Welch-Satterthwaite df and Student-t critical value
                st = (np.std(t["values"], ddof=1) ** 2) / t["n"]
                sr = (np.std(r["values"], ddof=1) ** 2) / r["n"]
                df = (st + sr) ** 2 / (
                    st ** 2 / max(t["n"] - 1, 1)
                    + sr ** 2 / max(r["n"] - 1, 1) + 1e-12)
                half = _tcrit(df) * math.sqrt(st + sr)
                gap = t["mean"] - r["mean"]
                gaps[m] = dict(gap=round(gap, 4), ci95=round(half, 4),
                               excludes_zero=bool(abs(gap) > half),
                               direction="trained" if gap > 0 else "random")

    b = budget if (budget and "per_row" not in (budget or {})) else \
        (budgets[0] if budgets else {})
    if camroute:
        proto = ("CAMERA-ROUTE protocol (route raster blanked from the "
                 "encoder input, dis/theta masked from the policy obs — "
                 "route geometry must be perceived from the camera's "
                 "painted ribbon; the configuration where the encoder is "
                 "load-bearing, BENCH_r3_scale.json camroute_reeval)")
        enc = ("trained arm: DANet pretrained 25 epochs with camroute "
               "blanking on the expert dataset (/tmp/device_scale/enc — "
               "the SAME encoder as the round-3 single-seed camroute "
               "runs); random arm: same architecture, init-only")
    else:
        proto = ("standard moving-traffic protocol (the "
                 "corner-floor-breaking configuration)")
        enc = ("trained arm: DANet pretrained 25 epochs on the balanced "
               "expert dataset (/tmp/pdata2 protocol: phase-balanced "
               "lights, slow traffic mix, roadside props); random arm: "
               "same architecture, init-only")
    artifact = dict(
        experiment=("multi-seed trained-vs-random frozen-encoder study on "
                    f"the device-resident path, {proto}, "
                    f"{b.get('iterations', '?')} iterations x "
                    f"{b.get('num_envs', '?')} envs x "
                    f"{b.get('steps_per_iter', '?')} steps = "
                    f"{b.get('env_steps_per_seed', 0) / 1e6:.2f}M "
                    "env-steps/seed, 6-member snapshot ensembles, held-out "
                    "on-device eval per seed (eval.py protocol)"),
        budget=budget,
        primary_metric=("mean_driving_score — pre-registered before the "
                        "runs (VERDICT.md round-2 item 2); completion is "
                        "secondary"),
        encoder=enc,
        arms=arms,
        gaps=gaps,
    )
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("WROTE", args.out)
    for arm, a in arms.items():
        for m in METRICS:
            if m in a:
                print(f"  {arm} {m}: {a[m]['mean']} +/- "
                      f"{a[m]['ci95']} (n={a[m]['n']})")
    for m, g in gaps.items():
        print(f"  gap {m}: {g['gap']} +/- {g['ci95']} "
              f"(excludes zero: {g['excludes_zero']})")


if __name__ == "__main__":
    main()
