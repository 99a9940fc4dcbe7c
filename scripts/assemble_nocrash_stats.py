"""Assemble BENCH_r5_nocrash.json from multi-seed NoCrash runs.

Reads per-seed artifacts written by scripts/run_nocrash_eval.py
(--workdir .../nocrash_r5_s{seed} --out .../seed_{seed}.json) and
reports, per town x traffic tier, mean +/- 95% Student-t CI over
training seeds for completion and driving score, with per-seed rows and
encoder/code provenance (VERDICT r4 items 4 + 7).

Usage: python scripts/assemble_nocrash_stats.py --statsdir DIR --out FILE
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
    from scipy.stats import t

    return float(t.ppf(0.975, max(df, 1.0)))


def _ci(vals):
    v = np.asarray(vals, float)
    n = len(v)
    if n == 0:
        return dict(n=0, mean=None, ci95=None, values=[])
    mean = float(np.mean(v))
    if n < 2:
        return dict(n=n, mean=round(mean, 4), ci95=None,
                    values=[round(float(x), 4) for x in v])
    sem = float(np.std(v, ddof=1)) / math.sqrt(n)
    return dict(n=n, mean=round(mean, 4),
                ci95=round(_tcrit(n - 1) * sem, 4),
                values=[round(float(x), 4) for x in v])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--statsdir", default="/tmp/device_scale/nocrash_r5")
    p.add_argument("--out", default="BENCH_r5_nocrash.json")
    args = p.parse_args()

    docs = []
    for path in sorted(glob.glob(os.path.join(args.statsdir,
                                              "seed_*.json"))):
        with open(path) as f:
            docs.append(json.load(f))
    if not docs:
        raise SystemExit(f"no seed_*.json under {args.statsdir}")

    seeds = []
    for doc in docs:
        cfg = doc["config"]
        row = dict(seed=cfg.get("seed"),
                   encoder=cfg.get("encoder"),
                   encoder_sha256=cfg.get("encoder_sha256"),
                   code_rev=cfg.get("code_rev"),
                   total_env_steps=cfg.get("total_env_steps"),
                   towns={})
        for town, tiers in doc["eval"].items():
            # back-compat: a flat (tier-less) eval block is "regular"
            if "mean_completion" in tiers:
                tiers = {"regular": tiers}
            row["towns"][town] = {
                tier: {m: t.get(m) for m in METRICS}
                | {"errors": t.get("errors")}
                for tier, t in tiers.items()}
        seeds.append(row)

    tables = {}
    for town in sorted({t for s in seeds for t in s["towns"]}):
        tables[town] = {}
        tier_names = sorted({tn for s in seeds
                             for tn in s["towns"].get(town, {})})
        for tier in tier_names:
            vals = {m: [s["towns"][town][tier][m] for s in seeds
                        if tier in s["towns"].get(town, {})
                        and s["towns"][town][tier][m] is not None]
                    for m in METRICS}
            tables[town][tier] = {m: _ci(v) for m, v in vals.items()}

    protocol = docs[0].get("protocol", {})
    artifact = dict(
        experiment=("multi-seed NoCrash protocol on the device twin: "
                    f"{len(seeds)} training seeds, ensemble eval per "
                    "town x NoCrash traffic tier; mean +/- Student-t "
                    "95% CI over seeds (VERDICT r4 item 4)"),
        protocol=protocol,
        per_seed=seeds,
        tables=tables)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("WROTE", args.out)
    for town, tiers in tables.items():
        for tier, ms in tiers.items():
            c, d = ms["mean_completion"], ms["mean_driving_score"]
            print(f"  {town}/{tier}: completion {c['mean']} +/- {c['ci95']}"
                  f" | driving score {d['mean']} +/- {d['ci95']}"
                  f" (n={c['n']})")


if __name__ == "__main__":
    main()
