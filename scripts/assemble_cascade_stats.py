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
    """Student-t 95% CI on the mean. Keeps the UNROUNDED values under
    `_raw` so downstream gap math never runs on display-rounded numbers
    (ADVICE r4: a borderline excludes_zero must not flip on rounding);
    `_raw` is stripped before the artifact is serialized."""
    v = np.asarray(vals, float)
    n = len(v)
    mean = float(np.mean(v))
    if n < 2:
        return dict(n=n, mean=round(mean, 4), ci95=None, values=list(v),
                    _raw=v)
    sem = float(np.std(v, ddof=1)) / math.sqrt(n)
    return dict(n=n, mean=round(mean, 4),
                ci95=round(_tcrit(n - 1) * sem, 4),
                values=[round(float(x), 4) for x in v],
                _raw=v)


# config keys that attest where a seed's numbers came from; copied into
# each seed row so the artifact is self-describing (ADVICE r4 medium:
# provenance lived only in scripts/R4_RECOVERY_STATUS.md, invisible to
# readers of the JSON)
_PROV_KEYS = ("encoder", "encoder_sha256", "code_rev",
              "encoder_provenance", "reconstructed_from")


def _provenance(cfg, statsdir):
    prov = {k: cfg[k] for k in _PROV_KEYS if cfg.get(k)}
    # a run that predates sha recording: attest the file as it exists NOW,
    # clearly labelled — the file may have been rewritten since the run
    if prov.get("encoder") and "encoder_sha256" not in prov:
        path = prov["encoder"]
        if os.path.exists(path):
            import hashlib

            with open(path, "rb") as f:
                prov["encoder_sha256_at_assembly"] = hashlib.sha256(
                    f.read()).hexdigest()
    return prov


def _encoder_identity(prov):
    """One short, stable identity label per seed for heterogeneity
    detection (full detail stays in the per-seed provenance rows)."""
    sha = prov.get("encoder_sha256") or prov.get("encoder_sha256_at_assembly")
    if sha:
        return f"sha256:{sha[:12]}"
    if prov.get("encoder_provenance"):
        return prov["encoder_provenance"].split(":")[0]  # e.g. "pre-wipe encoder"
    return prov.get("encoder") or "init-only (no encoder)"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--statsdir", default="/tmp/device_scale/stats")
    p.add_argument("--out", default="BENCH_r3_cascade_stats.json")
    p.add_argument("--prereg-max-seed", type=int, default=4,
                   help="seeds <= this form the pre-registered grid; "
                        "higher seeds are post-hoc extension and the "
                        "artifact reports both analyses")
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
                             provenance=_provenance(cfg, args.statsdir),
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

    def _welch_gaps(trained_rows, random_rows):
        out = {}
        for m in METRICS:
            tv = np.asarray([r[m] for r in trained_rows
                             if r[m] is not None], float)
            rv = np.asarray([r[m] for r in random_rows
                             if r[m] is not None], float)
            if len(tv) >= 2 and len(rv) >= 2:
                # Welch CI on the difference of seed means, with the
                # Welch-Satterthwaite df and Student-t critical value —
                # computed from the UNROUNDED seed values
                st = (np.std(tv, ddof=1) ** 2) / len(tv)
                sr = (np.std(rv, ddof=1) ** 2) / len(rv)
                df = (st + sr) ** 2 / (
                    st ** 2 / max(len(tv) - 1, 1)
                    + sr ** 2 / max(len(rv) - 1, 1) + 1e-12)
                half = _tcrit(df) * math.sqrt(st + sr)
                gap = float(np.mean(tv) - np.mean(rv))
                out[m] = dict(n_trained=len(tv), n_random=len(rv),
                              gap=round(gap, 4), ci95=round(half, 4),
                              excludes_zero=bool(abs(gap) > half),
                              direction="trained" if gap > 0 else "random")
        return out

    gaps = {}
    preregistered = None
    if "trained" in arms and "random" in arms:
        gaps = _welch_gaps(arms["trained"]["seeds"], arms["random"]["seeds"])
        # the PRE-REGISTERED grid is seeds <= prereg-max-seed (default 4:
        # the 5+5 design); extension seeds added post hoc must not
        # silently absorb it — both analyses ship side by side
        pre_t = [r for r in arms["trained"]["seeds"]
                 if r["seed"] is not None and r["seed"] <= args.prereg_max_seed]
        pre_r = [r for r in arms["random"]["seeds"]
                 if r["seed"] is not None and r["seed"] <= args.prereg_max_seed]
        if (len(pre_t), len(pre_r)) != (len(arms["trained"]["seeds"]),
                                        len(arms["random"]["seeds"])):
            preregistered = dict(
                note=(f"seeds 0-{args.prereg_max_seed} are the "
                      "pre-registered grid; later seeds are a FIXED-SIZE "
                      "post-hoc extension declared before launch "
                      "(scripts/run_r5_camroute_ext.sh). The "
                      "pre-registered analysis is preserved here; the "
                      "top-level gaps use all seeds and are labelled "
                      "extended."),
                gaps=_welch_gaps(pre_t, pre_r),
                **{arm: {m: {k: v for k, v in _ci(
                    [r[m] for r in rows if r[m] is not None]).items()
                    if k != "_raw"} for m in METRICS}
                   for arm, rows in (("trained", pre_t), ("random", pre_r))})
    for a in arms.values():  # _raw was math-only; keep the artifact clean
        for m in METRICS:
            if m in a:
                a[m].pop("_raw", None)

    # encoder-heterogeneity audit over the trained arm (ADVICE r4 medium):
    # if seeds ran against different encoder instances, say so in the
    # artifact itself so a null result can't be silently blamed on mixing
    heterogeneity = None
    if "trained" in arms:
        idents = {}
        for row in arms["trained"]["seeds"]:
            idents.setdefault(
                _encoder_identity(row["provenance"]), []).append(row["seed"])
        if len(idents) > 1:
            heterogeneity = dict(
                distinct_encoder_instances=len(idents),
                seeds_by_instance={str(k): v for k, v in idents.items()},
                note=("trained seeds ran against more than one encoder "
                      "instance; encoder-instance variation is folded into "
                      "the trained arm's seed variance. This widens the CI "
                      "and can also SHIFT the arm mean (e.g. a weaker "
                      "retrain biases it down) — per-seed provenance above "
                      "is the record for attributing either effect."))

    b = budget if (budget and "per_row" not in (budget or {})) else \
        (budgets[0] if budgets else {})
    if camroute:
        proto = ("CAMERA-ROUTE protocol (route raster blanked from the "
                 "encoder input, dis/theta masked from the policy obs — "
                 "route geometry must be perceived from the camera's "
                 "painted ribbon; the configuration where the encoder is "
                 "load-bearing, BENCH_r3_scale.json camroute_reeval)")
    else:
        proto = ("standard moving-traffic protocol (the "
                 "corner-floor-breaking configuration)")
    # encoder description is DERIVED from the per-seed provenance rows,
    # never hardcoded (ADVICE r4 medium)
    n_inst = (heterogeneity["distinct_encoder_instances"]
              if heterogeneity else 1)
    enc = ("trained arm: frozen pretrained DANet"
           + (" (camroute-blanked pretraining)" if camroute else "")
           + f", {n_inst} distinct encoder instance"
           + ("s — see encoder_heterogeneity" if n_inst > 1 else "")
           + "; per-seed path/sha256/code-rev in arms.*.seeds[*]."
             "provenance; random arm: same architecture, init-only")
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
        encoder_heterogeneity=heterogeneity,
        arms=arms,
        gaps=gaps,
        preregistered=preregistered,
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
