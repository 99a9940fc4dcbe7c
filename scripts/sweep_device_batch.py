"""num_envs operating-point sweep for the on-device training loop.

The production runs (scale/camstats/NoCrash drivers) all use num_envs=32.
Encoder MXU utilization rises with batch, so larger env batches may buy
aggregate env-steps/s at the same per-step semantics (PPO batch size
changes with num_envs — this sweeps THROUGHPUT only; pick an operating
point, then retune lr/minibatching if adopting a different batch).

Writes one JSON artifact with steps/s per num_envs (bench_device_env's
chained-scan timing rules — see BENCH_NOTES.md on tunnel-safe
measurement).

Usage: python scripts/sweep_device_batch.py [--out BENCH_r4_batch_sweep.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))          # repo root (script lives in scripts/)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[16, 32, 48, 64, 96])
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", default="BENCH_r4_batch_sweep.json")
    p.add_argument("--no-lock", action="store_true",
                   help="skip the experiment flock (CPU smoke tests)")
    args = p.parse_args()

    if not args.no_lock:
        # serialize against training jobs (bench.py's flock discipline)
        import fcntl
        import os
        os.makedirs("/tmp/device_scale", exist_ok=True)
        lock = os.open("/tmp/device_scale/.lock", os.O_WRONLY | os.O_CREAT,
                       0o644)
        fcntl.flock(lock, fcntl.LOCK_EX)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_device_env import bench_train

    import jax
    rows = []
    for n in args.sizes:
        try:
            sps = bench_train(n, args.steps, repeats=args.repeats)
        except Exception as e:  # tunnel wedge etc: record and continue
            rows.append(dict(num_envs=n, error=str(e)[:200]))
            continue
        rows.append(dict(num_envs=n, env_steps_per_sec=round(sps, 1),
                         steps_per_sec_per_env=round(sps / n, 2)))
        print(rows[-1], flush=True)
    best = max((r for r in rows if "env_steps_per_sec" in r),
               key=lambda r: r["env_steps_per_sec"], default=None)
    artifact = dict(
        experiment=("device-train num_envs throughput sweep (full cascade: "
                    "render + production DANet bf16 + policy banks + PPO "
                    "update in one jitted scan per iteration)"),
        backend=jax.default_backend(),
        steps_per_iter=args.steps, repeats=args.repeats,
        rows=rows, best=best)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("WROTE", args.out, flush=True)


if __name__ == "__main__":
    main()
