"""Mirror per-seed cascade results into the tracked results/camstats/ dir.

Strips each /tmp/device_scale/camstats/*.json down to the config+eval
subset the assembler consumes (minus the bulky eval `rows`), so a /tmp
wipe can never lose a landed seed and the tracked dir stays one uniform
~30-line format (ADVICE r4: random_s3.json was committed with its full
4.5k-line per-iteration train log while the other seeds were eval-only).

Usage: python scripts/track_seed_results.py [--src DIR] [--dst DIR]
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def strip(doc: dict) -> dict:
    ev = {k: v for k, v in doc.get("eval", {}).items() if k != "rows"}
    return dict(config=doc.get("config", {}), eval=ev)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/tmp/device_scale/camstats")
    p.add_argument("--dst", default="results/camstats")
    args = p.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(args.src, "*_s*.json"))):
        out = os.path.join(args.dst, os.path.basename(path))
        with open(path) as f:
            doc = json.load(f)
        with open(out, "w") as f:
            json.dump(strip(doc), f, indent=1)
        print("tracked", out)


if __name__ == "__main__":
    main()
