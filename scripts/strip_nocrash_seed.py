"""Track an eval-only mirror of a NoCrash per-seed artifact (strip bulky
train + per-episode rows) into a results dir, so a /tmp wipe cannot lose
a landed seed. Usage: strip_nocrash_seed.py SEED_JSON DEST_DIR"""
import json
import os
import sys


def main():
    src, dst_dir = sys.argv[1], sys.argv[2]
    with open(src) as f:
        doc = json.load(f)
    for town in doc.get("eval", {}).values():
        for tier in town.values():
            if isinstance(tier, dict):
                tier.pop("rows", None)
    doc.get("train", {}).pop("rows", None)
    os.makedirs(dst_dir, exist_ok=True)
    out = os.path.join(dst_dir, os.path.basename(src))
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print("tracked", out)


if __name__ == "__main__":
    main()
