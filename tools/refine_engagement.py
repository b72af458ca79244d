"""Refine-tail engagement audit (VERDICT r3 #4).

Round-3 finding: 35/64 holdout seeds had BIT-IDENTICAL final fitness with
and without the refine tail — the tail's population (the last generation's
parents, ranked by quantised fitness) never contained the best-ever
candidate it was supposed to polish. round-4 fix: refine_boundary() injects
best-ever into parent slot 0 (es/pipeline.py).

This reads benchmarks/quality_gates.json and reports, per split, on how
many PAIRED seeds the refine tail changed/improved the f32-rescored
outcome vs the same engine without the tail.

    python tools/refine_engagement.py --json benchmarks/refine_engagement.json
"""
import argparse
import json
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gates", default="benchmarks/quality_gates.json")
    ap.add_argument("--base", default="int8+sin7")
    ap.add_argument("--refined", default="int8+sin7+refine")
    ap.add_argument("--json", default="benchmarks/refine_engagement.json")
    args = ap.parse_args(argv)

    with open(args.gates) as f:
        doc = json.load(f)
    out = {"base": args.base, "refined": args.refined, "splits": {}}
    for split, blk in doc.get("splits", {}).items():
        res = blk.get("results", {})
        if args.base not in res or args.refined not in res:
            continue
        b = np.asarray(res[args.base]["fits"])
        r = np.asarray(res[args.refined]["fits"])
        n = len(b)
        changed = b != r
        improved = r < b
        regressed = r > b
        out["splits"][split] = {
            "seeds": n,
            "frac_changed": float(np.mean(changed)),
            "frac_improved": float(np.mean(improved)),
            "frac_regressed": float(np.mean(regressed)),
            "median_improvement_ratio": float(np.median(r / b)),
            "median_improvement_ratio_changed_only": (
                float(np.median(r[changed] / b[changed]))
                if changed.any() else None
            ),
        }
        print(f"{split}: {int(changed.sum())}/{n} seeds changed "
              f"({100*np.mean(changed):.0f}%), "
              f"{int(improved.sum())} improved, "
              f"{int(regressed.sum())} regressed, "
              f"median ratio {np.median(r/b):.3f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
