"""Merge chunked pursuit_study part JSONs (same recipe, different
seed-offsets) into one artifact. Chunking bounds the blast radius of the
axon dev-tunnel's occasional hung device sync (CLAUDE.md): each 8-seed
chunk runs in its own process under its own timeout.

    python tools/merge_pursuit_parts.py OUT part1.json part2.json ...
"""
import json
import sys

import numpy as np


def main(argv):
    out_path, parts = argv[0], argv[1:]
    docs = [json.load(open(p)) for p in parts]
    docs.sort(key=lambda d: d["meta"]["seed_offset"])
    meta = dict(docs[0]["meta"])
    for d in docs[1:]:
        for k, v in d["meta"].items():
            if k not in ("seed_offset", "seeds", "tgt_energy") and meta.get(k) != v:
                raise ValueError(f"part meta mismatch on {k}: {meta.get(k)} vs {v}")
    meta["seeds"] = sum(d["meta"]["seeds"] for d in docs)
    meta["chunks"] = [
        (d["meta"]["seed_offset"], d["meta"]["seeds"]) for d in docs
    ]
    fits = [f for d in docs for f in d["fits"]]
    rels = [r for d in docs for r in d["rel_errors"]]
    gens = [g for d in docs for g in d["generations_used"]]
    atts = [a for d in docs for a in d.get("attempts", [1] * len(d["fits"]))]
    secs = [t for d in docs for t in d.get("seed_seconds", [])]
    tgt_energy = docs[0]["meta"]["tgt_energy"]
    fits_a = np.asarray(fits)
    thresholds = {
        k: float(k[3:]) ** 2 * tgt_energy for k in docs[0]["frac_converged"]
    }
    merged = {
        "meta": meta,
        "fits": fits,
        "rel_errors": rels,
        "generations_used": gens,
        "attempts": atts,
        "seed_seconds": secs,
        "frac_converged": {
            k: float(np.mean(fits_a <= v)) for k, v in thresholds.items()
        },
        "median_fit": float(np.median(fits_a)),
        "median_rel": float(np.median(rels)),
        "mean_attempts": float(np.mean(atts)),
        "median_seed_seconds": float(np.median(secs)) if secs else None,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    for k, v in merged["frac_converged"].items():
        print(f"{k}: frac_converged {v:.2f}")
    print(f"median rel {merged['median_rel']:.4f}  "
          f"mean attempts {merged['mean_attempts']:.2f}  "
          f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
