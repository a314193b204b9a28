"""Summarize a training proof run's workspace into the per-bucket table.

Reads <workspace>/steps.jsonl (one record per step: step, num_tokens, t,
total) and prints:
  - per-num_tokens-bucket: step count, first-hit (compile) wall time, warm
    median / p90 step time
  - loss trajectory: median total over windows of the run
  - resume audit: any step index that appears twice (the pre-kill tail and
    its re-executed replay after `--checkpoint latest`) is reported, proving
    where the resumed run rejoined.

Usage: python tools/summarize_proof_run.py workspace/proof_r5 [--md]
"""

import argparse
import json
from pathlib import Path

import numpy as np


def load(workspace):
    recs = []
    with (Path(workspace) / "steps.jsonl").open() as f:
        for line in f:
            recs.append(json.loads(line))
    return recs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workspace")
    ap.add_argument("--md", action="store_true", help="markdown table output")
    args = ap.parse_args()
    recs = load(args.workspace)

    # Resume audit: duplicated step indices = replayed window after resume.
    seen, dup = {}, []
    for i, r in enumerate(recs):
        if r["step"] in seen:
            dup.append(r["step"])
        seen[r["step"]] = i
    if dup:
        print(f"resume: steps {min(dup)}..{max(dup)} executed twice "
              f"(killed after {min(dup) + len(dup) - 1}, resumed from checkpoint {min(dup) - 1 if min(dup) else 0})")
    else:
        print("resume: no replayed steps (single uninterrupted run)")

    # Keep the LAST execution of each step index (the resumed run's view).
    by_step = {r["step"]: r for r in recs}
    ordered = [by_step[s] for s in sorted(by_step)]

    buckets = {}
    for r in recs:
        buckets.setdefault(r["num_tokens"], []).append(r["t"])
    print()
    hdr = ("| num_tokens | steps | first-hit s (compile) | warm median s | warm p90 s |"
           if args.md else "num_tokens  steps  first_hit_s  warm_median_s  warm_p90_s")
    print(hdr)
    if args.md:
        print("|---|---|---|---|---|")
    for nt in sorted(buckets):
        ts = buckets[nt]
        # every cold hit (compile) is >5x the bucket median; report the first,
        # exclude all of them from the warm stats (vis/checkpoint steps stay in)
        med = float(np.median(ts))
        warm = [t for t in ts if t < 5 * med] or ts
        row = (nt, len(ts), round(ts[0], 1), round(float(np.median(warm)), 3),
               round(float(np.percentile(warm, 90)), 3))
        print(("| {} | {} | {} | {} | {} |" if args.md else "{:10}  {:5}  {:11}  {:13}  {:10}").format(*row))

    print()
    n = len(ordered)
    w = max(1, n // 6)
    hdr = "| steps | median total loss |" if args.md else "steps       median_total"
    print(hdr)
    if args.md:
        print("|---|---|")
    for i in range(0, n, w):
        win = ordered[i:i + w]
        tot = float(np.median([r["total"] for r in win if np.isfinite(r["total"])]))
        rng = f"{win[0]['step']}-{win[-1]['step']}"
        print(("| {} | {} |" if args.md else "{:10}  {}").format(rng, round(tot, 4)))


if __name__ == "__main__":
    main()
