"""Cross-arm ablation report from a round-5 chain log.

Parses the per-scenario JSON summary lines emitted by
`crowdnav_tpu.drivers.evaluate` (each carries `scenario`, success_rate,
ego/social safety, episodes) out of a tpu_chain log, groups them by the
checkpoint (from the preceding START line), and prints the arm x scenario
table with 95% Wilson intervals on the success rates — the evidence table
for VERDICT r4 item 1 (does perceived risk earn its name in this engine?).

Usage: python scripts/ablation_report.py results/r5/chain_p.log [--csv out]
"""
from __future__ import annotations

import argparse
import json
import math
import re


def wilson(p, n, z=1.96):
    if n == 0:
        return (0.0, 1.0)
    den = 1 + z * z / n
    c = (p + z * z / (2 * n)) / den
    h = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return (max(0.0, c - h), min(1.0, c + h))


def parse(path):
    rows = []
    arm = None
    for line in open(path):
        m = re.search(r"START: .*--checkpoint (\S+)", line)
        if m:
            arm = m.group(1).split("/")[-2]
            continue
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "scenario" in d and arm:
            d["arm"] = arm
            rows.append(d)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log")
    p.add_argument("--csv", default=None)
    args = p.parse_args()
    rows = parse(args.log)
    # last result wins if a scenario was re-run for an arm
    table = {}
    for d in rows:
        table[(d["arm"], d["scenario"])] = d
    arms = sorted({a for a, _ in table})
    scenarios = []
    for a, s in table:
        if s not in scenarios:
            scenarios.append(s)

    out_rows = []
    for s in scenarios:
        cells = []
        for a in arms:
            d = table.get((a, s))
            if d is None:
                cells.append("-")
                continue
            n = d["episodes"]
            lo, hi = wilson(d["success_rate"], n)
            cells.append(f"{100*d['success_rate']:.1f} "
                         f"[{100*lo:.1f},{100*hi:.1f}] "
                         f"(n={n}, ego {d['mean_ego_safety']:.3f}, "
                         f"soc {d['mean_social_safety']:.3f})")
            out_rows.append({"scenario": s, "arm": a, "n": n,
                             "success_rate": d["success_rate"],
                             "ci_lo": round(lo, 4), "ci_hi": round(hi, 4),
                             "ego": d["mean_ego_safety"],
                             "social": d["mean_social_safety"],
                             "mean_steps": d["mean_steps"]})
        print(f"{s:32s} | " + " | ".join(cells))
    print("\narms order:", arms)
    if args.csv:
        import csv
        with open(args.csv, "w", newline="") as fp:
            w = csv.DictWriter(fp, fieldnames=list(out_rows[0]))
            w.writeheader()
            w.writerows(out_rows)
        print("wrote", args.csv)


if __name__ == "__main__":
    main()
