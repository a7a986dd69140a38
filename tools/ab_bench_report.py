#!/usr/bin/env python3
"""Fold the per-round samples sidecars written by tools/ab_bench.sh into
BENCH_AB.json: per-query min-across-rounds for each side, the per-query
code-drift ratio (cur/base), and the two summary numbers that settle a
"did the code get slower" argument — the total ratio (what a naive
cross-round comparison sees, host drift included) and the MEDIAN per-query
ratio (robust to a few unstable queries; ~1.0 means the code is flat and
any total movement is host drift).

Usage: ab_bench_report.py <cur_sha> <base_sha> <rounds> <sf> <out.json>
Reads /tmp/graft_ab_{cur,base}_{1..rounds}.json (Bench samples sidecars).
"""
import json
import statistics
import sys


def side_mins(side, rounds):
    mins = {}
    seen = 0
    for i in range(1, rounds + 1):
        try:
            with open(f"/tmp/graft_ab_{side}_{i}.json") as f:
                samples = json.load(f)["samples"]
        except FileNotFoundError:
            continue
        seen += 1
        for q, v in samples.items():
            vals = v if isinstance(v, list) else [v]
            cur = min(vals)
            mins[q] = min(mins.get(q, cur), cur)
    if seen == 0:
        sys.exit(f"no samples found for side {side!r}")
    return mins, seen


def main():
    cur_sha, base_sha, rounds, sf, out = sys.argv[1:6]
    rounds = int(rounds)
    cur, cur_rounds = side_mins("cur", rounds)
    base, base_rounds = side_mins("base", rounds)
    common = sorted(set(cur) & set(base))
    only_cur = sorted(set(cur) - set(base))
    only_base = sorted(set(base) - set(cur))
    queries = {
        q: {
            "cur": round(cur[q], 4),
            "base": round(base[q], 4),
            "ratio": round(cur[q] / base[q], 4) if base[q] > 0 else None,
        }
        for q in common
    }
    ratios = [v["ratio"] for v in queries.values() if v["ratio"]]
    total_cur = sum(cur[q] for q in common)
    total_base = sum(base[q] for q in common)
    record = {
        "current": cur_sha,
        "baseline": base_sha,
        "rounds": {"cur": cur_rounds, "base": base_rounds},
        "sf": sf,
        "n_common": len(common),
        "total_cur_sec": round(total_cur, 2),
        "total_base_sec": round(total_base, 2),
        "total_ratio": round(total_cur / total_base, 4) if total_base else None,
        "median_query_ratio": round(statistics.median(ratios), 4)
        if ratios else None,
        "worst5": sorted(
            ((q, queries[q]["ratio"]) for q in common if queries[q]["ratio"]),
            key=lambda t: -t[1],
        )[:5],
        "best5": sorted(
            ((q, queries[q]["ratio"]) for q in common if queries[q]["ratio"]),
            key=lambda t: t[1],
        )[:5],
        "only_current": only_cur,
        "only_baseline": only_base,
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(record, f, indent=1, sort_keys=False)
    print(
        f"[ab] {cur_sha} vs {base_sha} on {len(common)} common queries: "
        f"total {record['total_cur_sec']}s vs {record['total_base_sec']}s "
        f"(x{record['total_ratio']}), median per-query ratio "
        f"{record['median_query_ratio']}"
    )
    for q, r in record["worst5"]:
        print(f"[ab]   slowest drift {q}: x{r}")


if __name__ == "__main__":
    main()
