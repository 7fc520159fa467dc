#!/usr/bin/env python3
"""Repeat-run bench comparator (VERDICT r7 #2): given two bench.json
dumps from back-to-back sf0.1 runs, emit a BENCH-style JSON with both
runs plus the per-query MIN, and flag queries whose min is still far
above a supplied reference level (a real regression, not box noise).

Usage: bench_repeat.py run1.json run2.json [out.json]
"""
import json
import sys


def main() -> None:
    r1 = json.load(open(sys.argv[1]))
    r2 = json.load(open(sys.argv[2]))
    q1, q2 = r1["queries"], r2["queries"]
    names = sorted(set(q1) | set(q2))
    merged = {
        n: {
            "run1_s": q1.get(n, -1.0),
            "run2_s": q2.get(n, -1.0),
            "min_s": min(q1.get(n, -1.0), q2.get(n, -1.0))
            if min(q1.get(n, -1.0), q2.get(n, -1.0)) >= 0
            else max(q1.get(n, -1.0), q2.get(n, -1.0)),
        }
        for n in names
    }
    # totals are sums over EXACTLY the queries in this artifact — state
    # the count so the headline is checkable from the artifact alone
    # (VERDICT r11 #3: an r11 artifact carried subset totals while the
    # notes quoted full-run totals; the protocol string now binds them)
    out = {
        "protocol": "two back-to-back sf0.1 runs, separate JVMs; "
        f"per-query min; totals are sums over the {len(names)} queries "
        "in this artifact's `queries` map",
        "sf": r1.get("sf"),
        "n_queries": len(names),
        "n_queries_run1": sum(1 for v in q1.values() if v > 0),
        "n_queries_run2": sum(1 for v in q2.values() if v > 0),
        "total_run1": round(sum(v for v in q1.values() if v > 0), 2),
        "total_run2": round(sum(v for v in q2.values() if v > 0), 2),
        "total_min": round(sum(v["min_s"] for v in merged.values() if v["min_s"] > 0), 2),
        "queries": merged,
    }
    dest = sys.argv[3] if len(sys.argv) > 3 else "BENCH_repeat.json"
    json.dump(out, open(dest, "w"), indent=1)
    # console: the r7 spike set + anything whose two runs disagree > 3x
    spikes = ["w25_lag_autocorr", "j02_fact_fact_revenue", "a16_derived_cols",
              "a25_grouping_sets", "a27_quantile_bins", "m10_avghash_pairs"]
    print(f"run1 {out['total_run1']}s  run2 {out['total_run2']}s  "
          f"min-total {out['total_min']}s over {len(names)} queries")
    print("\nr7 spike set (run1 / run2 / min):")
    for n in spikes:
        m = merged.get(n)
        if m:
            print(f"  {n:28s} {m['run1_s']:7.2f} {m['run2_s']:7.2f} {m['min_s']:7.2f}")
    noisy = [(n, m) for n, m in merged.items()
             if m["run1_s"] > 0 and m["run2_s"] > 0
             and max(m["run1_s"], m["run2_s"]) / max(min(m["run1_s"], m["run2_s"]), 0.01) > 3]
    if noisy:
        print("\nrun-to-run > 3x disagreement (box noise signature):")
        for n, m in sorted(noisy, key=lambda x: -max(x[1]["run1_s"], x[1]["run2_s"])):
            print(f"  {n:28s} {m['run1_s']:7.2f} {m['run2_s']:7.2f}")


if __name__ == "__main__":
    main()
