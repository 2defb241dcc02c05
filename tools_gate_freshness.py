#!/usr/bin/env python3
"""Print gate-freshness facts derived from the committed artifacts.

Replays CORRECTNESS_r*.json (latest hash-green round per query) and the
BENCH_FULL.json cost table — the same inputs the registry's import-time
gate ordering uses — and prints the histogram WORKLOG should paste, the
stalest rows, and the rows inside the next ~50-row gate budget.
Usage: python tools_gate_freshness.py [budget]
"""
import sys

from ad_data_pipelines_spark.plans import testdata_queries as tq


def main() -> None:
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    latest = tq.latest_green_rounds()
    hist = tq.gate_freshness_histogram()
    print("freshness histogram (0 = never green):", hist)
    order = list(tq.REGISTRY)
    print(f"\ntier 0 (hand-kept, changed-plan): {tq._GATE_TIER0}")
    print(f"\nnext gate budget ({budget} rows):")
    for i, name in enumerate(order[:budget]):
        print(f"  {i:3d}  r{latest.get(name, 0):<3d} {name}")
    beyond = [
        (name, latest.get(name, 0)) for name in order[budget:]
    ]
    if beyond:
        oldest = min(r for _, r in beyond)
        print(
            f"\noldest beyond budget: r{oldest} — "
            f"{[n for n, r in beyond if r == oldest]}"
        )


if __name__ == "__main__":
    main()
