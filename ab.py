#!/usr/bin/env python
"""Interleaved A/B bench harness — the ONLY accepted evidence for a
perf regression or improvement claim in this repo (see COVERAGE.md
round logs and the bench-method note: cross-round BENCH deltas on a
shared sandbox are machine-noise roulette; local n=3 totals read ~25%
above driver n=7 numbers; uniform inflation is NOT a regression).

Runs the named registry queries under TWO code trees (e.g. the current
repo vs a git-ref worktree), alternating whole sessions A/B/A/B/… so
both variants sample the same machine weather, then reports per-query
session medians and the pairwise ratio. Each session is a fresh
subprocess (two same-named packages cannot share one interpreter), and
each warms the JVM + the shared stages before timing, like bench.py.

    python ab.py --queries a30_market_share,j29_local_supplier_volume \
                 --ref 48fd5db --sessions 3 --reps 2

With --ref omitted, both variants are THIS tree — a null test that
measures the session-noise floor for the chosen queries (useful before
trusting any small delta).

Exit code 0 always: this is a measurement tool, judgment stays human.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.abspath(__file__))

_CHILD = r"""
import os, sys, time, json, statistics
tree, sf_dir, reps, names = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4].split(",")
sys.path.insert(0, tree)
from ad_data_pipelines_spark.session import get_spark
spark = get_spark(app_name="ab")
from ad_data_pipelines_spark.plans.testdata_queries import REGISTRY, warm_shared_stages
spark.range(1_000_000).selectExpr("sum(id) AS s").write.format("noop").mode("overwrite").save()
# JVM/parquet-path warm-up on the smallest SF available; prefer the
# canonical sf0.001 but fall back to the benchmarked dir itself so the
# harness works on any machine/layout (ADVICE r10).
warm_dir = "/root/testdata/sf0.001"
if not os.path.isdir(warm_dir):
    warm_dir = sf_dir
REGISTRY[sorted(REGISTRY)[0]].fn(spark, warm_dir).count()
t0 = time.perf_counter()
warm_shared_stages(spark, sf_dir)
out = {"__shared_build": round(time.perf_counter() - t0, 3)}
for name in names:
    if name == "__shared_build":
        continue
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    out[name] = round(statistics.median(runs), 3)
print("ABCHILD " + json.dumps(out))
"""


def _run_session(tree: str, sf_dir: str, reps: int, names: list[str]) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, tree, sf_dir, str(reps), ",".join(names)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABCHILD "):
            return json.loads(line[len("ABCHILD "):])
    raise RuntimeError(
        f"session under {tree} produced no result:\n{p.stdout[-800:]}\n{p.stderr[-800:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True,
                    help="comma-separated registry names; __shared_build "
                         "is always measured too")
    ap.add_argument("--ref", default=None,
                    help="git ref (worktree is created in /tmp) or an "
                         "existing tree path for variant B; default = "
                         "this tree (null test)")
    ap.add_argument("--sessions", type=int, default=3,
                    help="sessions PER VARIANT (alternated A/B/A/B/…)")
    ap.add_argument("--reps", type=int, default=2,
                    help="runs per query within a session (median)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = [n for n in args.queries.split(",") if n]

    tree_a = REPO
    cleanup = None
    if args.ref is None:
        tree_b = REPO
    elif os.path.isdir(args.ref):
        tree_b = args.ref
    else:
        tree_b = tempfile.mkdtemp(prefix="ab_ref_")
        subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                        tree_b, args.ref], check=True, capture_output=True)
        cleanup = tree_b

    try:
        per = {"A": [], "B": []}
        for s in range(args.sessions):
            for label, tree in (("A", tree_a), ("B", tree_b)):
                r = _run_session(tree, args.sf_dir, args.reps, names)
                per[label].append(r)
                print(f"session {s + 1} {label} ({tree}): "
                      + json.dumps(r), flush=True)
        report = {}
        for name in ["__shared_build"] + names:
            a = [r[name] for r in per["A"] if name in r]
            b = [r[name] for r in per["B"] if name in r]
            if not a or not b:
                continue
            pairwise = [round(x / y, 3) if y else None
                        for x, y in zip(a, b)]
            report[name] = {
                "A_median": statistics.median(a),
                "B_median": statistics.median(b),
                "A_over_B_pairwise": pairwise,
            }
        print(json.dumps({"ab_report": report,
                          "A": tree_a, "B": tree_b,
                          "sessions_per_variant": args.sessions,
                          "reps_per_query": args.reps,
                          "sf_dir": args.sf_dir}))
    finally:
        if cleanup:
            subprocess.run(["git", "-C", REPO, "worktree", "remove",
                            "--force", cleanup], capture_output=True)


if __name__ == "__main__":
    main()
