#!/usr/bin/env python
"""Plan-fingerprint compare for bench-regression attribution: executes
the named registry queries at sf0.1 under THIS tree and under a git-ref
worktree (same interpreter trick as ab.py — fresh subprocess per tree),
normalizes expression ids / plan_id / cache-uuid noise out of the FINAL
adaptive plan text, and reports per-query fingerprint equality.

Identical fingerprints + an ab.py null-test noise floor covering the
swing magnitude = the machine-drift attribution the work log records
(the r10 a30 entry is the model for the REAL-regression alternative).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.abspath(__file__))

_CHILD = r"""
import sys, json, re, hashlib
tree, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
sys.path.insert(0, tree)
from ad_data_pipelines_spark.session import get_spark
spark = get_spark(app_name="fingerprint")
from ad_data_pipelines_spark.plans.testdata_queries import REGISTRY, warm_shared_stages
warm_shared_stages(spark, sf_dir)
out = {}
for name in names:
    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    norm = re.sub(r"#\d+L?", "#x", final)
    norm = re.sub(r"plan_id=\d+", "plan_id=x", norm)
    norm = re.sub(r"\[id=#?\d+\]", "[id=x]", norm)
    norm = re.sub(r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}", "uuid", norm)
    norm = re.sub(r"Statistics\([^)]*\)", "Statistics(x)", norm)
    out[name] = hashlib.md5(norm.encode()).hexdigest()[:16]
print("FPCHILD " + json.dumps(out))
"""


def _run(tree: str, sf_dir: str, names: list[str]) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, tree, sf_dir, ",".join(names)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("FPCHILD "):
            return json.loads(line[len("FPCHILD "):])
    raise RuntimeError(
        f"no result from {tree}:\n{p.stdout[-500:]}\n{p.stderr[-800:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--ref", required=True,
                    help="git ref for the comparison worktree")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = [n for n in args.queries.split(",") if n]
    tree_b = tempfile.mkdtemp(prefix="fp_ref_")
    subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                    tree_b, args.ref], check=True, capture_output=True)
    try:
        a = _run(REPO, args.sf_dir, names)
        b = _run(tree_b, args.sf_dir, names)
        report = {
            n: {"this": a.get(n), "ref": b.get(n),
                "identical": a.get(n) == b.get(n)}
            for n in names
        }
        print(json.dumps({"fingerprints": report, "ref": args.ref}))
    finally:
        subprocess.run(["git", "-C", REPO, "worktree", "remove",
                        "--force", tree_b], capture_output=True)


if __name__ == "__main__":
    main()
