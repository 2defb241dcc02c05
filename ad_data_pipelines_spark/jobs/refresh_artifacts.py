"""Corpus-artifact refresh job: the scheduled upstream step that makes
the `_shared` pattern real end-to-end.

Run it per corpus revision (cron / orchestrator):

    spark-submit -m ad_data_pipelines_spark.jobs.refresh_artifacts \
        --corpus /data/corpus/sf0.1 --root /data/artifacts/sf0.1

Every session-shared stage (MinHash signatures, LSH pairs+buckets,
dup components, SimHash, IVF cells, PQ codes, word grams, quality
signals) materializes as a versioned parquet artifact
(operators/artifacts.py contract): a re-run with an unchanged
(corpus, revision) version is marker reads only — no Spark jobs —
while a version bump rebuilds exactly the stale stages. Consumer jobs
read the artifact directories instead of re-deriving the chains.

Prints ONE JSON line: {stage: {path, version, n_rows, rebuilt}}.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from ad_data_pipelines_spark.operators import artifacts as _art
from ad_data_pipelines_spark.plans.testdata_queries import (
    materialize_shared_artifacts,
)


def refresh(
    spark: SparkSession, corpus_dir: str, root: str
) -> dict[str, dict]:
    """Materialize every shared corpus stage under `root`; returns
    per-stage {path, version, n_rows, rebuilt} (rebuilt=False when the
    existing artifact's version already matched — a marker read)."""
    import os

    before = {}
    for name in os.listdir(root) if os.path.isdir(root) else []:
        st = _art.artifact_status(os.path.join(root, name))
        if st is not None:
            before[name] = (st["version"], os.path.getmtime(
                os.path.join(root, name, _art.MARKER)))
    paths = materialize_shared_artifacts(spark, corpus_dir, root)
    out = {}
    for name, path in paths.items():
        st = _art.artifact_status(path)
        marker_mtime = os.path.getmtime(os.path.join(path, _art.MARKER))
        prev = before.get(name)
        out[name] = {
            "path": path,
            "version": st["version"],
            "n_rows": st["n_rows"],
            "rebuilt": prev is None
            or prev[0] != st["version"]
            or prev[1] != marker_mtime,
        }
    return out


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", required=True,
                    help="corpus directory (documents/embeddings parquet)")
    ap.add_argument("--root", required=True,
                    help="artifact root directory (one subdir per stage)")
    args = ap.parse_args(argv)

    from ad_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="refresh_artifacts")
    print(json.dumps(refresh(spark, args.corpus, args.root)))


if __name__ == "__main__":
    main()
