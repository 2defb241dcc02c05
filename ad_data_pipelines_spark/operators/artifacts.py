"""Versioned on-disk artifact materialization — the cross-job twin of
the session-scoped `_shared` memo (plans/testdata_queries.py).

A production corpus pipeline computes its expensive per-corpus
artifacts (MinHash signatures, LSH buckets, IVF cell assignments, PQ
code tables, word n-gram tables, quality signals) ONCE per corpus
version in a scheduled upstream job; every consumer reads the
materialized table instead of re-deriving it. The reference runs the
same shape for ingestion state (first-seen SQLite registry,
`data_ingestion/folder_import.R:9-213`); here the artifact IS a parquet
directory any Spark job can scan.

Contract:
  * An artifact is a parquet directory plus an `_ARTIFACT.json` marker
    written LAST — marker presence is the commit point. A crashed
    build leaves data without a marker (or a `.build.tmp` sibling) and
    is rebuilt on the next call; readers of the previous artifact are
    never exposed to a half-written directory.
  * The marker records a caller-supplied `version` string that must
    encode every build parameter (corpus revision, n_hashes, bands,
    k, …). A version mismatch triggers a rebuild — rebuild-on-
    version-change, never silent reuse of stale parameters.
  * Rebuilds write into a sibling tmp directory and swap via two
    renames (atomic on POSIX/HDFS — same caveat-and-pattern as
    `partitioning.compact_parquet` and the JDBC staged swap,
    sources/writers.py ← `data_ingestion/pg_import.R:288-313`).
  * Underscore-prefixed marker files are invisible to Spark's file
    index (the `_SUCCESS` convention) and to `*.parquet` globs, so
    the directory reads cleanly from Spark and DuckDB alike.

Artifacts that downstream jobs JOIN on a key at scale should be
bucketed instead of plain parquet — `dedup.dup_components_table` /
`similarity.lsh_corpus_table` are the bucketed variants of this
pattern (zero-Exchange consumer joins); this module is the generic
unbucketed path plus the freshness contract.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

#: marker filename; the leading underscore hides it from Spark scans
MARKER = "_ARTIFACT.json"


def artifact_version(**params) -> str:
    """Stable version string from build parameters: sorted k=v pairs.
    Include everything that changes the artifact's content — corpus
    revision, algorithm knobs, code revision."""
    return ",".join(f"{k}={params[k]}" for k in sorted(params))


def artifact_status(path: str) -> dict | None:
    """The artifact's marker dict, or None when absent/unreadable
    (no marker == no committed artifact — rebuild)."""
    try:
        with open(os.path.join(path, MARKER)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def materialize(
    spark: SparkSession,
    path: str,
    version: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the artifact at `path`, building it only when missing or
    version-stale. `build` is invoked lazily — a fresh hit costs one
    marker read, no Spark job.

    The returned DataFrame reads from disk, so consumers get parquet
    scan benefits (column pruning, predicate pushdown, footer stats)
    rather than a recomputed lineage.

    Single-writer contract: concurrent rebuilds of the SAME artifact
    path race on the shared tmp directory — serialize refreshes per
    artifact in the orchestrator (the refresh job is the intended
    sole writer; concurrent READERS are always safe, they see either
    the old committed directory or the new one).
    """
    meta = artifact_status(path)
    if meta is not None and meta.get("version") == version:
        return spark.read.parquet(path)

    tmp = path.rstrip("/") + ".build.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    build().write.mode("overwrite").parquet(tmp)
    n_rows = spark.read.parquet(tmp).count()
    with open(os.path.join(tmp, MARKER), "w") as fh:
        json.dump({"version": version, "n_rows": int(n_rows)}, fh)

    old = path.rstrip("/") + ".build.old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return spark.read.parquet(path)
