"""Versioned artifact materialization (operators/artifacts.py): fresh
hits cost no build, version changes rebuild, crashed builds self-heal,
and the on-disk artifacts match the in-session shared stages."""

from __future__ import annotations
import pytest

import os

from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators import artifacts as art
from ad_data_pipelines_spark.plans.testdata_queries import (
    _shingles_shared,
    materialize_shared_artifacts,
)

from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_materialize_builds_once_then_reads_marker(spark, tmp_path):
    path = str(tmp_path / "a1")
    calls = []

    def build():
        calls.append(1)
        return _docs(spark)

    v = art.artifact_version(rev=1, k=9)
    first = art.materialize(spark, path, v, build)
    assert first.count() == 50
    assert len(calls) == 1
    meta = art.artifact_status(path)
    assert meta == {"version": "k=9,rev=1", "n_rows": 50}

    again = art.materialize(spark, path, v, build)
    assert len(calls) == 1  # fresh hit: marker read only, no build
    assert again.count() == 50


def test_version_change_rebuilds_and_old_content_is_replaced(
    spark, tmp_path
):
    path = str(tmp_path / "a2")
    art.materialize(spark, path, "rev=1", lambda: _docs(spark))
    rebuilt = art.materialize(
        spark, path, "rev=2", lambda: _docs(spark).limit(7)
    )
    assert rebuilt.count() == 7
    assert art.artifact_status(path)["version"] == "rev=2"
    # stale-parameter data is gone, not merged
    assert spark.read.parquet(path).count() == 7


def test_crashed_build_without_marker_is_rebuilt(spark, tmp_path):
    path = str(tmp_path / "a3")
    art.materialize(spark, path, "rev=1", lambda: _docs(spark))
    os.remove(os.path.join(path, art.MARKER))  # crash between data+marker
    calls = []

    def build():
        calls.append(1)
        return _docs(spark)

    art.materialize(spark, path, "rev=1", build)
    assert calls, "marker-less directory must be treated as uncommitted"
    assert art.artifact_status(path)["n_rows"] == 50


def test_failed_rebuild_leaves_live_artifact_untouched(spark, tmp_path):
    path = str(tmp_path / "a4")
    art.materialize(spark, path, "rev=1", lambda: _docs(spark))

    def exploding():
        raise RuntimeError("upstream table missing")

    try:
        art.materialize(spark, path, "rev=2", exploding)
    except RuntimeError:
        pass
    assert art.artifact_status(path)["version"] == "rev=1"
    assert spark.read.parquet(path).count() == 50


def test_marker_is_invisible_to_spark_and_duckdb(spark, duck, tmp_path):
    path = str(tmp_path / "a5")
    art.materialize(spark, path, "rev=1", lambda: _docs(spark))
    assert spark.read.parquet(path).count() == 50
    n = duck.execute(
        f"SELECT count(*) FROM read_parquet('{path}/*.parquet')"
    ).fetchone()[0]
    assert n == 50


@pytest.mark.slow
def test_shared_stage_artifacts_match_in_session_stages(spark, tmp_path):
    root = str(tmp_path / "corpus_artifacts")
    paths = materialize_shared_artifacts(spark, SF_SMALL, root)
    assert set(paths) >= {
        "shingles", "minhash_sigs", "dup_components", "pq_codes",
        "word_grams", "quality_features",
    }
    for p in paths.values():
        assert art.artifact_status(p) is not None

    # disk artifact ≡ the session-shared stage it was written from
    on_disk = spark.read.parquet(paths["shingles"])
    in_session = _shingles_shared(spark, SF_SMALL)
    assert on_disk.columns == in_session.columns
    assert (
        on_disk.exceptAll(in_session).count() == 0
        and in_session.exceptAll(on_disk).count() == 0
    )

    # second materialization is marker-reads only: mtimes untouched
    mtimes = {p: os.path.getmtime(os.path.join(p, art.MARKER))
              for p in paths.values()}
    materialize_shared_artifacts(spark, SF_SMALL, root)
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(p, art.MARKER)) == m


@pytest.mark.slow
def test_shared_rev_bump_rebuilds(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "corpus_artifacts")
    paths = materialize_shared_artifacts(spark, SF_SMALL, root)
    shingles = paths["shingles"]
    v1 = art.artifact_status(shingles)["version"]

    import ad_data_pipelines_spark.plans.testdata_queries as tq

    bumped = tq._SHARED_REV + 1
    monkeypatch.setattr(tq, "_SHARED_REV", bumped)
    materialize_shared_artifacts(spark, SF_SMALL, root)
    v2 = art.artifact_status(shingles)["version"]
    assert v1 != v2 and f"rev={bumped}" in v2


def test_refresh_job_rebuilds_then_noops(spark, tmp_path):
    """The refresh job's first run builds every stage (rebuilt=True);
    an immediate re-run with the same corpus+revision reports every
    stage rebuilt=False and leaves markers untouched (no Spark work)."""
    from ad_data_pipelines_spark.jobs.refresh_artifacts import refresh

    root = str(tmp_path / "arts")
    first = refresh(spark, SF_SMALL, root)
    assert first and all(v["rebuilt"] for v in first.values())
    assert all(v["n_rows"] >= 0 for v in first.values())

    second = refresh(spark, SF_SMALL, root)
    assert set(second) == set(first)
    assert all(not v["rebuilt"] for v in second.values())
    assert {k: v["version"] for k, v in second.items()} == {
        k: v["version"] for k, v in first.items()
    }


@pytest.mark.slow
def test_search_consumes_lsh_bucket_artifact(spark, tmp_path):
    """An ANN search fed the ON-DISK bucket artifact returns exactly
    the session-stage result — the consumer-job side of the artifact
    story (search jobs scan the materialized corpus buckets, never
    re-assign them)."""
    from pyspark.sql import functions as F

    from ad_data_pipelines_spark.operators import similarity as sim
    from ad_data_pipelines_spark.plans import testdata_queries as tq

    root = str(tmp_path / "arts")
    paths = materialize_shared_artifacts(spark, SF_SMALL, root)
    emb = tq.t(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)

    from_artifact = sim.lsh_topk(
        emb, queries, k=5,
        corpus_buckets=spark.read.parquet(paths["lsh_corpus_buckets"]),
    )
    from_session = sim.lsh_topk(
        emb, queries, k=5,
        corpus_buckets=tq._lsh_buckets_shared(spark, SF_SMALL),
    )
    a = sorted(map(tuple, from_artifact.collect()))
    b = sorted(map(tuple, from_session.collect()))
    assert a == b and len(a) > 0
