"""End-to-end curation job: the waterfall composition of normalize →
quality → dedup → mix → pack over real testdata, deterministic across
reruns."""

from __future__ import annotations

from ad_data_pipelines_spark.jobs.curate_corpus import curate
from ad_data_pipelines_spark.plans import testdata_queries as tq
from tests.conftest import SF_SMALL


def test_curate_waterfall_counts_and_determinism(spark, tmp_path):
    docs = tq.t(spark, SF_SMALL, "documents")
    out1 = str(tmp_path / "run1")
    stats = curate(spark, docs, out1, budget=100, seq_tokens=256)

    # waterfall: monotone non-increasing through the filters
    assert stats["n_input"] == 500
    assert 0 < stats["n_after_quality"] <= stats["n_input"]
    assert 0 < stats["n_after_dedup"] <= stats["n_after_quality"]
    assert 0 < stats["n_curated"] <= min(stats["n_after_dedup"], 100)
    assert stats["n_sequences"] > 0

    curated = spark.read.parquet(out1 + "/documents")
    packing = spark.read.parquet(out1 + "/packing")
    assert curated.count() == stats["n_curated"]
    assert packing.count() == stats["n_curated"]
    # normalized text: no uppercase, no double spaces
    import pyspark.sql.functions as F

    bad = curated.filter(
        F.col("text").rlike("[A-Z]") | F.col("text").contains("  ")
    ).count()
    assert bad == 0

    # rerun reproduces identical stats and identical curated rows
    out2 = str(tmp_path / "run2")
    stats2 = curate(spark, docs, out2, budget=100, seq_tokens=256)
    assert stats2 == stats
    a = sorted(map(tuple, curated.collect()))
    b = sorted(map(tuple, spark.read.parquet(out2 + "/documents").collect()))
    assert a == b


def test_curate_decontamination_stage(spark, tmp_path):
    """With an eval source, the waterfall drops BOTH the eval docs and
    every corpus doc sharing an 8-gram with them."""
    import pyspark.sql.functions as F

    docs = tq.t(spark, SF_SMALL, "documents")
    out = str(tmp_path / "run")
    stats = curate(
        spark, docs, out, seq_tokens=256, eval_source="src0"
    )
    assert "n_after_decontam" in stats
    assert stats["n_after_decontam"] <= stats["n_after_dedup"]
    curated = spark.read.parquet(out + "/documents")
    assert curated.filter(F.col("source") == "src0").count() == 0
    assert stats["n_curated"] == stats["n_after_decontam"]


def test_curate_jsonl_export_round_trips(spark, tmp_path):
    """--export-jsonl writes gzip JSONL shards the JSONL reader loads
    back losslessly (same doc_ids, same text)."""
    import glob

    from ad_data_pipelines_spark.sources.jsonl import read_jsonl

    docs = tq.t(spark, SF_SMALL, "documents")
    out = str(tmp_path / "run")
    stats = curate(
        spark, docs, out, budget=60, seq_tokens=256, export_jsonl=True
    )
    assert stats["n_jsonl_shards"] >= 1
    shards = glob.glob(out + "/jsonl/*.json.gz")
    assert shards, "expected gzip JSONL shards"

    back = read_jsonl(spark, out + "/jsonl")
    curated = spark.read.parquet(out + "/documents")
    a = {(r.doc_id, r.text) for r in back.select("doc_id", "text").collect()}
    b = {(r.doc_id, r.text) for r in curated.select("doc_id", "text").collect()}
    assert a == b and len(a) == stats["n_curated"]
