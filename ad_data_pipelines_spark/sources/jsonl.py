"""JSONL (line-delimited JSON) source/sink — the LLM-corpus
interchange format (beyond-reference; the reference ingests CSV/VDV
only, but a training-data engine lives on .jsonl/.jsonl.gz drops).

Design points for 100 TB corpora:
  * line-delimited only (`multiLine` stays False): Spark splits plain
    JSONL by byte ranges, so one 500 GB file still fans out across
    executors; multiline JSON is a single-task parse and is refused.
  * corrupt lines are DATA, not exceptions: the read is PERMISSIVE
    with an explicit corrupt-record column, and `split_quarantine`
    separates clean rows from raw broken lines so a bad shard can't
    kill an ingest (the reference's per-chunk retry philosophy,
    pg_import.R:253-268, applied to parse errors).
  * schema is pinned: with no schema given, one whole-file inference
    pass runs first (the manifest reader's S4 policy — sampled
    inference misses late mixed types), then the data read uses the
    EXPLICIT schema + corrupt column. This also sidesteps Spark's
    refusal to filter on an inferred-only corrupt column.
  * compression is transparent on read (.gz/.zst by extension); on
    write it's an option because the downstream consumer dictates it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: Column capturing the raw text of unparseable lines (PERMISSIVE read).
CORRUPT_COL = "_corrupt_record"


def infer_jsonl_schema(
    spark: SparkSession, path: str, **options
) -> StructType:
    """Whole-file schema inference for a JSONL feed (samplingRatio 1.0
    is Spark's JSON default — every line votes, unlike the CSV
    engine's sampled inference)."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    schema = reader.json(path).schema
    return StructType([f for f in schema.fields if f.name != CORRUPT_COL])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    **options,
) -> DataFrame:
    """PERMISSIVE JSONL scan with corrupt-record capture: returns the
    declared columns plus `_corrupt_record` (NULL for clean rows, the
    raw line for broken ones). Pair with `split_quarantine`.

    Implemented as text-source + `from_json` rather than the json
    source: Spark's json scan refuses any query whose pruned schema is
    only the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which
    breaks exactly the quarantine counts this reader exists for. The
    text source has no such restriction, splits by byte ranges the
    same way, decompresses .gz transparently, and `from_json` is the
    same Jackson parse, codegen'd per row.
    """
    if schema is None:
        schema = infer_jsonl_schema(spark, path, **options)
    fields = [f for f in schema.fields if f.name != CORRUPT_COL]
    full = StructType(fields + [StructField(CORRUPT_COL, StringType())])
    parse_opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **{k: str(v) for k, v in options.items()},
    }
    raw = spark.read.text(path)
    return (
        raw.filter(F.length(F.trim("value")) > 0)  # blank lines aren't rows
        .select(F.from_json(F.col("value"), full, parse_opts).alias("__j"))
        .select("__j.*")
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the corrupt column;
    quarantine keeps the FULL row — the raw line for repair plus any
    partially-parsed columns. (Projecting only the corrupt column off
    a raw JSON scan is disallowed by Spark — QUERY_ONLY_CORRUPT_RECORD
    — and the partial columns are what makes triage possible anyway.)
    Both are narrow filters over the same scan — no extra pass."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int = 8,
    **options,
) -> DataFrame:
    """Structured Streaming twin of `read_jsonl` — same text-source +
    `from_json` parse, same corrupt-record column; schema is REQUIRED
    (streams never infer). Stateless per row, so micro-batch results
    equal the batch reader's by construction."""
    fields = [f for f in schema.fields if f.name != CORRUPT_COL]
    full = StructType(fields + [StructField(CORRUPT_COL, StringType())])
    parse_opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **{k: str(v) for k, v in options.items()},
    }
    raw = (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
    )
    return (
        raw.filter(F.length(F.trim("value")) > 0)
        .select(F.from_json(F.col("value"), full, parse_opts).alias("__j"))
        .select("__j.*")
    )


def run_jsonl_ingest_available_now(
    spark: SparkSession,
    src_path: str,
    checkpoint: str,
    clean_path: str,
    quarantine_path: str,
    schema: StructType,
) -> None:
    """Drain a JSONL drop folder once (AvailableNow): clean rows append
    to parquet, broken lines append VERBATIM to a quarantine text
    folder (repair = fix and re-drop; replay is byte-exact). Both
    writes happen in one `foreachBatch`, so a line can never land in
    both; the checkpoint makes re-runs skip already-ingested files —
    the streaming twin of the manifest importer's marker semantics
    (sources/manifest.py, folder_import.R:69-91)."""

    def sink(batch: DataFrame, _epoch: int) -> None:
        clean, bad = split_quarantine(batch)
        clean.write.mode("append").parquet(clean_path)
        bad.select(F.col(CORRUPT_COL).alias("value")).write.mode(
            "append"
        ).text(quarantine_path)

    (
        read_jsonl_stream(spark, src_path, schema)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    single_file: bool = False,
) -> None:
    """JSONL sink. `single_file` coalesces to one output file — only
    for small exports (the CSV sink's S10 caveat applies); large
    corpora keep one file per partition so writes stay parallel."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
