"""Manifest-based incremental folder import (S12) and the typed CSV
reader with schema cache (S4 + the reference's .schema RDS cache).

Reference parity: data_ingestion/folder_import.R:9-213 walks
`<root>/<table>/<file>.csv`, skips files with `.imported` markers,
infers each feed's schema ONCE and caches it so later files reuse it
(pg_import.R:19-51), and appends into the warehouse. Here:
  * markers  → a JSON manifest per table directory (atomic, idempotent;
               equivalent of `_SUCCESS`/Delta-txn-log bookkeeping),
  * schema cache → StructType persisted as JSON per feed,
  * full-file inference → `samplingRatio=1.0` on first read (the
    reference inferred from the whole file deliberately —
    README_APPROACH.md:60-75 — sampling breaks mixed-type columns),
  * NA strings → the reference's list via `nullValue`/`nanValue`.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from urllib.parse import quote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ad_data_pipelines_spark.functions.cleaning import (
    NA_STRINGS,
    nullify_na_strings,
)

MANIFEST_NAME = "_import_manifest.json"
SCHEMA_SUFFIX = ".schema.json"

#: ISO-date shape: distinguishes true date columns from timestamp columns
#: (Spark's string→date CAST would happily truncate '2024-01-01 10:00:00').
_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"


def infer_types_full(
    spark: SparkSession,
    path: str,
    na_strings: list[str] = NA_STRINGS,
    **options,
) -> StructType:
    """Whole-file type inference with an NA-string list — the semantics
    of the reference's `readr::type_convert` pass
    (/root/reference/data_ingestion/pg_import.R:76-102): every row of
    every column votes, NA strings are excluded from voting, and a
    column is only typed T when ALL its non-NA values parse as T.

    Unlike readr (whole file in driver memory), the vote is ONE
    distributed aggregate over try_cast/rlike indicator columns —
    partial+final combinable, so a 1 TB CSV feed infers with a single
    streaming pass and O(n_cols) driver state. Type priority mirrors
    readr: boolean → integer (int32 when the observed range fits,
    else bigint) → double → date → timestamp → string; all-NA columns
    stay string.
    """
    reader = spark.read.option("header", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.csv(path)

    aggs = []
    for c in raw.columns:
        # backtick-quote: feed headers like "a.b" are column names,
        # never struct paths (both F.col and df[...] parse bare dots)
        v = F.trim(F.col("`" + c.replace("`", "``") + "`"))
        v = F.when(v.isin(na_strings), F.lit(None)).otherwise(v)
        qc = c.replace("`", "")
        aggs += [
            F.count(v).alias(f"{qc}__n"),
            F.count(F.when(F.lower(v).isin("true", "false"), 1)).alias(f"{qc}__bool"),
            F.count(v.try_cast("bigint")).alias(f"{qc}__long"),
            F.min(v.try_cast("bigint")).alias(f"{qc}__min"),
            F.max(v.try_cast("bigint")).alias(f"{qc}__max"),
            F.count(v.try_cast("double")).alias(f"{qc}__dbl"),
            # rlike excludes timestamp-shaped strings from the date
            # bucket; try_cast demotes calendar-invalid shapes like
            # '2024-99-99' (readr keeps those character)
            F.count(
                F.when(v.rlike(_DATE_RE) & v.try_cast("date").isNotNull(), 1)
            ).alias(f"{qc}__date"),
            F.count(v.try_cast("timestamp")).alias(f"{qc}__ts"),
        ]
    stats = raw.agg(*aggs).collect()[0].asDict()

    fields = []
    for c in raw.columns:
        qc = c.replace("`", "")
        n = stats[f"{qc}__n"]
        if n == 0:
            typ = "string"
        elif stats[f"{qc}__bool"] == n:
            typ = "boolean"
        elif stats[f"{qc}__long"] == n:
            in32 = (
                stats[f"{qc}__min"] >= -(2**31)
                and stats[f"{qc}__max"] < 2**31
            )
            typ = "int" if in32 else "bigint"
        elif stats[f"{qc}__dbl"] == n:
            typ = "double"
        elif stats[f"{qc}__date"] == n:
            typ = "date"
        elif stats[f"{qc}__ts"] == n:
            typ = "timestamp"
        else:
            typ = "string"
        fields.append(f"`{qc}` {typ}")
    return StructType.fromDDL(", ".join(fields))


def read_csv_typed(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    infer_full: bool = True,
    **options,
) -> DataFrame:
    """Typed CSV scan (S3/S4) with the reference's NA-string policy.

    With no schema: whole-file inference via `infer_types_full` when
    `infer_full` (the reference inferred from the whole file
    deliberately — README_APPROACH.md:60-75 — sampling breaks
    mixed-type columns), else Spark's sampled engine inference. The
    typed read is PERMISSIVE, so NA strings in numeric columns land as
    NULL via failed casts; string-typed columns get the same `na =`
    list applied explicitly afterwards — readr::type_convert nullifies
    NA tokens in character columns too (pg_import.R:83). Whitespace is
    trimmed on read (readr's trim_ws default), matching the trimmed
    vote in `infer_types_full` so a whitespace-padded numeric column
    both infers AND parses as numeric.
    """
    reader = (
        spark.read.option("header", True)
        .option("nullValue", "")
        .option("emptyValue", "")
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is None and infer_full:
        schema = infer_types_full(spark, path, **options)
    if schema is not None:
        df = reader.schema(schema).csv(path)
        str_cols = [
            f.name for f in schema.fields if f.dataType.simpleString() == "string"
        ]
        if str_cols:
            df = df.withColumns(
                {
                    c: nullify_na_strings(
                        F.col("`" + c.replace("`", "``") + "`")
                    )
                    for c in str_cols
                }
            )
        return df
    return reader.option("inferSchema", True).option(
        "samplingRatio", 0.1
    ).csv(path)


def load_schema_cache(feed_dir: str) -> StructType | None:
    p = Path(feed_dir) / f"feed{SCHEMA_SUFFIX}"
    if p.exists():
        return StructType.fromJson(json.loads(p.read_text()))
    return None


def save_schema_cache(feed_dir: str, schema: StructType) -> None:
    p = Path(feed_dir) / f"feed{SCHEMA_SUFFIX}"
    p.write_text(json.dumps(schema.jsonValue()))


def _load_manifest(table_dir: Path) -> set[str]:
    p = table_dir / MANIFEST_NAME
    if p.exists():
        return set(json.loads(p.read_text()))
    return set()


def _save_manifest(table_dir: Path, done: set[str]) -> None:
    p = table_dir / MANIFEST_NAME
    tmp = table_dir / (MANIFEST_NAME + ".tmp")
    tmp.write_text(json.dumps(sorted(done)))
    os.replace(tmp, p)  # atomic on POSIX — marker write can't half-happen


def import_folder(
    spark: SparkSession,
    root: str,
    warehouse: str,
    file_ext: str = ".csv",
) -> dict[str, int]:
    """Incremental import: `<root>/<table>/*.csv` → parquet warehouse,
    skipping files already in the manifest (idempotent re-runs — the
    reference's `.imported` markers, folder_import.R:69-91).

    Each source file lands in its own `source_file=<name>` partition
    directory, written with mode("overwrite"). That makes the
    write+marker pair crash-safe end-to-end: a crash between the
    parquet write and the manifest save re-runs the file on the next
    import as an overwrite of the same directory — no duplicate rows,
    unlike a top-level append. Readers of `<warehouse>/<table>` see
    `source_file` as a string partition column (provenance for free,
    and per-file partition pruning).

    Returns {table: files_imported_this_run}.
    """
    imported: dict[str, int] = {}
    for table_dir in sorted(Path(root).iterdir()):
        if not table_dir.is_dir():
            continue
        table = table_dir.name
        done = _load_manifest(table_dir)
        pending = sorted(
            f.name
            for f in table_dir.iterdir()
            if f.suffix == file_ext and f.name not in done
        )
        if not pending:
            imported[table] = 0
            continue
        schema = load_schema_cache(str(table_dir))
        n = 0
        for fname in pending:
            fpath = str(table_dir / fname)
            df = read_csv_typed(spark, fpath, schema=schema)
            if schema is None:  # first file of the feed defines the schema
                schema = df.schema
                save_schema_cache(str(table_dir), schema)
            part = quote(fname, safe="")  # partition values are URL-coded
            df.write.mode("overwrite").parquet(
                f"{warehouse}/{table}/source_file={part}"
            )
            done.add(fname)
            _save_manifest(table_dir, done)  # marker after idempotent write
            n += 1
        imported[table] = n
    return imported


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    **options,
) -> tuple[DataFrame, DataFrame]:
    """Typed CSV read that SPLITS malformed rows out instead of
    silently nulling them: returns (clean, quarantine) where
    `quarantine` carries each broken row verbatim in `raw_line` for
    triage — the CSV twin of the JSONL source's corrupt-line
    quarantine (sources/jsonl.py), and the batch answer to the
    reference's abort-on-bad-chunk retry loop
    (`data_ingestion/pg_import.R:253-268`): one bad row must neither
    kill the import nor vanish.

    Mechanics: PERMISSIVE mode with `columnNameOfCorruptRecord` — rows
    whose parse fails (wrong column count, unparsable cast under the
    declared schema) land with the raw text in the corrupt column and
    NULLs elsewhere. The split is a map-only filter on that column's
    nullness; both frames come from ONE scan (Spark caches the parsed
    batch per task). The corrupt column must be part of the read
    schema, so it is appended here and stripped from the clean half.
    """
    corrupt = "_corrupt_record"
    read_schema = StructType(
        list(schema.fields) + [StructField(corrupt, StringType())]
    )
    reader = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.schema(read_schema).csv(path)
    # Spark requires caching/materializing the corrupt column's frame
    # before filtering on it (SPARK-38523: the column is filled during
    # parsing, referencing it alone needs the raw row retained)
    df = df.cache()
    clean = df.filter(F.col(corrupt).isNull()).drop(corrupt)
    quarantine = df.filter(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("raw_line")
    )
    return clean, quarantine


class SchemaContractError(ValueError):
    """Merged file schema violates the declared table contract."""


def read_parquet_evolving(
    spark: SparkSession,
    path: str,
    contract: StructType | None = None,
    allow_extra: bool = False,
) -> DataFrame:
    """Read a long-lived parquet append directory whose schema EVOLVED
    (columns added over time): `mergeSchema` unions every file footer,
    and rows from files predating a column surface NULL for it.

    With a `contract`, enforce the table's declared shape against the
    merged schema BEFORE any data is read (footer-only check):
      * a contract column missing everywhere       → error (the feed
        silently stopped shipping a field),
      * a contract column present at another type  → error (type
        drift — Spark's merge would have failed for conflicting
        types WITHIN the directory, but drift vs the contract is
        this check),
      * columns beyond the contract               → error unless
        `allow_extra` (upstream added fields nobody reviewed).
    On success the result projects exactly the contract columns, in
    contract order — so the scan stays pruned to the agreed set even
    when the directory carries extras.

    Spark itself refuses same-name/different-type conflicts BETWEEN
    files at read time — that failure is deliberately left loud.
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if contract is None:
        return df
    have = {f.name: f.dataType for f in df.schema.fields}
    want = {f.name: f.dataType for f in contract.fields}
    missing = sorted(set(want) - set(have))
    drift = sorted(
        (n, str(have[n]), str(t))
        for n, t in want.items()
        if n in have and have[n] != t
    )
    extra = sorted(set(have) - set(want))
    problems = []
    if missing:
        problems.append(f"missing columns: {missing}")
    if drift:
        problems.append(f"type drift (name, actual, declared): {drift}")
    if extra and not allow_extra:
        problems.append(f"undeclared columns: {extra}")
    if problems:
        raise SchemaContractError(
            f"schema contract violated for {path}: " + "; ".join(problems)
        )
    return df.select(*[f.name for f in contract.fields])
