"""Sink / ingestion / streaming tests: manifest incremental import
(idempotence + schema cache), first-seen merge, CSV NA policy, swap DDL,
and the Structured Streaming daily aggregate vs its batch twin."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ad_data_pipelines_spark.sources import firstseen, manifest, writers
from ad_data_pipelines_spark.streaming import daily_aggs
from ad_data_pipelines_spark.plans import testdata_queries as tq
from tests.conftest import SF_SMALL


def _write_csv(path, rows, header="id,name,v"):
    path.write_text("\n".join([header] + rows) + "\n")


def test_import_folder_incremental_and_idempotent(spark, tmp_path):
    root = tmp_path / "feeds"
    wh = tmp_path / "warehouse"
    t1 = root / "trips"
    t1.mkdir(parents=True)
    _write_csv(t1 / "a.csv", ["1,x,1.5", "2,y,2.5"])
    _write_csv(t1 / "b.csv", ["3,z,3.5"])

    n1 = manifest.import_folder(spark, str(root), str(wh))
    assert n1 == {"trips": 2}
    assert spark.read.parquet(f"{wh}/trips").count() == 3

    # re-run: markers skip everything (reference .imported semantics)
    n2 = manifest.import_folder(spark, str(root), str(wh))
    assert n2 == {"trips": 0}
    assert spark.read.parquet(f"{wh}/trips").count() == 3

    # new file: only it is imported, using the CACHED schema
    _write_csv(t1 / "c.csv", ["4,w,4.5"])
    n3 = manifest.import_folder(spark, str(root), str(wh))
    assert n3 == {"trips": 1}
    df = spark.read.parquet(f"{wh}/trips")
    assert df.count() == 4
    assert dict(df.dtypes)["id"] == "int"  # full-file inference, cached
    assert manifest.load_schema_cache(str(t1)) is not None


def test_first_seen_merge(spark):
    prev = spark.createDataFrame(
        [("k1", dt.datetime(2025, 1, 1, 12, 0, 0), 10)],
        "k string, create_time timestamp, v int",
    )
    cur = spark.createDataFrame([("k1", 99), ("k2", 7)], "k string, v int")
    out = firstseen.merge_first_seen(cur, prev, ["k"])
    rows = {r.k: r for r in out.collect()}
    assert rows["k1"].create_time == dt.datetime(2025, 1, 1, 12, 0, 0)  # preserved
    assert rows["k1"].v == 99  # value refreshed
    assert rows["k2"].create_time is not None  # new key stamped now


def test_swap_ddl_sequence():
    ddl = writers.swap_ddl("ads_x", "ads_x__staging")
    assert ddl == [
        'DROP TABLE IF EXISTS "ads_x"',
        'ALTER TABLE "ads_x__staging" RENAME TO "ads_x"',
    ]
    assert writers.swap_ddl("t", "s", dialect="derby", table_exists=False) == [
        'RENAME TABLE "s" TO "t"'
    ]
    assert writers.swap_ddl("t", "s", dialect="derby", table_exists=True)[0] == (
        'DROP TABLE "t"'
    )


def test_jdbc_staged_swap_end_to_end(spark, tmp_path):
    """The full S11 lifecycle against embedded Derby (a real JDBC
    database on the Spark classpath): staged write → atomic swap →
    idempotent re-run replacing the table → no staging residue.
    Reference behavior: data_ingestion/pg_import.R:230-313."""
    url = f"jdbc:derby:{tmp_path}/swapdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    target = writers.JdbcTarget(
        url=url, table="ads_x", driver=driver, batchsize=1000, num_partitions=1
    )

    def read_back(table):
        return (
            spark.read.format("jdbc")
            .options(url=url, driver=driver, dbtable=f'"{table}"')
            .load()
        )

    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    writers.write_jdbc_staged(df1, target, dialect="derby")
    assert {(r.id, r.name) for r in read_back("ads_x").collect()} == {
        (1, "a"), (2, "b"),
    }

    # re-run with different data: swap replaces the table atomically
    df2 = spark.createDataFrame(
        [(3, "c"), (4, "d"), (5, "e")], "id int, name string"
    )
    writers.write_jdbc_staged(df2, target, dialect="derby")
    assert {(r.id, r.name) for r in read_back("ads_x").collect()} == {
        (3, "c"), (4, "d"), (5, "e"),
    }

    # staging table is gone after the swap
    import py4j.protocol
    import pytest

    with pytest.raises(py4j.protocol.Py4JJavaError):
        read_back("ads_x__staging").collect()


def test_compression_ddl_statements():
    """The postgres compression DDL matches the reference's intent
    (pg_import.R:187-221): TOAST tuple target, EXTENDED storage +
    LZ4 per text column — emitted in the valid PG14+ column-level
    spelling (the reference's table-level `SET (compression = lz4)`
    is not a real reloption; it lives inside its tryCatch). Derby has
    no equivalent → []."""
    import pytest

    ddl = writers.compression_ddl("s", ["name", "city"])
    assert ddl == [
        'ALTER TABLE "s" SET (toast_tuple_target = 128)',
        'ALTER TABLE "s" ALTER COLUMN "name" SET STORAGE EXTENDED',
        'ALTER TABLE "s" ALTER COLUMN "name" SET COMPRESSION lz4',
        'ALTER TABLE "s" ALTER COLUMN "city" SET STORAGE EXTENDED',
        'ALTER TABLE "s" ALTER COLUMN "city" SET COMPRESSION lz4',
    ]
    assert writers.compression_ddl("s", ["name"], dialect="derby") == []
    with pytest.raises(ValueError, match="dialect"):
        writers.compression_ddl("s", [], dialect="oracle")


def test_jdbc_post_load_hook_best_effort(spark, tmp_path):
    """The post-swap hook (the reference's VACUUM FULL step,
    pg_import.R:316-331, generalized to caller statements): statements
    run AFTER the swap commits against the FINAL table name, a failing
    statement warns and continues without failing the load or blocking
    later statements, and enable_compression on a dialect with no
    compression DDL (derby) is a clean no-op — the swap itself stays
    strict."""
    url = f"jdbc:derby:{tmp_path}/postdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    target = writers.JdbcTarget(
        url=url, table="ads_z", driver=driver, batchsize=100, num_partitions=1
    )
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, name string"
    )
    ok = writers.write_jdbc_staged(
        df,
        target,
        dialect="derby",
        enable_compression=True,  # no-op DDL set on derby; must not fail
        post_load_sql=[
            'CREATE INDEX "ads_z_id_ix" ON "ads_z" ("id")',  # real: final name
            'VACUUM FULL "ads_z"',  # derby can't parse this → warn, continue
            # (an index on "name" would also fail: Spark's Derby dialect
            # writes StringType as CLOB, which Derby can't index)
            'UPDATE "ads_z" SET "name" = \'seen\' WHERE "id" = 3',  # still runs
        ],
    )
    assert ok == [
        'CREATE INDEX "ads_z_id_ix" ON "ads_z" ("id")',
        'UPDATE "ads_z" SET "name" = \'seen\' WHERE "id" = 3',
    ]
    got = (
        spark.read.format("jdbc")
        .options(url=url, driver=driver, dbtable='"ads_z"')
        .load()
        .collect()
    )
    assert {(r.id, r.name) for r in got} == {(1, "a"), (2, "b"), (3, "seen")}

    # the index exists on the live table (proves the hook ran post-swap
    # against the final name, not the staging name)
    jvm = spark._sc._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        rs = conn.getMetaData().getIndexInfo(None, None, "ads_z", False, False)
        names = set()
        while rs.next():
            ix = rs.getString("INDEX_NAME")
            if ix:
                names.add(ix)
        rs.close()
    finally:
        conn.close()
    assert "ads_z_id_ix" in names


def test_jdbc_staged_swap_survives_midwrite_failure(spark, tmp_path):
    """Fault injection for the reference's chunk-resilience contract
    (data_ingestion/pg_import.R:253-268, 3 retries per chunk): a batch
    that dies MID-WRITE must leave the live table untouched (the
    failure happens in the staging write, before the swap transaction),
    and a clean re-run must converge with no staging residue."""
    import pytest

    url = f"jdbc:derby:{tmp_path}/faultdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    target = writers.JdbcTarget(
        url=url, table="ads_y", driver=driver, batchsize=10, num_partitions=1
    )

    def read_back(table):
        return (
            spark.read.format("jdbc")
            .options(url=url, driver=driver, dbtable=f'"{table}"')
            .load()
        )

    good = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "id int, name string"
    )
    writers.write_jdbc_staged(good, target, dialect="derby")
    live = {(r.id, r.name) for r in read_back("ads_y").collect()}
    assert len(live) == 50

    # poison pill: evaluation throws partway through the batch stream
    # (batchsize=10, row 37 → several batches commit to staging before
    # the task dies — the partial-write shape, not an empty write)
    bad = spark.range(50).selectExpr(
        "CASE WHEN id = 37 THEN CAST(raise_error('mid-write fault') "
        "AS INT) ELSE CAST(id + 1000 AS INT) END AS id",
        "CAST(id AS STRING) AS name",
    )
    with pytest.raises(Exception, match="mid-write fault"):
        writers.write_jdbc_staged(bad, target, dialect="derby")

    # live table untouched — readers never saw the doomed load
    assert {(r.id, r.name) for r in read_back("ads_y").collect()} == live

    # clean re-run converges: overwrite clears the partial staging,
    # swap replaces the table, no staging residue
    good2 = spark.createDataFrame([(9, "done")], "id int, name string")
    writers.write_jdbc_staged(good2, target, dialect="derby")
    assert {(r.id, r.name) for r in read_back("ads_y").collect()} == {
        (9, "done")
    }
    import py4j.protocol

    with pytest.raises(py4j.protocol.Py4JJavaError):
        read_back("ads_y__staging").collect()


def test_csv_na_policy(spark, tmp_path):
    p = tmp_path / "na.csv"
    p.write_text("id,v\n1,\n2,ok\n")
    df = manifest.read_csv_typed(spark, str(p))
    rows = {r.id: r.v for r in df.collect()}
    assert rows[1] is None and rows[2] == "ok"


def test_streaming_daily_aggs_match_batch(spark, tmp_path):
    """AvailableNow streaming drain == batch aggregation of the same data
    (counts and sums exactly; approx_users within HLL tolerance)."""
    # re-write events with micro timestamps (stream source can't read nanos)
    src = tmp_path / "events_src"
    ck = tmp_path / "ck"
    ev = tq.t(spark, SF_SMALL, "events")
    ev.write.parquet(str(src))

    daily_aggs.run_available_now(spark, str(src), str(ck), sink_table="t_daily")
    got = {
        (r.ope_date, r.event_type): (r.n_events, r.value_sum)
        for r in spark.sql("select * from t_daily").collect()
    }
    batch = (
        ev.groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    )
    expect = {(r.d, r.event_type): (r.n, r.s) for r in batch}
    assert got == expect


def test_infer_types_full_readr_semantics(spark, tmp_path):
    """Whole-file inference with the NA-string list: NA tokens don't
    vote, so a numeric column polluted with 'NA' still types numeric
    (Spark's engine inference calls it string — the exact gap the
    reference's readr::type_convert pass closes); every row votes, so
    a late mixed value demotes to string (sampled inference misses it)."""
    p = tmp_path / "feed.csv"
    p.write_text(
        "i,big,d,b,dt,ts,mixed,allna,s,pad,baddt\n"
        "1,3000000000,1.5,true,2024-01-01,2024-01-01 10:00:00,1,NA,x, 7 ,2024-99-99\n"
        "NA,4000000000,N/A,false,2024-02-03,2024-02-03 00:00:01,2,#N/A,NA, 8 ,2024-88-88\n"
        "3,5000000000,2.25,true,2024-03-04,2024-03-04 23:59:59,oops,NULL,z, 9 ,2024-77-77\n"
    )
    sch = {f.name: f.dataType.simpleString()
           for f in manifest.infer_types_full(spark, str(p))}
    assert sch == {
        "i": "int", "big": "bigint", "d": "double", "b": "boolean",
        "dt": "date", "ts": "timestamp", "mixed": "string",
        "allna": "string", "s": "string",
        # whitespace-padded numerics vote (and read) trimmed
        "pad": "int",
        # date-shaped but calendar-invalid: readr keeps character
        "baddt": "string",
    }
    df = manifest.read_csv_typed(spark, str(p))
    rows = df.orderBy("big").collect()
    assert rows[0].i == 1 and rows[1].i is None  # NA -> NULL, still int
    assert rows[1].d is None and rows[2].d == 2.25
    assert rows[0].dt == dt.date(2024, 1, 1)
    assert rows[2].ts == dt.datetime(2024, 3, 4, 23, 59, 59)
    # NA tokens nullify in string-typed columns too (readr na= semantics)
    assert [r.allna for r in rows] == [None, None, None]
    assert rows[0].s == "x" and rows[1].s is None and rows[2].s == "z"
    assert [r.pad for r in rows] == [7, 8, 9]  # padded ints parse, not NULL
    assert rows[0].baddt == "2024-99-99"  # invalid date survives as text


def test_infer_types_full_dotted_headers(spark, tmp_path):
    """Feed headers with dots/spaces are column NAMES, not struct paths
    — inference and the typed read must handle them verbatim."""
    p = tmp_path / "dotted.csv"
    p.write_text("a.b,c d\n1,x\n2,y\n")
    sch = {f.name: f.dataType.simpleString()
           for f in manifest.infer_types_full(spark, str(p))}
    assert sch == {"a.b": "int", "c d": "string"}
    rows = manifest.read_csv_typed(spark, str(p)).collect()
    assert sorted(r["a.b"] for r in rows) == [1, 2]


def test_jsonl_roundtrip_quarantine_and_gzip(spark, tmp_path):
    """JSONL reader/writer: corrupt lines land in quarantine (raw text
    preserved) instead of failing or silently vanishing; clean rows
    survive a write→read roundtrip byte-equal; .gz reads transparently."""
    from ad_data_pipelines_spark.sources import jsonl

    src = tmp_path / "corpus.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "hello world", "meta": {"lang": "en"}}\n'
        '{"doc_id": 2, "text": "bonjour", "meta": {"lang": "fr"}}\n'
        "{this line is not json at all\n"
        '{"doc_id": 3, "text": "ok", "meta": null}\n'
    )
    df = jsonl.read_jsonl(spark, str(src))
    clean, bad = jsonl.split_quarantine(df)
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].meta.lang == "en" and rows[3].meta is None
    assert [r[jsonl.CORRUPT_COL] for r in bad.collect()] == [
        "{this line is not json at all"
    ]

    # explicit-schema read: same split, no inference pass
    df2 = jsonl.read_jsonl(spark, str(src), schema=clean.schema)
    clean2, bad2 = jsonl.split_quarantine(df2)
    assert clean2.count() == 3 and bad2.count() == 1

    # roundtrip with gzip: compressed files read transparently
    out = tmp_path / "out"
    jsonl.write_jsonl(clean, str(out), compression="gzip")
    import glob

    assert glob.glob(f"{out}/*.json.gz")
    back = jsonl.read_jsonl(spark, str(out))
    cback, bback = jsonl.split_quarantine(back)
    assert bback.count() == 0
    assert {
        (r.doc_id, r.text) for r in cback.collect()
    } == {(1, "hello world"), (2, "bonjour"), (3, "ok")}


def test_write_partition_overwrite_only_touches_written_days(spark, tmp_path):
    """Dynamic partition overwrite: rewriting one day's slice replaces
    that partition and leaves the others byte-identical; re-running the
    same slice is idempotent; the session conf is restored."""
    from pyspark.sql import functions as F

    from ad_data_pipelines_spark.sources.writers import (
        write_partition_overwrite,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 11.0),
         (3, "2024-01-02", 20.0), (4, "2024-01-03", 30.0)],
        "id bigint, day string, v double",
    )
    write_partition_overwrite(base, path, ["day"])

    patch = spark.createDataFrame(
        [(30, "2024-01-02", 99.0)], "id bigint, day string, v double"
    )
    write_partition_overwrite(patch, path, ["day"])
    write_partition_overwrite(patch, path, ["day"])  # idempotent re-run

    got = {
        (str(r.day), r.id): r.v  # partition col type-infers to date
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("2024-01-01", 1): 10.0,
        ("2024-01-01", 2): 11.0,
        ("2024-01-02", 30): 99.0,   # replaced wholesale
        ("2024-01-03", 4): 30.0,    # untouched
    }
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        .upper()
        == "STATIC"
    )


def test_read_csv_with_quarantine_splits_broken_rows(spark, tmp_path):
    """Malformed CSV rows (wrong column count / unparsable cast) land
    verbatim in the quarantine frame; clean rows parse typed; the
    split is exhaustive and disjoint."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ad_data_pipelines_spark.sources.manifest import (
        read_csv_with_quarantine,
    )

    p = tmp_path / "feed.csv"
    p.write_text(
        "id,name,amount\n"
        "1,alpha,10.5\n"
        "2,beta,not_a_number\n"      # cast failure
        "3,gamma\n"                  # missing column
        "4,delta,7.25\n"
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("amount", DoubleType()),
        ]
    )
    clean, quar = read_csv_with_quarantine(spark, str(p), schema)
    rows = {r.id: (r.name, r.amount) for r in clean.collect()}
    assert rows == {1: ("alpha", 10.5), 4: ("delta", 7.25)}
    bad = sorted(r.raw_line for r in quar.collect())
    assert bad == ["2,beta,not_a_number", "3,gamma"]


def test_read_parquet_evolving_merges_and_enforces_contract(spark, tmp_path):
    """Directory with an added column: merged read NULL-fills old rows;
    the contract check passes on match, prunes extras when allowed,
    and fails loudly on missing columns, type drift, or unreviewed
    extras."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ad_data_pipelines_spark.sources.manifest import (
        SchemaContractError,
        read_parquet_evolving,
    )

    path = str(tmp_path / "evolving")
    spark.range(3).select(
        F.col("id").alias("a"), F.lit("x").alias("b")
    ).write.parquet(path, mode="append")
    spark.range(2).select(
        F.col("id").alias("a"),
        F.lit("y").alias("b"),
        F.lit(9).cast("long").alias("c"),
    ).write.parquet(path, mode="append")

    merged = read_parquet_evolving(spark, path)
    assert set(merged.columns) == {"a", "b", "c"}
    rows = merged.collect()
    assert sum(1 for r in rows if r.c is None) == 3  # pre-evolution rows
    assert sum(1 for r in rows if r.c == 9) == 2

    full = StructType(
        [
            StructField("a", LongType()),
            StructField("b", StringType()),
            StructField("c", LongType()),
        ]
    )
    assert read_parquet_evolving(spark, path, full).columns == ["a", "b", "c"]

    narrow = StructType([StructField("a", LongType()),
                         StructField("b", StringType())])
    with pytest.raises(SchemaContractError, match="undeclared"):
        read_parquet_evolving(spark, path, narrow)
    pruned = read_parquet_evolving(spark, path, narrow, allow_extra=True)
    assert pruned.columns == ["a", "b"]  # contract order, extras pruned

    with pytest.raises(SchemaContractError, match="missing"):
        read_parquet_evolving(
            spark, path,
            StructType([*full.fields, StructField("d", LongType())]),
        )
    with pytest.raises(SchemaContractError, match="drift"):
        read_parquet_evolving(
            spark, path,
            StructType([StructField("a", StringType()),
                        StructField("b", StringType()),
                        StructField("c", LongType())]),
        )


def test_ingest_folder_job_entrypoint(spark, tmp_path, capsys, monkeypatch):
    """The CLI job wraps import_folder: first run imports, re-run is a
    no-op, and the summary prints as one JSON line."""
    import json

    from ad_data_pipelines_spark.jobs import ingest_folder

    root = tmp_path / "landing"
    (root / "trips").mkdir(parents=True)
    (root / "trips" / "day1.csv").write_text("id,v\n1,a\n2,b\n")
    wh = tmp_path / "wh"

    # reuse the session fixture instead of building a new one
    monkeypatch.setattr(
        "ad_data_pipelines_spark.session.get_spark", lambda **kw: spark
    )
    ingest_folder.main(
        ["--root", str(root), "--warehouse", str(wh)]
    )
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1 == {"trips": 1}
    assert spark.read.parquet(str(wh / "trips")).count() == 2

    ingest_folder.main(["--root", str(root), "--warehouse", str(wh)])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2 == {"trips": 0}


def test_corrupt_parquet_file_quarantine_read(spark, tmp_path):
    """A garbage file dropped into a parquet directory: the default
    read fails loudly (correctness first), and the explicit
    ignoreCorruptFiles escape hatch recovers the healthy rows — the
    operational knob for salvage reads, never the default."""
    import pytest

    path = tmp_path / "data"
    spark.range(10).write.parquet(str(path))
    (path / "part-corrupt.parquet").write_bytes(b"PAR1 this is not parquet")

    with pytest.raises(Exception):
        spark.read.parquet(str(path)).count()

    salvaged = (
        spark.read.option("ignoreCorruptFiles", "true")
        .parquet(str(path))
        .count()
    )
    assert salvaged == 10


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC as an alternative warehouse format: lossless round-trip of
    typed columns (timestamps included) and predicate pushdown into
    the ORC scan — the format swap is a writer string, nothing else
    changes."""
    li = tq.t(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity",
        "l_shipdate",
    )
    path = str(tmp_path / "orc")
    li.write.orc(path)

    back = spark.read.orc(path)
    assert back.schema == li.schema
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0

    filtered = back.filter(F.col("l_suppkey") < 5)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_suppkey" in plan.split(
        "PushedFilters"
    )[1][:120]
    assert filtered.count() == li.filter(F.col("l_suppkey") < 5).count()


def test_compact_partitions_reduces_files_and_preserves_rows(spark, tmp_path):
    """Compaction rewrites only over-fragmented partitions (day=1: 12
    files → 1), leaves right-sized partitions' files untouched on
    disk, preserves every row bit-for-bit, and a re-run is a no-op."""
    import os

    from ad_data_pipelines_spark.sources import maintenance as mt
    from pyspark.sql import functions as F

    path = str(tmp_path / "tbl")
    frag = spark.range(1200).select(
        F.col("id"), F.lit(1).alias("day"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    ).repartition(12)
    tidy = spark.range(1200, 1300).select(
        F.col("id"), F.lit(2).alias("day"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    ).coalesce(1)
    frag.write.partitionBy("day").parquet(path)
    tidy.write.mode("append").partitionBy("day").parquet(path)

    def files(day):
        d = os.path.join(path, f"day={day}")
        return {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in os.listdir(d) if f.endswith(".parquet")
        }

    assert len(files(1)) == 12 and len(files(2)) == 1
    before = spark.read.parquet(path)
    before_rows = {(r.id, r.day, r.v) for r in before.collect()}
    tidy_before = files(2)

    report = mt.compact_partitions(spark, path, ["day"])
    assert [r["day"] for r in report] == ["1"]
    assert len(files(1)) == 1           # 12 small files → 1
    assert files(2) == tidy_before      # right-sized partition untouched
    after_rows = {(r.id, r.day, r.v) for r in spark.read.parquet(path).collect()}
    assert after_rows == before_rows

    assert mt.compact_partitions(spark, path, ["day"]) == []  # idempotent


def test_table_compact_versioned_atomic(spark, tmp_path):
    """Versioned-table compaction commits a new version with fewer
    files and identical rows; the fragmented version survives until
    vacuum."""
    from ad_data_pipelines_spark.operators import merge as M
    from ad_data_pipelines_spark.sources import maintenance as mt
    from pyspark.sql import functions as F

    root = str(tmp_path / "vt")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    ).repartition(16)
    M.table_init(df, root)
    stats = mt.table_compact(spark, root)
    assert stats["files_before"] == 16 and stats["files_after"] == 1
    assert M.table_current_version(root) == stats["version"]
    got = {(r.id, r.g) for r in M.table_read(spark, root).collect()}
    assert got == {(i, i % 7) for i in range(2000)}
    assert "v000001" in M.table_vacuum(root)
