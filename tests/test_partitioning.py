"""Plan-level assertions for the shuffle-elimination utilities: the
point is not the result rows (also checked) but the PHYSICAL PLAN —
bucketed joins must run without an Exchange, salted joins must produce
identical results to the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators.partitioning import (
    salted_join,
    write_bucketed,
)
from tests.conftest import SF_MEDIUM, SF_SMALL


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(
        li, "b_lineitem", str(tmp_path / "b_li"), ["l_orderkey"], 8,
        sort_by=["l_orderkey"],
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", str(tmp_path / "b_ord"), ["l_orderkey"], 8,
        sort_by=["l_orderkey"],
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bl = spark.table("b_lineitem")
        bo = spark.table("b_orders")
        joined = bl.join(bo, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # same result as the plain parquet join
        plain = (
            spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF_SMALL}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    salted = salted_join(li, orders, "l_orderkey", n_salts=4)
    plain = li.join(orders, "l_orderkey")
    assert salted.count() == plain.count()
    # aggregate equivalence (order-insensitive)
    a = {
        r.o_orderpriority: (r.n, r.q)
        for r in salted.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
        .collect()
    }
    b = {
        r.o_orderpriority: (r.n, r.q)
        for r in plain.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
        .collect()
    }
    assert a == b


def test_salted_join_left_keeps_unmatched(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    # dim missing most keys → left join must keep all fact rows
    dim = spark.createDataFrame([(1, "x")], "l_orderkey long, tag string")
    out = salted_join(li, dim, "l_orderkey", n_salts=4, how="left")
    assert out.count() == li.count()


def test_time_partitioned_layout_prunes(spark, tmp_path):
    from ad_data_pipelines_spark.operators.partitioning import (
        write_time_partitioned,
    )

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    part = write_time_partitioned(li, str(tmp_path / "li_part"), "l_shipdate")
    back = spark.read.parquet(str(tmp_path / "li_part"))
    one_month = back.filter(F.col(part) == "1995-06")
    plan = one_month._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1995-06" in plan, plan
    expect = li.filter(F.date_format("l_shipdate", "yyyy-MM") == "1995-06").count()
    assert one_month.count() == expect


def test_write_sized_bounds_file_count(spark, tmp_path):
    """Stat-based sizing must produce few, large files for a small
    result (1 file here), not one file per shuffle partition."""
    from ad_data_pipelines_spark.operators.partitioning import (
        partitions_for_target_size,
        write_sized,
    )

    li = spark.read.parquet(f"{SF_MEDIUM}/lineitem.parquet")
    agg = li.groupBy("l_returnflag", "l_linestatus").count()
    assert partitions_for_target_size(agg, target_mb=256) == 1
    out = str(tmp_path / "sized")
    n = write_sized(agg, out, target_mb=256)
    assert n == 1
    import glob

    files = glob.glob(out + "/*.parquet")
    assert len(files) == 1
    # a big scan estimate must ask for >1 partition at a small target
    big = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    assert partitions_for_target_size(big, target_mb=1) > 1


def test_write_range_sorted_nonoverlapping_files(spark, tmp_path):
    """Files produced by write_range_sorted must carry disjoint
    [min, max] ranges of the order column — the property parquet
    min/max pruning needs."""
    import glob

    import pyarrow.parquet as pq

    from ad_data_pipelines_spark.operators.partitioning import write_range_sorted

    li = spark.read.parquet(f"{SF_MEDIUM}/lineitem.parquet")
    out = str(tmp_path / "sorted")
    write_range_sorted(li, out, "l_shipdate", n_files=4)
    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("l_shipdate")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {hi1} > {lo2}"


def test_dup_components_table_bucketed_anti_join(spark, tmp_path):
    """The materialized cluster table: one pipeline run, bucketed by
    doc_id, then the kept-corpus anti-join consumes it WITHOUT an
    Exchange on the components side — the compute-once / join-everywhere
    shape dedup takes at corpus scale."""
    from ad_data_pipelines_spark.operators.dedup import (
        dup_components,
        dup_components_table,
    )

    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
    comp = dup_components_table(
        docs, "dup_components", str(tmp_path / "comp"), min_eq=8, n_buckets=8
    )
    try:
        # identical rows to the direct pipeline output
        direct = {
            (r.doc_id, r.component, r.is_keeper)
            for r in dup_components(docs, min_eq=8).collect()
        }
        persisted = {
            (r.doc_id, r.component, r.is_keeper) for r in comp.collect()
        }
        assert persisted == direct and persisted
        # the consumer-side anti-join reads the bucketed table: no
        # Exchange may appear above the components scan
        losers = comp.filter(F.col("is_keeper") == 0).select("doc_id")
        kept = docs.join(losers, "doc_id", "left_anti")
        plan = kept._jdf.queryExecution().executedPlan().toString()
        scan_side = plan[plan.find("dup_components"):]
        assert "Exchange" not in scan_side.split("LeftAnti")[0], plan
        n_losers = len([1 for r in persisted if r[2] == 0])
        assert kept.count() == docs.count() - n_losers
    finally:
        spark.sql("DROP TABLE IF EXISTS dup_components")


def test_salted_join_rejects_outer_sides(spark):
    """right/full outer would emit n_salts duplicates for unmatched
    exploded rows — the operator must refuse."""
    import pytest

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").limit(10)
    dim = li.select(F.col("l_orderkey")).distinct()
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(li, dim, "l_orderkey", how=how)


def test_lsh_corpus_table_matches_and_skips_assignment(spark, tmp_path):
    """The materialized LSH corpus: search results from the bucketed
    table equal the compute-in-place path, and the search plan over it
    contains no bucket-assignment expressions (the per-plane sign tests
    ran once, at write time)."""
    from ad_data_pipelines_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    expected = {
        tuple(r)
        for r in sim.lsh_topk(emb, queries, k=3, n_planes=4).collect()
    }
    corpus = sim.lsh_corpus_table(
        emb, "t_lsh_corpus", str(tmp_path / "lsh_corpus"), n_planes=4
    )
    got_df = sim.lsh_topk(
        emb, queries, k=3, n_planes=4, corpus_buckets=corpus
    )
    assert {tuple(r) for r in got_df.collect()} == expected
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    # corpus side reads materialized bucket_id; only the 10-row query
    # side computes sign tests (4 planes) — never corpus-cardinality
    assert plan.count("zip_with") <= 8 * 2  # query buckets + sim scoring


def test_compact_parquet_shrinks_files_and_preserves_content(spark, tmp_path):
    """A 40-file directory compacts to few files with identical content
    (checksum-verified before the swap); a second compaction is a
    no-op-sized rewrite that still preserves everything."""
    from ad_data_pipelines_spark.operators.partitioning import compact_parquet

    path = str(tmp_path / "t")
    df = spark.range(10_000).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS k"
    )
    df.repartition(40).write.parquet(path)

    stats = compact_parquet(
        spark, path, target_mb=256, checksum_cols=["id", "k"]
    )
    assert stats["files_before"] == 40
    assert stats["files_after"] < 10
    assert stats["n_rows"] == 10_000

    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg({"id": "sum"}).first()[0] == 10_000 * 9_999 // 2
    # leftovers cleaned up
    import os
    assert not os.path.exists(path + ".compact.tmp")
    assert not os.path.exists(path + ".compact.old")


def test_write_zordered_prunes_on_both_columns(spark, tmp_path):
    """Z-ordered files each cover a small fraction of BOTH columns'
    global ranges (multi-dimension min/max pruning), while a single-
    column range sort leaves the second column unprunable (~full range
    per file)."""
    import glob

    import pyarrow.parquet as pq

    from ad_data_pipelines_spark.operators.partitioning import (
        write_range_sorted,
        write_zordered,
    )

    li = spark.read.parquet(f"{SF_MEDIUM}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )

    def coverage(path, col):
        glo, ghi, spans = None, None, []
        files = glob.glob(path + "/*.parquet")
        per_file = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            per_file.append((min(mins), max(maxs)))
        glo = min(lo for lo, _ in per_file)
        ghi = max(hi for _, hi in per_file)
        spans = [(hi - lo) / max(ghi - glo, 1) for lo, hi in per_file]
        return sum(spans) / len(spans)

    zpath = str(tmp_path / "zord")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=16)
    spath = str(tmp_path / "single")
    write_range_sorted(li, spath, "l_partkey", n_files=16)

    # round-trip: layout change must not lose or duplicate rows
    assert spark.read.parquet(zpath).count() == li.count()
    assert set(spark.read.parquet(zpath).columns) == set(li.columns)

    z_part, z_supp = (coverage(zpath, c) for c in ("l_partkey", "l_suppkey"))
    s_supp = coverage(spath, "l_suppkey")
    # each z-file covers a bounded hyper-rectangle: both dims prunable
    assert z_part < 0.6, f"zorder l_partkey coverage {z_part:.2f}"
    assert z_supp < 0.6, f"zorder l_suppkey coverage {z_supp:.2f}"
    # the single-column sort can't prune the other column
    assert s_supp > 0.9, f"single-sort suppkey coverage {s_supp:.2f}"


def test_zorder_key_matches_python_morton(spark):
    """The Spark Morton key equals a pure-Python bit-interleave of the
    same bucket indices on values whose buckets are known exactly."""
    from ad_data_pipelines_spark.operators.partitioning import zorder_key

    bits = 4
    n_buckets = 1 << bits
    # values at bucket centers over [0, 16): bucket == int(value)
    rows = [
        (float(a) + 0.5, float(b) + 0.5)
        for a in range(n_buckets)
        for b in range(0, n_buckets, 3)
    ]
    # pin the min/max so normalization maps bucket i to [i, i+1)
    rows.append((0.0, 0.0))
    rows.append((15.9999, 15.9999))
    df = spark.createDataFrame(rows, "x double, y double")
    joined, key = zorder_key(df, ["x", "y"], bits=bits)
    got = {
        (r.x, r.y): r.z
        for r in joined.withColumn("z", key).collect()
    }

    lo, hi = 0.0, 15.9999

    def bucket(v):
        return min(max(int((v - lo) / (hi - lo) * n_buckets), 0),
                   n_buckets - 1)

    def morton(bx, by):
        z = 0
        for j in range(bits):
            z |= ((bx >> j) & 1) << (2 * j)
            z |= ((by >> j) & 1) << (2 * j + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(bucket(x), bucket(y)), (x, y, z)


def test_parquet_text_compression_meets_reference_band(spark, tmp_path):
    """The reference's TOAST/VACUUM pipeline claims 40-70% savings on
    text-heavy tables (BASELINE.md); columnar zstd parquet must land in
    or above that band against uncompressed parquet on the documents
    table — compression is a writer option here, not a maintenance
    job."""
    import pathlib

    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")

    def size(path):
        return sum(
            f.stat().st_size
            for f in pathlib.Path(path).rglob("*.parquet")
        )

    raw = str(tmp_path / "raw")
    zstd = str(tmp_path / "zstd")
    docs.coalesce(1).write.option("compression", "none").parquet(raw)
    docs.coalesce(1).write.option("compression", "zstd").parquet(zstd)
    saving = 1.0 - size(zstd) / size(raw)
    assert saving >= 0.40, f"zstd saving only {saving:.0%}"


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """The 100 TB selective-join story: when a filtered dim joins a big
    fact and neither broadcasts, Spark's runtime bloom filter injects a
    might_contain predicate on the fact's join key — rows that cannot
    match are dropped AT THE SCAN, before the shuffle. Thresholds are
    lowered to trigger at test scale (the big-cluster defaults play the
    same role at real size); results must be identical either way."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "10GB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{SF_MEDIUM}/lineitem.parquet")
        od = (
            spark.read.parquet(f"{SF_MEDIUM}/orders.parquet")
            .filter(F.col("o_totalprice") > 400000)
            .select("o_orderkey")
        )
        j = li.join(od, li.l_orderkey == od.o_orderkey).agg(
            F.sum("l_quantity").alias("q"), F.count("*").alias("n")
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:3000]
        with_bloom = j.collect()[0]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    li = spark.read.parquet(f"{SF_MEDIUM}/lineitem.parquet")
    od = (
        spark.read.parquet(f"{SF_MEDIUM}/orders.parquet")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    plain = li.join(od, li.l_orderkey == od.o_orderkey).agg(
        F.sum("l_quantity").alias("q"), F.count("*").alias("n")
    ).collect()[0]
    assert (with_bloom.q, with_bloom.n) == (plain.q, plain.n)


def test_z_value_matches_python_morton_and_is_bijective(spark):
    """The shared z_value interleave equals a bit-twiddling Python
    reference for 2-D and 3-D bucket tuples, and is bijective on the
    bucket grid (distinct tuples → distinct keys)."""
    from pyspark.sql import functions as F

    from ad_data_pipelines_spark.operators.partitioning import z_value

    bits = 5
    grid = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("x"),
        (F.col("id") / 32).cast("long").alias("y"),
    )
    rows = grid.withColumn(
        "z", z_value([F.col("x"), F.col("y")], bits)
    ).collect()

    def morton2(x, y, bits):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for r in rows:
        assert r.z == morton2(r.x, r.y, bits), (r.x, r.y)
    assert len({r.z for r in rows}) == 32 * 32  # bijective

    tri = spark.range(8 * 8 * 8).select(
        (F.col("id") % 8).alias("a"),
        ((F.col("id") / 8).cast("long") % 8).alias("b"),
        (F.col("id") / 64).cast("long").alias("c"),
    )
    rows3 = tri.withColumn(
        "z", z_value([F.col("a"), F.col("b"), F.col("c")], 3)
    ).collect()
    assert len({r.z for r in rows3}) == 512  # bijective in 3-D too
