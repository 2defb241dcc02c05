"""Operator-coverage queries over the driver testdata (TPC-H-ish tables).

Each registered query is one SURVEY.md §2 operator (or a tight cluster)
exercised on `/root/testdata/sf*` with an equivalent ANSI-SQL oracle that
DuckDB runs on the same parquet files. Query keys are prefixed with the
§2 operator ids they cover (a1_, w4_, j13_, …) so coverage is auditable.

Cross-engine determinism rules (every query follows these):
  * output columns: date / string / bigint / rounded double only;
    timestamps are formatted to strings (timezone-proof),
  * every aggregate/computed column aliased identically in Spark + SQL,
  * float aggregates rounded (sum→2dp, avg/ratio→4-6dp) so double
    summation order cannot flip the hash,
  * window orderings use a unique key (no nondeterministic ties),
  * exact count(distinct) in oracle-checked variants; the production
    `approx_count_distinct` (HLL++, rsd=0.01 — the reference's
    HyperLogLog(0.01)) is exposed as a separate rows-only query.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ad_data_pipelines_spark.functions import (
    deep_clean,
    minutes_between,
    month_str,
    prefix_map,
    right_closed_bins,
)
from ad_data_pipelines_spark.operators.agg import count_if, guarded_ratio, sum_if
from ad_data_pipelines_spark.plans.transit_common import maybe_broadcast


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


_TABLE_CACHE: dict[tuple, DataFrame] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one testdata table (S1). Column pruning and filter
    pushdown happen in Catalyst — callers just select/filter.

    The analyzed DataFrame is memoized per (session, sf_dir, table):
    every registry query pays file-listing + footer/schema analysis
    otherwise, a constant cost that adds up across a 65-query
    correctness run (the cache stores only the logical plan — no data
    is pinned).

    `events.parquet`'s `ts` column has shipped in two physical forms
    across driver testdata generations: TIMESTAMP(NANOS) (which Spark's
    vectorized reader rejects — read nanos-as-long and floor-truncate
    to micros, exactly DuckDB's micro-precision read) and
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark 4 reads as
    TIMESTAMP_NTZ — cast to session-TZ TIMESTAMP; the session is pinned
    UTC below, so wall-clock values are preserved and match the
    oracle's naive timestamps bit-for-bit). Normalizing here keeps
    every downstream `unix_micros`/`date_trunc`/window query working
    against either generation.

    `get_spark` pins the session timezone to UTC; the guard here (on
    cache miss only — no per-call RPC) covers externally-built sessions
    so `to_date`/`date_trunc`/`date_format` still agree with the
    oracle's naive timestamps.
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) generation
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":  # TIMESTAMP(MICROS) NTZ generation
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _TABLE_CACHE[key] = df
    return df


# ---------------------------------------------------------------------------
# Scans / filters / projections / aggregation core
# ---------------------------------------------------------------------------

@register(
    "a1_trips_daily",
    oracle="""
        SELECT CAST(l_shipdate AS DATE) AS ship_date,
               l_returnflag, l_linestatus, COUNT(*) AS trips
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
        GROUP BY 1, 2, 3
    """,
    doc="S1+S2+P5+P17+A1: pushed time-range scan → daily count per key. "
    "Flagship; analog of ads_route_passenger_trips_di (reference "
    "scripts/ads_route_…py:79-94) with half-open interval policy "
    "(SURVEY.md §4.4-1).",
)
def q_trips_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
        )
        .groupBy(
            F.to_date("l_shipdate").alias("ship_date"), "l_returnflag", "l_linestatus"
        )
        .agg(F.count("*").alias("trips"))
    )


@register(
    "a3_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                                AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                           AS sum_base,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc,
               ROUND(AVG(l_quantity), 4)                                AS avg_qty,
               COUNT(*)                                                 AS count_order
        FROM lineitem
        GROUP BY 1, 2
    """,
    doc="A3 sums per group (TPC-H Q1 shape). Reference: distance/time sums "
    "scripts/ads_passenger_travel_info_mi.py:308-310.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@register(
    "a2_conditional_counts",
    oracle="""
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               CAST(SUM(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END) AS BIGINT) AS journey_num,
               CAST(SUM(CASE WHEN l_linenumber <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS transfer_num
        FROM lineitem
        GROUP BY 1
    """,
    doc="A2 conditional counts in one pass (journeys vs transfers). "
    "Reference: scripts/ads_passenger_travel_info_mi.py:306-307; the "
    "filter-twice-then-join variant (ads_ridership_…py:91-99 = J4) is "
    "deliberately collapsed to a single aggregation.",
)
def q_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(month_str("l_shipdate").alias("ship_month")).agg(
        count_if(F.col("l_linenumber") == 1).alias("journey_num"),
        count_if(F.col("l_linenumber") != 1).alias("transfer_num"),
    )


@register(
    "a5_distinct_exact",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS uniq_suppliers,
               COUNT(*) AS trips
        FROM lineitem
        GROUP BY 1
    """,
    doc="A5 distinct-count (exact variant for the oracle; production path "
    "is a5_distinct_approx with HLL++ rsd=0.01 == reference "
    "hyperloglog.HyperLogLog(0.01), "
    "scripts/ads_passenger_travel_info_mi.py:266).",
)
def q_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("uniq_suppliers"),
        F.count("*").alias("trips"),
    )


@register(
    "a5_distinct_approx",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS uniq_suppliers,
               TRUE AS within_tolerance
        FROM lineitem
        GROUP BY 1
    """,
    doc="A5 production path: approx_count_distinct(rsd=0.01), Spark "
    "HLL++ == reference HyperLogLog(0.01). The ESTIMATE is sketch-"
    "dependent so no SQL oracle can equal it — instead the query "
    "returns the TOLERANCE VERDICT (r9 brief #4): exact distinct "
    "(re-derived in the same aggregate) plus a boolean asserting "
    "|approx − exact| <= 3·rsd·exact (3 sigma of the HLL++ standard "
    "error). The verdict is deterministic — HLL++ is hash-based, no "
    "randomness — so the row hash-gates; the oracle asserts the "
    "exact counts and all-true verdicts.",
)
def q_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # pre-distinct once, then BOTH sides read the deduped pairs: HLL is
    # insertion-count invariant (adding a value twice leaves the sketch
    # unchanged), so approx over distinct input == approx over raw, and
    # the exact count is a plain count(*) — one map-side-combined
    # shuffle instead of the two-distinct expand plan (A/B: 0.90 vs
    # 1.78 s at sf0.1, outputs identical)
    # drop NULL keys BEFORE the distinct: count(*) over distinct pairs
    # would count a NULL l_suppkey row, but COUNT(DISTINCT) (the oracle
    # and the reference semantics) excludes NULLs. TPC-H suppkey is
    # NOT NULL so this is a no-op here, but the operator must match on
    # any input (ADVICE r10).
    d = (
        li.select("l_returnflag", "l_suppkey")
        .filter(F.col("l_suppkey").isNotNull())
        .distinct()
    )
    agg = d.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey", 0.01).alias("approx"),
        F.count("*").alias("uniq_suppliers"),
    )
    return agg.select(
        "l_returnflag",
        "uniq_suppliers",
        (
            F.abs(F.col("approx") - F.col("uniq_suppliers"))
            <= 0.03 * F.col("uniq_suppliers")
        ).alias("within_tolerance"),
    )


@register(
    "a26_hll_shard_union",
    oracle="""
        SELECT COUNT(DISTINCT l_suppkey) AS n_distinct_exact,
               TRUE AS within_tolerance
        FROM lineitem
        WHERE strftime(l_shipdate, '%Y-%m') <= '1995-06'
    """,
    doc="A5's INCREMENTAL sibling (operators/sketch.py hll_shard_table / "
    "hll_union_estimate): per-month DataSketches HLL sketches of "
    "distinct suppliers, then 'distinct over H1' answered by sketch "
    "UNION ALGEBRA alone — no re-scan. This is what a 100 TB daily "
    "pipeline stores: approx_count_distinct returns a NUMBER (numbers "
    "don't union); the sketch artifact answers any shard subset later. "
    "Shard build = one groupBy over the fact; union = 6 binary "
    "merges. The ESTIMATE is sketch-dependent so no SQL oracle can "
    "equal it — the query returns the TOLERANCE VERDICT (r9 brief "
    "#4): exact distinct over the same slice plus a boolean asserting "
    "|union_est − exact| <= 5%·exact (3 sigma of lg_k=12's ~1.6% "
    "rsd). Sketches are hash-deterministic, so the verdict hash-"
    "gates; shard-union == whole-sketch equality stays asserted in "
    "tests/test_operators.py.",
)
def q_a26_hll_shard_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ad_data_pipelines_spark.operators import sketch as _sketch

    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", month_str("l_shipdate").alias("month")
    )
    shards = _sketch.hll_shard_table(li, "l_suppkey", ["month"], lg_k=12)
    h1 = shards.filter(F.col("month") <= "1995-06")
    est = _sketch.hll_union_estimate(h1).select(
        F.col("n_distinct_est").cast("bigint").alias("est")
    )
    exact = (
        li.filter(F.col("month") <= "1995-06")
        .agg(F.countDistinct("l_suppkey").alias("n_distinct_exact"))
    )
    # both sides are ONE row — the cross join is a 1x1 scalar combine
    return est.crossJoin(F.broadcast(exact)).select(
        "n_distinct_exact",
        (
            F.abs(F.col("est") - F.col("n_distinct_exact"))
            <= 0.05 * F.col("n_distinct_exact")
        ).alias("within_tolerance"),
    )


@register(
    "a9_rollup_overall",
    oracle="""
        SELECT CASE WHEN GROUPING(n_name) = 1 THEN 'overall'
                    ELSE n_name END AS nation_name,
               COUNT(*) AS customers,
               ROUND(SUM(c_acctbal), 2) AS acctbal_sum
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), ())
    """,
    doc="A9 'overall' rollup via grouping sets — one scan, one shuffle "
    "(reference recomputed + unioned: "
    "scripts/ads_passenger_travel_info_mi.py:469-516).",
)
def q_rollup_overall(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    return (
        joined.rollup("n_name")
        .agg(
            F.count("*").alias("customers"),
            F.round(F.sum("c_acctbal"), 2).alias("acctbal_sum"),
            F.grouping("n_name").alias("__is_rollup"),
        )
        .withColumn(
            "nation_name",
            F.when(F.col("__is_rollup") == 1, F.lit("overall")).otherwise(
                F.col("n_name")
            ),
        )
        .drop("n_name", "__is_rollup")
    )


@register(
    "a8_adjacent_diff",
    oracle="""
        WITH hist AS (
            SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                   l_linenumber AS leg,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY 1, 2
        )
        SELECT ship_month, leg,
               cnt - COALESCE(LEAD(cnt) OVER (PARTITION BY ship_month ORDER BY leg), 0)
                   AS exactly_n
        FROM hist
        QUALIFY exactly_n >= 0
    """,
    doc="A7+A8: leg-count histogram then adjacent-difference via LEAD "
    "(journeys with exactly k transfers), negatives dropped. Reference: "
    "scripts/ads_passenger_transfer_count_di.py:189, 216-244.",
)
def q_adjacent_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        month_str("l_shipdate").alias("ship_month"), F.col("l_linenumber").alias("leg")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("ship_month").orderBy("leg")
    return (
        hist.withColumn(
            "exactly_n", F.col("cnt") - F.coalesce(F.lead("cnt").over(w), F.lit(0))
        )
        .filter(F.col("exactly_n") >= 0)
        .select("ship_month", "leg", "exactly_n")
    )


@register(
    "a13_first_last_ordered",
    oracle="""
        SELECT l_orderkey,
               MIN_BY(l_partkey, CAST(l_linenumber AS BIGINT) * 1000000000 + l_partkey)
                   AS first_part,
               MAX_BY(l_partkey, CAST(l_linenumber AS BIGINT) * 1000000000 + l_partkey)
                   AS last_part,
               COUNT(*) AS n_legs
        FROM lineitem
        GROUP BY 1
    """,
    doc="A13 first/last per ordered group (route endpoints). Reference: "
    "arrange(SEQUENCE_NO) + first/last(POINT_NO), "
    "scripts/dwd_bus_route_info_mf & other 2.R:185-192. min_by/max_by "
    "avoid the sort entirely; the composite (linenumber, partkey) order "
    "key makes ties deterministic (testdata linenumbers repeat per order).",
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    ord_key = F.col("l_linenumber").cast("long") * 1000000000 + F.col("l_partkey")
    return li.groupBy("l_orderkey").agg(
        F.min_by("l_partkey", ord_key).alias("first_part"),
        F.max_by("l_partkey", ord_key).alias("last_part"),
        F.count("*").alias("n_legs"),
    )


# ---------------------------------------------------------------------------
# Joins / set ops
# ---------------------------------------------------------------------------

@register(
    "j1_broadcast_enrich",
    oracle="""
        SELECT p_brand,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS trips
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1
    """,
    doc="J1/J2 fact⋈dim broadcast equi-join then aggregate. Reference AFC⋈"
    "VDV LINE join (scripts/ads_passenger_travel_info_mi.py:154-172). "
    "Explicit broadcast() hint: dim is KB-scale even at 100TB fact.",
)
def q_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("trips"),
        )
    )


@register(
    "j8_full_outer_3way",
    oracle="""
        WITH o AS (SELECT strftime(o_orderdate, '%Y-%m') AS m, COUNT(*) AS n_orders
                   FROM orders GROUP BY 1),
             l AS (SELECT strftime(l_shipdate, '%Y-%m') AS m, COUNT(*) AS n_ship
                   FROM lineitem GROUP BY 1),
             b AS (SELECT strftime(l_shipdate, '%Y-%m') AS m, COUNT(*) AS n_big
                   FROM lineitem WHERE l_quantity > 40 GROUP BY 1)
        SELECT COALESCE(o.m, l.m, b.m) AS month,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(n_ship, 0) AS n_ship,
               COALESCE(n_big, 0) AS n_big
        FROM o FULL OUTER JOIN l ON o.m = l.m
               FULL OUTER JOIN b ON COALESCE(o.m, l.m) = b.m
    """,
    doc="J8 three-way full-outer join of aggregate branches + J4-style "
    "zero-fill. Reference: trip/journey/transfer 3-way full join, "
    "scripts/ads_passenger_travel_time_di.R:258-262.",
)
def q_full_outer_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    o = orders.groupBy(month_str("o_orderdate").alias("m")).agg(
        F.count("*").alias("n_orders")
    )
    l = li.groupBy(month_str("l_shipdate").alias("m")).agg(F.count("*").alias("n_ship"))
    b = (
        li.filter(F.col("l_quantity") > 40)
        .groupBy(month_str("l_shipdate").alias("m"))
        .agg(F.count("*").alias("n_big"))
    )
    ol = o.join(l, "m", "full")
    all3 = ol.join(b, "m", "full")
    return all3.select(
        F.col("m").alias("month"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_ship", F.lit(0)).alias("n_ship"),
        F.coalesce("n_big", F.lit(0)).alias("n_big"),
    )


@register(
    "j13_anti_join",
    oracle="""
        SELECT p_partkey, p_brand
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 48
        )
    """,
    doc="J13/O5 anti-join: keys on the left absent from the (filtered) "
    "right. Reference diagnostic set-difference of route keys, "
    "scripts/ads_passenger_transfer_count_di.py:131-137.",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    return part.join(
        li, part.p_partkey == li.l_partkey, "left_anti"
    ).select("p_partkey", "p_brand")


@register(
    "j14_match_rate",
    oracle="""
        SELECT COUNT(*) AS total,
               CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS matched
        FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    """,
    doc="J14 join match-rate metric (left join + notnull count). "
    "Reference: scripts/ads_passenger_transfer_count_di.py:161-162.",
)
def q_match_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
    return joined.agg(
        F.count("*").alias("total"),
        count_if(F.col("o_orderkey").isNotNull()).alias("matched"),
    )


@register(
    "o4_union_spine_j6",
    oracle="""
        WITH spine AS (
            SELECT DISTINCT o_custkey AS custkey FROM orders
            UNION
            SELECT DISTINCT c_custkey FROM customer
        ),
        cnt AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1),
        big AS (SELECT o_custkey, COUNT(*) AS n_big FROM orders
                WHERE o_totalprice > 100000 GROUP BY 1)
        SELECT s.custkey,
               COALESCE(cnt.n_orders, 0) AS n_orders,
               COALESCE(big.n_big, 0) AS n_big
        FROM spine s
        LEFT JOIN cnt ON s.custkey = cnt.o_custkey
        LEFT JOIN big ON s.custkey = big.o_custkey
    """,
    doc="O4 union-distinct key spine + J6 chained left joins of "
    "pre-aggregated counts + P6 zero-fill. Reference station spine: "
    "scripts/ads_stop_…py:39-41, 77-81.",
)
def q_union_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    spine = (
        orders.select(F.col("o_custkey").alias("custkey"))
        .union(cust.select(F.col("c_custkey").alias("custkey")))
        .distinct()
    )
    cnt = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    big = (
        orders.filter(F.col("o_totalprice") > 100000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"))
    )
    return (
        spine.join(cnt, spine.custkey == cnt.o_custkey, "left")
        .join(big, spine.custkey == big.o_custkey, "left")
        .select(
            "custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_big", F.lit(0)).alias("n_big"),
        )
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

@register(
    "w1_lead_gap",
    oracle="""
        SELECT event_id, user_id,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   - epoch_us(ts) AS gap_us
        FROM events
    """,
    doc="W1 LEAD next-event time per user (transfer-time precursor). "
    "Reference: pandas shift(-1) per journey, "
    "scripts/ads_passenger_travel_info_mi.py:195-198. Unique order key "
    "(ts, event_id) for shuffle determinism (SURVEY.md §4.4-6).",
)
def q_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "event_id", "user_id", (F.lead(us).over(w) - us).alias("gap_us")
    )


@register(
    "w4_keep_last",
    oracle="""
        SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
        FROM (
            SELECT l_orderkey, l_linenumber, l_shipdate,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_orderkey
                       ORDER BY l_shipdate DESC, l_linenumber DESC
                   ) AS rn
            FROM lineitem
        ) WHERE rn = 1
    """,
    doc="W4/A16 keep-last-by-explicit-order. Reference: "
    "rank(ascending=False)==1, scripts/ads_stop_…py:62-65; replaces "
    "order-dependent drop_duplicates(keep='first') (SURVEY.md §4.4-6). "
    "Computed as ONE combinable max(struct) aggregate (r14 opt, the "
    "label_propagation min_by lesson): keep-last over a UNIQUE order "
    "key is an argmax. The actual win over the row_number window is "
    "the removed double Sort — Spark 3.5+'s WindowGroupLimit already "
    "kept <=1 row/key per map partition pre-shuffle, so shuffle "
    "volume was comparable; the aggregate still partial-aggregates "
    "map-side and needs no sort at all (r14 verdict correction). "
    "Rows identical by construction (max over the unique "
    "(l_shipdate, l_linenumber) pair = rank desc 1); the window form "
    "of the operator remains covered by w1/w2/w3/w5/o7/a13.",
)
def q_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.max(F.struct("l_shipdate", "l_linenumber")).alias("m"))
        .select(
            "l_orderkey",
            F.col("m.l_linenumber").alias("l_linenumber"),
            F.to_date("m.l_shipdate").alias("ship_date"),
        )
    )


@register(
    "o7_topk_rank",
    oracle="""
        SELECT nation, suppkey, revenue, rk FROM (
            SELECT s_nationkey AS nation, s_suppkey AS suppkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   ROW_NUMBER() OVER (
                       PARTITION BY s_nationkey
                       ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, s_suppkey
                   ) AS rk
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1, 2
        ) WHERE rk <= 3
    """,
    doc="O7/W top-k per group (the glossary's planned Top5/Bottom5 KPI — "
    "docs/data glossary.xlsx — which no reference script implements; "
    "first-class here). suppkey tiebreak keeps ranking deterministic.",
)
def q_topk_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nation"), F.col("s_suppkey").alias("suppkey"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
        )
    )
    w = Window.partitionBy("nation").orderBy(F.col("__rev").desc(), F.col("suppkey"))
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("nation", "suppkey", F.round("__rev", 2).alias("revenue"), "rk")
    )


# ---------------------------------------------------------------------------
# Row-transform expressions (cleaning / mapping / binning)
# ---------------------------------------------------------------------------

@register(
    "p7_p8_clean_map",
    oracle="""
        SELECT c_custkey,
               UPPER(REGEXP_REPLACE(TRIM(c_name), '[^0-9A-Za-z]', '', 'g')) AS clean_key,
               CASE WHEN c_mktsegment LIKE 'AUTO%' THEN 'Vehicles'
                    WHEN c_mktsegment LIKE 'BUIL%' THEN 'Construction'
                    WHEN c_mktsegment LIKE 'FURN%' THEN 'Furniture'
                    ELSE 'Unknown' END AS segment_label
        FROM customer
    """,
    doc="P7 deep_clean join-key scrub + P8 prefix→label map as pure column "
    "exprs (reference row UDFs: "
    "scripts/ads_passenger_travel_info_mi.py:121-151).",
)
def q_clean_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        deep_clean("c_name").alias("clean_key"),
        prefix_map(
            "c_mktsegment",
            {"AUTO": "Vehicles", "BUIL": "Construction", "FURN": "Furniture"},
        ).alias("segment_label"),
    )


@register(
    "p15_binning",
    oracle="""
        SELECT CASE WHEN l_quantity <= 10 THEN '0-10'
                    WHEN l_quantity <= 20 THEN '10-20'
                    WHEN l_quantity <= 30 THEN '20-30'
                    WHEN l_quantity <= 40 THEN '30-40'
                    ELSE '40+' END AS qty_bin,
               COUNT(*) AS trips,
               ROUND(SUM(l_extendedprice), 2) AS price_sum
        FROM lineitem
        GROUP BY 1
    """,
    doc="P15/P16 right-closed distance-style binning (pd.cut semantics: "
    "(lo,hi] + include-lowest; reference "
    "scripts/ads_passenger_travel_distance_di.py:210-220).",
)
def q_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    bins = right_closed_bins(
        "l_quantity",
        [0, 10, 20, 30, 40, float("inf")],
        ["0-10", "10-20", "20-30", "30-40", "40+"],
    )
    return li.groupBy(bins.alias("qty_bin")).agg(
        F.count("*").alias("trips"),
        F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
    )


@register(
    "a12_guarded_ratio",
    oracle="""
        SELECT l_returnflag,
               CASE WHEN SUM(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END) > 0
                    THEN ROUND(SUM(l_quantity)
                         / SUM(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END), 4)
                    ELSE 0 END AS qty_per_journey
        FROM lineitem
        GROUP BY 1
    """,
    doc="A12 zero-guarded ratio (avg per journey). Reference: "
    "scripts/ads_passenger_travel_info_mi.py:442-445.",
)
def q_guarded_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("__qty"),
        count_if(F.col("l_linenumber") == 1).alias("__journeys"),
    )
    return agg.select(
        "l_returnflag",
        F.round(
            guarded_ratio(F.col("__qty"), F.col("__journeys")), 4
        ).alias("qty_per_journey"),
    )


# ---------------------------------------------------------------------------
# Events: time-bucket aggregates and JSON props (streaming-batch analog)
# ---------------------------------------------------------------------------

@register(
    "t1_events_hourly",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS value_sum
        FROM events
        GROUP BY 1, 2
    """,
    doc="Tumbling-window (1h) aggregate — batch twin of the Structured "
    "Streaming daily-aggregate pipeline (streaming/daily_aggs.py). "
    "Beyond-reference: the reference is batch-only (SURVEY.md §2.9).",
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


@register(
    "t2_events_json_props",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS k_sum,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1
    """,
    doc="JSON property extraction + aggregate (semi-structured side-input "
    "path; beyond-reference — the reference had no JSON functions, "
    "SURVEY.md §2.7). from_json with an explicit schema parses the "
    "payload ONCE for any number of extracted fields — get_json_object "
    "re-parses per key, which compounds as JSON operators accrete.",
)
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    props = F.from_json("props", "k BIGINT").alias("pj")
    return (
        ev.select("event_type", props)
        .groupBy("event_type")
        .agg(
            F.sum(F.col("pj.k")).alias("k_sum"),
            F.count("*").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# LLM training-data operators: dedup / similarity / text analysis /
# multimodal (beyond-reference, BASELINE.json north star)
# ---------------------------------------------------------------------------

from ad_data_pipelines_spark.operators import chunking as _chunking  # noqa: E402
from ad_data_pipelines_spark.operators import dedup as _dedup  # noqa: E402
from ad_data_pipelines_spark.operators import multimodal as _mm  # noqa: E402
from ad_data_pipelines_spark.operators import packing as _packing  # noqa: E402
from ad_data_pipelines_spark.operators import sampling as _sampling  # noqa: E402
from ad_data_pipelines_spark.operators import profile as _profile  # noqa: E402
from ad_data_pipelines_spark.operators import scd as _scd  # noqa: E402
from ad_data_pipelines_spark.operators import vocab as _vocab  # noqa: E402
from ad_data_pipelines_spark.operators import scrub as _scrub  # noqa: E402
from ad_data_pipelines_spark.operators import similarity as _sim  # noqa: E402
from ad_data_pipelines_spark.operators import textstats as _ts  # noqa: E402
from ad_data_pipelines_spark.operators import lm as _lm  # noqa: E402
from ad_data_pipelines_spark.operators import classify as _cls  # noqa: E402
from ad_data_pipelines_spark.operators import retrieval as _ret  # noqa: E402
from ad_data_pipelines_spark.operators import snapshot as _snapshot  # noqa: E402
from ad_data_pipelines_spark.operators import audit as _audit  # noqa: E402
from ad_data_pipelines_spark.operators import agg as _agg  # noqa: E402
from ad_data_pipelines_spark.operators import intervals as _intervals  # noqa: E402
from ad_data_pipelines_spark.operators import corpusstats as _cs  # noqa: E402
from ad_data_pipelines_spark.operators import fuzzy as _fuzzy  # noqa: E402
from ad_data_pipelines_spark.operators import graph as _graph  # noqa: E402
from ad_data_pipelines_spark.operators import sketch as _sketch_ops  # noqa: E402


@register(
    "llm_dedup_exact",
    oracle="""
        SELECT md5(text) AS content_hash,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS keeper_id
        FROM documents
        GROUP BY 1
    """,
    doc="Exact dedup via content-hash groupBy; deterministic keeper "
    "(min doc_id). operators/dedup.py:exact_dup_groups.",
)
def q_llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.exact_dup_groups(t(spark, sf_dir, "documents"))


@register(
    "llm_minhash_sig",
    oracle=_dedup.minhash_sql(),
    doc="MinHash signatures (16 perms over 5-char shingles, md5-portable "
    "hashing) — bit-identical to the SQL oracle. "
    "operators/dedup.py:minhash_signatures.",
)
def q_llm_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_sigs_shared(spark, sf_dir)


@register(
    "llm_lsh_candidates",
    oracle=_dedup.lsh_candidates_sql(),
    doc="LSH band-bucket candidate pairs (4 bands × 4 rows) with "
    "n_eq/16 estimated Jaccard. Scale path: explode-by-band self-join "
    "shuffles signatures only, never text. "
    "operators/dedup.py:lsh_candidate_pairs.",
)
def q_llm_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_pairs_shared(spark, sf_dir)


@register(
    "llm_ngram_jaccard",
    oracle=_dedup.ngram_jaccard_sql(max_doc_id=150),
    doc="Exact 5-gram Jaccard pairs ≥0.25 on a bounded scope (doc_id<150) "
    "— the quadratic verifier for LSH candidates; never run unscoped at "
    "scale. operators/dedup.py:ngram_jaccard_pairs.",
)
def q_llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    # scope filter applies to the SHARED shingle table too — feeding the
    # unscoped corpus into the quadratic verifier is exactly the misuse
    # its docstring bans
    return _dedup.ngram_jaccard_pairs(
        docs, min_jaccard=0.25,
        shingled=_shingles_shared(spark, sf_dir).filter(
            F.col("doc_id") < 150
        ),
    )


@register(
    "llm_containment",
    oracle=_dedup.ngram_containment_sql(max_doc_id=150),
    doc="Exact 5-gram containment pairs (either direction ≥0.5) on a "
    "bounded scope — catches subset duplication (short doc quoted inside "
    "a long one) that symmetric Jaccard misses. "
    "operators/dedup.py:ngram_containment_pairs.",
)
def q_llm_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    # scoped like the Jaccard verifier: quadratic form stays banned
    # unscoped; the shared shingle stage is filtered to the same scope
    return _dedup.ngram_containment_pairs(
        docs,
        min_containment=0.5,
        shingled=_shingles_shared(spark, sf_dir).filter(
            F.col("doc_id") < 150
        ),
    )


@register(
    "llm_dup_spans",
    oracle=_dedup.dup_span_coverage_sql(k=20),
    doc="EXACTSUBSTR duplicated-span coverage (Lee et al. 2022): per-doc "
    "fraction of characters under merged cross-doc 20-gram spans — the "
    "exact-substring complement to MinHash near-dup. "
    "operators/dedup.py:dup_span_coverage.",
)
def q_llm_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.dup_span_coverage(
        t(spark, sf_dir, "documents"),
        k=20,
        bounds=_span_bounds_shared(spark, sf_dir),
    )


@register(
    "llm_prefix_jaccard",
    oracle=_dedup.prefix_jaccard_sql(
        threshold=0.8,
        scope="(SELECT * FROM documents WHERE doc_id < 200)",
    ),
    doc="EXACT all-pairs word-set Jaccard ≥0.8 via prefix filtering "
    "(PPJoin family) — guaranteed-complete candidates from each set's "
    "rarest tokens under a global df order, then exact verification "
    "on candidates only; the deterministic regression baseline LSH "
    "recall is graded against. Scoped because the testdata's ~30-word "
    "vocabulary makes every prefix token hot (real corpora have "
    "Zipfian tails — prefixes there are genuinely rare). "
    "operators/dedup.py:prefix_jaccard_pairs.",
)
def q_llm_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return _dedup.prefix_jaccard_pairs(docs, threshold=0.8)


@register(
    "llm_dup_span_removal",
    oracle=_dedup.remove_dup_spans_sql(k=20),
    doc="EXACTSUBSTR dedup transform (Lee et al. 2022 removal step): "
    "merged cross-doc 20-gram spans excised from every non-owner doc "
    "(owner = global min doc_id per gram — deterministic keeper, "
    "SURVEY §4.4-6), text rebuilt array-side with an aggregate fold; "
    "each duplicated substring survives exactly once in the corpus. "
    "operators/dedup.py:remove_dup_spans.",
)
def q_llm_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.remove_dup_spans(
        t(spark, sf_dir, "documents"),
        k=20,
        bounds=_span_bounds_shared(spark, sf_dir),
    )


@register(
    "llm_dedup_threshold_curve",
    oracle=f"""
        WITH counts AS (
            SELECT n_eq, COUNT(*) AS c
            FROM ({_dedup.lsh_candidates_sql()}) GROUP BY n_eq
        )
        SELECT n_eq AS min_eq,
               CAST(SUM(c) OVER (ORDER BY n_eq DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_pairs_ge
        FROM counts
    """,
    doc="Dedup threshold sensitivity: candidate-pair count at each "
    "possible min_eq cutoff in one pass over the shared LSH pair table "
    "— the tuning report run before committing a similarity threshold. "
    "Cumulative window runs over ≤16 aggregated rows, never raw pairs.",
)
def q_llm_dedup_threshold_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    counts = (
        _lsh_pairs_shared(spark, sf_dir)
        .groupBy("n_eq")
        .agg(F.count("*").alias("c"))
    )
    w = (
        Window.orderBy(F.desc("n_eq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return counts.select(
        F.col("n_eq").alias("min_eq"),
        F.sum("c").over(w).cast("bigint").alias("n_pairs_ge"),
    )


@register(
    "llm_cooccurrence",
    oracle=_cs.cooccurrence_pmi_sql(),
    doc="Top-100 token-pair collocations by PMI within a ±3 window — "
    "surfaces glued-together templates/boilerplate; array-side pair "
    "extraction, nothing quadratic. "
    "operators/corpusstats.py:cooccurrence_pmi.",
)
def q_llm_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cs.cooccurrence_pmi(t(spark, sf_dir, "documents"))


@register(
    "llm_zipf",
    oracle=_cs.zipf_slope_sql(),
    doc="Per-language Zipf rank-frequency log-log slope over the top-100 "
    "words — one-number distribution fingerprint; slope drift between "
    "snapshots flags source-mix change. "
    "operators/corpusstats.py:zipf_slope.",
)
def q_llm_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cs.zipf_slope(t(spark, sf_dir, "documents"))


@register(
    "llm_source_diversity",
    oracle=_cs.source_diversity_sql(),
    doc="Per-source lexical-diversity triage: corpus-level word and "
    "bigram type-token ratios ACROSS a source's docs — the inter-doc "
    "self-BLEU-style signal per-doc repetition (Gopher) and "
    "boilerplate mining can't give: a templated-spam source whose "
    "docs are individually clean shows a collapsed corpus TTR long "
    "before pairwise dedup prices it, so this is the cheap first "
    "pass over thousands of sources. One token explode feeds both "
    "gram levels (bigrams via zip_with of the array against its "
    "tail, prefix-tagged — no second tokenization), then combinable "
    "per-(source, gram) counts and one per-source aggregate: two "
    "keyed shuffles, no windows, no driver data. "
    "operators/corpusstats.py:source_diversity.",
)
def q_llm_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cs.source_diversity(t(spark, sf_dir, "documents"))


@register(
    "llm_simhash",
    oracle=_dedup.simhash_sql(),
    doc="32-bit SimHash over word tokens (±1 per bit, sign-of-sum) — "
    "near-dups land within small Hamming distance. "
    "operators/dedup.py:simhash.",
)
def q_llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash_shared(spark, sf_dir)


def _simhash_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared(
        spark, sf_dir, "simhash",
        lambda: _dedup.simhash(t(spark, sf_dir, "documents")),
    )


def _simhash_pairs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the banded-Hamming self-join runs ONCE per session: both
    # llm_simhash_pairs and llm_candidate_agreement consume the same
    # (doc_a, doc_b, hamming) candidate table (r15 — previously each
    # re-ran the self-join + distinct over the shared signature table)
    return _shared(
        spark, sf_dir, "simhash_pairs",
        lambda: _dedup.simhash_candidates(
            _simhash_shared(spark, sf_dir), max_hamming=3
        ),
    )


@register(
    "llm_simhash_pairs",
    oracle=_dedup.simhash_candidates_sql(max_hamming=3),
    doc="SimHash near-dup pairs within Hamming distance 3 via banded "
    "blocking: 4 equal bit-bands self-joined on band equality "
    "(pigeonhole-complete for distance ≤ 3), then exact bit_count(xor) "
    "verification. The join shuffles (doc_id, simhash, band) only — "
    "one long per side, never text; shares the session's SimHash "
    "table with llm_simhash. operators/dedup.py:simhash_candidates.",
)
def q_llm_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash_pairs_shared(spark, sf_dir)


@register(
    "llm_token_stats",
    oracle="""
        SELECT lang, COUNT(*) AS n_docs,
               ROUND(AVG(len(regexp_split_to_array(trim(text), '\\s+'))), 4)
                   AS avg_tokens,
               ROUND(AVG(n_chars), 4) AS avg_chars
        FROM documents
        GROUP BY 1
    """,
    doc="Token counting (whitespace tokenizer) aggregated per language. "
    "operators/textstats.py:token_count.",
)
def q_llm_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(_ts.token_count("text")), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@register(
    "llm_quality",
    oracle=_ts.quality_sql(),
    doc="Per-doc quality features (token count, type-token ratio, mean "
    "token length, length score) — Gopher-style filter ingredients. "
    "operators/textstats.py:quality_features.",
)
def q_llm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _quality_features_shared(spark, sf_dir)


def _quality_features_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one explode+aggregate signal pass per session, consumed by the
    # standalone signal query AND the composite quality_filter verdict
    return _shared(
        spark, sf_dir, "quality_features",
        lambda: _ts.quality_features(t(spark, sf_dir, "documents")),
    )


@register(
    "llm_source_quality_shrunk",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
        ),
        per_doc AS (
            SELECT doc_id, COUNT(*) AS n_tokens,
                   COUNT(DISTINCT w) AS n_types
            FROM toks GROUP BY doc_id
        ),
        per_source AS (
            SELECT d.source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN p.n_tokens >= 50
                                  AND 2 * p.n_types >= p.n_tokens
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_good
            FROM documents d JOIN per_doc p USING (doc_id)
            GROUP BY d.source
        ),
        prior AS (
            SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
                   CAST(SUM(n_good) AS BIGINT) AS kk
            FROM per_source
        )
        SELECT source, n_docs, n_good,
               CAST((2 * n_good * 1000000 + n_docs) // (2 * n_docs)
                    AS BIGINT) AS raw_e6,
               CAST((2 * (n_good * nn + 50 * kk) * 1000000
                     + (n_docs + 50) * nn)
                    // (2 * (n_docs + 50) * nn) AS BIGINT) AS shrunk_e6
        FROM per_source, prior
        ORDER BY source
    """,
    doc="Empirical-Bayes SHRUNK per-source quality rate — the "
    "estimator source-level curation decisions actually need: a raw "
    "good-doc rate over few documents overfits (a 3-doc source with 3 "
    "passes is not a 100%-quality source), so each source's rate "
    "shrinks toward the corpus prior with strength s=50 pseudo-counts "
    "(Beta-Binomial posterior mean: (k + s·p0)/(n + s)). The good "
    "flag is integer-exact (n_tokens ≥ 50 AND 2·n_types ≥ n_tokens — "
    "the TTR≥0.5 rule restated without the ROUNDED float ratio, a "
    "cross-engine boundary trap), and both rates are half-up integer "
    "divisions in 1e-6 units, so the query hash-gates. Scale shape: "
    "reuses the SHARED quality_features pass (one explode per "
    "session), one doc-grain join-back, one per-source aggregate, one "
    "broadcast one-row prior scalar. Int64 headroom note: the exact "
    "integer restatement holds to ~1e11 docs·docs products; beyond "
    "that rescale the units upstream. operators/textstats.py:"
    "quality_features.",
)
def q_llm_source_quality_shrunk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    q = _quality_features_shared(spark, sf_dir).select(
        "doc_id", "n_tokens", "n_types"
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    good = (F.col("n_tokens") >= 50) & (
        2 * F.col("n_types") >= F.col("n_tokens")
    )
    per = (
        docs.join(q, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(good, 1).otherwise(0))
            .cast("bigint")
            .alias("n_good"),
        )
    )
    glob = per.agg(
        F.sum("n_docs").cast("bigint").alias("nn"),
        F.sum("n_good").cast("bigint").alias("kk"),
    )
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            "source",
            "n_docs",
            "n_good",
            F.expr("(2 * n_good * 1000000 + n_docs) DIV (2 * n_docs)")
            .cast("bigint")
            .alias("raw_e6"),
            F.expr(
                "(2 * (n_good * nn + 50 * kk) * 1000000"
                " + (n_docs + 50) * nn) DIV (2 * (n_docs + 50) * nn)"
            )
            .cast("bigint")
            .alias("shrunk_e6"),
        )
        .orderBy("source")
    )


def _entropy_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared(
        spark, sf_dir, "char_entropy",
        lambda: _ts.char_entropy(t(spark, sf_dir, "documents")),
    )


def _repetition_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared(
        spark, sf_dir, "repetition",
        lambda: _ts.repetition_signals(t(spark, sf_dir, "documents")),
    )


def _lang_id_oracle() -> str:
    scores = _ts.lang_scores_sql("text")
    cols = ",\n               ".join(
        f"{sql} AS score_{lang}" for lang, sql in scores.items()
    )
    langs = list(scores)
    m = "GREATEST(" + ", ".join(f"score_{la}" for la in langs) + ")"
    case = " ".join(f"WHEN score_{la} = {m} THEN '{la}'" for la in langs)
    return f"""
        WITH scored AS (
            SELECT doc_id,
               {cols}
            FROM documents
        )
        SELECT doc_id, {", ".join("score_" + la for la in langs)},
               CASE WHEN {m} > 0 THEN (CASE {case} END) ELSE 'und' END AS pred_lang
        FROM scored
    """


def _lang_confusion_oracle() -> str:
    scores = _ts.lang_scores_sql("text")
    cols = ",\n               ".join(
        f"{sql} AS score_{lang}" for lang, sql in scores.items()
    )
    langs = list(scores)
    m = "GREATEST(" + ", ".join(f"score_{la}" for la in langs) + ")"
    case = " ".join(f"WHEN score_{la} = {m} THEN '{la}'" for la in langs)
    return f"""
        WITH scored AS (
            SELECT lang,
               {cols}
            FROM documents
        )
        SELECT lang,
               CASE WHEN {m} > 0 THEN (CASE {case} END)
                    ELSE 'und' END AS pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM scored GROUP BY 1, 2
    """


@register(
    "llm_lang_confusion",
    oracle=_lang_confusion_oracle(),
    doc="Label-QA confusion matrix: declared language label × marker-"
    "scorer prediction, counted — the report that catches mislabeled "
    "or drifting language metadata before it biases a mixture. Reuses "
    "the shared one-pass scorer; one combinable (label, pred) count. "
    "(Same synthetic-corpus caveat as llm_lang_id: accuracy here is "
    "meaningless by construction; the matrix MECHANICS are what the "
    "oracle checks.)",
)
def q_llm_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    scores = _ts.lang_scores("text")
    return (
        docs.select(
            "lang", _ts.lang_id_from_scores(scores).alias("pred_lang")
        )
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


@register(
    "llm_lang_id",
    oracle=_lang_id_oracle(),
    doc="Language-ID marker scoring + argmax with fixed tie order. NOTE: "
    "the synthetic corpus draws all langs from one vocabulary, so "
    "accuracy vs the label column is meaningless by construction "
    "(operators/textstats.py module docstring); the oracle checks the "
    "scoring mechanics exactly.",
)
def q_llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    scores = _ts.lang_scores("text")
    # reuse the same score column objects for the argmax — codegen CSE
    # then evaluates each language's regexp scan once per row
    return docs.select(
        "doc_id",
        *[s.alias(f"score_{lang}") for lang, s in scores.items()],
        _ts.lang_id_from_scores(scores).alias("pred_lang"),
    )


@register(
    "llm_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    """,
    doc="Canonical content fingerprint: md5 of lowercased whitespace-"
    "collapsed text. operators/textstats.py:fingerprint.",
)
def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", _ts.fingerprint("text").alias("fp"))


@register(
    "llm_cosine_topk",
    oracle=_sim.cosine_topk_sql(max_query_id=25, k=5),
    doc="Brute-force cosine top-5 (query side vec_id<25, broadcast; "
    "corpus streamed, never shuffled). Double-precision zip_with/"
    "aggregate dot product. operators/similarity.py:cosine_topk.",
)
def q_llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cosine_truth25_shared(spark, sf_dir)


@register(
    "llm_hard_negatives",
    oracle=_sim.hard_negatives_sql(
        _dedup.dup_components_sql(min_eq=8), max_query_id=25, k=5
    ),
    doc="Contrastive-training hard-negative mining: per query (vec_id"
    "<25, broadcast) the top-5 most-similar corpus vectors EXCLUDING "
    "the query's own near-dup cluster — a near-dup sampled as a "
    "negative is a false negative that poisons the contrastive loss, "
    "so the dedup chain's cluster table (reused from the shared "
    "artifact) is the exclusion set. Corpus streams, never shuffles; "
    "cluster labels join at doc_id grain. operators/similarity.py:"
    "hard_negatives.",
)
def q_llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    comp = _dup_components_shared(spark, sf_dir, min_eq=8)
    return _sim.hard_negatives(
        emb, F.col("vec_id") < 25, comp.select("doc_id", "component"), k=5
    )


@register(
    "llm_ann_lsh",
    oracle=_sim.lsh_topk_sql(max_query_id=25, k=5, n_planes=4, multiprobe=1),
    doc="Hyperplane-LSH ANN top-5 (4 deterministic planes → 16 buckets, "
    "multi-probe Hamming-1): bucket ids are literal-plane sign tests so "
    "DuckDB reproduces them bit-for-bit. Recall floor additionally "
    "asserted in tests. operators/similarity.py:lsh_topk.",
)
def q_llm_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return _sim.lsh_topk(
        emb,
        emb.filter(F.col("vec_id") < 25),
        k=5,
        corpus_buckets=_lsh_buckets_shared(spark, sf_dir),
    )


def _lsh_buckets_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared(
        spark, sf_dir, "lsh_corpus_buckets",
        lambda: _sim.lsh_bucket(t(spark, sf_dir, "embeddings"), n_planes=4),
    )


def _cosine_truth25_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 ground truth for the 25-query eval set
    — the most expensive single computation of the recall family (full
    corpus × 25 dot products), consumed by llm_cosine_topk (as its
    result) and by llm_ann_recall / llm_ivf_recall (as the recall
    denominator). A production recall gate materializes its
    ground-truth table ONCE per index rebuild; this is the in-session
    twin of that artifact."""

    def build() -> DataFrame:
        emb = t(spark, sf_dir, "embeddings")
        return _sim.cosine_topk(emb, emb.filter(F.col("vec_id") < 25), k=5)

    return _shared(spark, sf_dir, "cosine_truth25", build)


def _l2_truth10_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact squared-L2 top-5 ground truth for the 10-query PQ eval set
    (same metric as PQ so the recall gate isolates quantization loss) —
    consumed by llm_l2_topk (as its result) and llm_pq_recall."""

    def build() -> DataFrame:
        emb = t(spark, sf_dir, "embeddings")
        return _sim.l2_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)

    return _shared(spark, sf_dir, "l2_truth10", build)


@register(
    "llm_ann_recall",
    oracle=f"""
        WITH brute AS ({_sim.cosine_topk_sql(max_query_id=25, k=5)}),
        ann AS (
            {_sim.lsh_topk_sql(max_query_id=25, k=5, n_planes=4,
                               multiprobe=1)}
        ),
        per_q AS (
            SELECT b.query_id,
                   COUNT(*) AS k,
                   COUNT(a.neighbor_id) AS hits
            FROM brute b
            LEFT JOIN ann a
              ON b.query_id = a.query_id
             AND b.neighbor_id = a.neighbor_id
            GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               ROUND(AVG(hits * 1.0 / k), 4) AS mean_recall,
               ROUND(MIN(hits * 1.0 / k), 4) AS min_recall
        FROM per_q
    """,
    doc="ANN quality gate as a query: per-query recall of the LSH "
    "top-5 against the brute-force cosine ground truth (same 25-query "
    "scope), reported as mean/min — the regression report a pipeline "
    "runs before trusting an index rebuild. Composes the two existing "
    "search paths; ground truth stays scoped so the brute side never "
    "runs unbounded. Hit counting is the JOIN-FREE _recall_report "
    "union+aggregate (both top-k sides are bounded n_queries×k rows "
    "but carry product size estimates — the a30 misplan class; with "
    "no join there is nothing to misplan).",
)
def q_llm_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 25)
    brute = _cosine_truth25_shared(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ann = _sim.lsh_topk(
        emb, q, k=5, corpus_buckets=_lsh_buckets_shared(spark, sf_dir)
    ).select("query_id", "neighbor_id")
    return _recall_report(brute, ann)


def _recall_report(truth: DataFrame, ann: DataFrame) -> DataFrame:
    """(n_queries, mean_recall, min_recall) of `ann` against `truth`
    WITHOUT a join. Both inputs are (query_id, neighbor_id) top-k
    outputs — bounded at n_queries×k rows, but their static size
    estimates are window/join products (the a30 misplan class: the
    planner put the r9 recall joins on a sort-merge path that AQE
    never backed out, harmless at 125 rows yet exactly the shape that
    bites at scale). The union + two-aggregate restatement has no
    join side to misplan: tag each source, collapse per
    (query_id, neighbor_id), keep truth rows, count which also
    appeared in ann — identical semantics to the LEFT JOIN because
    top-k outputs are unique per (query_id, neighbor_id)."""
    tagged = truth.select(
        "query_id",
        "neighbor_id",
        F.lit(1).alias("in_truth"),
        F.lit(0).alias("in_ann"),
    ).unionByName(
        ann.select(
            "query_id",
            "neighbor_id",
            F.lit(0).alias("in_truth"),
            F.lit(1).alias("in_ann"),
        )
    )
    per_q = (
        tagged.groupBy("query_id", "neighbor_id")
        .agg(
            F.max("in_truth").alias("in_truth"),
            F.max("in_ann").alias("in_ann"),
        )
        .filter(F.col("in_truth") == 1)
        .groupBy("query_id")
        .agg(F.count("*").alias("k"), F.sum("in_ann").alias("hits"))
    )
    recall = F.col("hits") / F.col("k")
    return per_q.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.round(F.avg(recall), 4).alias("mean_recall"),
        F.round(F.min(recall), 4).alias("min_recall"),
    )


@register(
    "llm_mm_binary_meta",
    oracle=_mm.BINARY_META_SQL,
    doc="Multimodal plumbing: opaque binary payload + Arrow-batched "
    "mapInPandas metadata extraction (byte length + checksum). The "
    "heavy-codec decode runs Pillow when present (PNG decodes via the "
    "stdlib zlib path regardless) and this "
    "proves schema/batching/UDF-signature end-to-end. "
    "operators/multimodal.py:binary_meta.",
)
def q_llm_mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mm.binary_meta(t(spark, sf_dir, "documents"))


#: md5-portable 60-bit hash + controlled bit flips, shared by the
#: llm_mm_dhash_pairs query and its oracle: docs in groups of 10 share
#: a base hash; slots 1-3 flip 1/2/3 distinct bits (near-dups), the
#: rest get isolated per-doc hashes. Deterministic in both engines.
_DHASH_BASE = (
    "CAST(conv(substring(md5(CAST(doc_id DIV 10 AS STRING)), 1, 15), "
    "16, 10) AS BIGINT)"
)
_DHASH_ISO = (
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), "
    "16, 10) AS BIGINT)"
)
_DHASH_B = [
    "shiftleft(CAST(1 AS BIGINT), CAST((doc_id DIV 10) % 60 AS INT))",
    "shiftleft(CAST(1 AS BIGINT), "
    "CAST(((doc_id DIV 10) * 7 + 17) % 60 AS INT))",
    "shiftleft(CAST(1 AS BIGINT), "
    "CAST(((doc_id DIV 10) * 13 + 29) % 60 AS INT))",
]
_DHASH_SQL = f"""CASE CAST(doc_id % 10 AS INT)
        WHEN 0 THEN {_DHASH_BASE}
        WHEN 1 THEN {_DHASH_BASE} ^ {_DHASH_B[0]}
        WHEN 2 THEN {_DHASH_BASE} ^ {_DHASH_B[0]} ^ {_DHASH_B[1]}
        WHEN 3 THEN {_DHASH_BASE} ^ {_DHASH_B[0]} ^ {_DHASH_B[1]} ^ {_DHASH_B[2]}
        ELSE {_DHASH_ISO} END"""


@register(
    "llm_mm_dhash_pairs",
    oracle=f"""
        WITH hb AS (
            SELECT doc_id,
                   CASE CAST(doc_id % 10 AS INT)
                     WHEN 0 THEN CAST('0x' || substr(md5(CAST(doc_id // 10 AS VARCHAR)), 1, 15) AS BIGINT)
                     WHEN 1 THEN xor(CAST('0x' || substr(md5(CAST(doc_id // 10 AS VARCHAR)), 1, 15) AS BIGINT),
                                     1::BIGINT << CAST((doc_id // 10) % 60 AS INTEGER))
                     WHEN 2 THEN xor(xor(CAST('0x' || substr(md5(CAST(doc_id // 10 AS VARCHAR)), 1, 15) AS BIGINT),
                                         1::BIGINT << CAST((doc_id // 10) % 60 AS INTEGER)),
                                     1::BIGINT << CAST(((doc_id // 10) * 7 + 17) % 60 AS INTEGER))
                     WHEN 3 THEN xor(xor(xor(CAST('0x' || substr(md5(CAST(doc_id // 10 AS VARCHAR)), 1, 15) AS BIGINT),
                                             1::BIGINT << CAST((doc_id // 10) % 60 AS INTEGER)),
                                         1::BIGINT << CAST(((doc_id // 10) * 7 + 17) % 60 AS INTEGER)),
                                     1::BIGINT << CAST(((doc_id // 10) * 13 + 29) % 60 AS INTEGER))
                     ELSE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                   END AS dhash
            FROM documents WHERE doc_id < 2000
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
        FROM hb a JOIN hb b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    """,
    doc="Perceptual-hash near-dup pairing (operators/multimodal.py:"
    "dhash_near_dup_pairs) under an oracle: Spark runs the production "
    "4×16-bit-band pigeonhole join (shuffles 8-byte hashes, never "
    "pixels, never all-pairs); the DuckDB oracle BRUTE-FORCES every "
    "pair, independently proving the banding is exact for Hamming ≤3. "
    "Hashes are md5-derived with controlled 1/2/3-bit flips so true "
    "near-dups exist (the pixel→dHash stage itself is pytest-covered: "
    "test_image_dhash_and_near_dup_pairs — not SQL-expressible).",
)
def q_llm_mm_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    hashes = docs.select("doc_id", F.expr(_DHASH_SQL).alias("dhash"))
    return _mm.dhash_near_dup_pairs(hashes, max_hamming=3)


# ---------------------------------------------------------------------------
# Geometry, coordinate, journey-grain and avg-of-daily-ratio operators
# ---------------------------------------------------------------------------

from ad_data_pipelines_spark.functions.geo import (  # noqa: E402
    dddmmss_to_decimal,
    dddmmss_to_decimal_sql,
)
from ad_data_pipelines_spark.functions.timeutil import (  # noqa: E402
    clamp_outliers,
    minutes_between,
)
from ad_data_pipelines_spark.operators import geo as _geo  # noqa: E402

#: test polygons for the J12 point-in-polygon label join (grid units)
_POLYGONS: dict[str, list[tuple[float, float]]] = {
    "triangle": [(-80.0, -80.0), (0.0, 60.0), (80.0, -80.0)],
    "box": [(-95.0, 65.0), (-35.0, 65.0), (-35.0, 95.0), (-95.0, 95.0)],
}


@register(
    "p20_coord_convert",
    oracle=f"""
        SELECT p_partkey,
               ((p_partkey * 7919) % 3600000000) - 1800000000 AS lon_raw,
               {dddmmss_to_decimal_sql('(((p_partkey * 7919) % 3600000000) - 1800000000)')}
                   AS lon_dec
        FROM part
    """,
    doc="P20 signed DDDMMSSmmm→decimal-degree conversion as pure column "
    "arithmetic (reference row fn "
    "scripts/ads_passenger_travel_time_di.R:29-48). Input synthesized "
    "deterministically from p_partkey.",
)
def q_coord_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    raw = (F.col("p_partkey") * 7919) % 3600000000 - 1800000000
    return part.select(
        "p_partkey",
        raw.alias("lon_raw"),
        dddmmss_to_decimal(raw).alias("lon_dec"),
    )


@register(
    "w2_transfer_time",
    oracle="""
        SELECT event_id, user_id,
               ROUND(
                 CASE WHEN gap_min < 0 OR gap_min > 240 THEN 0 ELSE gap_min END,
               4) AS transfer_min
        FROM (
            SELECT event_id, user_id,
                   (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)) / 60000000.0
                       AS gap_min
            FROM events
        )
    """,
    doc="W2 LAG previous-event time + P13 minutes-diff + P14 outlier clamp "
    "(<0 or >240 min → 0): the reference's transfer-time computation "
    "(scripts/ads_passenger_travel_info_mi.py:195-205, "
    "ads_passenger_travel_time_di.R:165-173) computed globally — no "
    "chunk-boundary journey splits (SURVEY.md §4.4-3).",
)
def q_transfer_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)) / 60_000_000.0
    return ev.select(
        "event_id",
        "user_id",
        F.round(clamp_outliers(gap, 0, 240), 4).alias("transfer_min"),
    )


@register(
    "a10_journey_reagg",
    oracle="""
        WITH journey AS (
            SELECT l_orderkey, SUM(l_quantity) AS qty_sum, COUNT(*) AS n_legs
            FROM lineitem GROUP BY 1
        )
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               COUNT(*) AS journeys,
               ROUND(AVG(n_legs), 4) AS avg_legs,
               ROUND(SUM(qty_sum), 2) AS qty_total
        FROM journey JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    doc="A10 two-level re-aggregation: legs→journey→month (reference "
    "journey rollup scripts/ads_passenger_travel_time_di.R:200-222). "
    "The leg→journey agg pre-shuffles on orderkey; the second agg is "
    "tiny.",
)
def q_journey_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    journey = li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("qty_sum"), F.count("*").alias("n_legs")
    )
    return (
        journey.join(orders, journey.l_orderkey == orders.o_orderkey)
        .groupBy(month_str("o_orderdate").alias("order_month"))
        .agg(
            F.count("*").alias("journeys"),
            F.round(F.avg("n_legs"), 4).alias("avg_legs"),
            F.round(F.sum("qty_sum"), 2).alias("qty_total"),
        )
    )


@register(
    "a11_avg_daily_ratio",
    oracle="""
        WITH daily AS (
            SELECT strftime(ts, '%Y-%m') AS m, CAST(ts AS DATE) AS d, event_type,
                   COUNT(*) AS trips, COUNT(DISTINCT user_id) AS users
            FROM events GROUP BY 1, 2, 3
        )
        SELECT m AS month, event_type,
               ROUND(SUM(CASE WHEN users > 0 THEN trips * 1.0 / users ELSE 0 END)
                     / day(last_day(MIN(d))), 6) AS avg_daily_trips_per_user
        FROM daily GROUP BY 1, 2
    """,
    doc="A11 avg-of-daily-ratios — the reference's hardest metric "
    "(scripts/ads_passenger_travel_info_mi.py:415-436): "
    "Σ_days(trips/users)÷calendar-days, zero-user days contribute 0, "
    "divisor is calendar days not active days. Exact count(distinct) "
    "here for the oracle; production swaps in approx_count_distinct.",
)
def q_avg_daily_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        month_str("ts").alias("month"),
        F.to_date("ts").alias("d"),
        "event_type",
    ).agg(
        F.count("*").alias("trips"), F.countDistinct("user_id").alias("users")
    )
    ratio = F.when(F.col("users") > 0, F.col("trips") / F.col("users")).otherwise(0.0)
    return (
        daily.withColumn("ratio", ratio)
        .groupBy("month", "event_type")
        .agg(
            F.round(
                F.sum("ratio") / F.dayofmonth(F.last_day(F.min("d"))), 6
            ).alias("avg_daily_trips_per_user")
        )
    )


@register(
    "a14_wkt_assembly",
    oracle="""
        SELECT l_orderkey,
               'LINESTRING(' || string_agg(
                   printf('%.6f %.6f', x, y), ', ' ORDER BY s, x, y
               ) || ')' AS wkt
        FROM (
            SELECT l_orderkey, l_linenumber AS s,
                   CAST(l_partkey % 100 AS DOUBLE) AS x,
                   CAST(l_suppkey % 100 AS DOUBLE) AS y
            FROM lineitem
        )
        GROUP BY 1
    """,
    doc="A14 ordered geometry assembly → WKT linestring text, no geo "
    "engine: sort_array(collect_list(struct)) + transform + concat "
    "(reference sf st_linestring + WKT out, "
    "dwd_bus_route_info_mf & other 2.R:109-119, 259). Full-struct sort "
    "keeps tied sequence numbers deterministic.",
)
def q_wkt_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_linenumber").alias("s"),
        (F.col("l_partkey") % 100).cast("double").alias("x"),
        (F.col("l_suppkey") % 100).cast("double").alias("y"),
    )
    return _geo.linestring_wkt(li, ["l_orderkey"], "s", "x", "y")


def _j12_oracle() -> str:
    x = "(((c_custkey * 37) % 200) - 100)"
    y = "(((c_custkey * 73) % 200) - 100)"
    tri = _geo.point_in_polygon_sql(x, y, _POLYGONS["triangle"])
    box = _geo.point_in_polygon_sql(x, y, _POLYGONS["box"])
    return f"""
        SELECT CASE WHEN {tri} THEN 'triangle'
                    WHEN {box} THEN 'box'
                    ELSE 'Unknown' END AS region_id,
               COUNT(*) AS n_points
        FROM customer
        GROUP BY 1
    """


@register(
    "j12_point_in_polygon",
    oracle=_j12_oracle(),
    doc="J12 spatial containment as a zero-shuffle column expression: "
    "ray-casting unrolled over each (broadcast, few) polygon's edges — "
    "the reference's st_within stops⋈regions join "
    "(dwd_bus_route_info_mf & other 2.R:338-340) for a handful of "
    "polygons at any point-table scale. Points synthesized from "
    "c_custkey.",
)
def q_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    pts = cust.select(
        ((F.col("c_custkey") * 37) % 200 - 100).cast("double").alias("px"),
        ((F.col("c_custkey") * 73) % 200 - 100).cast("double").alias("py"),
    )
    labeled = _geo.label_by_polygons(pts, "px", "py", _POLYGONS)
    return labeled.groupBy("region_id").agg(F.count("*").alias("n_points"))


@register(
    "j21_grid_knn",
    oracle="""
        WITH a AS (
            SELECT c_custkey,
                   (c_custkey * 37) % 200 AS ax,
                   (c_custkey * 73) % 200 AS ay
            FROM customer
        ),
        b AS (
            SELECT s_suppkey,
                   (s_suppkey * 41) % 200 AS bx0,
                   (s_suppkey * 89) % 200 AS by0
            FROM supplier
        ),
        pairs AS (
            SELECT c_custkey, s_suppkey,
                   (ax - bx0) * (ax - bx0) + (ay - by0) * (ay - by0)
                       AS dist2
            FROM a CROSS JOIN b
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY c_custkey ORDER BY dist2, s_suppkey
            ) AS rn FROM pairs
        )
        SELECT c_custkey,
               s_suppkey AS nearest_s_suppkey,
               CAST(dist2 AS BIGINT) AS dist2
        FROM ranked WHERE rn = 1
    """,
    doc="Exact nearest-neighbor spatial join via grid blocking "
    "(cell=25): right points replicate to 3×3 neighbor cells, "
    "equi-join on cell, integer squared distances, min(struct) per "
    "left point; a grid match closer than one cell is provably global "
    "nearest, the rest fall back to a brute pass against the "
    "broadcast right side — never an unscoped cross join (the "
    "oracle's cross join is oracle-scale only). "
    "operators/geo.py:grid_knn_join.",
)
def q_j21_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_pts = t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 37) % 200).alias("ax"),
        ((F.col("c_custkey") * 73) % 200).alias("ay"),
    )
    supp_pts = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 41) % 200).alias("bx0"),
        ((F.col("s_suppkey") * 89) % 200).alias("by0"),
    )
    return _geo.grid_knn_join(
        cust_pts,
        supp_pts,
        left_id="c_custkey",
        right_id="s_suppkey",
        lx="ax",
        ly="ay",
        rx="bx0",
        ry="by0",
        cell=25,
    )


# ---------------------------------------------------------------------------
# Sessionization + remaining conditional-sum coverage
# ---------------------------------------------------------------------------

from ad_data_pipelines_spark.operators.sessionize import (  # noqa: E402
    sessionize,
    sessionize_sql,
)


@register(
    "t3_sessionize",
    oracle=sessionize_sql(timeout_min=30.0),
    doc="Gap-based sessionization (30-min timeout): lag-gap flag + "
    "running-sum session ids + per-session aggregate, one shuffle. "
    "Streaming twin = session_window(ts, '30 minutes'). "
    "operators/sessionize.py.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(t(spark, sf_dir, "events"), timeout_min=30.0)


@register(
    "j22_min_cost_supplier",
    oracle="""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   MIN((2 * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        + CAST(l_quantity AS BIGINT))
                       // (2 * CAST(l_quantity AS BIGINT)))
                       AS unit_cents
            FROM lineitem GROUP BY 1, 2
        ),
        ranked AS (
            SELECT p.p_partkey, ps.l_suppkey, ps.unit_cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.p_partkey
                       ORDER BY ps.unit_cents, ps.l_suppkey
                   ) AS rn
            FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
            WHERE p.p_size < 15
        )
        SELECT r.p_partkey, s.s_name, n.n_name,
               r.unit_cents / 100.0 AS unit_cost
        FROM ranked r
        JOIN supplier s ON s.s_suppkey = r.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE r.rn = 1
    """,
    doc="TPC-H Q2 SHAPE on the available tables (no partsupp in this "
    "testdata): cheapest-supplier-per-part from lineitem facts — "
    "per-(part,supp) MIN of per-row unit price in EXACT INTEGER "
    "cents: round(ep/q, 2) restated as the half-up integer division "
    "(2·ep_cents + q) DIV (2q), because Spark and DuckDB ROUND "
    "diverge within 1 ulp of the .005 boundary (bit the sf0.1 parity "
    "sweep in round 6; same fix as p20's coordinate rounding). "
    "Window rank 1 per part with a unique tiebreak, broadcast name "
    "lookups, p_size predicate pushed to the part scan. The "
    "correlated-subquery pattern as one window pass.",
)
def q_j22_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    unit_cents = F.expr(
        "(2 * CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
        " + CAST(l_quantity AS BIGINT))"
        " DIV (2 * CAST(l_quantity AS BIGINT))"
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit_cents).alias("unit_cents")
    )
    pp = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size") < 15)
        .select("p_partkey")
    )
    ranked = ps.join(
        pp, ps.l_partkey == pp.p_partkey
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("p_partkey").orderBy(
                "unit_cents", "l_suppkey"
            )
        ),
    ).filter(F.col("rn") == 1)
    supp = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        ranked.join(maybe_broadcast(supp), ranked.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            (F.col("unit_cents") / 100.0).alias("unit_cost"),
        )
    )


@register(
    "j23_small_quantity_revenue",
    oracle="""
        SELECT p_brand,
               ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = p_partkey
        )
        GROUP BY 1
    """,
    doc="TPC-H Q17 shape: per-group-aggregate threshold (line items "
    "below 20% of their part's average quantity). The oracle is the "
    "CORRELATED scalar subquery; the Spark plan is its decorrelation "
    "— ONE per-part aggregate joined back on l_partkey (never a "
    "correlated re-scan per row), then the broadcast part-dim join. "
    "Exact cross-engine: quantities are integer-valued doubles, so "
    "SUM is exact and AVG*0.2 is a deterministic pair of IEEE ops. "
    "At 100 TB: the aggregate and the fact shuffle once on the same "
    "key; AQE picks the physical join.",
)
def q_j23_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    thresh = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    pb = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .join(maybe_broadcast(pb), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "j24_sole_late_supplier",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN orders   ON o_orderkey = l1.l_orderkey
                     AND o_orderstatus = 'F'
        JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY 1
    """,
    doc="TPC-H Q21 shape: multi-EXISTS semi/anti join — late line items "
    "(shipped >60 days after an 'F' order's date) of the ONLY late "
    "supplier on a multi-supplier order. The oracle keeps the two "
    "correlated EXISTS; the Spark plan decorrelates both into ONE "
    "per-(order,supplier) aggregate + ONE per-order aggregate: "
    "n_supp>1 replaces the EXISTS, n_late_suppliers==1 replaces the "
    "NOT EXISTS — the fact is scanned once and shuffles once on "
    "l_orderkey (the second aggregate reuses that partitioning), "
    "instead of three correlated re-scans. Supplier names broadcast.",
)
def q_j24_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    ords = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    per_os = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(late, 1).otherwise(0)).alias("n_late"))
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.when(F.col("n_late") > 0, 1).otherwise(0)).alias(
            "n_late_supp"
        ),
    )
    qual = (
        per_os.join(per_o, "l_orderkey")
        .filter(
            (F.col("n_late") > 0)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qual.join(maybe_broadcast(supp), qual.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late").cast("bigint").alias("numwait"))
    )


@register(
    "j25_idle_rich_customers",
    oracle="""
        SELECT c_nationkey, COUNT(*) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM customer
        WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT)
              * (SELECT COUNT(*) FROM customer c2
                 WHERE ROUND(c2.c_acctbal * 100) > 0)
              > (SELECT SUM(CAST(ROUND(c3.c_acctbal * 100) AS BIGINT))
                 FROM customer c3 WHERE ROUND(c3.c_acctbal * 100) > 0)
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1999-01-01'
          )
        GROUP BY 1
    """,
    doc="TPC-H Q22 shape: customers above the positive-balance average "
    "with NO RECENT orders (none since 1999), by nation. Decorrelation: the scalar average "
    "broadcasts as a 1-row cross join (never a per-row re-scan), the "
    "NOT EXISTS becomes one left-anti join on the order keys. "
    "EXACT threshold cross-engine: balances are cents, so the "
    "avg comparison is done in integers — cents·n_pos > Σcents — "
    "instead of a float average whose summation order could flip a "
    "boundary row.",
)
def q_j25_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").withColumn(
        "cents", F.round(F.col("c_acctbal") * 100).cast("bigint")
    )
    pos = cust.filter(F.col("cents") > 0).agg(
        F.count("*").alias("n_pos"),
        F.sum("cents").alias("sum_pos_cents"),
    )
    rich = cust.crossJoin(F.broadcast(pos)).filter(
        F.col("cents") * F.col("n_pos") > F.col("sum_pos_cents")
    )
    idle = rich.join(
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    )
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@register(
    "j26_dominant_suppliers",
    oracle="""
        SELECT s_name, COUNT(*) AS n_parts
        FROM (
            SELECT l1.l_partkey AS pk, l1.l_suppkey AS sk
            FROM lineitem l1
            GROUP BY 1, 2
            HAVING SUM(CAST(l_quantity AS BIGINT)) * 5
                 > (SELECT SUM(CAST(l2.l_quantity AS BIGINT))
                    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        ) d JOIN supplier ON s_suppkey = sk
        GROUP BY 1
    """,
    doc="TPC-H Q20 shape: two-level aggregate threshold — suppliers "
    "shipping >20% of a part's total quantity ('dominant'), counted "
    "per supplier. The oracle keeps the correlated scalar in HAVING; "
    "the Spark plan decorrelates to one (part,supplier) aggregate + "
    "one part aggregate joined on the part key (the second aggregate "
    "is a re-aggregation of the first — the fact scans ONCE), "
    "integer-exact threshold (quantities are integral, ×5 "
    "avoids float division), supplier names broadcast.",
)
def q_j26_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty_ps")
    )
    per_part = ps.groupBy("l_partkey").agg(
        F.sum("qty_ps").alias("qty_p")
    )
    dominant = ps.join(per_part, "l_partkey").filter(
        F.col("qty_ps") * 5 > F.col("qty_p")
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        dominant.join(
            maybe_broadcast(supp), dominant.l_suppkey == supp.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("n_parts"))
    )


@register(
    "a27_large_volume_orders",
    oracle="""
        SELECT c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               ROUND(o_totalprice, 2) AS total_price,
               CAST(sum_qty AS BIGINT) AS sum_qty
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN (
            SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
            FROM lineitem GROUP BY 1
            HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
        ) big ON o_orderkey = big.l_orderkey
    """,
    doc="TPC-H Q18 shape (large-volume orders): HAVING-filtered "
    "aggregate joined back to its parents. The per-order aggregate "
    "shrinks the fact BEFORE any join (HAVING > 300 keeps a sliver), "
    "so the orders join is small-vs-large and the customer dim "
    "broadcasts — the aggregate-then-join ordering that matters at "
    "100 TB (joining first would shuffle every line item against "
    "orders). Integer-exact quantities; price rounded.",
)
def q_a27_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.col("sum_qty").cast("bigint").alias("sum_qty"),
        )
    )


@register(
    "a28_important_suppliers",
    oracle="""
        WITH v AS (
            SELECT l_suppkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                       AS value_e4
            FROM lineitem GROUP BY 1
        )
        SELECT l_suppkey,
               ((value_e4 + 50) // 100) / 100.0 AS supp_value
        FROM v, (SELECT SUM(value_e4) AS total_e4, COUNT(*) AS n_supp
                 FROM v) t
        WHERE value_e4 * n_supp * 10 > total_e4 * 11
    """,
    doc="TPC-H Q11 shape: groups above a FRACTION of the global total "
    "(suppliers carrying >1.1x the mean supplier share — scale-free, "
    "so the query stays non-trivial at any SF). The "
    "correlated-scalar oracle vs the decorrelated plan: ONE supplier "
    "aggregate, ONE 1-row global re-aggregation broadcast back — the "
    "global total is a re-sum of the group table, so the fact scans "
    "once. EXACT threshold: revenue in integer 1e-4 units "
    "(cents × (100−discount%)), so double summation order cannot "
    "flip a boundary supplier.",
)
def q_a28_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    value = F.sum(
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    ).alias("value_e4")
    v = li.groupBy("l_suppkey").agg(value)
    total = v.agg(
        F.sum("value_e4").alias("total_e4"),
        F.count("*").alias("n_supp"),
    )
    return (
        v.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_e4") * F.col("n_supp") * 10
            > F.col("total_e4") * 11
        )
        .select(
            "l_suppkey",
            (F.expr("(value_e4 + 50) DIV 100") / 100.0)
            .alias("supp_value"),
        )
    )


@register(
    "a29_top_revenue_suppliers",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                       AS rev_e4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate <  TIMESTAMP '1995-04-01'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name,
               ((rev_e4 + 50) // 100) / 100.0 AS total_revenue
        FROM rev JOIN supplier ON s_suppkey = l_suppkey
        WHERE rev_e4 = (SELECT MAX(rev_e4) FROM rev)
    """,
    doc="TPC-H Q15 shape: the group(s) achieving the MAX of an "
    "aggregate (top revenue supplier for a quarter — the reference's "
    "top-N KPI glossary pattern taken to its max-of-aggregate "
    "edge). Decorrelated: quarterly supplier aggregate + 1-row max "
    "re-aggregation broadcast back; ties all surface (no arbitrary "
    "LIMIT 1). Integer 1e-4 revenue units make the max comparison "
    "exact; pushed quarter filter reaches the scan.",
)
def q_a29_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1995-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("rev_e4")
    )
    mx = rev.agg(F.max("rev_e4").alias("max_e4"))
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_e4") == F.col("max_e4"))
        .join(maybe_broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.expr("(rev_e4 + 50) DIV 100") / 100.0)
            .alias("total_revenue"),
        )
    )


@register(
    "j27_customer_order_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY 1
        ) c_orders
        GROUP BY 1
    """,
    doc="TPC-H Q13 shape: the DISTRIBUTION of per-group sizes "
    "including empty groups (orders per customer, urgent excluded — "
    "the left join is what makes zero-order customers countable; an "
    "inner join would silently drop them). Two aggregates: per-key "
    "count, then a histogram of counts — the degree-distribution "
    "report every join-planning decision wants (it is o14's skew "
    "report generalized to the full histogram). COUNT(col) not "
    "COUNT(*): unmatched left rows must count 0, not 1.",
)
def q_j27_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


@register(
    "p24_disjunctive_revenue",
    oracle="""
        SELECT COUNT(*) AS n_items,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity >= 10 AND l_quantity <= 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="TPC-H Q19 shape: an OR of conjunct bundles spanning BOTH join "
    "sides. The planner must split the disjunction: the part-only "
    "prefix (brand ∈ {12,23,34}, size ≤ 35) pushes into the part "
    "scan and the quantity envelope (1..30) into the lineitem scan "
    "BEFORE the join, with the exact disjunction re-checked after — "
    "Catalyst does this given the declarative predicate; the query "
    "exists to pin that it stays true. Part side broadcasts.",
)
def q_p24_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    bundle = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .filter(bundle)
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
        )
    )


@register(
    "j28_nation_trade_volume",
    oracle="""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(strftime(l_shipdate, '%Y') AS BIGINT) AS ship_year,
               COUNT(*) AS n_items,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                   AS volume
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        WHERE sn.n_name IN ('NATION_1', 'NATION_2')
          AND cn.n_name IN ('NATION_1', 'NATION_2')
          AND sn.n_name <> cn.n_name
        GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: cross-nation trade volume — the 5-table star "
    "join (fact → orders → customer, fact → supplier, two nation "
    "aliases) with a pair predicate. Scale shape: the nation pair is "
    "SCHEMA-bounded (2 of 25 rows at every SF), so both dim sides "
    "take the a30 treatment — the collected (key, name) pairs become "
    "a pushed IN-list on the supplier/customer scans plus a literal "
    "CASE map for the name, leaving each probe side a Filter+Project "
    "LEAF whose size estimate the static planner gets right (a "
    "dim⋈dim-of-dim probe side carries a product-of-children "
    "estimate that forced a sort-merge join on o_custkey here, the "
    "same misplan class a30 hit; AQE never backs it out). The fact "
    "shuffles once (the orders join); year extraction and rounded "
    "volume follow the standard determinism rules.",
)
def q_j28_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = ("NATION_1", "NATION_2")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # nation is schema-bounded (25 rows at EVERY SF): collect the two
    # target (key, name) pairs once per (session, sf_dir) — a
    # constant-size probe — and push membership into the parquet scans
    pair_nat = _dim_keys(
        spark, sf_dir, "j28_pair_nations",
        lambda: [
            (r.n_nationkey, r.n_name)
            for r in nat.filter(F.col("n_name").isin(*nations)).collect()
        ],
    )
    pair_keys = [k for k, _ in pair_nat]

    def nation_name(col: str):  # literal CASE map, no join to misplan
        expr = F.lit(None).cast("string")
        for k, name in pair_nat:
            expr = F.when(F.col(col) == F.lit(k), F.lit(name)).otherwise(expr)
        return expr

    supp = (
        t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .filter(F.col("s_nationkey").isin(pair_keys))
        .select("s_suppkey", nation_name("s_nationkey").alias("supp_nation"))
    )
    cust = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .filter(F.col("c_nationkey").isin(pair_keys))
        .select("c_custkey", nation_name("c_nationkey").alias("cust_nation"))
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
    return (
        li.join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("volume"),
        )
    )


@register(
    "w8_balance_deciles",
    oracle="""
        SELECT decile,
               COUNT(*) AS n_cust,
               ROUND(MIN(c_acctbal), 2) AS lo_bal,
               ROUND(MAX(c_acctbal), 2) AS hi_bal
        FROM (
            SELECT c_acctbal,
                   CAST(NTILE(10) OVER (
                       ORDER BY c_acctbal, c_custkey
                   ) AS BIGINT) AS decile
            FROM customer
        )
        GROUP BY 1
    """,
    doc="W8 (beyond-reference): global decile assignment — the "
    "rank-bucket window completing the window family (lead/lag/rank/"
    "rolling/cumulative-share), reported as per-decile counts and "
    "balance ranges. ORDER includes c_custkey so equal balances "
    "assign deterministically (the windows-on-unique-keys rule). "
    "The oracle keeps the declarative NTILE SQL; the Spark plan is "
    "the SCALE-SAFE equivalent, `agg.distributed_ntile`: range-shard "
    "on the balance, within-shard row_number, per-shard counts give "
    "broadcast offsets and the exact NTILE split as integer algebra "
    "— row-identical to a global NTILE with NO single-partition sort "
    "over the fact (only the ≤64-row shard-count table crosses a "
    "global window). Enforced by test_plan_hygiene's "
    "single-partition-collapse ban.",
)
def q_w8_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ad_data_pipelines_spark.operators.agg import distributed_ntile

    cust = t(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    dec = distributed_ntile(
        cust, 10, ["c_acctbal", "c_custkey"], out_col="decile"
    )
    return dec.groupBy("decile").agg(
        F.count("*").alias("n_cust"),
        F.round(F.min("c_acctbal"), 2).alias("lo_bal"),
        F.round(F.max("c_acctbal"), 2).alias("hi_bal"),
    )


@register(
    "j29_local_supplier_volume",
    oracle="""
        SELECT n_name,
               CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS order_year,
               COUNT(*) AS n_items,
               ((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                 + 50) // 100) / 100.0 AS revenue
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
                     AND s_nationkey = c_nationkey
        JOIN nation   ON n_nationkey = s_nationkey
        GROUP BY 1, 2
    """,
    doc="TPC-H Q5 shape: LOCAL supplier volume — the join predicate "
    "BETWEEN two dimensions (supplier nation == customer nation) "
    "that makes Q5 more than a star: the fact row survives only if "
    "its two dim paths agree. Plan: supplier broadcasts into the "
    "fact, orders⋈customer resolves the customer's nation, the "
    "equality applies at the final join — one fact shuffle total, "
    "dims broadcast. The nation NAME resolves via a 25-arm literal "
    "CASE map (r10 build-side audit: as a join, the supplier side's "
    "product estimate beat the projected lineitem scan and the "
    "planner broadcast THE FACT, BuildLeft — the a30 misplan's "
    "build-side variant; nation is schema-bounded, so the map costs "
    "one memoized 25-row collect).",
)
def q_j29_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # nation is schema-bounded (25 rows at EVERY SF): resolve the name
    # with a literal CASE map so the supplier side stays a LEAF with an
    # honest size estimate (the join form broadcast the fact — BuildLeft)
    nat_pairs = _dim_keys(
        spark, sf_dir, "all_nations",
        lambda: [(r.n_nationkey, r.n_name) for r in nat.collect()],
    )
    name_expr = F.lit(None).cast("string")
    for k, nm in nat_pairs:
        name_expr = F.when(
            F.col("s_nationkey") == F.lit(k), F.lit(nm)
        ).otherwise(name_expr)
    supp = (
        t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .select("s_suppkey", "s_nationkey", name_expr.alias("n_name"))
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg(
            F.count("*").alias("n_items"),
            # exact integer 1e-4 revenue units -> half-up cents -> /100.0:
            # ROUND(SUM(double),2) diverges 1 ulp around .005 boundaries
            # between engines (the j22 lesson); integer algebra cannot
            (
                F.expr(
                    "(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
                    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))"
                    " + 50) DIV 100"
                )
                / 100.0
            ).alias("revenue"),
        )
    )


@register(
    "a30_market_share",
    oracle="""
        WITH sold AS (
            SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT)
                       AS order_year,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                       AS rev_e4,
                   sn.n_name = 'NATION_5' AS is_target
            FROM lineitem
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation cn ON cn.n_nationkey = c_nationkey
            JOIN region   ON r_regionkey = cn.n_regionkey
                         AND r_name = 'ASIA'
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation sn ON sn.n_nationkey = s_nationkey
        )
        SELECT order_year,
               CAST(SUM(CASE WHEN is_target THEN rev_e4 ELSE 0 END)
                    AS BIGINT) AS target_rev_e4,
               CAST(SUM(rev_e4) AS BIGINT) AS total_rev_e4,
               ROUND(SUM(CASE WHEN is_target THEN rev_e4 ELSE 0 END)
                     * 1.0 / SUM(rev_e4), 6) AS mkt_share
        FROM sold GROUP BY 1
    """,
    doc="TPC-H Q8 shape: market share — the ratio of a CONDITIONAL "
    "aggregate to the total aggregate per group (NATION_5 suppliers' "
    "share of revenue to ASIA customers, by year), the "
    "nested-aggregate shape Q8 decorrelates into one conditional-sum "
    "pass (never aggregate-twice-and-join). Numerator and "
    "denominator surface as EXACT integer 1e-4 units so the hash "
    "check is boundary-proof; the ratio itself rounds at 6dp (a12's "
    "guarded-ratio precedent). The region→nation restriction is "
    "SCHEMA-bounded (≤25 nations), so it collapses to an IN-list "
    "pushed into the customer scan — measured fix for a real "
    "r8 misplan: as a join, the customer side's static size estimate "
    "(a join-output product) exceeded the broadcast threshold, the "
    "planner emitted a sort-merge join on o_custkey and AQE never "
    "backed it out (interleaved A/B: +41% vs the broadcast plan). "
    "The supplier side got the same treatment in r10 after the "
    "residual-gap A/B: its nation join (only there to resolve ONE "
    "name into a boolean) carried a product estimate LARGER than the "
    "projected lineitem scan, so the planner broadcast THE FACT and "
    "probed it with supplier (BuildLeft — the build-side variant of "
    "the same misplan; ~32% pairwise). is_target is now a literal "
    "key comparison from the memoized nation probe; every probe "
    "side is a leaf, every build side a dim. The fact shuffles only "
    "for the final re-aggregation.",
)
def q_a30_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = t(spark, sf_dir, "nation")
    asia_nations = (
        nat.join(
            F.broadcast(
                t(spark, sf_dir, "region").filter(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("c_nat"))
    )
    # nation is schema-bounded (25 rows at EVERY SF) — the collect is a
    # constant-size probe, and the IN-list reaches the parquet scan as
    # a pushed filter, which no join formulation can do; memoized per
    # (session, sf_dir) like the shared stages
    asia_keys = _dim_keys(
        spark, sf_dir, "asia_nations",
        lambda: [r.c_nat for r in asia_nations.collect()],
    )
    cust = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .filter(F.col("c_nationkey").isin(asia_keys))
        .select("c_custkey")
    )
    # the nation join resolved ONE name into a boolean — as a join its
    # product estimate beat the projected lineitem scan and the planner
    # broadcast THE FACT (BuildLeft, ~32% pairwise); one collected key
    # makes the supplier side a leaf with an honest estimate
    target_keys = _dim_keys(
        spark, sf_dir, "nation5_key",
        lambda: [
            r.n_nationkey
            for r in nat.filter(F.col("n_name") == "NATION_5")
            .select("n_nationkey")
            .collect()
        ],
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .select(
            "s_suppkey",
            F.col("s_nationkey").isin(target_keys).alias("is_target"),
        )
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    sold = (
        li.join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            rev_e4.alias("rev_e4"),
            "is_target",
        )
    )
    return sold.groupBy("order_year").agg(
        F.sum(F.when(F.col("is_target"), F.col("rev_e4")).otherwise(0))
        .alias("target_rev_e4"),
        F.sum("rev_e4").alias("total_rev_e4"),
        F.round(
            F.sum(
                F.when(F.col("is_target"), F.col("rev_e4")).otherwise(0)
            )
            * 1.0
            / F.sum("rev_e4"),
            6,
        ).alias("mkt_share"),
    )


@register(
    "j30_late_order_priorities",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY 1
    """,
    doc="TPC-H Q4 shape: per-priority counts of orders with at least "
    "one late line item (shipped >60 days after order). The EXISTS "
    "decorrelates to a LEFT SEMI join — the fact side reduces to "
    "distinct qualifying order keys BEFORE the join, so the semi "
    "join carries each order at most once and the half-open date "
    "window pushes into the orders scan.",
)
def q_j30_late_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_orders = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("o_orderkey")
        .distinct()
    )
    return (
        orders.join(late_orders, "o_orderkey", "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "j31_returned_item_customers",
    oracle="""
        SELECT c_custkey, c_name,
               ((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                 + 50) // 100) / 100.0 AS revenue,
               ROUND(c_acctbal, 2) AS acctbal,
               n_name
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by revenue lost to "
    "returned items in one quarter — the returned-item report "
    "(l_returnflag = 'R', the one Q-shape column the testdata adds "
    "beyond Q1's). Plan: the quarter-filtered orders slice BROADCASTS "
    "into the returnflag-filtered lineitem (both filters push to the "
    "scans), so the fact shuffles exactly once — on o_custkey for the "
    "aggregate — then customer and nation broadcast onto the "
    "bounded per-customer result and the top-20 runs as "
    "TakeOrderedAndProject (revenue DESC, c_custkey tiebreak: "
    "deterministic under the unique-order rule). Revenue uses the "
    "exact integer-cents algebra (the j22/j29 lesson: per-row "
    "ROUND(double) diverges 1 ulp between engines).",
)
def q_j31_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-10-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    per_cust = (
        li.join(maybe_broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            (
                F.expr(
                    "(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
                    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))"
                    " + 50) DIV 100"
                )
                / 100.0
            ).alias("revenue"),
        )
    )
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        per_cust.join(
            maybe_broadcast(cust), per_cust.o_custkey == cust.c_custkey
        )
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "a31_supplier_variety",
    oracle="""
        WITH bad AS (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
        )
        SELECT p_brand,
               CASE WHEN p_size <= 10 THEN 'small'
                    WHEN p_size <= 30 THEN 'medium'
                    ELSE 'large' END AS size_class,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM bad)
        GROUP BY 1, 2
    """,
    doc="TPC-H Q16 shape: how many DISTINCT suppliers serve each "
    "(brand, size class), excluding a disqualified supplier set "
    "(negative balances standing in for Q16's complaint filter). The "
    "NOT IN decorrelates to a left-anti join against the tiny "
    "broadcast exclusion set BEFORE the distinct-count aggregate; "
    "the count-distinct itself is the two-phase partial-distinct "
    "Catalyst plans (per-partition dedup before the shuffle). Part "
    "dim broadcasts; size bucketing is a pure CASE.",
)
def q_a31_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    bad = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    size_class = (
        F.when(F.col("p_size") <= 10, "small")
        .when(F.col("p_size") <= 30, "medium")
        .otherwise("large")
    )
    return (
        li.join(maybe_broadcast(bad), "l_suppkey", "left_anti")
        .join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", size_class.alias("size_class"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "o16_zorder_cells",
    oracle="""
        WITH pts AS (
            SELECT p_partkey,
                   (p_partkey * 7919) % 1024 AS x,
                   (p_partkey * 104729) % 1024 AS y
            FROM part
        ),
        z AS (
            SELECT x, y, ({z_expr}) AS zv FROM pts
        )
        SELECT zv >> 14 AS cell,
               COUNT(*) AS n_pts,
               CAST(MAX(x) - MIN(x) AS BIGINT) AS x_spread,
               CAST(MAX(y) - MIN(y) AS BIGINT) AS y_spread
        FROM z GROUP BY 1
    """,
    doc="Z-order (Morton) clustering key (operators/partitioning.py z_value): "
    "interleaved-bit sort key as PURE column arithmetic (codegen, no "
    "UDF), the layout device behind multi-dimensional parquet data "
    "skipping — `zorder_write` range-partitions on it so every file "
    "gets tight min/max on EVERY interleaved dimension (file-pruning "
    "win over a single-column sort proven on real parquet footers: "
    "tests/test_merge.py zorder test). This query checks the "
    "interleave itself: per coarse z-cell (top 3 bits of each dim), "
    "both dimensions' spreads are bounded by the 128-unit cell edge — "
    "locality in EVERY dimension at once. Oracle rebuilds the "
    "interleave bit-by-bit via z_value_sql.",
)
def q_o16_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ad_data_pipelines_spark.operators import partitioning as _zorder

    pts = t(spark, sf_dir, "part").select(
        ((F.col("p_partkey") * 7919) % 1024).alias("x"),
        ((F.col("p_partkey") * 104729) % 1024).alias("y"),
    )
    z = _zorder.z_value([F.col("x"), F.col("y")], bits=10)
    return (
        pts.withColumn("zv", z)
        .groupBy(F.shiftrightunsigned("zv", 14).alias("cell"))
        .agg(
            F.count("*").alias("n_pts"),
            (F.max("x") - F.min("x")).cast("bigint").alias("x_spread"),
            (F.max("y") - F.min("y")).cast("bigint").alias("y_spread"),
        )
    )


from ad_data_pipelines_spark.operators.partitioning import (  # noqa: E402
    z_value_sql as _z_value_sql,
)

REGISTRY["o16_zorder_cells"].oracle = REGISTRY["o16_zorder_cells"].oracle.format(
    z_expr=_z_value_sql(["x", "y"], bits=10)
)


@register(
    "a24_cube_totals",
    oracle="""
        SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
               COALESCE(l_linestatus, 'ALL') AS lstatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE aggregate: every (returnflag × linestatus) combination "
    "plus both one-dim margins plus the grand total in ONE pass — "
    "Catalyst plans a single Expand + one shuffle (vs 4 unioned "
    "aggregates); rolled dims surface as 'ALL' sentinels. Completes "
    "the grouping-sets family next to a9's rollup-to-overall.",
)
def q_a24_cube_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n_rows",
            "sum_qty",
        )
    )


@register(
    "a25_time_weighted_avg",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   CAST(value AS DECIMAL(14,4)) AS v,
                   CAST(date_diff('second', ts, LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   )) AS BIGINT) AS w
            FROM events
        )
        SELECT user_id,
               CAST(SUM(w) AS BIGINT) AS observed_seconds,
               ROUND(CAST(SUM(v * w) AS DOUBLE)
                     / CAST(SUM(w) AS DOUBLE), 6) AS twa_value
        FROM seq
        WHERE w IS NOT NULL AND w > 0
        GROUP BY user_id
    """,
    doc="Time-weighted average per user: each event's value holds until "
    "the next event, so the mean weights values by their holding "
    "DURATION, not their count (the sensor/price-feed aggregate a "
    "plain AVG gets wrong under irregular sampling). One lead window + "
    "one combinable aggregate; products accumulate in DECIMAL so the "
    "result is summation-order-independent (same discipline as a23).",
)
def q_a25_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w_next = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("value").cast("decimal(14,4)").alias("v"),
        (
            F.unix_timestamp(F.lead("ts").over(w_next))
            - F.unix_timestamp("ts")
        ).cast("bigint").alias("w"),
    ).filter(F.col("w").isNotNull() & (F.col("w") > 0))
    return seq.groupBy("user_id").agg(
        F.sum("w").cast("bigint").alias("observed_seconds"),
        F.round(
            F.sum(F.col("v") * F.col("w")).cast("double")
            / F.sum("w").cast("double"),
            6,
        ).alias("twa_value"),
    )


@register(
    "t8_session_window",
    oracle="""
        WITH gaps AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN ts >= COALESCE(LAG(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ), ts) + INTERVAL 15 MINUTE THEN 1 ELSE 0 END AS new_s
            FROM events
        ),
        isl AS (
            SELECT user_id, ts, value, SUM(new_s) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS s
            FROM gaps
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(MAX(ts) + INTERVAL 15 MINUTE,
                        '%Y-%m-%d %H:%M:%S') AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM isl GROUP BY user_id, s
    """,
    doc="Native session windows: Spark's built-in session_window "
    "aggregation (15-min gap; merge semantics ts_diff < gap, window "
    "end = last_ts + gap) — the SAME operator runs stateful in "
    "Structured Streaming with a watermark, so batch and stream "
    "sessionization share one definition. Oracle is the equivalent "
    "gaps-and-islands SQL. Complements t3_sessionize (hand-rolled "
    "lag-gap variant).",
)
def q_t8_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "value")
    sw = F.session_window("ts", "15 minutes")
    return (
        ev.groupBy("user_id", sw.alias("sw"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            "sum_value",
        )
    )


@register(
    "j7_dedup_then_join",
    oracle="""
        WITH latest AS (
            SELECT o_custkey, o_totalprice FROM (
                SELECT o_custkey, o_totalprice,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC
                       ) AS rn
                FROM orders
            ) WHERE rn = 1
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CASE WHEN l.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_with_order,
               ROUND(SUM(COALESCE(l.o_totalprice, 0)), 2) AS latest_value
        FROM customer c LEFT JOIN latest l ON c.c_custkey = l.o_custkey
        GROUP BY 1
    """,
    doc="J7+A16: dedup the right side to one row per key (deterministic "
    "keep-latest via row_number — SURVEY.md §4.4-6 replaces the "
    "reference's order-dependent keep='first', "
    "scripts/ads_stop_…py:84-85) then left join + null-guarded counts.",
)
def q_dedup_then_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_totalprice")
    )
    return (
        cust.join(latest, cust.c_custkey == latest.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            sum_if(F.col("o_custkey").isNotNull(), F.lit(1)).alias("n_with_order"),
            F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2).alias(
                "latest_value"
            ),
        )
    )


@register(
    "p9_p10_p11_mapping",
    oracle="""
        WITH mapped AS (
            SELECT CASE substr(CAST(ABS(p_size) AS VARCHAR), 1, 1)
                       WHEN '1' THEN 'band1' WHEN '2' THEN 'band2'
                       WHEN '3' THEN 'band3' ELSE 'Unknown' END AS size_band,
                   p_type, p_brand
            FROM part
        ),
        labeled AS (
            SELECT size_band,
                   CASE WHEN p_brand = 'Brand#55' THEN 'VIP'
                        WHEN size_band = 'band1' AND p_type LIKE 'STANDARD%'
                            THEN 'std-small'
                        WHEN size_band = 'band1' AND p_type LIKE 'PROMO%'
                            THEN 'promo-small'
                        WHEN size_band = 'band2' AND p_type LIKE 'STANDARD%'
                            THEN 'std-mid'
                        ELSE 'Other' END AS service_label
            FROM mapped
        )
        SELECT size_band, service_label, COUNT(*) AS n_parts
        FROM labeled GROUP BY 1, 2
    """,
    doc="P9+P10+P11: first-digit bucket mapping "
    "(scripts/ads_passenger_travel_time_di.R:104-108), two-key CASE "
    "service-type labeling (scripts/ads_ridership_…py:129-148) and a "
    "manual row patch override (…py:124-125) — all as when() chains, "
    "no UDF.",
)
def q_mapping_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    digit = F.substring(F.abs(F.col("p_size")).cast("string"), 1, 1)
    size_band = (
        F.when(digit == "1", "band1")
        .when(digit == "2", "band2")
        .when(digit == "3", "band3")
        .otherwise("Unknown")
    )
    mapped = part.select(
        size_band.alias("size_band"), "p_type", "p_brand"
    )
    service_label = (
        F.when(F.col("p_brand") == "Brand#55", "VIP")
        .when(
            (F.col("size_band") == "band1") & F.col("p_type").startswith("STANDARD"),
            "std-small",
        )
        .when(
            (F.col("size_band") == "band1") & F.col("p_type").startswith("PROMO"),
            "promo-small",
        )
        .when(
            (F.col("size_band") == "band2") & F.col("p_type").startswith("STANDARD"),
            "std-mid",
        )
        .otherwise("Other")
    )
    return (
        mapped.withColumn("service_label", service_label)
        .groupBy("size_band", "service_label")
        .agg(F.count("*").alias("n_parts"))
    )


@register(
    "w3_group_max_flag",
    oracle="""
        WITH flagged AS (
            SELECT l_returnflag, l_extendedprice,
                   CASE WHEN l_shipdate = MAX(l_shipdate)
                            OVER (PARTITION BY l_orderkey)
                        THEN 1 ELSE 0 END AS is_last
            FROM lineitem
        )
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               CAST(SUM(is_last) AS BIGINT) AS n_last,
               ROUND(SUM(CASE WHEN is_last = 1 THEN l_extendedprice
                              ELSE 0 END), 2) AS last_value
        FROM flagged GROUP BY 1
    """,
    doc="W3: group-max flag — mark the final leg(s) of each journey by "
    "comparing against max() over the journey window "
    "(scripts/ads_passenger_travel_info_mi.py:209-210). Flag semantics "
    "(not row_number) so shipdate ties all count as last, "
    "deterministically.",
)
def q_group_max_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    is_last = F.when(
        F.col("l_shipdate")
        == F.max("l_shipdate").over(Window.partitionBy("l_orderkey")),
        1,
    ).otherwise(0)
    return (
        li.withColumn("is_last", is_last)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("is_last").alias("n_last"),
            F.round(
                sum_if(F.col("is_last") == 1, F.col("l_extendedprice")), 2
            ).alias("last_value"),
        )
    )


@register(
    "p18_p19_days_in_month",
    oracle="""
        WITH monthly AS (
            SELECT strftime(ts, '%Y-%m') AS month, COUNT(*) AS n_events
            FROM events GROUP BY 1
        )
        SELECT month, n_events,
               date_part('day', last_day(CAST(month || '-01' AS DATE)))
                   AS days_in_month,
               ROUND(n_events * 1.0 /
                     date_part('day', last_day(CAST(month || '-01' AS DATE))), 4)
                   AS events_per_day
        FROM monthly
    """,
    doc="P18+P19: month extraction + days-in-month via last_day — the "
    "calendar-day divisor of the reference's monthly KPIs "
    "(scripts/ads_passenger_travel_info_mi.py:346-361 computes it by "
    "hand; Spark's dayofmonth(last_day()) replaces 16 lines).",
)
def q_days_in_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    monthly = ev.groupBy(
        F.date_format("ts", "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("n_events"))
    dim = F.dayofmonth(F.last_day(F.to_date(F.concat(F.col("month"), F.lit("-01")))))
    return monthly.select(
        "month",
        "n_events",
        dim.alias("days_in_month"),
        F.round(F.col("n_events") / dim, 4).alias("events_per_day"),
    )


@register(
    "s13_first_seen",
    oracle="""
        WITH cur AS (
            SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders GROUP BY 1
        ),
        prev AS (
            SELECT o_orderpriority,
                   TIMESTAMP '1995-06-30 00:00:00' AS create_time
            FROM orders
            WHERE o_orderdate < TIMESTAMP '1996-01-01'
              AND o_orderpriority IN ('1-URGENT', '2-HIGH')
            GROUP BY 1
        )
        SELECT cur.o_orderpriority, cur.n_orders,
               strftime(COALESCE(prev.create_time,
                                 TIMESTAMP '1996-07-01 00:00:00'),
                        '%Y-%m-%d %H:%M:%S') AS create_time
        FROM cur LEFT JOIN prev USING (o_orderpriority)
    """,
    doc="S13: first-seen create_time preservation — the reference's "
    "SQLite key-value store "
    "(scripts/ads_passenger_travel_distance_di.py:9-52) replaced by "
    "coalesce(prev.create_time, now) over a broadcast left join with "
    "the previous snapshot (sources/firstseen.py). Literal 'now' here "
    "for oracle determinism; production passes current_timestamp.",
)
def q_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ad_data_pipelines_spark.sources.firstseen import merge_first_seen

    orders = t(spark, sf_dir, "orders")
    cur = orders.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))
    prev = (
        orders.filter(
            (F.col("o_orderdate") < "1996-01-01")
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .groupBy("o_orderpriority")
        .agg(F.lit("1995-06-30 00:00:00").cast("timestamp").alias("create_time"))
    )
    merged = merge_first_seen(
        cur,
        prev,
        ["o_orderpriority"],
        now=F.lit("1996-07-01 00:00:00").cast("timestamp"),
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.date_format("create_time", "yyyy-MM-dd HH:mm:ss").alias("create_time"),
    )


# the kcenter seed picks as a (cell_id, vid) SQL source for kmeans_sql
_KCENTER_SEED_SQL = (
    f"SELECT cell_id, vec_id AS vid FROM ({_sim.kcenter_seeds_sql(n_cells=4)})"
)

# the trained codebook (kcenter-seeded — +0.04 mean IVF recall over
# lowest-id seeds at sf0.01, builder-measured r14), de-quantized to
# (cell_id, embedding) doubles — division by 2^20 is an exact exponent
# shift, so Spark and DuckDB see identical doubles feeding the
# dot-product ranking
_KMEANS_CENT_SQL = f"""
    SELECT cell_id,
           list_transform(centroid_fp,
                          f -> CAST(f AS DOUBLE) / {1 << 20} - 1.0)
               AS embedding
    FROM ({_sim.kmeans_sql(
        n_cells=4, iterations=3, seed_sql=_KCENTER_SEED_SQL,
    )})
"""


def _kcenter_seeds_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The farthest-point seed picks (K local rows), memoized: the
    K−1 greedy corpus passes run once per (session, sf_dir) — consumed
    by the seeds gate query and the trainer."""
    return _shared(
        spark, sf_dir, "kcenter_seeds_4",
        lambda: _sim.kcenter_seeds(
            t(spark, sf_dir, "embeddings"), n_cells=4
        ),
    )


def _kmeans_fp_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained 4×3 fixed-point codebook, memoized: the trainer's
    per-iteration collects run once per (session, sf_dir); every
    trained-cell consumer (the cells query, the recall gates, the
    shared corpus-cell table) reads the same K-row LOCAL frame — the
    memo skips re-training, not a persist. Seeded from the shared
    kcenter picks (farthest-point init beats lowest-id seeds on
    trained recall and cell balance)."""
    seed_ids = [
        int(r.vec_id)
        for r in _kcenter_seeds_shared(spark, sf_dir)
        .orderBy("cell_id")
        .collect()
    ]
    return _shared(
        spark, sf_dir, "kmeans_fp_4x3",
        lambda: _sim.kmeans_fp(
            t(spark, sf_dir, "embeddings"), n_cells=4, iterations=3,
            seed_ids=seed_ids,
        ),
    )


def _kmeans_cents_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained codebook de-quantized to (cell_id, cent_emb) —
    derived per call from the memoized fp table (K local rows, no
    persist needed)."""
    return _sim.kmeans_dequantize(_kmeans_fp_shared(spark, sf_dir))


def _ivf_cells_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE session cell table: every nearest-centroid consumer (IVF
    ANN + both recall gates, SemDeDup, cluster-balanced sampling)
    reads this ONE corpus assignment, built on the TRAINED kmeans_fp
    codebook — the r13 verdict's unification ask. At 100 TB this is a
    materialized table partitioned by cell_id, rebuilt only when the
    codebook retrains; the seed-vector cells it replaced were the
    bootstrap stand-in."""
    return _shared(
        spark, sf_dir, "kmeans_corpus_cells",
        lambda: _sim.ivf_cells(
            t(spark, sf_dir, "embeddings"),
            _kmeans_cents_shared(spark, sf_dir),
            "neighbor_id", "c_emb", 1,
        ),
    )


@register(
    "llm_ann_ivf",
    oracle=_sim.ivf_topk_sql(
        max_query_id=25, k=5, nprobe=2, cent_sql=_KMEANS_CENT_SQL
    ),
    doc="IVF ANN top-5 on the TRAINED codebook: corpus assigned to its "
    "nearest kmeans_fp cell (the session-shared trained cell table — "
    "same artifact SemDeDup and cluster-balanced sampling consume), "
    "queries probe their 2 nearest cells; the search join shuffles on "
    "cell_id only. operators/similarity.py:ivf_topk.",
)
def q_llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return _sim.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 25), k=5, n_cells=4, nprobe=2,
        corpus_cells=_ivf_cells_shared(spark, sf_dir),
        centroids=_kmeans_cents_shared(spark, sf_dir),
    )


@register(
    "llm_ivf_recall",
    oracle=f"""
        WITH truth AS ({_sim.cosine_topk_sql(max_query_id=25, k=5)}),
        ann AS ({_sim.ivf_topk_sql(
            max_query_id=25, k=5, nprobe=1, cent_sql=_KMEANS_CENT_SQL,
        )}),
        per_q AS (
            SELECT b.query_id,
                   COUNT(*) AS k,
                   COUNT(a.neighbor_id) AS hits
            FROM truth b
            LEFT JOIN ann a
              ON b.query_id = a.query_id
             AND b.neighbor_id = a.neighbor_id
            GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               ROUND(AVG(hits * 1.0 / k), 4) AS mean_recall,
               ROUND(MIN(hits * 1.0 / k), 4) AS min_recall
        FROM per_q
    """,
    doc="IVF probe-sensitivity gate: single-probe (nprobe=1) recall on "
    "the trained codebook vs the brute-force cosine ground truth — "
    "paired with llm_ivf_kmeans_recall (nprobe=2, same cells, same "
    "scope) it pins the recall-vs-probe-cost curve's two endpoints, so "
    "a codebook regression AND a probing regression each move a gated "
    "number. Shares the one trained corpus-cell table.",
)
def q_llm_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 25)
    truth = _cosine_truth25_shared(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ann = _sim.ivf_topk(
        emb, q, k=5, n_cells=4, nprobe=1,
        corpus_cells=_ivf_cells_shared(spark, sf_dir),
        centroids=_kmeans_cents_shared(spark, sf_dir),
    ).select("query_id", "neighbor_id")
    return _recall_report(truth, ann)


@register(
    "llm_kmeans_cells",
    oracle=f"""
        SELECT k.cell_id,
               k.n_members,
               CAST(t.i - 1 AS BIGINT) AS dim,
               CAST(k.centroid_fp[t.i] AS BIGINT) AS centroid_q
        FROM ({_sim.kmeans_sql(
            n_cells=4, iterations=3, seed_sql=_KCENTER_SEED_SQL,
        )}) k,
             UNNEST(generate_series(1, len(k.centroid_fp))) AS t(i)
    """,
    doc="Deterministic fixed-point Lloyd k-means (4 cells, 3 "
    "iterations, offset quantization at 2^20): the ORACLE-GATEABLE "
    "trainer behind the IVF family — Spark-ML KMeans (llm-ops "
    "ivf_train_centroids) has no SQL twin, so trained-codebook paths "
    "could never hash-gate before this. Integer sums + all-positive "
    "floor division + lowest-cell tie-breaks make it bit-equal to the "
    "unrolled DuckDB recurrence. Per iteration: one cached-corpus "
    "pass, broadcast-literal argmin, one combinable (cell,dim) sum; "
    "K x 64 centroids collect driver-side (KB — the train_bpe "
    "precedent). Seeded by the shared farthest-point picks "
    "(kcenter_seeds — +0.04 trained recall vs lowest-id, r14). "
    "GATE SHAPE: the codebook is posexploded to one "
    "(cell_id, n_members, dim, centroid_q) BIGINT row per dimension — "
    "the registry's flat-output convention (the r13 array<bigint> "
    "column crashed the driver's canonicalizer; arrays stay on the "
    "programmatic kmeans_fp contract only). "
    "operators/similarity.py:kmeans_fp.",
)
def q_llm_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = _kmeans_fp_shared(spark, sf_dir)
    return fp.select(
        "cell_id",
        "n_members",
        F.posexplode("centroid_fp").alias("dim", "centroid_q"),
    ).select(
        "cell_id",
        "n_members",
        F.col("dim").cast("bigint").alias("dim"),
        "centroid_q",
    )


@register(
    "llm_kcenter_seeds",
    oracle=_sim.kcenter_seeds_sql(n_cells=4),
    doc="Deterministic farthest-point (Gonzalez k-center) codebook "
    "seeding in the kmeans_fp fixed-point domain: seed 0 = lowest id, "
    "each next seed maximizes int64 squared-L2 distance to its "
    "nearest chosen seed (ties -> lowest id) — spreads seeds across "
    "the data's extremes where lowest-id seeds can all land in one "
    "dense mode; the classic 2-approximation init for the trainer. "
    "K-1 corpus passes, each reducing to ONE row via a combinable "
    "lexicographic struct-min (seed literals in-plan, no shuffle); "
    "bit-equal to the unrolled DuckDB greedy. "
    "operators/similarity.py:kcenter_seeds.",
)
def q_llm_kcenter_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kcenter_seeds_shared(spark, sf_dir)


@register(
    "llm_ivf_kmeans_recall",
    oracle=f"""
        WITH truth AS ({_sim.cosine_topk_sql(max_query_id=25, k=5)}),
        ann AS ({_sim.ivf_topk_sql(
            max_query_id=25, k=5, nprobe=2, cent_sql=_KMEANS_CENT_SQL,
        )}),
        per_q AS (
            SELECT b.query_id,
                   COUNT(*) AS k,
                   COUNT(a.neighbor_id) AS hits
            FROM truth b
            LEFT JOIN ann a
              ON b.query_id = a.query_id
             AND b.neighbor_id = a.neighbor_id
            GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               ROUND(AVG(hits * 1.0 / k), 4) AS mean_recall,
               ROUND(MIN(hits * 1.0 / k), 4) AS min_recall
    FROM per_q
    """,
    doc="IVF recall under the TRAINED deterministic codebook "
    "(kmeans_fp de-quantized via kmeans_centroids — exact power-of-2 "
    "division, both engines identical doubles): the full trained-ANN "
    "path hash-gated end to end. nprobe=2 endpoint of the "
    "recall-vs-probe-cost curve (llm_ivf_recall pins nprobe=1); both "
    "read the ONE session-shared trained corpus-cell table.",
)
def q_llm_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 25)
    truth = _cosine_truth25_shared(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ann = _sim.ivf_topk(
        emb, q, k=5, n_cells=4, nprobe=2,
        corpus_cells=_ivf_cells_shared(spark, sf_dir),
        centroids=_kmeans_cents_shared(spark, sf_dir),
    ).select("query_id", "neighbor_id")
    return _recall_report(truth, ann)


@register(
    "llm_matryoshka_recall",
    oracle=f"""
        WITH truth AS ({_sim.cosine_topk_sql(max_query_id=25, k=5)}),
        ann AS ({_sim.truncated_cosine_topk_sql(
            max_query_id=25, k=5, d=16,
        )}),
        per_q AS (
            SELECT b.query_id,
                   COUNT(*) AS k,
                   COUNT(a.neighbor_id) AS hits
            FROM truth b
            LEFT JOIN ann a
              ON b.query_id = a.query_id
             AND b.neighbor_id = a.neighbor_id
            GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               ROUND(AVG(hits * 1.0 / k), 4) AS mean_recall,
               ROUND(MIN(hits * 1.0 / k), 4) AS min_recall
        FROM per_q
    """,
    doc="Matryoshka truncation recall gate: cosine search in the "
    "L2-renormalized FIRST-16-dims prefix space (MRL, "
    "arXiv:2205.13147 — 1/4 of the dot-product work and index bytes) "
    "vs the full 64-dim brute-force ground truth. Completes the "
    "compression-tier recall family (LSH / IVF / PQ / SQ / now "
    "dimension truncation): every cost knob ships a gated recall "
    "regression. Truncation is map-only; the search is the shared "
    "25-query scope. operators/similarity.py:truncate_renorm.",
)
def q_llm_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    tr = _sim.truncate_renorm(emb, d=16)
    truth = _cosine_truth25_shared(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ann = _sim.cosine_topk(
        tr, tr.filter(F.col("vec_id") < 25), k=5
    ).select("query_id", "neighbor_id")
    return _recall_report(truth, ann)


@register(
    "a4_conditional_sum",
    oracle="""
        SELECT p_brand,
               ROUND(SUM(CASE WHEN p_type LIKE '%BRASS%'
                              THEN p_retailprice ELSE 0 END), 2) AS brass_value,
               ROUND(SUM(p_retailprice), 2) AS total_value
        FROM part
        GROUP BY 1
    """,
    doc="A4+P21 conditional sum over a substring-match flag — the "
    "reference's contactless-ticket revenue split "
    "(scripts/ads_csc_sales_revenue_region_mi.R:36-41).",
)
def q_conditional_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.round(
            sum_if(F.col("p_type").contains("BRASS"), F.col("p_retailprice")), 2
        ).alias("brass_value"),
        F.round(F.sum("p_retailprice"), 2).alias("total_value"),
    )


@register(
    "p16_threshold_bins",
    oracle="""
        SELECT CASE WHEN l_quantity <= 10 THEN '0-10'
                    WHEN l_quantity <= 20 THEN '10-20'
                    WHEN l_quantity <= 30 THEN '20-30'
                    ELSE '>30' END AS qty_bin,
               COUNT(*) AS n
        FROM lineitem GROUP BY 1
    """,
    doc="P16: case_when ≤-threshold chain — the reference's 9-bucket "
    "travel-time bins (scripts/ads_passenger_travel_time_di.R:140-151) "
    "as one shared helper. functions/binning.py:threshold_bins.",
)
def q_threshold_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ad_data_pipelines_spark.functions.binning import threshold_bins

    li = t(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "qty_bin",
            threshold_bins("l_quantity", [10, 20, 30], ["0-10", "10-20", "20-30", ">30"]),
        )
        .groupBy("qty_bin")
        .agg(F.count("*").alias("n"))
    )


@register(
    "a7_histogram",
    oracle="""
        SELECT CAST(o_orderdate AS DATE) AS ope_date,
               o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1995-04-01'
        GROUP BY 1, 2
    """,
    doc="A7: value-histogram per group — value_counts() of a category "
    "per day (reference scripts/ads_passenger_transfer_count_di.py:189, "
    "leg-count histograms per (date, region)); the input stage of the "
    "A8 adjacent-difference.",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderdate") < "1995-04-01")
        .groupBy(
            F.to_date("o_orderdate").alias("ope_date"), "o_orderpriority"
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "llm_cosine_near_dup",
    oracle=_sim.cosine_near_dup_sql(threshold=0.35, scope_max_id=100),
    doc="Embedding-cosine near-dup pairs ≥ 0.35 (left side scoped to "
    "vec_id<100 — at corpus scale this exact scorer runs only behind "
    "LSH/IVF blocking; the unblocked form is the candidate verifier). "
    "operators/similarity.py:cosine_near_dup.",
)
def q_llm_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return _sim.cosine_near_dup(emb, threshold=0.35, scope_max_id=100)


@register(
    "llm_mm_decode_resize",
    oracle=f"""
        WITH decoded AS ({_mm.DECODE_FAKE_SQL})
        SELECT doc_id, width, height,
               GREATEST(CAST(FLOOR(width * (64.0 / GREATEST(width, height)))
                             AS BIGINT), 1) AS new_width,
               GREATEST(CAST(FLOOR(height * (64.0 / GREATEST(width, height)))
                             AS BIGINT), 1) AS new_height
        FROM decoded
    """,
    doc="Multimodal decode→resize stages: deterministic-fake decoder "
    "(mapInPandas with a real decoder's signature/schema — md5-derived "
    "dims stand in for codec output) feeding a pure-column resize plan "
    "(longest side → 64, aspect kept, floor, min 1px). "
    "operators/multimodal.py:decode_fake,resize_meta.",
)
def q_llm_mm_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mm.resize_meta(_mm.decode_fake(t(spark, sf_dir, "documents")), 64)


@register(
    "llm_mm_frame_sample",
    oracle=_mm.frame_sample_sql(frame_chars=64, stride=2),
    doc="Multimodal frame-sampling stage: fake video = 64-char frames of "
    "text, keep every 2nd — mapInPandas emitting one row per sampled "
    "frame (row-count-changing batch transform, the real video sampler's "
    "shape). operators/multimodal.py:frame_sample.",
)
def q_llm_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mm.frame_sample(t(spark, sf_dir, "documents"), frame_chars=64, stride=2)

# ---------------------------------------------------------------------------
# Composite-key joins, sequence windows, set ops, top-N (W5/J9-J11/O3/O6)
# ---------------------------------------------------------------------------

@register(
    "w5_seq_lead",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey,
               LEAD(l_partkey) OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber
               ) AS to_partkey
        FROM lineitem
        WHERE l_orderkey < 5000
    """,
    doc="W5 lead over an ordered sequence — TO_POINT_NO = lead(POINT_NO) "
    "per route (reference scripts/dwd_bus_route_info_mf & other "
    "2.R:160-165). Order key (l_linenumber) is unique within the "
    "partition, so the window is deterministic.",
)
def q_seq_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.lead("l_partkey").over(w).alias("to_partkey"),
    )


@register(
    "j9_j10_composite_join",
    oracle="""
        WITH links AS (
            SELECT l_partkey, l_suppkey,
                   ROUND(AVG(l_quantity), 4) AS link_avg_qty
            FROM lineitem GROUP BY 1, 2
        )
        SELECT l_returnflag,
               COUNT(*) AS n_legs,
               ROUND(SUM(l_quantity - link_avg_qty), 2) AS dev_sum
        FROM lineitem JOIN links USING (l_partkey, l_suppkey)
        GROUP BY 1
    """,
    doc="J9/J10/J11 composite-key equi join — the reference's "
    "(BASE_VERSION, POINT_NO, POINT_TYPE) multi-column joins "
    "(scripts/dwd_bus_route_info_mf & other 2.R:97-101, 123-125). "
    "Scale: both sides shuffle once on the same composite key, so AQE "
    "plans a single co-partitioned sort-merge/shuffled-hash join; the "
    "derived link table reuses the fact's partitioning.",
)
def q_composite_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    links = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.avg("l_quantity"), 4).alias("link_avg_qty")
    )
    return (
        li.join(links, ["l_partkey", "l_suppkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_legs"),
            F.round(F.sum(F.col("l_quantity") - F.col("link_avg_qty")), 2).alias(
                "dev_sum"
            ),
        )
    )


@register(
    "o3_union_slices",
    oracle="""
        SELECT 'p1' AS slice, o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1995-02-15'
        GROUP BY 2
        UNION ALL
        SELECT 'p2' AS slice, o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-02-15'
          AND o_orderdate <  TIMESTAMP '1995-04-01'
        GROUP BY 2
    """,
    doc="O3 UNION ALL of per-slice aggregates — the reference's "
    "quarter-month concat (pd.concat at scripts/ads_route_…py:136) with "
    "half-open slice boundaries so no row is double-counted "
    "(SURVEY.md §4.4-1).",
)
def q_union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")

    def slice_counts(tag: str, lo: str, hi: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .select(F.lit(tag).alias("slice"), "o_orderpriority", "n")
        )

    return slice_counts("p1", "1995-01-01", "1995-02-15").unionByName(
        slice_counts("p2", "1995-02-15", "1995-04-01")
    )


@register(
    "o6_topn_revenue",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    doc="O2+O6 global sort + limit over a 3-way join (TPC-H Q3 shape) — "
    "the glossary's planned Top-N ridership KPIs as a fact-sized query. "
    "Deterministic: ties broken on unique o_orderkey. Scale: Spark "
    "plans TakeOrderedAndProject (per-partition top-10 then merge), "
    "never a global sort; customer-filter side is broadcastable.",
)
def q_topn_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "j5_regional_volume",
    oracle="""
        SELECT n_name AS nation_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_legs
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND s_nationkey = c_nationkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
        GROUP BY 1
    """,
    doc="J2/J5 multi-dimension join chain (TPC-H Q5 shape): fact joined "
    "through orders/customer/supplier up to broadcast nation/region "
    "dims, with the local-supplier condition s_nationkey = c_nationkey. "
    "Scale: nation/region/supplier broadcast; only the "
    "lineitem⋈orders⋈customer chain shuffles, and AQE reorders it.",
)
def q_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count("*").alias("n_legs"),
        )
    )


@register(
    "llm_quality_quantile",
    oracle="""
        WITH tok AS (
            SELECT lang,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
            FROM documents
        ),
        pct AS (
            SELECT lang,
                   ROUND(quantile_cont(n_tokens, 0.5), 4) AS p50_tokens,
                   ROUND(quantile_cont(n_tokens, 0.9), 4) AS p90_tokens
            FROM tok GROUP BY 1
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               MIN(p50_tokens) AS p50_tokens,
               MIN(p90_tokens) AS p90_tokens,
               CAST(SUM(CASE WHEN n_tokens >= p50_tokens THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept
        FROM tok JOIN pct USING (lang)
        GROUP BY 1
    """,
    doc="Quantile-threshold quality filter: per-language token-count "
    "percentiles (Spark exact `percentile` == DuckDB quantile_cont, "
    "linear interpolation) joined back as a broadcast threshold; docs "
    "below the median are cut. Production path at corpus scale swaps "
    "percentile → approx_percentile (t-digest, mergeable, one pass) — "
    "same plan shape, documented divergence like A5's HLL.",
)
def q_llm_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("lang", _ts.token_count("text").alias("n_tokens"))
    pct = tok.groupBy("lang").agg(
        F.round(F.expr("percentile(n_tokens, 0.5)"), 4).alias("p50_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.9)"), 4).alias("p90_tokens"),
    )
    return (
        tok.join(F.broadcast(pct), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("p50_tokens").alias("p50_tokens"),
            F.min("p90_tokens").alias("p90_tokens"),
            count_if(F.col("n_tokens") >= F.col("p50_tokens")).alias("n_kept"),
        )
    )


_DIM_KEYS_CACHE: dict[tuple, list] = {}


def _dim_keys(spark: SparkSession, sf_dir: str, what: str, build) -> list:
    """Memoized driver-side key list for a SCHEMA-bounded dimension
    restriction (nation = 25 rows, region = 5 at EVERY SF). The list
    feeds an `isin` filter pushed into a fact-side scan — manual
    dynamic partition pruning (see a30 / SCALE.md hint discipline) —
    and memoizing it per (session, sf_dir) removes the one small
    driver job per query invocation (measured ~0.12 s/run at sf0.1).
    Only use for dims bounded by the SCHEMA, never by the scale
    factor."""
    key = (spark.sparkContext.applicationId, sf_dir, what)
    if key not in _DIM_KEYS_CACHE:
        _DIM_KEYS_CACHE[key] = build()
    return _DIM_KEYS_CACHE[key]


_SHARED_CACHE: dict[tuple, DataFrame] = {}


def _shared(
    spark: SparkSession,
    sf_dir: str,
    what: str,
    build,
    materialize: str = "persist",
) -> DataFrame:
    """Session-scoped persisted memo for pipeline intermediates that
    several registry queries consume. The dedup chain
    (signatures → candidate pairs → components) is the expensive part
    of five different queries; each layer is computed once per
    (session, sf_dir) — the in-session twin of materializing the same
    intermediates bucketed on disk (`dedup.dup_components_table`).

    ``materialize="checkpoint"`` stores the stage as a localCheckpoint
    (row RDD) instead of a columnar persist: the right shape for the
    ITERATIVE consumers (PageRank/label propagation scan the edge list
    10-20× per query, and per-scan columnar-cache deserialization
    dominates; row-RDD scans don't pay it, and the consumers then skip
    their own per-call defensive cut entirely)."""
    # Entries are per-doc signature/pair/component tables — kilobytes to
    # low megabytes at test SFs, MEMORY_AND_DISK so an over-budget entry
    # spills rather than evicting executors. A long-lived session over
    # many sf_dirs can call _SHARED_CACHE[k].unpersist() per dir; the
    # registry's driver/test sessions touch one or two dirs.
    key = (spark.sparkContext.applicationId, sf_dir, what)
    if key not in _SHARED_CACHE:
        built = build()
        _SHARED_CACHE[key] = (
            built.localCheckpoint()
            if materialize == "checkpoint"
            else built.persist()
        )
    return _SHARED_CACHE[key]


def _nb_buckets_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one token explode per session feeds BOTH NB training and scoring
    # (classify.token_buckets) — self-scoring would otherwise explode
    # the corpus twice
    from ad_data_pipelines_spark.operators import classify as _classify

    return _shared(
        spark, sf_dir, "nb_buckets",
        lambda: _classify.token_buckets(
            t(spark, sf_dir, "documents"), n_features=1024
        ),
    )


def warm_shared_stages(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Materialize every session-shared persisted stage up front and
    return per-stage build seconds.

    Whichever registry query touches a `_shared` entry first otherwise
    pays the whole chain's persist-materialization — benign for total
    runtime, but it makes per-query bench attribution depend on run
    order (llm_ngram_jaccard read 3.9 s in BENCH_r03 vs 0.6 s warm).
    bench.py calls this before timing and reports the chain build cost
    separately — the in-session twin of a production pipeline
    materializing its bucketed intermediate tables in a scheduled
    upstream job rather than inside whichever consumer runs first.
    """
    import time as _time

    costs: dict[str, float] = {}
    for name, fn in _shared_stages_map().items():
        t0 = _time.perf_counter()
        fn(spark, sf_dir).count()  # forces the persist to materialize
        costs[name] = round(_time.perf_counter() - t0, 4)
    return costs


def _shared_stages_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The stages the warm phase pre-builds and the artifact writer
    materializes. MEMBERSHIP RULE (r8 verdict #6): a stage earns a slot
    here only with ≥2 registry consumers — a single-consumer stage
    builds lazily inside its one query (the `_shared` session memo
    still dedups repeated runs), so the shared-build phase charges
    only genuinely shared work. Registry consumer counts (r9 audit;
    update when registering consumers): shingles 4, minhash_sigs 2,
    lsh_pairs 3, dup_components 5 (+blast_radius), simhash 2,
    simhash_pairs 2 (llm_simhash_pairs/llm_candidate_agreement — r15),
    lsh_corpus_buckets 2,
    kmeans_corpus_cells 5 (llm_ann_ivf/llm_ivf_recall/
    llm_ivf_kmeans_recall/llm_semantic_dedup/llm_cluster_balanced_mix —
    the ONE trained cell table, r13 verdict unification),
    quality_features 2, char_entropy 2,
    repetition 2, word_grams 4 (contamination/novelty/bloom_decontam/blast_radius),
    pq_codes 2, span_bounds 2,
    trade_edges 8 (g1/g2/g3/g4/g5/g7 + g11/g12 SSSP), cosupply_pairs 2
    (the knn build + g10), cosupply_knn 3 (g6/g8/g9),
    cosine_truth25 5 (llm_cosine_topk/llm_ann_recall/llm_ivf_recall/
    llm_sq_recall/llm_ivf_kmeans_recall), sq_codes 2 + sq_scales 2
    (llm_sq_topk/llm_sq_recall),
    l2_truth10 2 (llm_l2_topk/llm_pq_recall) — the recall gates'
    ground-truth tables, materialized once like a production recall
    harness would per index rebuild —, kmeans_fp_4x3 6
    (llm_kmeans_cells + every kmeans_corpus_cells consumer; the memo
    skips the trainer's per-iteration collects, the frame itself is
    K rows), kcenter_seeds_4 2 (llm_kcenter_seeds + the trainer's
    seed pick), dsir_weights 2 (llm_dsir_weights/llm_dsir_select),
    bm25_scores 2 (llm_bm25_topk/llm_hybrid_rrf),
    bigram_scores 2 (llm_bigram_lm/llm_ppl_buckets — r15).
    Dropped as single-consumer:
    nb_buckets (llm_nb_quality trains and scores off one memoized
    explode — reuse is WITHIN the query)."""
    return {
        "kcenter_seeds_4": _kcenter_seeds_shared,
        "kmeans_fp_4x3": _kmeans_fp_shared,
        "shingles": _shingles_shared,
        "minhash_sigs": _minhash_sigs_shared,
        "lsh_pairs": _lsh_pairs_shared,
        "dup_components": lambda s, d: _dup_components_shared(s, d, min_eq=8),
        "simhash": _simhash_shared,
        "simhash_pairs": _simhash_pairs_shared,
        "lsh_corpus_buckets": _lsh_buckets_shared,
        "kmeans_corpus_cells": _ivf_cells_shared,
        "quality_features": _quality_features_shared,
        "char_entropy": _entropy_shared,
        "repetition": _repetition_shared,
        "word_grams": _word_grams_shared,
        "pq_codes": _pq_codes_shared,
        "sq_scales": _sq_scales_shared,
        "sq_codes": _sq_codes_shared,
        "span_bounds": _span_bounds_shared,
        "trade_edges": _trade_edges_shared,
        "cosupply_pairs": _cosupply_pairs_shared,
        "cosupply_knn": _cosupply_knn_shared,
        "cosine_truth25": _cosine_truth25_shared,
        "l2_truth10": _l2_truth10_shared,
        "dsir_weights": _dsir_weights_shared,
        "bm25_scores": _bm25_scores_shared,
        "bigram_scores": _bigram_scores_shared,
    }


#: bump when ANY shared stage's build parameters change — on-disk
#: artifact directories carrying the previous revision string are then
#: version-stale and rebuilt on next access (rebuild-on-version-change)
_SHARED_REV = 2  # r8: trade_edges gained (w, ws) weight columns


def materialize_shared_artifacts(
    spark: SparkSession, sf_dir: str, root: str
) -> dict[str, str]:
    """Write every session-shared corpus stage as a VERSIONED ON-DISK
    artifact under `root` (one parquet dir per stage, marker contract
    in operators/artifacts.py) and return {stage: path}.

    This is the production shape of the `_shared` in-session memo: a
    scheduled upstream job materializes signatures / buckets / cells /
    codes / grams / signals once per corpus revision, and every
    consumer job scans the artifact (column-pruned, stat-pruned
    parquet) instead of re-deriving the chain. A re-run with an
    unchanged (corpus, `_SHARED_REV`) version is a marker read — no
    Spark job; bumping either rebuilds exactly the stale stages.
    """
    import os as _os

    from ad_data_pipelines_spark.operators import artifacts as _art

    corpus = _os.path.basename(_os.path.normpath(sf_dir))
    out: dict[str, str] = {}
    for name, fn in _shared_stages_map().items():
        path = _os.path.join(root, name)
        version = _art.artifact_version(
            stage=name, corpus=corpus, rev=_SHARED_REV
        )
        _art.materialize(
            spark, path, version, lambda fn=fn: fn(spark, sf_dir)
        )
        out[name] = path
    return out


def _pq_codes_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one corpus PQ encode per session feeds flat PQ search AND the
    # IVFPQ composition (disk twin: the code table itself)
    return _shared(
        spark,
        sf_dir,
        "pq_codes",
        lambda: _sim.pq_encode(t(spark, sf_dir, "embeddings")),
    )


def _word_grams_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one word-8-gram hash table per session feeds the contamination
    # scan AND the novelty score (disk twin: a corpus_grams table)
    return _shared(
        spark,
        sf_dir,
        "word_grams",
        lambda: _dedup.word_ngram_hashes(
            t(spark, sf_dir, "documents"), n=8
        ),
    )


def _span_bounds_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the EXACTSUBSTR upstream: one position-gram explode + one gram
    # window feeds BOTH the coverage metric (llm_dup_spans) and the
    # removal transform (llm_dup_span_removal) — the two heaviest
    # registry queries share their dominant stage
    return _shared(
        spark, sf_dir, "span_bounds",
        lambda: _dedup.position_gram_bounds(
            t(spark, sf_dir, "documents"), k=20
        ),
    )


def _shingles_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the widest narrow stage of the text layer: ONE shingle explode per
    # session feeds minhash signatures, boilerplate heavy hitters and
    # Jaccard verification (disk twin: a corpus_shingles table)
    return _shared(
        spark, sf_dir, "shingles",
        lambda: _dedup.char_shingles(t(spark, sf_dir, "documents")),
    )


def _minhash_sigs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared(
        spark, sf_dir, "sigs",
        lambda: _dedup.minhash_signatures(
            t(spark, sf_dir, "documents"),
            shingled=_shingles_shared(spark, sf_dir),
        ),
    )


def _lsh_pairs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared(
        spark, sf_dir, "pairs",
        lambda: _dedup.lsh_candidate_pairs(_minhash_sigs_shared(spark, sf_dir)),
    )


def _dup_components_shared(
    spark: SparkSession, sf_dir: str, min_eq: int = 8
) -> DataFrame:
    return _shared(
        spark, sf_dir, f"comp{min_eq}",
        lambda: _dedup.dup_components_from_pairs(
            _lsh_pairs_shared(spark, sf_dir).filter(F.col("n_eq") >= min_eq)
        ),
    )


@register(
    "llm_dedup_groups",
    oracle=_dedup.dup_components_sql(min_eq=8),
    doc="End of the MinHash dedup pipeline: LSH candidate pairs with "
    "n_eq≥8 (est. Jaccard ≥ 0.5) merged into duplicate clusters via "
    "iterative min-label connected components; keeper = min doc_id per "
    "cluster. Oracle is a recursive-CTE transitive closure — same "
    "components, different algorithm. operators/dedup.py:"
    "connected_components,dup_components.",
)
def q_llm_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dup_components_shared(spark, sf_dir, min_eq=8)


@register(
    "llm_dedup_threshold",
    oracle=_dedup.dup_components_sql(threshold=0.5),
    doc="Threshold-parameterized dedup chain (r12 verdict #2): the "
    "banding AND the verification bar derived from lsh_plan for a "
    "target Jaccard of 0.5 — (8 bands x 2 rows, min_eq=8) instead of "
    "the shipped high-similarity (4x4) constants — then the same "
    "LSH -> connected-components pipeline. Wider bands collide more "
    "readily (S-curve midpoint 0.354 vs 0.707), so this catches "
    "moderate-similarity clusters the default banding under-recalls; "
    "signatures are banding-independent and REUSED from the shared "
    "artifact. operators/dedup.py:dedup_plan_for_threshold,lsh_plan.",
)
def q_llm_dedup_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = _dedup.dedup_plan_for_threshold(0.5)
    pairs = _dedup.lsh_candidate_pairs(
        _minhash_sigs_shared(spark, sf_dir),
        n_bands=plan["n_bands"],
        rows_per_band=plan["rows_per_band"],
    ).filter(F.col("n_eq") >= plan["min_eq"])
    return _dedup.dup_components_from_pairs(pairs)


@register(
    "llm_hash_split",
    oracle=f"""
        SELECT {_sampling.hash_split_sql(
            "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        )} AS split,
               lang, COUNT(*) AS n_docs
        FROM documents
        GROUP BY 1, 2
    """,
    doc="Deterministic train/val/test split (80/10/10) by md5-bucket of "
    "doc_id — row-keyed, so assignment survives repartitions, reruns "
    "and engine changes (df.sample() does not). Narrow map-only "
    "transform. operators/sampling.py:hash_split.",
)
def q_llm_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    split = _sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return split.groupBy("split", "lang").agg(F.count("*").alias("n_docs"))


@register(
    "llm_leakage_safe_split",
    oracle=f"""
        WITH j AS (
            SELECT d.doc_id,
                   COALESCE(c.component, d.doc_id) AS cluster_id,
                   c.component IS NOT NULL AS in_cluster
            FROM documents d
            LEFT JOIN ({_dedup.dup_components_sql(min_eq=8)}) c
                   ON c.doc_id = d.doc_id
        )
        SELECT {_sampling.hash_split_sql(
            "cluster_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        )} AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
               CAST(SUM(CASE WHEN in_cluster THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_member_docs
        FROM j GROUP BY 1 ORDER BY 1
    """,
    doc="LEAKAGE-SAFE train/val/test split: hash-split by the near-dup "
    "CLUSTER id (the CC component representative; singletons fall "
    "back to their own doc_id) instead of the row id — llm_hash_split "
    "keyed per doc would strand near-duplicates of a training doc in "
    "the test set, the classic contamination-through-near-dups hole "
    "that survives doc-level decontamination because the eval twin "
    "isn't an exact match. Same cluster key ⇒ same split by "
    "construction (atomicity property-tested). Scale shape: the "
    "cluster table is the SHARED dup_components stage (tiny — only "
    "docs in some cluster), broadcast-joined onto the doc spine; the "
    "split itself stays a narrow map-side expression, so at 100 TB "
    "this costs one dim broadcast over the corpus scan. "
    "operators/sampling.py:hash_split + dedup.py:dup_components.",
)
def q_llm_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id")
    comp = _dup_components_shared(spark, sf_dir, min_eq=8).select(
        "doc_id", "component"
    )
    keyed = docs.join(maybe_broadcast(comp), "doc_id", "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("cluster_id"),
        F.col("component").isNotNull().alias("in_cluster"),
    )
    split = _sampling.hash_split(
        keyed, "cluster_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return (
        split.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct("cluster_id").cast("bigint").alias("n_clusters"),
            F.sum(F.when(F.col("in_cluster"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_member_docs"),
        )
        .orderBy("split")
    )


@register(
    "t4_funnel_conversion",
    oracle="""
        WITH nextp AS (
            SELECT event_id, ts, event_type,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS next_purchase_ts
            FROM events
        )
        SELECT CAST(ts AS DATE) AS click_date,
               COUNT(*) AS n_clicks,
               CAST(SUM(CASE WHEN next_purchase_ts IS NOT NULL
                              AND next_purchase_ts <= ts + INTERVAL 1 HOUR
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        FROM nextp
        WHERE event_type = 'click'
        GROUP BY 1
    """,
    doc="Funnel conversion (click → purchase within 1h) WITHOUT a range "
    "join: next-purchase timestamp via conditional min over the "
    "forward window frame — one shuffle on user_id, ordered by the "
    "unique (ts, event_id) pair. The naive clicks⋈purchases interval "
    "self-join is quadratic in events-per-user at 100 TB; this is the "
    "plan that scales.",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nextp = ev.withColumn(
        "next_purchase_ts",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w),
    )
    return (
        nextp.filter(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("click_date"))
        .agg(
            F.count("*").alias("n_clicks"),
            count_if(
                F.col("next_purchase_ts").isNotNull()
                & (
                    F.col("next_purchase_ts")
                    <= F.col("ts") + F.expr("INTERVAL 1 HOUR")
                )
            ).alias("n_converted"),
        )
    )


@register(
    "t5_cohort_retention",
    oracle="""
        WITH cohorts AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY 1
        ),
        activity AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS active_week
            FROM events
        )
        SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
               CAST(date_diff('day', cohort_week, active_week) / 7 AS BIGINT)
                   AS week_offset,
               COUNT(*) AS n_users
        FROM activity JOIN cohorts USING (user_id)
        GROUP BY cohort_week, active_week
    """,
    doc="Weekly cohort retention: cohort = ISO week of a user's first "
    "event, counted again in each later active week. Two aggregates on "
    "user_id + one join (broadcast when the cohort side is small, else "
    "co-partitioned on user_id); Monday-start date_trunc('week') agrees "
    "across engines.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("active_week")
    ).distinct()
    return (
        activity.join(cohorts, "user_id")
        .groupBy("cohort_week", "active_week")
        .agg(F.count("*").alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
            "n_users",
        )
    )


@register(
    "t6_user_streaks",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ),
        islands AS (
            SELECT user_id, d,
                   d - CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY d) AS INT) AS anchor
            FROM days
        ),
        streaks AS (
            SELECT user_id, anchor, COUNT(*) AS len
            FROM islands GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(SUM(len) AS BIGINT) AS n_active_days,
               CAST(COUNT(*) AS BIGINT) AS n_streaks,
               CAST(MAX(len) AS BIGINT) AS max_streak_days
        FROM streaks GROUP BY user_id
    """,
    doc="Consecutive-day activity streaks per user — the classic "
    "gaps-and-islands shape: distinct active days, island anchor = "
    "day minus row_number (consecutive runs share an anchor), two "
    "combinable aggregates. One window + one agg shuffle, both hash-"
    "partitioned on user_id; no self-join, no lead/lag chain.",
)
def q_t6_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.count("*").cast("bigint").alias("n_streaks"),
        F.max("len").cast("bigint").alias("max_streak_days"),
    )


@register(
    "llm_candidate_agreement",
    oracle=f"""
        WITH mh AS (
            SELECT doc_a, doc_b FROM ({_dedup.lsh_candidates_sql()})
            WHERE n_eq >= 8
        ),
        sh AS (
            SELECT doc_a, doc_b
            FROM ({_dedup.simhash_candidates_sql(max_hamming=3)})
        ),
        u AS (
            SELECT doc_a, doc_b, 1 AS m, 0 AS s FROM mh
            UNION ALL
            SELECT doc_a, doc_b, 0 AS m, 1 AS s FROM sh
        ),
        p AS (
            SELECT doc_a, doc_b, MAX(m) AS m, MAX(s) AS s
            FROM u GROUP BY 1, 2
        )
        SELECT CAST(SUM(m) AS BIGINT) AS n_minhash,
               CAST(SUM(s) AS BIGINT) AS n_simhash,
               CAST(SUM(m * s) AS BIGINT) AS n_both,
               ROUND(SUM(m * s) * 1.0
                     / NULLIF(SUM(m) + SUM(s) - SUM(m * s), 0), 4)
                   AS agreement
        FROM p
    """,
    doc="Dedup-method QA: agreement between the MinHash-LSH candidate "
    "set (n_eq ≥ 8) and the SimHash banded-Hamming set (distance ≤ 3) "
    "— pair-set Jaccard in one union + groupBy pass over the two "
    "session-shared stages; the report run before swapping near-dup "
    "detectors on a live corpus.",
)
def q_llm_candidate_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mh = (
        _lsh_pairs_shared(spark, sf_dir)
        .filter(F.col("n_eq") >= 8)
        .select("doc_a", "doc_b", F.lit(1).alias("m"), F.lit(0).alias("s"))
    )
    sh = _simhash_pairs_shared(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(0).alias("m"), F.lit(1).alias("s")
    )
    p = (
        mh.unionAll(sh)
        .groupBy("doc_a", "doc_b")
        .agg(F.max("m").alias("m"), F.max("s").alias("s"))
    )
    both = F.sum(F.col("m") * F.col("s"))
    denom = F.sum("m") + F.sum("s") - both
    return p.agg(
        F.sum("m").cast("bigint").alias("n_minhash"),
        F.sum("s").cast("bigint").alias("n_simhash"),
        both.cast("bigint").alias("n_both"),
        F.round(
            both / F.when(denom == 0, None).otherwise(denom), 4
        ).alias("agreement"),
    )


@register(
    "t7_last_touch_attribution",
    oracle="""
        WITH purch AS (
            SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        clk AS (
            SELECT user_id, ts AS click_ts
            FROM events WHERE event_type = 'click'
        ),
        j AS (
            SELECT p.user_id, p.ts,
                   CASE WHEN c.click_ts IS NOT NULL
                         AND p.ts - c.click_ts <= INTERVAL 7 DAY
                        THEN c.click_ts END AS asof_ts
            FROM purch p ASOF LEFT JOIN clk c
              ON p.user_id = c.user_id AND p.ts >= c.click_ts
        )
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(COUNT(asof_ts) AS BIGINT) AS n_attributed,
               ROUND(AVG(date_diff('microsecond', asof_ts, ts)
                         / 3600000000.0), 2) AS avg_lag_hours
        FROM j GROUP BY 1
    """,
    doc="Last-touch attribution: each purchase matched to the user's "
    "latest click at-or-before it WITHIN a 7-day window — the as-of "
    "join's tolerance path (outside-window matches null out, "
    "purchases never drop), then a daily conversion report. One "
    "exchange for the as-of union+window, one for the daily rollup; "
    "never a purchases×clicks range join. operators/asof.py:asof_join "
    "(oracle: DuckDB native ASOF LEFT JOIN + tolerance CASE).",
)
def q_t7_last_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ad_data_pipelines_spark.operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    j = asof_join(
        purch,
        clk,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_cols=[],
        tolerance=F.expr("INTERVAL 7 DAYS"),
        right_tiebreak=["click_id"],
    )
    lag_h = (
        F.unix_micros("ts") - F.unix_micros("asof_ts")
    ) / F.lit(3_600_000_000.0)
    return j.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.count("asof_ts").cast("bigint").alias("n_attributed"),
        F.round(F.avg(lag_h), 2).alias("avg_lag_hours"),
    )


@register(
    "llm_dedup_corpus",
    oracle=f"""
        WITH comp AS ({_dedup.dup_components_sql(min_eq=8)})
        SELECT lang, COUNT(*) AS n_kept,
               ROUND(SUM(n_chars) / 1.0, 2) AS kept_chars
        FROM documents d
        WHERE NOT EXISTS (
            SELECT 1 FROM comp c
            WHERE c.doc_id = d.doc_id AND c.is_keeper = 0
        )
        GROUP BY 1
    """,
    doc="The deduplicated corpus itself: documents minus non-keeper "
    "cluster members (left anti join against the connected-components "
    "output), counted per language. This is the filter a training-data "
    "pipeline actually ships; the anti join shuffles only doc_ids.",
)
def q_llm_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    losers = _dup_components_shared(spark, sf_dir, min_eq=8).filter(
        F.col("is_keeper") == 0
    )
    return (
        docs.join(losers.select("doc_id"), "doc_id", "left_anti")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.sum("n_chars") / 1.0, 2).alias("kept_chars"),
        )
    )


@register(
    "llm_dedup_keeper_policy",
    oracle=f"""
        WITH comp AS ({_dedup.dup_components_sql(min_eq=8)}),
        j AS (
            SELECT c.component, c.doc_id, d.n_chars
            FROM comp c JOIN documents d ON d.doc_id = c.doc_id
        )
        SELECT component, n_members, doc_id AS keeper_id,
               n_chars AS keeper_chars
        FROM (
            SELECT *,
                   CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT)
                       AS n_members,
                   ROW_NUMBER() OVER (
                       PARTITION BY component
                       ORDER BY n_chars DESC, doc_id
                   ) AS rk
            FROM j
        ) WHERE rk = 1
    """,
    doc="Pluggable keeper policy over the SHARED duplicate clusters: "
    "keep each cluster's LONGEST member (ties → min doc_id) instead of "
    "the default min-id keeper — the content-preserving choice a "
    "training pipeline usually wants. Clusters are computed once per "
    "session (dedup chain); this query only joins doc lengths on and "
    "ranks within components — policy changes never recompute "
    "MinHash/LSH/components.",
)
def q_llm_dedup_keeper_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    comps = _dup_components_shared(spark, sf_dir, min_eq=8)
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = comps.select("component", "doc_id").join(docs, "doc_id")
    w = Window.partitionBy("component")
    wr = w.orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        j.withColumn("n_members", F.count("*").over(w).cast("bigint"))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "component",
            "n_members",
            F.col("doc_id").alias("keeper_id"),
            F.col("n_chars").alias("keeper_chars"),
        )
    )


@register(
    "llm_quality_quantile_approx",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               TRUE AS within_tolerance
        FROM documents
        GROUP BY 1
    """,
    doc="Production path of llm_quality_quantile: approx_percentile "
    "(Greenwald-Khanna summary, mergeable, one pass over 100 TB) in "
    "place of the exact sort-based percentile. The sketch VALUES are "
    "algorithm-dependent so no SQL oracle can equal them — the query "
    "returns the TOLERANCE VERDICT (r9 brief #4): per language, the "
    "returned p50/p90 elements must sit within the documented rank "
    "guarantee (|rank(v) − q·n| <= n/accuracy, +1 slack for the "
    "target-rank convention), checked by re-counting ranks against "
    "the same token counts in the SAME query. The sketch is "
    "deterministic for fixed input, so the verdict hash-gates; the "
    "oracle asserts per-lang doc counts and all-true verdicts. The "
    "oracle-checked exact twin is llm_quality_quantile.",
)
def q_llm_quality_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("lang", _ts.token_count("text").alias("n_tokens"))
    pct = tok.groupBy("lang").agg(
        F.expr("approx_percentile(n_tokens, 0.5, 10000)").alias("p50a"),
        F.expr("approx_percentile(n_tokens, 0.9, 10000)").alias("p90a"),
    )
    per_lang = (
        tok.join(F.broadcast(pct), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            count_if(F.col("n_tokens") <= F.col("p50a")).alias("le50"),
            count_if(F.col("n_tokens") < F.col("p50a")).alias("lt50"),
            count_if(F.col("n_tokens") <= F.col("p90a")).alias("le90"),
            count_if(F.col("n_tokens") < F.col("p90a")).alias("lt90"),
        )
    )
    n = F.col("n")
    tol = n / 10000 + 1  # rank error bound n/accuracy, +1 for the
    # floor/ceil target-rank convention — covers every GK variant

    def rank_ok(q: float, le: str, lt: str):
        return (F.col(le) >= q * n - tol) & (F.col(lt) <= q * n + tol)

    return per_lang.select(
        "lang",
        n.alias("n_docs"),
        (
            rank_ok(0.5, "le50", "lt50") & rank_ok(0.9, "le90", "lt90")
        ).alias("within_tolerance"),
    )


@register(
    "llm_boilerplate_ngrams",
    oracle=f"""
        WITH pos AS (
            SELECT doc_id, text,
                   unnest(generate_series(1, GREATEST(n_chars - 4, 1))) AS i
            FROM documents
        ),
        sh AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS shingle FROM pos),
        freq AS (
            SELECT shingle, COUNT(*) AS n_docs FROM sh GROUP BY 1
        )
        SELECT shingle, n_docs FROM freq
        ORDER BY n_docs DESC, shingle
        LIMIT 20
    """,
    doc="Boilerplate heavy hitters: the 20 character-5-grams present in "
    "the most documents (distinct-per-doc, so repeats inside one doc "
    "don't inflate). Doubly useful at corpus scale: candidates for "
    "boilerplate stripping, AND the exact keys that skew LSH band "
    "buckets (feed them to salted_join / AQE diagnostics). Plan: "
    "narrow shingle explode → one count shuffle → TakeOrderedAndProject "
    "(per-partition top-20, no global sort). Ties broken on the shingle "
    "value for cross-engine determinism.",
)
def q_llm_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles_shared(spark, sf_dir)
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "shingle")
        .limit(20)
    )


@register(
    "llm_heavy_hitters_sketch",
    oracle="""
        WITH pos AS (
            SELECT doc_id, text,
                   unnest(generate_series(1, GREATEST(n_chars - 4, 1))) AS i
            FROM documents
        ),
        sh AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS shingle FROM pos),
        samp AS (
            SELECT * FROM sh
            WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                       AS BIGINT) % 100 < 20
        ),
        cand AS (
            SELECT shingle FROM (
                SELECT shingle, COUNT(*) AS n_sample FROM samp
                GROUP BY 1 ORDER BY n_sample DESC, shingle LIMIT 80
            )
        ),
        cnt AS (
            SELECT sh.shingle, COUNT(*) AS n
            FROM sh JOIN cand USING (shingle) GROUP BY 1
            ORDER BY n DESC, shingle LIMIT 20
        )
        SELECT shingle, n,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, shingle) AS INT)
                   AS rank
        FROM cnt
    """,
    doc="Heavy hitters WITHOUT aggregating the key universe "
    "(operators/sketch.py approx_top_keys): the monitoring twin of "
    "llm_boilerplate_ngrams's exact count. A deterministic 20% "
    "doc-hash sample nominates 4×k=80 candidate shingles (exact within "
    "the sample), then ONE filtered aggregate computes exact counts "
    "for candidates only — at 100 TB the aggregate's key set is ≤80 "
    "instead of the shingle universe, so map-side combine reduces "
    "every partition to ≤80 rows before the (tiny) shuffle. Returned "
    "counts are exact for returned keys; the miss probability for "
    "true heavy hitters is vanishing (module docstring). Accuracy "
    "vs exact and CMS bounds: tests/test_operators.py sketch tests.",
)
def q_llm_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ad_data_pipelines_spark.operators import sketch as _sketch

    sh = _shingles_shared(spark, sf_dir)
    return _sketch.approx_top_keys(
        sh, "shingle", "doc_id", k=20, sample_pct=20, candidate_factor=4
    )


@register(
    "llm_nb_quality",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 1024
                       AS bucket
            FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)),
                                                    '\\s+')) AS tok
                FROM documents
            ) WHERE tok <> ''
        ),
        lb AS (SELECT doc_id, lang = 'en' AS pos FROM documents),
        b AS (SELECT t.doc_id, bucket, pos FROM toks t JOIN lb USING (doc_id)),
        pb AS (
            SELECT bucket,
                   SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos,
                   SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg
            FROM b GROUP BY 1
        ),
        tot AS (
            SELECT SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
                   SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg
            FROM b
        ),
        dtot AS (
            SELECT SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS d_pos,
                   SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS d_neg
            FROM lb
        ),
        w AS (
            SELECT bucket,
                   ln((c_pos + 1.0) / (n_pos + 1024.0))
                 - ln((c_neg + 1.0) / (n_neg + 1024.0)) AS w
            FROM pb, tot
        ),
        consts AS (
            SELECT ln((d_pos + 1.0) / (d_neg + 1.0)) AS prior,
                   ln(1.0 / (n_pos + 1024.0))
                 - ln(1.0 / (n_neg + 1024.0)) AS w_unseen
            FROM tot, dtot
        ),
        scored AS (
            SELECT t.doc_id,
                   SUM(CASE WHEN w.w IS NULL THEN 1 ELSE 0 END) AS n_unseen,
                   SUM(COALESCE(w.w, 0)) AS w_sum
            FROM toks t LEFT JOIN w USING (bucket) GROUP BY 1
        ),
        final AS (
            SELECT d.doc_id, d.lang,
                   prior + COALESCE(w_sum, 0)
                         + COALESCE(n_unseen, 0) * w_unseen AS score
            FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id,
                 consts
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pred_en,
               ROUND(AVG(score), 4) AS avg_score
        FROM final GROUP BY 1
    """,
    doc="Model-based quality/domain filter (operators/classify.py): a "
    "fasttext-style hashed-feature Naive Bayes classifier TRAINED and "
    "APPLIED inside the engine — train = ONE aggregate (per-bucket "
    "class counts + add-1 smoothing, no gradient loop), score = one "
    "token explode + broadcast join against the ≤1024-row weight "
    "table + per-doc sum, all codegen; corpus text never shuffles. "
    "Here trained to recognize lang='en' and evaluated per language "
    "(per-class above-threshold rates + mean scores — the validation "
    "a real filter threshold needs). The DuckDB oracle replays "
    "training AND scoring bit-for-bit off the md5 buckets.",
)
def q_llm_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ad_data_pipelines_spark.operators import classify as _classify

    docs = t(spark, sf_dir, "documents")
    tb = _nb_buckets_shared(spark, sf_dir)
    weights, consts = _classify.train_nb(
        docs, F.col("lang") == "en", n_features=1024, buckets=tb
    )
    scored = _classify.nb_score(
        docs, weights, consts, n_features=1024, buckets=tb
    )
    return (
        scored.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pred_en"),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
    )


def _dsir_weights_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log-importance weights of the raw pool (source<>'src0')
    against the src0 target domain — shared by llm_dsir_weights (the
    weight table itself) and llm_dsir_select (the Gumbel resample over
    it); the disk twin is the per-candidate weight column a curation
    run materializes once and resamples from many times. Gram-cache
    ownership: the internal raw-gram persist is session-owned here
    (deliberately NO gram_cache) — the shared stage itself is a
    session-lived persist, and its consumers re-scan it across the
    whole bench, so there is no earlier safe unpersist point."""
    docs = t(spark, sf_dir, "documents")
    return _shared(
        spark,
        sf_dir,
        "dsir_weights",
        lambda: _cls.dsir_weights(
            docs.filter(F.col("source") != "src0"),
            docs.filter(F.col("source") == "src0"),
            n_features=4096,
        ),
    )


_DSIR_SQL = _cls.dsir_weights_sql(
    raw_where="source <> 'src0'",
    target_where="source = 'src0'",
    n_features=4096,
)


@register(
    "llm_dsir_weights",
    oracle=_DSIR_SQL,
    doc="DSIR — Data Selection via Importance Resampling (Xie et al. "
    "2023): hashed uni+bigram bag models p̂ (target = source='src0') "
    "and q̂ (raw = the rest), every raw doc scored with its log "
    "importance weight Σ ln p̂(b) − ln q̂(b) (add-1 smoothing over "
    "4096 md5 buckets). High scores = raw docs that look like the "
    "target domain — the principled alternative to a hard classifier "
    "threshold for shifting a pretraining mixture. Featurization is a "
    "narrow map+explode (text never shuffles); each model is ONE "
    "combinable count aggregate (≤4096 rows, broadcast); scoring is "
    "one broadcast join + per-doc sum. "
    "operators/classify.py:dsir_weights.",
)
def q_llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsir_weights_shared(spark, sf_dir)


@register(
    "llm_dsir_select",
    oracle=f"""
        WITH dw AS ({_cls.dsir_weights_sql(
            raw_where="source <> 'src0'",
            target_where="source = 'src0'",
            n_features=4096,
        )})
        SELECT doc_id, n_grams, log_w,
               {_sampling.gumbel_key_sql("log_w", "doc_id")} AS gumbel_key
        FROM dw
        ORDER BY gumbel_key DESC, doc_id ASC
        LIMIT 40
    """,
    doc="The DSIR resampling step: a FIXED-SIZE weighted sample "
    "without replacement over the importance weights via the "
    "Gumbel-max / Efraimidis–Spirakis trick — each doc's log-weight "
    "perturbed by deterministic hash-keyed Gumbel noise, global "
    "top-40 keys kept. One map + TakeOrdered (per-partition heaps + "
    "40-row driver merge) — never a global window or full sort; the "
    "(gumbel_key, doc_id) order is unique so engines and "
    "partitionings agree. Reads the session-shared weight stage. "
    "operators/sampling.py:gumbel_topk_sample.",
)
def q_llm_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sampling.gumbel_topk_sample(
        _dsir_weights_shared(spark, sf_dir),
        F.col("log_w"),
        k=40,
        key="doc_id",
    )


#: the registry retrieval query — four mid-frequency corpus terms
_BM25_TERMS = ["hash", "join", "vector", "stream"]


def _bm25_scores_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 score table for the registry's 4-term query — shared by
    llm_bm25_topk (its top-20) and llm_hybrid_rrf (its top-50 rank
    list), so the corpus tokenizes once per session; the disk twin is
    the per-query score table a retrieval pipeline materializes once
    and cuts at several depths."""
    return _shared(
        spark,
        sf_dir,
        "bm25_scores",
        lambda: _ret.bm25_scores(t(spark, sf_dir, "documents"), _BM25_TERMS),
    )


@register(
    "llm_bm25_topk",
    oracle=f"""
        WITH bm AS ({_ret.bm25_scores_sql(_BM25_TERMS)})
        SELECT doc_id, n_terms, score FROM bm
        ORDER BY score DESC, doc_id LIMIT 20
    """,
    doc="Okapi BM25 top-20 lexical retrieval for a 4-term query over "
    "the documents table — the query-targeted selection primitive "
    "(pick the corpus slice most relevant to a target domain/query). "
    "Tokens filter to the query terms MAP-SIDE (the exchange carries "
    "only matching (doc_id, term) occurrences, never text); N/avgdl "
    "are a 1-row broadcast aggregate, per-term dfs a 4-row broadcast; "
    "the cut is TakeOrdered on (score DESC, doc_id). "
    "operators/retrieval.py:bm25_topk.",
)
def q_llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bm25_scores_shared(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@register(
    "llm_hybrid_rrf",
    oracle=f"""
        WITH bm AS ({_ret.bm25_scores_sql(_BM25_TERMS)}),
        bm_rank AS (
            SELECT doc_id, rank FROM (
                SELECT doc_id, ROW_NUMBER() OVER (
                    ORDER BY score DESC, doc_id
                ) AS rank FROM bm
            ) WHERE rank <= 50
        ),
        cos AS ({_sim.cosine_topk_sql(max_query_id=1, k=50)}),
        u AS (
            SELECT * FROM bm_rank
            UNION ALL
            SELECT neighbor_id AS doc_id, rk AS rank FROM cos
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lists,
               ROUND(SUM(1.0 / (60 + rank)), 4) AS rrf
        FROM u GROUP BY doc_id
        ORDER BY rrf DESC, doc_id LIMIT 20
    """,
    doc="Hybrid retrieval by reciprocal-rank fusion (Cormack et al. "
    "2009): the BM25 top-50 lexical list fused with the embedding "
    "cosine top-50 for query vector 0 (vec_id AS doc_id, the "
    "registry's doc↔vec bridge) via Σ 1/(60+rank), final top-20 on "
    "(rrf DESC, doc_id). Rank-only fusion needs no score "
    "calibration; docs on BOTH lists (n_lists=2) dominate. Each "
    "input list is already k-row-bounded, so fusion cost is "
    "O(Σ list length) regardless of corpus size. "
    "operators/retrieval.py:rrf_fuse.",
)
def q_llm_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    bm = _ret.rank_by(_bm25_scores_shared(spark, sf_dir), "score", k=50)
    cos = _sim.cosine_topk(emb, emb.filter(F.col("vec_id") < 1), k=50).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rk").alias("rank")
    )
    return (
        _ret.rrf_fuse({"bm25": bm, "cosine": cos}, k0=60)
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(20)
    )


#: batch retrieval eval set — overlapping term sets so tf/df sharing
#: across queries is exercised
_BM25_BATCH = [
    (0, ["hash", "join"]),
    (1, ["vector", "stream", "window"]),
    (2, ["join", "table"]),
]


@register(
    "llm_bm25_batch",
    oracle=_ret.bm25_batch_topk_sql(_BM25_BATCH, k=10),
    doc="Batch BM25: top-10 retrieval for THREE queries in one corpus "
    "pass — the retrieval-evaluation / multi-domain-sweep shape. The "
    "corpus tokenizes once for the union of all query terms; "
    "tf/df/idf are term-global and shared across queries; the "
    "per-query expansion joins the ≤(queries×terms)-row literal "
    "frame broadcast on term, so the only corpus-scale exchange "
    "carries (query_id, doc_id) partial scores; the cut is a window "
    "partitioned by query_id. operators/retrieval.py:bm25_batch_topk.",
)
def q_llm_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ret.bm25_batch_topk(
        t(spark, sf_dir, "documents"), _BM25_BATCH, k=10
    )


@register(
    "llm_doc_embedding",
    oracle=_cls.hashed_doc_embedding_sql(n_features=4096, dim=8),
    doc="Model-free text featurizer: a signed-count Johnson–"
    "Lindenstrauss sketch of each doc's hashed uni+bigram bag — "
    "val(doc,d) = Σ_buckets count·sign(bucket,d), signs from md5 "
    "parity. One flat BIGINT row per (doc_id, dim): integer-exact "
    "cross-engine, no floats anywhere. The text-side bridge to the "
    "similarity family — a cheap dense vector per document for "
    "clustering/near-dup/drift when no neural embedder has run (the "
    "DSIR hashed-feature idea, projected instead of scored). Text "
    "never shuffles: narrow gram explode, one combinable bucket-count "
    "aggregate, an engine-generated broadcast sign table, one final "
    "combinable reduce. operators/classify.py:hashed_doc_embedding.",
)
def q_llm_doc_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cls.hashed_doc_embedding(
        t(spark, sf_dir, "documents"), n_features=4096, dim=8
    )


@register(
    "llm_semantic_decontam",
    oracle=_sim.semantic_decontam_sql(eval_where="vec_id < 10", threshold=0.35),
    doc="Embedding-space decontamination — the semantic member of the "
    "decontam family (exact gram → bloom probe → THIS): every corpus "
    "vector scored by its max cosine to ANY of the 10 eval vectors, "
    "flagged at ≥0.35; catches paraphrased/re-tokenized benchmark "
    "leakage n-gram matching misses (DCLM-style eval-embedding "
    "filter). The eval set broadcasts; max-sim is ONE combinable "
    "struct-max aggregate — a map-side O(N×E) scan, embeddings never "
    "shuffle. operators/similarity.py:semantic_decontam.",
)
def q_llm_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return _sim.semantic_decontam(
        emb, emb.filter(F.col("vec_id") < 10), threshold=0.35
    )


_SD_DOT = (
    "list_sum(list_transform(list_zip({a}.embedding, {b}.embedding), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)


@register(
    "llm_semantic_decontam_ivf",
    oracle=f"""
        WITH sd_exact AS ({_sim.semantic_decontam_sql(
            eval_where="vec_id < 10", threshold=0.35)}),
        sdi_cent AS ({_KMEANS_CENT_SQL}),
        sdi_ccells AS (
            SELECT neighbor_id, cell_id FROM (
                SELECT v.vec_id AS neighbor_id, sdi_cent.cell_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY ROUND({_SD_DOT.format(
                               a='v', b='sdi_cent')}, 4) DESC,
                                    sdi_cent.cell_id
                       ) AS crk
                FROM embeddings v CROSS JOIN sdi_cent
            ) WHERE crk <= 1
        ),
        sdi_ecells AS (
            SELECT eval_id, cell_id FROM (
                SELECT v.vec_id AS eval_id, sdi_cent.cell_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY ROUND({_SD_DOT.format(
                               a='v', b='sdi_cent')}, 4) DESC,
                                    sdi_cent.cell_id
                       ) AS crk
                FROM embeddings v CROSS JOIN sdi_cent
                WHERE v.vec_id < 10
            ) WHERE crk <= 2
        ),
        sdi_best AS (
            SELECT vec_id, sim AS max_sim FROM (
                SELECT cc.neighbor_id AS vec_id,
                       ROUND({_SD_DOT.format(a='c', b='e')}, 4) AS sim,
                       ROW_NUMBER() OVER (
                           PARTITION BY cc.neighbor_id
                           ORDER BY ROUND({_SD_DOT.format(
                               a='c', b='e')}, 4) DESC, ec.eval_id
                       ) AS rk
                FROM sdi_ccells cc
                JOIN sdi_ecells ec ON cc.cell_id = ec.cell_id
                JOIN embeddings c ON c.vec_id = cc.neighbor_id
                JOIN embeddings e ON e.vec_id = ec.eval_id
                WHERE cc.neighbor_id >= 10
            ) WHERE rk = 1
        ),
        sdi_u AS (
            SELECT vec_id, 0 AS is_ivf FROM sd_exact WHERE flagged
            UNION ALL
            SELECT vec_id, 1 AS is_ivf FROM sdi_best
            WHERE max_sim >= 0.35
        ),
        sdi_per AS (
            SELECT vec_id, MAX(1 - is_ivf) AS in_exact,
                   MAX(is_ivf) AS in_ivf
            FROM sdi_u GROUP BY vec_id
        )
        SELECT CAST(SUM(in_exact) AS BIGINT) AS n_exact,
               CAST(SUM(in_ivf) AS BIGINT) AS n_ivf,
               CAST(SUM(in_exact * in_ivf) AS BIGINT) AS n_common,
               ROUND(SUM(in_exact * in_ivf) * 1.0 / SUM(in_exact), 4)
                   AS recall,
               BOOL_AND(in_exact >= in_ivf) AS ivf_subset
        FROM sdi_per
    """,
    doc="The agreement gate for cell-bounded semantic decontamination "
    "— the scale path when the eval list is corpus-sized and cannot "
    "broadcast: corpus vectors keep the shared trained-cell "
    "assignment, eval vectors probe their 2 nearest cells, pairs "
    "exist only within a shared cell (Σ|cell|·|probes| cost, never "
    "N×E). Every IVF flag is true (candidate sims are exact sims — "
    "ivf_subset must hold); recall prices the nprobe knob exactly "
    "like the ANN recall gates. One verdict row: exact vs IVF flag "
    "counts, overlap, recall, subset invariant. "
    "operators/similarity.py:semantic_decontam_ivf.",
)
def q_llm_semantic_decontam_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") < 10)
    exact = _sim.semantic_decontam(emb, ev, threshold=0.35)
    ivf = _sim.semantic_decontam_ivf(
        emb,
        ev,
        _kmeans_cents_shared(spark, sf_dir),
        threshold=0.35,
        nprobe=2,
        corpus_cells=_ivf_cells_shared(spark, sf_dir),
    )
    u = (
        exact.filter(F.col("flagged"))
        .select("vec_id", F.lit(0).alias("is_ivf"))
        .unionByName(
            ivf.filter(F.col("flagged")).select(
                "vec_id", F.lit(1).alias("is_ivf")
            )
        )
    )
    per = u.groupBy("vec_id").agg(
        F.max(1 - F.col("is_ivf")).alias("in_exact"),
        F.max("is_ivf").alias("in_ivf"),
    )
    return per.agg(
        F.sum("in_exact").cast("bigint").alias("n_exact"),
        F.sum("in_ivf").cast("bigint").alias("n_ivf"),
        F.sum(F.col("in_exact") * F.col("in_ivf"))
        .cast("bigint")
        .alias("n_common"),
        F.round(
            F.sum(F.col("in_exact") * F.col("in_ivf"))
            / F.sum("in_exact"),
            4,
        ).alias("recall"),
        F.min(F.col("in_exact") >= F.col("in_ivf")).alias("ivf_subset"),
    )


@register(
    "llm_selection_frontier",
    oracle="""
        WITH qf AS (
            SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT w) AS n_types
            FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                FROM documents
            ) GROUP BY doc_id
        ),
        grid AS (SELECT unnest(generate_series(1, 9)) AS thr_decile)
        SELECT thr_decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
        FROM qf CROSS JOIN grid
        WHERE 10 * n_types >= thr_decile * n_tokens
        GROUP BY thr_decile
    """,
    doc="Quality-selection frontier: the data-budget curve of docs and "
    "tokens surviving each type-token-ratio cutoff (deciles 0.1..0.9) "
    "— the sweep a curation run consults to price a quality bar in "
    "retained tokens BEFORE committing a filter (complements the "
    "single-point llm_quality_quantile). Thresholds compare "
    "INTEGER-exactly (10·n_types ≥ d·n_tokens — never a rounded "
    "ratio, the cross-engine float-boundary trap); the per-doc stats "
    "aggregate once and the 9-row grid joins broadcast. "
    "operators/textstats.py:quality_features.",
)
def q_llm_selection_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    qf = _ts.quality_features(t(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", "n_types"
    )
    grid = spark.range(1, 10).select(F.col("id").alias("thr_decile"))
    return (
        qf.crossJoin(F.broadcast(grid))
        .filter(10 * F.col("n_types") >= F.col("thr_decile") * F.col("n_tokens"))
        .groupBy("thr_decile")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
        )
    )


@register(
    "llm_cms_estimates",
    oracle="""
        WITH ev AS (SELECT event_type FROM events),
        hashed AS (
            SELECT event_type, r,
                   CAST('0x' || substr(
                        md5(event_type || '#cms' || CAST(r AS VARCHAR)),
                        1, 15) AS BIGINT) % 1024 AS bucket
            FROM ev, (SELECT unnest(generate_series(0, 3)) AS r)
        ),
        cms AS (
            SELECT r, bucket, COUNT(*) AS cnt FROM hashed GROUP BY 1, 2
        ),
        keys AS (SELECT DISTINCT event_type FROM events),
        probes AS (
            SELECT event_type, r,
                   CAST('0x' || substr(
                        md5(event_type || '#cms' || CAST(r AS VARCHAR)),
                        1, 15) AS BIGINT) % 1024 AS bucket
            FROM keys, (SELECT unnest(generate_series(0, 3)) AS r)
        ),
        est AS (
            SELECT event_type, MIN(COALESCE(cnt, 0)) AS est
            FROM probes LEFT JOIN cms USING (r, bucket) GROUP BY 1
        ),
        exact AS (
            SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1
        )
        SELECT e.event_type, est, n, est - n AS overcount
        FROM est e JOIN exact USING (event_type)
    """,
    doc="Count-Min sketch round trip (operators/sketch.py "
    "count_min_table + cms_estimates): a 4×1024 counter table over "
    "event_type occurrences — FIXED memory at any cardinality and "
    "mergeable bucket-wise across shards/days (cms_merge) — then "
    "point estimates for every key beside the exact counts, with "
    "the overestimate-only invariant surfaced as `overcount`. "
    "md5-portable bucket hashing makes the oracle reproduce the "
    "sketch bit-for-bit; production swaps fast=True xxhash64.",
)
def q_llm_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ad_data_pipelines_spark.operators import sketch as _sketch

    ev = t(spark, sf_dir, "events").select("event_type")
    cms = _sketch.count_min_table(ev, "event_type", width=1024, depth=4)
    est = _sketch.cms_estimates(
        cms, ev, "event_type", width=1024, depth=4
    )
    exact = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    return est.join(exact, "event_type").select(
        "event_type",
        "est",
        "n",
        (F.col("est") - F.col("n")).alias("overcount"),
    )


@register(
    "j15_asof_enrich",
    oracle="""
        WITH p AS (
            SELECT user_id, ts, value FROM (
                SELECT user_id, ts, value,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id, ts ORDER BY event_id DESC
                       ) AS rn
                FROM events WHERE event_type = 'purchase'
            ) WHERE rn = 1
        ),
        c AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        )
        SELECT c.event_id AS click_id,
               c.user_id AS user_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS last_purchase_ts,
               ROUND(p.value, 2) AS purchase_value
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
    doc="J15 (beyond-reference): backward as-of join — each click "
    "enriched with the user's most recent purchase at-or-before it. "
    "Spark side is the union+last(ignoreNulls)-window operator "
    "(operators/asof.py — ONE key shuffle, no range-condition join); "
    "oracle is DuckDB's native ASOF LEFT JOIN. (user_id, ts) purchase "
    "ties resolve to max event_id via the window tiebreak — same "
    "result as the oracle's row_number dedup, zero extra shuffle "
    "(SURVEY §4.4-6).",
)
def q_j15_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ad_data_pipelines_spark.operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("pts"),
        F.col("value").alias("pval"),
        "event_id",
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    joined = asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts", right_ts="pts",
        right_cols=["pval"], right_tiebreak=["event_id"],
    )
    return joined.select(
        "click_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "last_purchase_ts"
        ),
        F.round("pval", 2).alias("purchase_value"),
    )


@register(
    "llm_chunking",
    oracle=f"""
        SELECT doc_id, chunk_idx, chunk_id,
               length(chunk_text) AS n_chunk_chars
        FROM ({_chunking.chunk_documents_sql(chunk_chars=256, overlap=64)})
    """,
    doc="Document chunking for RAG/embedding prep: 256-char windows "
    "with 64-char overlap, deterministic chunk ids (md5 of "
    "doc_id:chunk_idx). sequence()+explode keeps the whole stage in "
    "codegen — the explode is the only row-multiplying step "
    "(operators/chunking.py). Beyond-reference.",
)
def q_llm_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _chunking.chunk_documents(
        t(spark, sf_dir, "documents"), chunk_chars=256, overlap=64
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_id",
        F.length("chunk_text").alias("n_chunk_chars"),
    )


_STRAT_FRACS = {"en": 0.25, "zh": 1.0, "de": 0.5}


@register(
    "llm_stratified_sample",
    oracle=f"""
        SELECT lang, COUNT(*) AS n_sampled,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM documents
        WHERE {_sampling.stratified_sample_sql(
            "lang", _STRAT_FRACS, "doc_id", default=0.1
        )}
        GROUP BY 1
    """,
    doc="Data-mix rebalancing: per-language keep fractions (downsample "
    "dominant en to 25%, keep all zh, default 10%) decided by a "
    "row-keyed hash — map-only, no shuffle, stable across runs and "
    "partitionings, and the 25% sample is a superset of a 10% one. "
    "id_sum is the witness that the exact same rows survive in both "
    "engines. operators/sampling.py:stratified_sample.",
)
def q_llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    kept = _sampling.stratified_sample(
        docs, "lang", _STRAT_FRACS, key="doc_id", default=0.1
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
    )


@register(
    "llm_stratified_topk",
    oracle=f"""
        SELECT lang, doc_id FROM (
            SELECT lang, doc_id,
                   {_sampling.stratified_topk_sql("lang", "doc_id")} AS rk
            FROM documents
        ) WHERE rk <= 20
    """,
    doc="Deterministic reservoir: exactly min(20, |stratum|) docs per "
    "language by hash rank — balanced eval-set assembly with ONE "
    "window shuffle; (hash, doc_id) order key is unique so engines "
    "and reruns agree. operators/sampling.py:stratified_topk.",
)
def q_llm_stratified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return _sampling.stratified_topk(docs, ["lang"], 20, key="doc_id").select(
        "lang", "doc_id"
    )


@register(
    "s14_scd2_history",
    oracle=f"""
        {_scd.scd2_history_sql(
            keys="o_custkey",
            attrs="o_orderpriority",
            order_col="o_orderdate",
            source='''(
                SELECT o_custkey, o_orderdate, o_orderpriority FROM (
                    SELECT o_custkey, o_orderdate, o_orderpriority,
                           ROW_NUMBER() OVER (
                               PARTITION BY o_custkey, o_orderdate
                               ORDER BY o_orderkey DESC
                           ) AS drn
                    FROM orders
                ) WHERE drn = 1
            ) snap''',
        )}
    """,
    doc="S14 (beyond-reference): SCD Type-2 history — per-customer "
    "order-priority intervals [valid_from, valid_to) collapsed from "
    "daily snapshots via gaps-and-islands (operators/scd.py). "
    "Generalizes the reference's first-seen store "
    "(scripts/ads_passenger_travel_distance_di.py:26-52 = S13) to "
    "full history. Snapshot "
    "dedup keeps max o_orderkey per (custkey, date) — deterministic "
    "(SURVEY §4.4-6). One repartition(key), zero further exchanges.",
)
def q_s14_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").repartition(F.col("o_custkey"))
    dw = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    snap = (
        orders.withColumn("drn", F.row_number().over(dw))
        .filter(F.col("drn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderpriority")
    )
    return _scd.scd2_history(
        snap, keys=["o_custkey"], attrs=["o_orderpriority"],
        order_col="o_orderdate",
    )


@register(
    "s16_merge_apply",
    oracle="""
        WITH merged AS (
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders WHERE o_orderkey % 10 NOT IN (0, 1)
            UNION ALL
            SELECT o_orderkey, o_totalprice + 10.0, '0-MERGED'
            FROM orders WHERE o_orderkey % 10 = 0
            UNION ALL
            SELECT o_orderkey + 100000000, o_totalprice, o_orderpriority
            FROM orders WHERE o_orderkey % 10 = 2
        )
        SELECT o_orderpriority,
               COUNT(*) AS n_rows,
               ROUND(SUM(o_totalprice), 2) AS sum_price,
               CAST(SUM(CASE WHEN o_orderkey > 100000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_inserted
        FROM merged GROUP BY 1
    """,
    doc="S16 (beyond-reference): keyed MERGE / CDC batch apply "
    "(operators/merge.py merge_plan) — the Delta-MERGE restatement of "
    "the reference's first-seen store "
    "(scripts/ads_passenger_travel_distance_di.py:26-52) and "
    "create-vs-append ingest (data_ingestion/folder_import.R:94-98). "
    "Deterministic change batch from orders: keys %10==0 update "
    "(priority+price), %10==1 delete, %10==2 insert under shifted "
    "keys. Broadcast strategy: the change batch broadcasts, the "
    "target fact NEVER shuffles for the update/delete pass; the "
    "insert anti-join ships only the projected key column. Oracle is "
    "the MERGE-equivalent UNION CTE. The physical versioned-pointer "
    "commit (atomic os.replace, crash fault injection) is "
    "pytest-covered: tests/test_merge.py.",
)
def q_s16_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ad_data_pipelines_spark.operators import merge as _merge

    orders = t(spark, sf_dir, "orders")
    m = F.col("o_orderkey") % 10
    updates = (
        orders.filter(m == 0)
        .withColumn("o_orderpriority", F.lit("0-MERGED"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 10.0)
        .withColumn("_op", F.lit("U"))
    )
    deletes = orders.filter(m == 1).withColumn("_op", F.lit("D"))
    inserts = (
        orders.filter(m == 2)
        .withColumn("o_orderkey", F.col("o_orderkey") + 100000000)
        .withColumn("_op", F.lit("I"))
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    # the stand-in change batch is 30% of orders — fact-scale, so the
    # full-outer shuffle path is the honest plan (broadcast_changes
    # stays True only for genuinely-small CDC batches)
    merged = _merge.merge_plan(
        orders, changes, ["o_orderkey"], op_col="_op",
        broadcast_changes=False,
    )
    return merged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.sum(
            F.when(F.col("o_orderkey") > 100000000, 1).otherwise(0)
        ).cast("bigint").alias("n_inserted"),
    )


@register(
    "llm_contamination",
    oracle=_dedup.contamination_sql("doc_id < 25", n=8),
    doc="Benchmark decontamination: corpus docs sharing ≥1 word-8-gram "
    "with a held-out eval set (doc_id<25 stands in for the benchmark). "
    "Eval gram-hashes broadcast (a benchmark is tiny); corpus grams "
    "stream map-side through the broadcast join, so corpus text never "
    "shuffles — only 8-byte hashes reach the count. The testdata's "
    "seeded near-dups make the result non-trivial. "
    "operators/dedup.py:contamination_check.",
)
def q_llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return _dedup.contamination_check(
        docs,
        F.col("doc_id") < 25,
        n=8,
        grams=_word_grams_shared(spark, sf_dir),
    )


@register(
    "llm_decontam_blast_radius",
    oracle=_dedup.decontam_blast_radius_sql("doc_id < 25", n=8, min_eq=8),
    doc="Cluster-atomic decontamination accounting: per near-dup "
    "cluster touched by contamination, how many docs the atomic rule "
    "removes beyond the directly gram-flagged ones (a near-dup of a "
    "contaminated doc carries the same eval text with the flagged "
    "8-gram paraphrased away — dropping only direct flags is leaky, "
    "the same argument as the leakage-safe splits). Pure composition "
    "of two shared artifacts (word-gram table ⋈ dup-cluster table): "
    "marginal cost is one doc_id-grain left join + one combinable "
    "per-cluster aggregate. "
    "operators/dedup.py:decontam_blast_radius.",
)
def q_llm_decontam_blast_radius(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return _dedup.decontam_blast_radius(
        docs,
        F.col("doc_id") < 25,
        n=8,
        min_eq=8,
        grams=_word_grams_shared(spark, sf_dir),
        components=_dup_components_shared(spark, sf_dir, min_eq=8),
    )


@register(
    "llm_bloom_decontam",
    oracle=_dedup.bloom_contamination_sql("doc_id < 25", n=8),
    doc="Benchmark decontamination at PRODUCTION-LIST scale: corpus "
    "docs whose word-8-grams hit a BLOOM of the eval set's grams "
    "(llm_contamination's sibling — the exact path broadcasts the "
    "full distinct hash set, fine for one benchmark but ~8 GB for a "
    "full decontamination list of ~1e9 grams where this bloom is "
    "2^18 bits = 32 KB). Probe is pure map-side arithmetic: forall "
    "over k=5 in-row double-hashed positions (Kirsch-Mitzenmacher: "
    "h1 + i*h2 mod m from ONE md5 — was k md5s/gram, -24% pairwise "
    "A/B) against ONE broadcast array<bigint> scalar — no join, "
    "nothing corpus-sized shuffles. "
    "The md5-derived positions make the filter deterministic and "
    "DuckDB-replayable, so the gate hash-checks the EXACT flagged "
    "set, false positives included (guaranteed superset of the exact "
    "scan — no false negatives — unit-tested). "
    "operators/dedup.py:bloom_contamination_filter(+_sql).",
)
def q_llm_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return _dedup.bloom_contamination_filter(
        docs,
        F.col("doc_id") < 25,
        n=8,
        grams=_word_grams_shared(spark, sf_dir),
    )


@register(
    "llm_pii_scrub",
    oracle=f"""
        SELECT lang,
               CAST(SUM({_scrub.pii_counts_sql("text")["email"]})
                    AS BIGINT) AS n_email,
               CAST(SUM({_scrub.pii_counts_sql("text")["url"]})
                    AS BIGINT) AS n_url,
               CAST(SUM({_scrub.pii_counts_sql("text")["ipv4"]})
                    AS BIGINT) AS n_ipv4,
               CAST(SUM({_scrub.pii_counts_sql("text")["longnum"]})
                    AS BIGINT) AS n_longnum,
               CAST(SUM(CASE WHEN {_scrub.pii_redact_sql("text")} <> text
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted
        FROM documents
        GROUP BY 1
    """,
    doc="PII scrub pass: per-language counts of email/URL/IPv4/long-"
    "digit matches plus how many docs redaction would change. The "
    "synthetic corpus is clean (all zeros) — the crafted-row "
    "cross-engine regex parity lives in "
    "tests/test_operators.py::test_pii_scrub_cross_engine; this entry "
    "verifies the patterns compile and agree over real text at the "
    "gate. Map-only regexp columns, no UDFs. operators/scrub.py.",
)
def q_llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    counts = _scrub.pii_counts("text")
    return docs.groupBy("lang").agg(
        F.sum(counts["email"]).cast("bigint").alias("n_email"),
        F.sum(counts["url"]).cast("bigint").alias("n_url"),
        F.sum(counts["ipv4"]).cast("bigint").alias("n_ipv4"),
        F.sum(counts["longnum"]).cast("bigint").alias("n_longnum"),
        F.sum(
            (_scrub.pii_redact("text") != F.col("text")).cast("int")
        ).cast("bigint").alias("n_redacted"),
    )


@register(
    "llm_chunking_tokens",
    oracle=f"""
        SELECT doc_id, chunk_idx, chunk_id, n_chunk_tokens,
               md5(chunk_text) AS chunk_md5
        FROM ({_chunking.chunk_by_tokens_sql(chunk_tokens=64, overlap=16)})
    """,
    doc="Token-granularity chunking (64-token windows, 16 overlap) — "
    "the variant an embedding pipeline schedules, since context "
    "windows are counted in tokens not characters. Same codegen-only "
    "sequence+explode shape as llm_chunking; chunk text verified by "
    "md5 so the gate compares content without hauling it. "
    "operators/chunking.py:chunk_by_tokens.",
)
def q_llm_chunking_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _chunking.chunk_by_tokens(
        t(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_id",
        "n_chunk_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    )


@register(
    "o8_pivot_matrix",
    oracle="""
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                    AS BIGINT) AS flag_A,
               CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                    AS BIGINT) AS flag_N,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS flag_R
        FROM lineitem
        GROUP BY 1
    """,
    doc="O8 (beyond-reference): pivot to a wide month × returnflag "
    "count matrix. Spark .pivot() with an EXPLICIT value list — "
    "without it Spark first runs a distinct scan to discover columns "
    "AND the output schema becomes data-dependent, both wrong at "
    "scale; with it the pivot is a single partial-aggregable "
    "hash-aggregate, same plan class as any groupBy.",
)
def q_o8_pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "ship_month",
        F.coalesce("A", F.lit(0)).alias("flag_A"),
        F.coalesce("N", F.lit(0)).alias("flag_N"),
        F.coalesce("R", F.lit(0)).alias("flag_R"),
    )


@register(
    "w6_rolling_window",
    oracle="""
        WITH daily AS (
            SELECT o_orderpriority AS pri, o_orderdate AS d,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1, 2
        )
        SELECT pri, d, n_orders,
               ROUND(AVG(n_orders) OVER (
                   PARTITION BY pri ORDER BY d
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
               ), 4) AS ma7,
               CAST(SUM(n_orders) OVER (
                   PARTITION BY pri ORDER BY d
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_orders
        FROM daily
    """,
    doc="W6 (beyond-reference): TIME-RANGE rolling window — 7-day "
    "moving average over daily counts plus running cumulative total. "
    "The range frame is over day numbers (unix_date), so calendar "
    "gaps shrink the window instead of silently widening it the way "
    "a ROWS 6 PRECEDING frame would on sparse dates. Daily agg "
    "first, windows over the (priority, date) grain — the windows "
    "run over pre-aggregated rows, never raw orders.",
)
def q_w6_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").alias("d"),
    ).agg(F.count("*").alias("n_orders"))
    w_ma = (
        Window.partitionBy("pri")
        .orderBy(F.unix_date(F.to_date("d")))
        .rangeBetween(-6, Window.currentRow)
    )
    w_cum = (
        Window.partitionBy("pri")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "pri",
        "d",
        "n_orders",
        F.round(F.avg("n_orders").over(w_ma), 4).alias("ma7"),
        F.sum("n_orders").over(w_cum).cast("bigint").alias("cum_orders"),
    )


@register(
    "o9_unpivot_long",
    oracle="""
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               'flag_' || f AS flag,
               CAST(SUM(CASE WHEN l_returnflag = f THEN 1 ELSE 0 END)
                    AS BIGINT) AS n
        FROM lineitem
        CROSS JOIN (SELECT unnest(['A', 'N', 'R']) AS f) flags
        GROUP BY 1, 2
    """,
    doc="O9 (beyond-reference): unpivot/melt — the wide month x flag "
    "matrix from o8 back to long (ship_month, flag, n) rows via "
    "DataFrame.unpivot. Wide->long is a zero-shuffle narrow transform "
    "(each input row fans out to its value columns in place); the "
    "oracle builds the long form directly with a 3-row flag spine so "
    "zero-count cells are preserved.",
)
def q_o9_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = q_o8_pivot_matrix(spark, sf_dir)
    return wide.unpivot(
        ["ship_month"],
        ["flag_A", "flag_N", "flag_R"],
        "flag",
        "n",
    )


@register(
    "llm_entropy",
    oracle=_ts.char_entropy_sql(),
    doc="Per-doc character Shannon entropy (bits/char) — boilerplate "
    "repeats →0, natural text ~4, noise →log2(alphabet); the "
    "Gopher/C4 quality signal. H = log2(T) - Σ n·log2(n)/T over "
    "(doc, char) counts: two partial-aggregable shuffles, no per-doc "
    "total join. operators/textstats.py:char_entropy.",
)
def q_llm_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _entropy_shared(spark, sf_dir)


@register(
    "llm_token_stats_bpe",
    oracle=f"""
        SELECT lang, COUNT(*) AS n_docs,
               ROUND(AVG({_ts.bpe_token_count_sql("text")}), 4)
                   AS avg_bpe_tokens,
               ROUND(AVG({_ts.bpe_token_count_sql("text")} * 1.0
                         / len(regexp_split_to_array(trim(text), '\\s+'))),
                     4) AS bpe_per_word
        FROM documents
        GROUP BY 1
    """,
    doc="BPE-ish token budget per language: GPT-2-style pre-token "
    "counts (letter/digit/punct runs, leading-space absorbed) and "
    "their ratio to whitespace words — the fertility estimate a "
    "training pipeline budgets context windows with. Lookahead-free "
    "pattern keeps Spark and DuckDB regex counts identical. "
    "operators/textstats.py:bpe_token_count.",
)
def q_llm_token_stats_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    bpe = _ts.bpe_token_count("text")
    words = _ts.token_count("text")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(bpe), 4).alias("avg_bpe_tokens"),
        F.round(F.avg(bpe * F.lit(1.0) / words), 4).alias("bpe_per_word"),
    )


@register(
    "llm_repetition",
    oracle=_ts.repetition_signals_sql(),
    doc="Gopher-style repetition quality signals (Rae et al. 2021, "
    "table A1): per-doc top word-2/3-gram character coverage and "
    "duplicate-5-gram character fraction. Each signal is one explode → "
    "partial-agg (doc_id, gram) count → per-doc combine; no stage "
    "materializes a whole doc's grams in one row. "
    "operators/textstats.py:repetition_signals.",
)
def q_llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _repetition_shared(spark, sf_dir)


@register(
    "llm_quality_filter",
    oracle=f"""
        WITH q AS ({_ts.quality_sql()}),
        e AS ({_ts.char_entropy_sql()}),
        r AS ({_ts.repetition_signals_sql()})
        SELECT d.doc_id,
               COALESCE(q.n_tokens BETWEEN 50 AND 100000, FALSE) AS ok_len,
               COALESCE(q.mean_tok_len BETWEEN 3 AND 10, FALSE) AS ok_tok,
               COALESCE(e.char_entropy >= 2.0, FALSE) AS ok_entropy,
               COALESCE(r.top2_frac <= 0.2 AND r.dup5_frac <= 0.3, FALSE)
                   AS ok_rep,
               COALESCE(q.n_tokens BETWEEN 50 AND 100000, FALSE)
                   AND COALESCE(q.mean_tok_len BETWEEN 3 AND 10, FALSE)
                   AND COALESCE(e.char_entropy >= 2.0, FALSE)
                   AND COALESCE(r.top2_frac <= 0.2 AND r.dup5_frac <= 0.3,
                                FALSE) AS pass
        FROM documents d
        LEFT JOIN q ON q.doc_id = d.doc_id
        LEFT JOIN e ON e.doc_id = d.doc_id
        LEFT JOIN r ON r.doc_id = d.doc_id
    """,
    doc="Composite Gopher/C4-style keep-or-drop verdict per doc: length "
    "band, mean-token-length band, char-entropy floor, repetition "
    "ceilings — each rule a transparent boolean column, pass = AND. "
    "Every input signal partial-aggs to hash(doc_id) partitioning, so "
    "the rule joins chain without re-exchanging the signal tables. "
    "Missing signals (empty docs) fail conservatively, never null.",
)
def q_llm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ts.quality_verdicts(
        t(spark, sf_dir, "documents"),
        quality=_quality_features_shared(spark, sf_dir),
        entropy=_entropy_shared(spark, sf_dir),
        repetition=_repetition_shared(spark, sf_dir),
    )


@register(
    "llm_pack_sequences",
    oracle=_packing.pack_sequences_sql(seq_tokens=2048),
    doc="GPT-style concat-and-chunk sequence packing: each doc's global "
    "token offset and the [first_seq, last_seq] training-sequence range "
    "it spans at a 2048-token budget. The global prefix sum is a "
    "two-phase scan (range shards → within-shard window → broadcast "
    "shard offsets), NEVER a single-partition global window. "
    "operators/packing.py:pack_sequences.",
)
def q_llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _packing.pack_sequences(t(spark, sf_dir, "documents"), seq_tokens=2048)


@register(
    "llm_det_shuffle",
    oracle=f"""
        SELECT doc_id, {_sampling.deterministic_shuffle_sql("doc_id", n_buckets=16)}
        FROM documents
    """,
    doc="Reproducible global shuffle order for training serving: "
    "(bucket, rank) keyed to the row hash — epoch order is a pure "
    "function of the corpus, unlike orderBy(rand()). One bounded "
    "window shuffle. operators/sampling.py:deterministic_shuffle.",
)
def q_llm_det_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return _sampling.deterministic_shuffle(
        docs.select("doc_id"), "doc_id", n_buckets=16
    )


@register(
    "llm_weighted_sample",
    oracle=f"""
        SELECT doc_id, n_chars
        FROM documents
        WHERE {_sampling.weighted_sample_sql(
            "LEAST(n_chars / 500.0, 1.0)", "doc_id"
        )}
    """,
    doc="Importance-resampling corpus curation: keep each doc with "
    "probability equal to its own quality weight (here "
    "least(n_chars/500, 1)), deterministically — hash-keyed to the row "
    "so reruns, engines and layouts agree, monotone in the weight. "
    "Map-only, no shuffle. operators/sampling.py:weighted_sample.",
)
def q_llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    weight = F.least(F.col("n_chars") / 500.0, F.lit(1.0))
    return _sampling.weighted_sample(docs, weight, "doc_id")


#: Prescribed data mixture for the mixing query: absolute per-language
#: row budgets (en-heavy, the canonical "60% web / rest long-tail" shape).
_MIX_TARGETS = {"en": 100, "de": 30, "zh": 20}

@register(
    "llm_source_mix",
    oracle=f"""
        SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   {_sampling.mixture_balance_sql(
                       "lang", _MIX_TARGETS, "doc_id"
                   )} AS __keep
            FROM documents
        ) WHERE __keep
    """,
    doc="Deterministic domain/source mixing: exactly min(target, "
    "stratum size) rows per language — the corpus-assembly step that "
    "pins a prescribed data mixture as absolute counts (stratified_"
    "sample scales by fraction instead). One window shuffle on the "
    "stratum; hash-rank pick is unbiased and layout-independent. "
    "operators/sampling.py:mixture_balance.",
)
def q_llm_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return _sampling.mixture_balance(docs, "lang", _MIX_TARGETS, "doc_id")


@register(
    "llm_temperature_mix",
    oracle=_sampling.temperature_mix_sql(
        "documents", "lang", "doc_id", budget=200,
        select_cols="doc_id, lang",
    ),
    doc="Temperature-weighted mixture sampling (τ=0.5): per-language "
    "budgets derive from corpus statistics — k_l ∝ sqrt(n_l) — so "
    "small languages are up-weighted vs proportional sampling and the "
    "mixture tracks the corpus as it grows (the multilingual-LM "
    "sampling recipe). One count aggregate, a broadcast target table, "
    "one hash-rank window shuffle. "
    "operators/sampling.py:temperature_mix.",
)
def q_llm_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return _sampling.temperature_mix(
        docs, "lang", "doc_id", budget=200
    ).select("doc_id", "lang")


@register(
    "llm_epoch_plan",
    oracle=_sampling.epoch_plan_sql(
        "lang", budget_tokens=100_000, tau=0.5, max_epochs=4.0
    ),
    doc="Token-budget mixing plan with repetition caps: each language "
    "stratum is allotted budget*sqrt(n)/sum(sqrt(n)) tokens "
    "(temperature mixing at token grain), its repeat factor "
    "epochs = allotment/available CAPPED at 4 — repeating a small "
    "source many times degrades quality faster than undershooting "
    "(the data-constrained-scaling rule) — and the plan reports "
    "(avail_tokens, epochs, planned_tokens, capped) per stratum. "
    "Pure plan computation: one combinable token-count aggregate + a "
    "1-row weight-sum broadcast; no corpus rows move. "
    "operators/sampling.py:epoch_plan.",
)
def q_llm_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return _sampling.epoch_plan(
        docs, "lang", budget_tokens=100_000, tau=0.5, max_epochs=4.0
    )


_CBAL_DOT = (
    "list_sum(list_transform(list_zip({a}.embedding, {b}.embedding), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)

@register(
    "llm_cluster_balanced_mix",
    oracle=f"""
        WITH cent AS (
            {_KMEANS_CENT_SQL}
        ),
        cells AS (
            SELECT vec_id AS doc_id, cell_id FROM (
                SELECT v.vec_id, cent.cell_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY ROUND({_CBAL_DOT.format(a='v', b='cent')}, 4) DESC,
                                    cent.cell_id
                       ) AS crk
                FROM embeddings v CROSS JOIN cent
            ) WHERE crk <= 1
        )
        SELECT doc_id, cell_id FROM (
            SELECT doc_id, cell_id,
                   {_sampling.cluster_balanced_sample_sql(
                       "cell_id", 40, "doc_id"
                   )} AS __keep
            FROM cells
        ) WHERE __keep
    """,
    doc="Cluster-balanced sampling (semantic-diversity curation): "
    "nearest-centroid embedding cells — the SAME session-shared "
    "TRAINED (kmeans_fp) cell table semantic_dedup and the ANN probes "
    "consume — become the strata of a uniform min(40, |cell|)-per-cell hash-rank "
    "sample, so the selected corpus is balanced over embedding-space "
    "modes, not just source labels (uniform-over-clusters beats "
    "uniform-over-rows when one dense mode dominates the crawl). "
    "Centroids broadcast for the cell assignment; the pick itself is "
    "ONE window shuffle partitioned by cell_id with a unique "
    "(hash, doc_id) order key — deterministic across engines, runs "
    "and layouts, and a cell's sample never changes because other "
    "cells grew. operators/sampling.py:cluster_balanced_sample.",
)
def q_llm_cluster_balanced_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _ivf_cells_shared(spark, sf_dir).select(
        F.col("neighbor_id").alias("doc_id"), "cell_id"
    )
    return _sampling.cluster_balanced_sample(
        cells, "cell_id", 40, "doc_id"
    ).select("doc_id", "cell_id")


@register(
    "llm_semantic_dedup",
    oracle=_sim.semantic_dedup_sql(
        threshold=0.9, cent_sql=_KMEANS_CENT_SQL
    ),
    doc="SemDeDup-style embedding-space pruning (arXiv:2303.09540): "
    "nearest-centroid clustering, WITHIN-cell cosine pairs only, drop "
    "every vector with a same-cell neighbor at sim>=0.9 and smaller id "
    "— kept rows are each neighborhood's min-id representative. "
    "Centroids broadcast; the pairwise stage shuffles cell_id only and "
    "costs sum(|cell|^2), bounded by the centroid-count knob — never "
    "the unscoped corpus quadratic. Reuses the session-shared TRAINED "
    "(kmeans_fp) cell table (renamed) — the same codebook the ANN "
    "probes and cluster-balanced sampling consume, so no per-call "
    "persist of a fresh assignment. "
    "operators/similarity.py:semantic_dedup.",
)
def q_llm_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    cells = _ivf_cells_shared(spark, sf_dir).select(
        "cell_id",
        F.col("neighbor_id").alias("vec_id"),
        F.col("c_emb").alias("emb"),
    )
    return _sim.semantic_dedup(
        emb, threshold=0.9, n_cells=4, corpus_cells=cells
    )


@register(
    "llm_budget_select",
    oracle=_packing.budget_select_sql(budget=15_000),
    doc="Quality-ranked data selection under a hard token budget: rank "
    "docs by (score DESC, doc_id), keep the maximal prefix with "
    "cumulative tokens <= 15k — 'train on the best N tokens'. The "
    "global prefix sum reuses pack_sequences' two-phase scan, range-"
    "sharded on the score so only per-shard totals cross a single-"
    "partition window. operators/packing.py:budget_select.",
)
def q_llm_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").alias("score"),
        _ts.token_count("text").cast("bigint").alias("n_tokens"),
    )
    return _packing.budget_select(docs, budget=15_000)


@register(
    "o10_profile",
    oracle=_profile.profile_sql(
        "documents", ["doc_id", "text", "lang", "source", "n_chars"]
    ),
    doc="One-pass column profiling (completeness / cardinality / "
    "range): a single wide aggregate computes count, nulls, distinct, "
    "min, max for every column — partial/final combinable, one scan at "
    "any scale — then stack-unpivots to a row per column. Exact "
    "distinct here for the oracle; production uses the "
    "approx_count_distinct twin (HLL sketches merge in the same pass). "
    "operators/profile.py:profile.",
)
def q_o10_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _profile.profile(
        t(spark, sf_dir, "documents"),
        ["doc_id", "text", "lang", "source", "n_chars"],
        exact=True,
    )


@register(
    "llm_incremental_dedup",
    oracle=_dedup.incremental_dedup_sql(
        "doc_id < 100", "doc_id >= 100", min_eq=8
    ),
    doc="Incremental (batch-vs-history) near-dedup: the first 100 docs "
    "play the incoming crawl, the rest the existing corpus; each new "
    "doc LSH-joins against the historical signature table and is "
    "dropped when any history doc agrees on >=8/16 permutations "
    "(matched_doc = min matching id as evidence). History is touched "
    "pre-bucketed — never re-paired against itself; both sides filter "
    "the session-shared signature stage. "
    "operators/dedup.py:dedup_against_corpus.",
)
def q_llm_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = _minhash_sigs_shared(spark, sf_dir)
    return _dedup.dedup_against_corpus(
        sigs.filter(F.col("doc_id") < 100),
        sigs.filter(F.col("doc_id") >= 100),
        min_eq=8,
    )


@register(
    "llm_vocab",
    oracle=_vocab.build_vocab_sql(max_size=200),
    doc="Frequency-ranked vocabulary from the corpus: top-200 tokens "
    "with deterministic (count DESC, token) ids from 1; id 0 reserved "
    "for OOV. Count is partial/final combinable and the top-N is "
    "TakeOrdered (distributed heap-select, no global sort); the only "
    "single-partition window ranks the <=200 survivors. "
    "operators/vocab.py:build_vocab.",
)
def q_llm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _vocab.build_vocab(t(spark, sf_dir, "documents"), max_size=200)


@register(
    "llm_vocab_coverage",
    oracle=_vocab.vocab_coverage_sql(sizes=(5, 10, 25)),
    doc="Vocabulary coverage curve — the tokenizer-sizing diagnostic: "
    "for K in {5, 10, 25} (the synthetic corpus holds ~31 types; "
    "real corpora use 2^13..2^18), the fraction of corpus token "
    "occurrences the K most frequent types cover (same rank as "
    "build_vocab, so coverage(K) IS the non-OOV share a K-sized "
    "vocab achieves; n_types = min(K, |V|) shows where the curve "
    "saturates). One explode into a combinable (token, count) "
    "aggregate; rank/running-sum window over the AGGREGATED "
    "vocabulary only (post-aggregate single partition, the w8 "
    "pattern); sizes broadcast. operators/vocab.py:vocab_coverage.",
)
def q_llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _vocab.vocab_coverage(
        t(spark, sf_dir, "documents"), sizes=(5, 10, 25)
    )


@register(
    "llm_encode_docs",
    oracle=_vocab.encode_docs_sql(max_size=200),
    doc="Corpus encoding against the built vocabulary: every doc "
    "becomes its id sequence (OOV->0, original order) + token/OOV "
    "counts; the vocab broadcasts so the corpus never shuffles for the "
    "lookup, and sequences reassemble with array_sort over (pos, id) "
    "structs — order-correct under any partitioning. Ids rendered "
    "space-joined for engine-neutral hashing. "
    "operators/vocab.py:encode_docs.",
)
def q_llm_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    encoded = _vocab.encode_docs(
        docs, _vocab.build_vocab(docs, max_size=200)
    )
    return encoded.select(
        "doc_id",
        F.array_join("token_ids", " ").alias("token_ids"),
        "n_tokens",
        "n_oov",
    )


@register(
    "llm_remove_boilerplate",
    oracle=_scrub.remove_boilerplate_sql(" ", 0.5),
    doc="C4-style boilerplate REMOVAL (the heavy-hitter reporter's "
    "acting sibling): spans whose document frequency exceeds half the "
    "corpus are dropped and docs reassembled in original order/"
    "spacing. Span text never shuffles — counting runs on md5 hashes, "
    "only the tiny heavy set joins back broadcast. Word granularity "
    "here (testdata is single-line); sep='\\n' is the production line "
    "mode. operators/scrub.py:remove_boilerplate_spans.",
)
def q_llm_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scrub.remove_boilerplate_spans(
        t(spark, sf_dir, "documents"), sep=" ", max_df_frac=0.5
    )


@register(
    "llm_snapshot_diff",
    oracle=_snapshot.snapshot_diff_sql(
        "doc_id % 11 <> 3",
        "doc_id % 13 <> 5",
        "CASE WHEN doc_id % 17 = 2 THEN upper(text) ELSE text END",
    ),
    doc="Corpus snapshot diff (added/removed/changed/unchanged) between "
    "two versions of a keyed corpus — both carved deterministically out "
    "of documents (old drops doc_id%11=3; new drops %13=5 and edits "
    "%17=2). Payloads fingerprint MAP-SIDE via portable md5, so the "
    "full-outer join shuffles two longs per row and text never enters "
    "an exchange. operators/snapshot.py:snapshot_diff; batch twin of "
    "the first-seen ledger (data_ingestion/folder_import.R:9-213).",
)
def q_llm_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 11 != 3)
    new = docs.filter(F.col("doc_id") % 13 != 5).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 17 == 2, F.upper("text")
        ).otherwise(F.col("text")),
    )
    return _snapshot.snapshot_diff(old, new)


@register(
    "llm_bigram_lm",
    oracle=_lm.bigram_lm_score_sql(k=0.5),
    doc="Bigram-LM perplexity scoring (CCNet/KenLM-style quality "
    "signal): train add-k-smoothed bigram counts on the corpus, score "
    "each doc's average log-likelihood under them — improbable docs "
    "are spam/boilerplate/wrong-language. Bigrams build array-side "
    "(zip_with over two slices — no posexplode+window); training is "
    "two combinable counts + a broadcast 1-row vocab scalar; scoring "
    "shuffles (doc_id, bigram) only, never text. "
    "operators/lm.py:bigram_lm_score.",
)
def q_llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bigram_scores_shared(spark, sf_dir)


def _bigram_scores_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE corpus LM-scoring pass per session (train counts + score
    # every doc) feeds the standalone score query AND the perplexity
    # bucketing report (r15 — previously llm_ppl_buckets re-ran the
    # whole pass); the disk twin is the per-doc quality-score column a
    # curation run materializes once
    return _shared(
        spark, sf_dir, "bigram_scores",
        lambda: _lm.bigram_lm_score(t(spark, sf_dir, "documents"), k=0.5),
    )


@register(
    "llm_lm_heldout",
    oracle=_lm.bigram_lm_heldout_sql(
        train_where="lang = 'en'", score_where="lang <> 'en'", k=0.5
    ),
    doc="HELD-OUT bigram-LM perplexity scoring — the full CCNet/KenLM "
    "filter shape llm_bigram_lm's self-scoring cannot exercise: the "
    "LM trains on the curated reference slice (lang='en') and scores "
    "DISJOINT candidate docs, so unseen bigrams hit the add-k "
    "fallback ln(k/(c(w1)+k*V)) and unseen context words ln(1/V) — "
    "wrong-language and off-distribution docs sink to the improbable "
    "tail, which is the drop rule. LM = two combinable counts over "
    "the train slice; scoring left-joins (doc_id, bigram) pairs to "
    "the count tables, text never shuffles. "
    "operators/lm.py:bigram_lm_score_held_out.",
)
def q_llm_lm_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return _lm.bigram_lm_score_held_out(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
        k=0.5,
    )


@register(
    "llm_ppl_buckets",
    oracle=_lm.perplexity_buckets_sql(k=0.5),
    doc="CCNet-style head/middle/tail perplexity bucketing: every doc "
    "scored under the corpus bigram LM, each language split at its "
    "exact tercile thresholds (head = the most probable third CCNet "
    "keeps outright, tail = the improbable third to drop or "
    "down-weight), reported as (lang, bucket, n_docs, mean_ll). "
    "Thresholds are RANK-EXACT — the k-th smallest already-rounded "
    "avg_ll per language (production: approx_percentile, the "
    "documented quantile divergence); bucketing is a map-side CASE "
    "over the rounded scores; mean_ll is an exact integer sum of the "
    "scaled scores, so no order-dependent float sum reaches the "
    "output. operators/lm.py:perplexity_buckets.",
)
def q_llm_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lm.perplexity_buckets(
        t(spark, sf_dir, "documents"),
        k=0.5,
        scored=_bigram_scores_shared(spark, sf_dir),
    )


@register(
    "llm_tfidf_keywords",
    oracle=_ts.tfidf_keywords_sql("source", k=5),
    doc="Top-5 TF-IDF keywords per source slice — the per-slice "
    "characterization report of a corpus audit. Raw tokens shuffle "
    "once into the (group, token) tf count; document frequency and "
    "the broadcast group-count scalar compute over the already-"
    "aggregated tf table; ranks order on the ROUNDED score so 1-ulp "
    "ln() differences cannot flip cross-engine ordering. "
    "operators/textstats.py:tfidf_keywords.",
)
def q_llm_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ts.tfidf_keywords(t(spark, sf_dir, "documents"), "source", k=5)


@register(
    "llm_random_projection",
    oracle=_sim.random_project_sql(out_dim=8),
    doc="Johnson-Lindenstrauss sign projection of the 64-d embeddings "
    "to 8 dims — the dimensionality-reduction front-end for ANN/"
    "clustering at scale. Pure narrow map: the deterministic +/-1 "
    "matrix (md5-parity, engine-reproducible) is baked into codegen'd "
    "add/subtract chains — no join, no shuffle, no Python; both "
    "engines evaluate the identical left-associated chain. "
    "operators/similarity.py:random_project.",
)
def q_llm_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.random_project(t(spark, sf_dir, "embeddings"), out_dim=8)


@register(
    "s15_json_props",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                             AS BIGINT)) AS BIGINT) AS sum_k,
               ROUND(AVG(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                              AS BIGINT)), 4) AS avg_k
        FROM events
        GROUP BY event_type
    """,
    doc="Semi-structured ingestion: parse the events.props JSON column "
    "with an explicit schema (from_json — typed, codegen, malformed "
    "rows null out instead of failing) and aggregate the extracted "
    "field per event_type. The schema-on-read twin of the JSONL "
    "source (sources/jsonl.py); at scale the parse is a narrow map "
    "and only (event_type, k) reaches the exchange.",
)
def q_s15_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k BIGINT").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
    )


_AUDIT_RULES = {
    "l_quantity_in_1_50": "l_quantity BETWEEN 1 AND 50",
    "l_discount_in_0_0.1": "l_discount BETWEEN 0 AND 0.1",
    "l_extendedprice_positive": "l_extendedprice > 0",
    "l_returnflag_domain": "l_returnflag IN ('A', 'N', 'R')",
    "l_shipdate_not_null": "l_shipdate IS NOT NULL",
}


@register(
    "o11_constraint_audit",
    oracle=_audit.constraint_audit_sql("lineitem", _AUDIT_RULES)
    + " UNION ALL "
    + _audit.fk_audit_sql(
        "orders", "customer", "o_custkey", "c_custkey", "orders_custkey_fk"
    ),
    doc="Declarative constraint audit (Deequ-style): five row-local "
    "rules over lineitem compile into ONE wide aggregate (a violation "
    "counter per rule, partial/final combinable — one scan at any "
    "scale) stack-unpivoted to a per-rule report, unioned with a "
    "referential-integrity row (orders.o_custkey within customer via "
    "broadcast LEFT ANTI on the distinct parent keys). NULL predicate "
    "results count as violations in both engines. The automated twin "
    "of the reference's manual post-ingest checks "
    "(data_ingestion/pg_import.R:230-280). "
    "operators/audit.py:constraint_audit,fk_audit.",
)
def q_o11_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    report = _audit.constraint_audit(li, _AUDIT_RULES)
    fk = _audit.fk_audit(
        t(spark, sf_dir, "orders"),
        t(spark, sf_dir, "customer"),
        "o_custkey",
        "c_custkey",
        "orders_custkey_fk",
        # customer scales with sf — fact-vs-fact audit, so the anti
        # join shuffles distinct keys instead of pinning a broadcast
        broadcast_parent=False,
    )
    return report.unionByName(fk)


_CHECKSUM_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_odate"]


@register(
    "o12_table_checksum",
    oracle=_audit.table_checksum_sql(
        "(SELECT o_orderkey, o_custkey, o_orderstatus, "
        "CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_odate "
        "FROM orders)",
        _CHECKSUM_COLS,
    ),
    doc="Order-independent table checksum: XOR of portable md5-derived "
    "row fingerprints + row count — validate a migrated/copied table "
    "against its source WITHOUT moving data (the check a user runs "
    "when switching the reference warehouse to this engine). XOR "
    "aggregate is combinable and layout-independent; columns "
    "canonicalize via unit-separator concat with a NULL sentinel; "
    "timestamp pre-cast to date string (float/timestamp rendering is "
    "engine-specific by design — see docstring). "
    "operators/audit.py:table_checksum.",
)
def q_o12_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("date").cast("string").alias("o_odate"),
    )
    return _audit.table_checksum(orders, _CHECKSUM_COLS)


@register(
    "a18_winsorize",
    oracle=_agg.winsorized_stats_sql(
        "events", "value", ["event_type"], 0.05, 0.95
    ),
    doc="Per-group winsorization (quantile generalization of the "
    "reference's fixed 240-minute outlier clamp, P14 — "
    "scripts/ads_passenger_travel_time_di.R): clamp events.value to "
    "each event_type's own [p05, p95] and report means before/after. "
    "Exact percentile for the oracle (quantile_cont-equivalent "
    "interpolation); production twin is approx_percentile (mergeable "
    "sketch, one pass). Bounds (1 row/group) broadcast back — facts "
    "never shuffle for the clamp. operators/agg.py:winsorized_stats.",
)
def q_a18_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _agg.winsorized_stats(
        t(spark, sf_dir, "events"),
        "value",
        ["event_type"],
        0.05,
        0.95,
        exact=True,
    )


@register(
    "llm_normalize_text",
    oracle=_scrub.normalize_text_sql("text"),
    doc="Canonical text normalization (pre-dedup): lowercase, control "
    "chars to spaces, whitespace runs collapsed, trimmed — so casing/"
    "spacing variants of the same content hash identically downstream. "
    "Map-only column algebra (lower + 2 regexp_replace + trim), "
    "explicit [\\x00-\\x1f\\x7f] class keeps Java regex and RE2 "
    "byte-identical. operators/scrub.py:normalize_text.",
)
def q_llm_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scrub.normalize_text(t(spark, sf_dir, "documents"))


@register(
    "j17_interval_join",
    oracle="""
        WITH iv AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS wday
            FROM events GROUP BY 1, 2
        ),
        win AS (
            SELECT event_type, wday,
                   CAST(wday AS TIMESTAMP) + INTERVAL 18 HOUR AS w_start,
                   CAST(wday AS TIMESTAMP) + INTERVAL 30 HOUR AS w_end
            FROM iv
        )
        SELECT w.event_type, w.wday, CAST(COUNT(*) AS BIGINT) AS n_points
        FROM win w JOIN events e
          ON e.event_type = w.event_type
         AND e.ts >= w.w_start AND e.ts < w.w_end
        GROUP BY 1, 2
    """,
    doc="Point-in-interval (range) join via bucket blocking: nightly "
    "18:00-06:00 windows per event_type (one per active day — windows "
    "CROSS midnight, exercising the multi-bucket interval explode) "
    "joined to the events inside them. The join is a plain equi-join "
    "on (day-bucket, event_type) with an exact containment "
    "post-filter — never the BroadcastNestedLoopJoin Spark would plan "
    "for a bare inequality join; explode factor is ceil(span/bucket)+1 "
    "on the (small) interval side only. "
    "operators/intervals.py:interval_join.",
)
def q_j17_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    win = (
        ev.groupBy("event_type", F.to_date("ts").alias("wday"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            "event_type",
            "wday",
            (
                F.col("wday").cast("timestamp")
                + F.expr("INTERVAL 18 HOURS")
            ).alias("w_start"),
            (
                F.col("wday").cast("timestamp")
                + F.expr("INTERVAL 30 HOURS")
            ).alias("w_end"),
        )
    )
    joined = _intervals.interval_join(
        ev.select("event_type", "ts"), win, keys=["event_type"]
    )
    return joined.groupBy("event_type", "wday").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )


@register(
    "j19_overlap_join",
    oracle="""
        WITH legs AS (
            SELECT l_suppkey AS suppkey, l_orderkey, l_linenumber,
                   l_shipdate AS a_start,
                   l_shipdate + (7 + (l_orderkey + l_linenumber) % 21)
                       * INTERVAL 1 DAY AS a_end
            FROM lineitem WHERE l_suppkey < 20
        ),
        wins AS (
            SELECT s_suppkey AS suppkey,
                   TIMESTAMP '1992-01-01'
                       + ((s_suppkey * 97 + w * 733) % 2400)
                       * INTERVAL 1 DAY AS b_start,
                   TIMESTAMP '1992-01-01'
                       + (((s_suppkey * 97 + w * 733) % 2400) + 45)
                       * INTERVAL 1 DAY AS b_end
            FROM supplier, unnest([0, 1, 2]) AS t(w)
            WHERE s_suppkey < 20
        )
        SELECT suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_overlaps,
               CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
                   AS n_shipments
        FROM legs JOIN wins USING (suppkey)
        WHERE a_start < b_end AND b_start < a_end
        GROUP BY suppkey
    """,
    doc="Interval×interval OVERLAP join via shared bucket blocking "
    "(weekly buckets): synthesized in-transit legs [shipdate, "
    "shipdate+transit) against per-supplier maintenance windows — "
    "'which shipments were in flight during a window'. Both sides "
    "explode onto week buckets, equi-join on (bucket, suppkey), "
    "multi-bucket pairs dedup BEFORE the exact overlap filter; never "
    "a nested-loop inequality join. operators/intervals.py:overlap_join.",
)
def q_j19_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    legs = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") < 20)
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").alias("a_start"),
            F.expr(
                "l_shipdate + make_interval(0, 0, 0, "
                "CAST(7 + pmod(l_orderkey + l_linenumber, 21) AS INT), "
                "0, 0, 0)"
            ).alias("a_end"),
        )
    )
    wins = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 20)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("w"),
        )
        .withColumn(
            "d0", F.expr("CAST(pmod(suppkey * 97 + w * 733, 2400) AS INT)")
        )
        .select(
            "suppkey",
            F.expr(
                "timestamp'1992-01-01 00:00:00' "
                "+ make_interval(0, 0, 0, d0, 0, 0, 0)"
            ).alias("b_start"),
            F.expr(
                "timestamp'1992-01-01 00:00:00' "
                "+ make_interval(0, 0, 0, d0 + 45, 0, 0, 0)"
            ).alias("b_end"),
        )
    )
    joined = _intervals.overlap_join(
        legs, wins, keys=["suppkey"], bucket_width="1 week"
    )
    return joined.groupBy("suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlaps"),
        F.countDistinct("l_orderkey", "l_linenumber")
        .cast("bigint")
        .alias("n_shipments"),
    )


@register(
    "j20_fuzzy_name_match",
    oracle=_fuzzy.blocked_levenshtein_sql(
        scope="part",
        text_expr="p_name",
        block_expr="list_extract(regexp_split_to_array(text, '\\s+'), -1)",
        max_dist=3,
    ),
    doc="Fuzzy entity matching: distinct part names paired by shared "
    "last-word block and verified by Levenshtein ≤3 — the scalable "
    "block→verify record-linkage shape (all-pairs edit distance is "
    "banned; the self-join equi-joins a deterministic blocking key). "
    "operators/fuzzy.py:blocked_levenshtein_pairs.",
)
def q_j20_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fuzzy.blocked_levenshtein_pairs(
        t(spark, sf_dir, "part"),
        "p_name",
        block=_fuzzy.last_word("text"),
        max_dist=3,
    )


@register(
    "o15_entity_clusters",
    oracle=_fuzzy.entity_clusters_sql(
        scope="part",
        text_expr="p_name",
        block_expr="list_extract(regexp_split_to_array(text, '\\s+'), -1)",
        max_dist=3,
    ),
    doc="Entity resolution end-to-end: j20's fuzzy pairs fed through "
    "connected components — every distinct part name labeled with its "
    "lexicographic-min canonical form (singletons self-canonical). "
    "Composition proof that the dedup clustering machinery is "
    "value-generic. operators/fuzzy.py:entity_clusters.",
)
def q_o15_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fuzzy.entity_clusters(
        t(spark, sf_dir, "part"),
        "p_name",
        block=_fuzzy.last_word("text"),
        max_dist=3,
    )


@register(
    "llm_chunk_dedup",
    oracle="""
        WITH c AS (
            SELECT doc_id, i AS chunk_idx,
                   substr(text, CAST(1 + i * 64 AS BIGINT), 64) AS chunk_text
            FROM documents,
                 unnest(range(0, greatest(1, CAST(floor(
                     (length(text) + 63) / 64.0) AS BIGINT)))) AS t(i)
        )
        SELECT CAST('0x' || substr(md5(chunk_text), 1, 15) AS BIGINT)
                   AS chunk_fp,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               CAST(MIN(doc_id * 1000000 + chunk_idx) // 1000000 AS BIGINT)
                   AS keeper_doc_id,
               CAST(MIN(doc_id * 1000000 + chunk_idx) % 1000000 AS BIGINT)
                   AS keeper_chunk_idx
        FROM c
        GROUP BY 1
        HAVING COUNT(*) > 1
    """,
    doc="Chunk-granularity exact dedup — pipeline COMPOSITION of "
    "chunking (operators/chunking.py, 64-char non-overlapping windows) "
    "with the hash-groupBy dedup discipline (SURVEY §4.4-6): duplicated "
    "chunks are reported with a deterministic keep-first keeper "
    "(min (doc_id, chunk_idx), encoded as one long so both engines "
    "break ties identically). Chunk text reduces to a portable md5 "
    "60-bit fingerprint BEFORE the groupBy, so the shuffle carries "
    "longs — the RAG-index build path where repeated passages (headers, "
    "licence blocks) must index once.",
)
def q_llm_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ad_data_pipelines_spark.functions.hashing import portable_hash64

    chunks = _chunking.chunk_documents(
        t(spark, sf_dir, "documents"), chunk_chars=64, overlap=0
    )
    keyed = chunks.select(
        portable_hash64("chunk_text").alias("chunk_fp"),
        (F.col("doc_id") * 1_000_000 + F.col("chunk_idx")).alias("__k"),
    )
    return (
        keyed.groupBy("chunk_fp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            # DIV, not float `/`: exact integer semantics at any key
            # magnitude (the packing.py double-quotient lesson)
            F.expr("min(__k) DIV 1000000").cast("bigint").alias(
                "keeper_doc_id"
            ),
            (F.min("__k") % 1_000_000).cast("bigint").alias(
                "keeper_chunk_idx"
            ),
        )
        .filter(F.col("n_copies") > 1)
    )


@register(
    "llm_novelty",
    oracle=_dedup.novelty_sql(n=8),
    doc="Per-doc word-8-gram novelty (the inverse of the contamination "
    "scan): fraction of a doc's distinct 8-grams found in NO other doc "
    "— low novelty flags templated/duplicated content, and 'train on "
    "the novel slice first' curricula rank by it. Same shuffle-free "
    "gram construction as the dedup chain (array_distinct before "
    "explode, md5-portable hashes); one gram-count aggregate + one "
    "hash-keyed join back — text never shuffles. "
    "operators/dedup.py:novelty_scores.",
)
def q_llm_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.novelty_scores(
        t(spark, sf_dir, "documents"),
        n=8,
        grams=_word_grams_shared(spark, sf_dir),
    )


@register(
    "llm_embedding_drift",
    oracle=_sim.embedding_group_stats_sql("label"),
    doc="Per-label embedding health report (drift/cohesion monitor): "
    "n_vectors, mean L2 norm, mean cosine-to-own-centroid. Centroids "
    "from one posexplode + combinable (group, pos) average — no "
    "collect — reassembled via array_sort(pos, value) and broadcast "
    "back; the cosine pass is a narrow zip_with/aggregate map plus one "
    "per-group aggregate. A falling cos-to-centroid means the slice "
    "fragments; a norm shift means the encoder changed. "
    "operators/similarity.py:embedding_group_stats.",
)
def q_llm_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.embedding_group_stats(
        t(spark, sf_dir, "embeddings"), "label"
    )


@register(
    "llm_cross_source_dup",
    oracle="""
        WITH h AS (
            SELECT DISTINCT source,
                   CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS fp
            FROM documents
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared_texts
        FROM h a JOIN h b ON a.fp = b.fp AND a.source < b.source
        GROUP BY 1, 2
    """,
    doc="Cross-source duplication matrix: for every source pair, how "
    "many distinct texts appear in BOTH (the 'is slice B just a "
    "re-crawl of slice A' audit that decides what to drop before "
    "training). Text reduces to a portable md5 long and (source, fp) "
    "dedups BEFORE the self-join, so the equi-join on fp moves longs "
    "and its fan-out is bounded by sources-per-text, never docs — the "
    "unscoped doc-level self-join this replaces is quadratic in copy "
    "count.",
)
def q_llm_cross_source_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ad_data_pipelines_spark.functions.hashing import portable_hash64

    h = (
        t(spark, sf_dir, "documents")
        .select("source", portable_hash64("text").alias("fp"))
        .distinct()
    )
    a = h.alias("a")
    b = h.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_texts"))
    )


@register(
    "o13_gap_audit",
    oracle="""
        WITH holed AS (
            SELECT event_id AS id FROM events WHERE event_id % 97 <> 13
        )
        SELECT id // 1000 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(id) AS BIGINT) AS id_min,
               CAST(MAX(id) AS BIGINT) AS id_max,
               CAST(MAX(id) - MIN(id) + 1 - COUNT(*) AS BIGINT)
                   AS n_missing
        FROM holed
        GROUP BY 1
        HAVING MAX(id) - MIN(id) + 1 - COUNT(*) > 0
    """,
    doc="Dense-sequence gap audit WITHOUT a global sort: ids bucket by "
    "DIV 1000 and each bucket's (count, min, max) — one combinable "
    "aggregate — exposes internal gaps as max-min+1-count. The "
    "pattern that replaces the naive lead()-over-everything window "
    "(a single-partition sort at any scale); holes are planted "
    "deterministically (event_id%97=13 removed) so every bucket "
    "reports. Entirely-missing buckets need the expected-domain "
    "variant (join against a sequence() of bucket ids) — same "
    "aggregate, documented here for parity of intent with the "
    "reference's post-import row-count checks (pg_import.R:230-280).",
)
def q_o13_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    holed = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 97 != 13)
        .select(F.col("event_id").alias("id"))
    )
    agg = holed.groupBy(F.expr("id DIV 1000").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("id").cast("bigint").alias("id_min"),
        F.max("id").cast("bigint").alias("id_max"),
    )
    return agg.withColumn(
        "n_missing",
        (F.col("id_max") - F.col("id_min") + 1 - F.col("n_rows")).cast(
            "bigint"
        ),
    ).filter(F.col("n_missing") > 0)


def _argmax_lang_sql(expr: str) -> str:
    """CASE-form argmax of the marker scores over `expr` (DuckDB CSE
    evaluates the repeated score expressions once)."""
    scores = _ts.lang_scores_sql(expr)
    langs = list(scores)
    m = "GREATEST(" + ", ".join(scores[la] for la in langs) + ")"
    case = " ".join(
        f"WHEN {scores[la]} = {m} THEN '{la}'" for la in langs
    )
    return f"CASE WHEN {m} > 0 THEN (CASE {case} END) ELSE 'und' END"


@register(
    "llm_lang_mix",
    oracle=f"""
        SELECT doc_id,
               {_argmax_lang_sql("substr(text, 1, length(text) // 2)")}
                   AS lang_head,
               {_argmax_lang_sql(
                   "substr(text, length(text) // 2 + 1, length(text))")}
                   AS lang_tail,
               ({_argmax_lang_sql("substr(text, 1, length(text) // 2)")}
                <> {_argmax_lang_sql(
                    "substr(text, length(text) // 2 + 1, length(text))")}
                AND {_argmax_lang_sql(
                    "substr(text, 1, length(text) // 2)")} <> 'und'
                AND {_argmax_lang_sql(
                    "substr(text, length(text) // 2 + 1, length(text))")}
                    <> 'und') AS mixed
        FROM documents
    """,
    doc="Mixed-language detection: lang-ID each document HALF "
    "independently (same marker scorer + fixed-tie argmax as "
    "llm_lang_id) and flag docs whose halves disagree — the "
    "code-switch / concatenated-crawl signal a monolingual filter "
    "misses. Pure composition of the existing map-only scorer over "
    "substrings; codegen CSE evaluates each half's scores once. "
    "operators/textstats.py:lang_id.",
)
def q_llm_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    head = F.expr("substring(text, 1, length(text) DIV 2)")
    tail = F.expr(
        "substring(text, length(text) DIV 2 + 1, length(text))"
    )
    lh = _ts.lang_id(head)
    lt = _ts.lang_id(tail)
    return docs.select(
        "doc_id",
        lh.alias("lang_head"),
        lt.alias("lang_tail"),
        (
            (lh != lt) & (lh != F.lit("und")) & (lt != F.lit("und"))
        ).alias("mixed"),
    )


@register(
    "j18_shipping_priority",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS o_odate,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                   AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    doc="TPC-H-Q3-shape shipping priority: two facts (orders, "
    "lineitem) hash-join on the order key while the filtered customer "
    "dim broadcasts; both date predicates push to the scans, revenue "
    "is one combinable aggregate, and the top-10 plans as "
    "TakeOrdered (distributed heap-select, no global sort). Ordering "
    "keys on the ROUNDED revenue then o_orderkey so cross-engine "
    "summation-order ulps cannot reorder the cut.",
)
def q_j18_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "o_orderkey", F.col("o_orderdate").cast("date").alias("o_odate")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "a19_robust_outliers",
    oracle=_agg.robust_outlier_stats_sql(
        "events", "value", ["event_type"], k=3.5
    ),
    doc="Per-group robust outlier report (median/MAD, 50% breakdown "
    "point — the resistant sibling of a18's winsorization, whose "
    "mean/sigma a gross outlier drags): flag |x-med| > 3.5*MAD. Two "
    "grouped exact medians with 1-row-per-group results broadcast "
    "back — facts never shuffle for the enrichment; approx_percentile "
    "is the production twin. operators/agg.py:robust_outlier_stats.",
)
def q_a19_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _agg.robust_outlier_stats(
        t(spark, sf_dir, "events"), "value", ["event_type"], k=3.5
    )


@register(
    "llm_dedup_stats",
    oracle=f"""
        WITH comp AS ({_dedup.dup_components_sql(min_eq=8)})
        SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
        FROM (
            SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
            FROM comp GROUP BY 1
        )
        GROUP BY 1
    """,
    doc="Duplicate-cluster size distribution — the one-screen dedup "
    "health report (a long tail of pair-clusters is normal; a giant "
    "cluster means a boilerplate template is gluing the corpus "
    "together). Two tiny aggregates over the session-shared "
    "components table; nothing recomputes. "
    "operators/dedup.py:dup_components.",
)
def q_llm_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = _dup_components_shared(spark, sf_dir, min_eq=8)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )


@register(
    "w7_cumulative_share",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   ROUND(SUM(o_totalprice), 2) AS day_rev
            FROM orders GROUP BY 1
        )
        SELECT strftime(day, '%Y-%m') AS month, day, day_rev,
               ROUND(SUM(day_rev) OVER (
                   PARTITION BY strftime(day, '%Y-%m') ORDER BY day
                   ROWS UNBOUNDED PRECEDING), 2) AS cum_rev,
               ROUND(SUM(day_rev) OVER (
                   PARTITION BY strftime(day, '%Y-%m') ORDER BY day
                   ROWS UNBOUNDED PRECEDING)
                   / SUM(day_rev) OVER (
                       PARTITION BY strftime(day, '%Y-%m')), 6) AS share
        FROM daily
    """,
    doc="Month-to-date running revenue and share-of-month per day — "
    "the pacing curve every revenue dashboard draws (W-family "
    "composite: cumulative rows-frame + partition-total window on one "
    "shuffle). Daily sums round to 2dp BEFORE the cumulative sum, so "
    "both engines accumulate identical doubles and the running total "
    "is deterministic — not merely close. Day is a unique order key "
    "within its month (no tie nondeterminism).",
)
def q_w7_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_rev"))
        .withColumn("month", F.date_format("day", "yyyy-MM"))
    )
    cum = (
        Window.partitionBy("month")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("month")
    return daily.select(
        "month",
        "day",
        "day_rev",
        F.round(F.sum("day_rev").over(cum), 2).alias("cum_rev"),
        F.round(
            F.sum("day_rev").over(cum) / F.sum("day_rev").over(tot), 6
        ).alias("share"),
    )


@register(
    "a20_ks_drift",
    oracle=_agg.ks_drift_sql(
        "events", "value", ["event_type"], "day(ts) <= 15"
    ),
    doc="Two-sample Kolmogorov-Smirnov drift per event_type: first "
    "half of the month vs second (D = max ECDF gap) — the numeric "
    "distribution monitor beside llm_embedding_drift's vector one. "
    "One combinable (group, value) count carrying both samples as "
    "conditional sums, then ONE cumulative window per group turns "
    "counts into ECDFs; totals ride the same window. NULL flags/"
    "values excluded (engines disagree on NULL sort order). "
    "operators/agg.py:ks_drift.",
)
def q_a20_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return _agg.ks_drift(
        ev, "value", ["event_type"], F.dayofmonth("ts") <= 15
    )


@register(
    "a21_psi_drift",
    oracle=_agg.psi_drift_sql(
        "events", "value", ["event_type"], "day(ts) <= 15",
        lo=0.0, hi=500.0, n_bins=10,
    ),
    doc="Population Stability Index per event_type over 10 fixed-width "
    "bins on [0, 500] — the industry-standard binned drift score "
    "(<0.1 stable, >0.25 shifted); fixed edges keep bins comparable "
    "across runs. Map-only binning + one combinable (group, bin) "
    "count + one per-group aggregate — NO windows over raw rows, so "
    "unlike the KS form it scales to a single giant group unchanged. "
    "operators/agg.py:psi_drift.",
)
def q_a21_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return _agg.psi_drift(
        ev,
        "value",
        ["event_type"],
        F.dayofmonth("ts") <= 15,
        lo=0.0,
        hi=500.0,
        n_bins=10,
    )


@register(
    "a23_groupwise_ols",
    oracle=_agg.group_ols_sql(
        "lineitem", ["l_returnflag"], "l_quantity", "l_extendedprice"
    ),
    doc="Per-group OLS trend fit (extendedprice vs quantity slope per "
    "returnflag) as ONE combinable five-moment aggregate — no window, "
    "shuffle carries 5 numbers per group; DECIMAL-exact moments make "
    "the double closed form bit-reproducible under any partitioning. "
    "operators/agg.py:group_ols.",
)
def q_a23_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _agg.group_ols(
        t(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        "l_quantity",
        "l_extendedprice",
    )


@register(
    "a22_psi_reference",
    oracle=_agg.psi_vs_reference_sql(
        "events", "value", ["event_type"], [0.1] * 10, lo=0.0, hi=500.0
    ),
    doc="PSI against a PINNED reference histogram (uniform over "
    "[0, 500], 10 bins) — the production monitoring form: any single "
    "sample (a day's partition, a micro-batch) scores alone without "
    "re-reading baseline data. Empty bins still contribute "
    "(eps−r)·ln(eps/r) via the broadcast bin spine. "
    "operators/agg.py:psi_vs_reference; streaming twin in "
    "streaming/drift.py.",
)
def q_a22_psi_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return _agg.psi_vs_reference(
        ev, "value", ["event_type"], [0.1] * 10, lo=0.0, hi=500.0
    )


# Decile boundaries of events.value trained OFFLINE on the reference
# period (agg.quantile_bin_edges, exact mode) and pinned as literals —
# the production train-once/monitor-forever workflow. events.value is
# heavy-tailed (median ≈ 35, max ≈ 490): a22's equal-width [0, 500)
# bins put ~90% of rows in the bottom two bins, so tail drift is
# invisible there; under these trained edges every bin carries ~10%
# and is equally informative.
_A32_TRAINED_EDGES = [5.2, 11.1, 18.17, 25.7, 34.59, 45.65, 60.02, 79.7, 113.29]


@register(
    "a32_psi_trained_edges",
    oracle=_agg.psi_vs_reference_edges_sql(
        "events", "value", ["event_type"], [0.1] * 10, _A32_TRAINED_EDGES
    ),
    doc="PSI per event_type over TRAINED decile boundaries (pinned "
    "literals from agg.quantile_bin_edges on the reference period) "
    "instead of a22's equal-width bins — the heavy-tailed-metric "
    "monitoring form. Bin id = count of edges ≤ v, a JVM-side filter "
    "over a 9-literal array: map-only binning, one combinable "
    "(group, bin) count, broadcast bin spine — no window, no join on "
    "data, unchanged at any scale. operators/agg.py:"
    "psi_vs_reference_edges; streaming twin: drift.py edges mode.",
)
def q_a32_psi_trained_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return _agg.psi_vs_reference_edges(
        ev, "value", ["event_type"], [0.1] * 10, _A32_TRAINED_EDGES
    )


# The trained PSI deciles (a32) plus explicit outer limits: the bin
# bounds of the mergeable histogram artifact. Same training, two
# consumers — drift scoring and quantile serving.
_A33_BOUNDS = [0.0] + _A32_TRAINED_EDGES + [500.0]


@register(
    "a33_binned_quantile_shards",
    oracle=_sketch_ops.histogram_quantiles_sql(
        "events", "value", _A33_BOUNDS, [0.5, 0.9, 0.99], ["event_type"]
    ),
    doc="p50/p90/p99 of events.value per event_type served from the "
    "mergeable HISTOGRAM artifact: per-(event_type, day) exact bin "
    "counts over trained bounds (histogram_shard_table), merged to "
    "the event_type grain by count addition, quantiles by in-bin "
    "linear interpolation — any-grain/any-subset quantiles with zero "
    "re-scan, completing the artifact family (HLL = distinct, CMS = "
    "frequency, histogram = quantiles). The oracle counts at the "
    "group grain directly — equal by algebra, which is the property "
    "that makes the artifact trustworthy. One combinable aggregate "
    "over the facts; everything after runs on ≤ groups×K rows. "
    "operators/sketch.py:histogram_shard_table.",
)
def q_a33_binned_quantile_shards(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    shards = _sketch_ops.histogram_shard_table(
        ev, "value", _A33_BOUNDS, ["event_type", "day"]
    )
    return _sketch_ops.histogram_union_quantiles(
        shards, _A33_BOUNDS, [0.5, 0.9, 0.99], ["event_type"]
    )


# Dense INTEGER node ids (customer 2k, supplier 2k+1): the rank state
# shuffles every iteration keyed on the node, and long keys run ~2×
# faster than string labels (see operators/graph.py docstring); the
# human label is re-derived once on the 25-row result.
_G1_EDGE_SQL = """
    WITH cs AS (
        SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS c,
                        CAST(l_suppkey AS BIGINT) * 2 + 1 AS s
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    )
    SELECT c AS src, s AS dst FROM cs
    UNION ALL
    SELECT s AS src, c AS dst FROM cs
"""
_G1_LABEL_SQL = (
    "concat(CASE WHEN node % 2 = 0 THEN 'c' ELSE 's' END,"
    " CAST(node // 2 AS VARCHAR))"
)


def trade_edges_build(o: DataFrame, li: DataFrame) -> DataFrame:
    """The trade_edges stage SHAPE with injected inputs — one
    orders⋈lineitem join, ONE aggregate that both dedups the
    (cust, supp) pairs and counts the weight, both orientations, and
    one degree/out-strength join-back. Factored out so the 10× volume
    probe (tests/test_scale_probe.py) times exactly the production
    plan; `_trade_edges_shared` feeds it the real tables."""
    cs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            (F.col("o_custkey").cast("bigint") * 2).alias("c"),
            (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("s"),
        )
        # edge weight = trade volume (lineitems between the pair):
        # free in the same aggregate that dedups the pairs, and
        # what the weighted ranking (g4) walks proportionally to
        .agg(F.count("*").alias("w"))
    )
    e = cs.selectExpr("c AS src", "s AS dst", "w").unionByName(
        cs.selectExpr("s AS src", "c AS dst", "w")
    )
    return e.join(
        e.groupBy("src").agg(
            F.count("*").alias("od"), F.sum("w").alias("ws")
        ),
        "src",
    ).select("src", "dst", "w", "od", "ws")


def _trade_edges_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the undirected customer↔supplier trade graph (both orientations
    # of the distinct (custkey, suppkey) pairs) WITH out-degrees: a
    # session-shared persisted stage like the dedup/ANN corpus stages —
    # the graph is an artifact many rankings consume, not per-query
    # work, so the whole normalization (dedup, orientation, outdeg)
    # is paid once and pagerank(assume_normalized=True) skips its
    # per-call distinct + out-degree passes. Keys pre-cast to BIGINT
    # BEFORE the ×2 id-doubling: the input int type would wrap silently
    # in Spark for custkey > 2^30 while DuckDB's identical multiply
    # errors — a cross-engine divergence at large SF.
    def build() -> DataFrame:
        return trade_edges_build(
            t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey"),
        )

    # checkpoint, not persist: g1/g2/g3's iterations scan this 10-20×
    # per query and row-RDD scans skip the per-scan columnar-cache
    # deserialization; consumers pass cut_input=False so no per-call
    # re-materialization happens either
    art = _shared(spark, sf_dir, "trade_edges", build, "checkpoint")
    # vouching contract: consumers pass assume_normalized=True and the
    # ws column makes pagerank skip ALL weight validation — so the
    # artifact validates ONCE here, on the materialized frame, right
    # after its first build (graph.validate_edge_weights docs)
    vkey = (spark.sparkContext.applicationId, sf_dir, "trade_edges:vouch")
    if vkey not in _SHARED_CACHE:
        from ad_data_pipelines_spark.operators.graph import validate_edge_weights

        # the RETURNED frame carries the vouched max scale as ws-column
        # metadata; pagerank's fast path asserts its scale against it,
        # so an over-scale consumer raises instead of wrapping int64
        _SHARED_CACHE[vkey] = validate_edge_weights(art, "w")
        # node artifact + stats, computed ONCE at build (r14 opt): the
        # artifact carries BOTH orientations, so its distinct src set
        # IS the full endpoint set; customers are the even ids by
        # construction. pagerank(nodes=, n_nodes=) and hits(n_nodes=,
        # n_src=) consumers then skip their per-call distinct-union /
        # countDistinct passes — the node set of a static graph is an
        # artifact property, same vouching family as validate_edge_
        # weights. Cost lands here, in the DECLARED shared-stage build.
        nodes = (
            _SHARED_CACHE[vkey]
            .select(F.col("src").alias("node"))
            .distinct()
            .localCheckpoint()
        )
        n_all, n_even = nodes.agg(
            F.count("*"),
            F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0)),
        ).first()
        _SHARED_CACHE[
            (spark.sparkContext.applicationId, sf_dir, "trade_edges:nodes")
        ] = nodes
        _SHARED_CACHE[
            (spark.sparkContext.applicationId, sf_dir, "trade_edges:stats")
        ] = {"n_nodes": int(n_all), "n_src_even": int(n_even)}
    return _SHARED_CACHE[vkey]


def _trade_nodes_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trade graph's vouched endpoint set (build-time artifact
    property — see _trade_edges_shared)."""
    _trade_edges_shared(spark, sf_dir)
    return _SHARED_CACHE[
        (spark.sparkContext.applicationId, sf_dir, "trade_edges:nodes")
    ]


def _trade_stats_shared(spark: SparkSession, sf_dir: str) -> dict:
    """Vouched node counts of the trade graph (full node count + even/
    customer count), computed once at artifact build."""
    _trade_edges_shared(spark, sf_dir)
    return _SHARED_CACHE[
        (spark.sparkContext.applicationId, sf_dir, "trade_edges:stats")
    ]


@register(
    "g1_pagerank_suppliers",
    oracle=(
        "WITH pr AS (\n"
        + _graph.pagerank_sql(_G1_EDGE_SQL, iterations=10)
        + f"\n) SELECT {_G1_LABEL_SQL} AS node, rank_fp FROM pr\n"
        "ORDER BY rank_fp DESC, node LIMIT 25"
    ),
    doc="Fixed-point PageRank over the undirected customer↔supplier "
    "trade graph (distinct (custkey, suppkey) pairs from "
    "orders⨝lineitem, both orientations), top 25 nodes — the "
    "web-graph source-quality rank crawl curation consumes "
    "(CCNet/RefinedWeb-style). BIGINT fixed-point + integer floor "
    "division make the 10-iteration ranks BIT-EQUAL between Spark "
    "and the unrolled DuckDB recurrence, so an iterative float "
    "algorithm becomes hash-gateable. Per iteration: one src equi-"
    "join of the 2-long rank state onto edges + one combinable (dst) "
    "aggregate; lineage truncated per round (localCheckpoint); dense "
    "integer node ids (2k / 2k+1), labels re-derived on the top-25 "
    "only. operators/graph.py:pagerank.",
)
def q_g1_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = _graph.pagerank(
        _trade_edges_shared(spark, sf_dir),
        iterations=10,
        assume_normalized=True,
        cut_input=False,  # the shared stage is a checkpointed RDD
        # cadence exercised on THIS plan shape (the raise-only-if-
        # exercised rule in pagerank's docstring): one cut per 5
        # rounds, measured 1.4x faster, ranks identical
        checkpoint_every=5,
        # node set + count are artifact build-time properties (r14
        # opt): skips the per-call distinct-union pass + count action
        nodes=_trade_nodes_shared(spark, sf_dir),
        n_nodes=_trade_stats_shared(spark, sf_dir)["n_nodes"],
    )
    label = F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
        F.expr("CAST(node DIV 2 AS STRING)"),
    )
    return (
        ranks.select(label.alias("node"), "rank_fp")
        .orderBy(F.desc("rank_fp"), "node")
        .limit(25)
    )


@register(
    "g14_hits_authorities",
    oracle=(
        "WITH hs AS (\n"
        + _graph.hits_sql(
            """
            SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS src,
                            CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            """,
            iterations=6,
        )
        + f"\n) SELECT {_G1_LABEL_SQL} AS node, score_fp AS auth_fp"
        " FROM hs WHERE side = 'auth'"
        " ORDER BY auth_fp DESC, node LIMIT 25"
    ),
    doc="HITS authorities (Kleinberg 1999) over the DIRECTED "
    "customer→supplier trade graph: an authority is a supplier "
    "endorsed by good hubs (customers who buy from good suppliers) — "
    "the mutual-reinforcement source-quality signal PageRank's "
    "single-score walk can't express; top 25 suppliers. L1-normalized "
    "BIGINT fixed-point recurrence (floor division, all-positive) "
    "makes the 6 iterations BIT-EQUAL to the unrolled DuckDB twin "
    "(iteration count chosen pre-gate with measured evidence: the "
    "top-25 is identical at 4/6/8/12 iterations at sf0.01 AND sf0.1 "
    "— HITS converges fast on this graph) — a "
    "second iterative float algorithm made hash-gateable. Per half-"
    "step: one equi-join of the 2-long score state onto the edges + "
    "one combinable aggregate + a 1-row normalizer crossJoin (never a "
    "driver collect); the c→s orientation filters the shared "
    "checkpointed trade_edges artifact (even src = customer), so no "
    "new shared stage. operators/graph.py:hits.",
)
def q_g14_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _trade_edges_shared(spark, sf_dir).filter(F.col("src") % 2 == 0)
    stats = _trade_stats_shared(spark, sf_dir)
    hs = _graph.hits(
        e.select("src", "dst"),
        iterations=6,
        # the artifact is distinct/NULL-free/self-loop-free by build
        # (and a c→s edge can't self-loop: parities differ); a filter
        # over the checkpointed RDD re-scans cheaply, so no input cut
        assume_normalized=True,
        cut_input=False,
        # guard counts are artifact build-time properties (r14 opt):
        # the c→s half's src set = the even (customer) ids, and its
        # endpoint set = the FULL node set (every customer has an
        # out-edge here, every supplier an in-edge — the artifact
        # carries both orientations of every pair)
        n_nodes=stats["n_nodes"],
        n_src=stats["n_src_even"],
        # the r14 raw-state cut inside hits._normalize subsumes the
        # old checkpoint cadence (raising checkpoint_every had been
        # tried first and A/B'd SLOWER — 8.1/8.5 vs 6.8 s — because
        # the normalizer broadcasts re-executed their uncut upstream
        # half-steps; cutting the raw state instead removes that
        # double execution outright)
    )
    label = F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
        F.expr("CAST(node DIV 2 AS STRING)"),
    )
    return (
        hs.filter(F.col("side") == "auth")
        .select(label.alias("node"), F.col("score_fp").alias("auth_fp"))
        .orderBy(F.desc("auth_fp"), "node")
        .limit(25)
    )


# seed predicate valid at EVERY test SF (sf0.001 has 10 suppliers,
# keys 0-9, and no nation-1 supplier — a nation filter would leave
# the teleport nowhere to land there)
_G2_SEED_SQL = (
    "SELECT CAST(s_suppkey AS BIGINT) * 2 + 1 AS node"
    " FROM supplier WHERE s_suppkey % 10 = 1"
)


@register(
    "g2_ppr_trusted_suppliers",
    oracle=(
        "WITH pr AS (\n"
        + _graph.pagerank_sql(
            _G1_EDGE_SQL, iterations=10, seed_sql=_G2_SEED_SQL
        )
        + f"\n) SELECT {_G1_LABEL_SQL} AS node, rank_fp FROM pr\n"
        "ORDER BY rank_fp DESC, node LIMIT 25"
    ),
    doc="PERSONALIZED PageRank (Haveliwala 2002) over the same trade "
    "graph as g1, teleporting only to a trusted supplier decile — ranks "
    "every customer and supplier by random-walk proximity to the "
    "trusted seed set, the seed-expansion primitive of source "
    "curation ('find sources close to these known-good ones'). Same "
    "bit-equal integer recurrence (seeds = all nodes reproduces g1 "
    "exactly, tested); same plan shape — the constant teleport gate "
    "rides through the per-iteration aggregate as a max(is_seed) "
    "column, so personalization adds NO extra join. "
    "operators/graph.py:pagerank(seeds=).",
)
def q_g2_ppr_trusted_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    seeds = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 1)
        .select((F.col("s_suppkey").cast("bigint") * 2 + 1).alias("node"))
    )
    ranks = _graph.pagerank(
        _trade_edges_shared(spark, sf_dir),
        iterations=10,
        seeds=seeds,
        assume_normalized=True,
        cut_input=False,  # the shared stage is a checkpointed RDD
        checkpoint_every=5,  # exercised on this plan shape (see g1)
        nodes=_trade_nodes_shared(spark, sf_dir),  # vouched (see g1)
        n_nodes=_trade_stats_shared(spark, sf_dir)["n_nodes"],
    )
    label = F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
        F.expr("CAST(node DIV 2 AS STRING)"),
    )
    return (
        ranks.select(label.alias("node"), "rank_fp")
        .orderBy(F.desc("rank_fp"), "node")
        .limit(25)
    )


# strong-tie edge set for community detection: repeat-business pairs
# only (≥3 lineitems between the customer and supplier). The FULL
# trade graph is near-complete bipartite at every SF (avg pair count
# 1.2) — label propagation on it collapses to one giant community in
# two rounds, which is correct but says nothing; communities live in
# the strong-tie backbone, the standard graph-sparsification step
# before clustering.
_G3_EDGE_SQL = """
    WITH cs AS (
        SELECT CAST(o_custkey AS BIGINT) * 2 AS c,
               CAST(l_suppkey AS BIGINT) * 2 + 1 AS s
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 3
    )
    SELECT c AS src, s AS dst FROM cs
    UNION ALL
    SELECT s AS src, c AS dst FROM cs
"""


@register(
    "g3_trade_communities",
    oracle=(
        "WITH lp AS (\n"
        + _graph.label_propagation_sql(_G3_EDGE_SQL, iterations=5)
        + "\n) SELECT concat(CASE WHEN label % 2 = 0 THEN 'c' ELSE 's' "
        "END, CAST(label // 2 AS VARCHAR)) AS community, "
        "CAST(COUNT(*) AS BIGINT) AS n_members FROM lp GROUP BY 1 "
        "ORDER BY n_members DESC, community LIMIT 25"
    ),
    doc="Semi-synchronous label-propagation communities (Raghavan "
    "2007) over the STRONG-TIE trade graph (repeat-business pairs, "
    "≥3 lineitems — the full graph is near-complete bipartite and "
    "collapses to one community), top 25 community sizes — the "
    "clustering complement of PageRank for source curation: PageRank "
    "says which sources MATTER, communities say which sources move "
    "TOGETHER (dedup-aware sampling, per-cluster quotas, "
    "contamination blast-radius). Same determinism discipline as "
    "g1/g2: integer vote counts, smallest-label ties, FIXED "
    "iterations, labels bit-equal to the unrolled DuckDB recurrence. "
    "Two half-steps per round (even ids re-label, then odd against "
    "fresh labels) because a bipartite graph oscillates under fully "
    "synchronous sweeps — parity IS the bipartition here by "
    "construction. Per half-step: one equi-join of the 2-long label "
    "state + one combinable count + one per-node window bounded by "
    "the node's distinct neighbor labels. "
    "operators/graph.py:label_propagation.",
)
def q_g3_trade_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the strong-tie backbone IS the shared artifact filtered to w>=3
    # (both orientations carry the pair's lineitem count) — g5 reads
    # the same slice; rebuilding the orders⨝lineitem chain per query
    # cost ~1 s/run before r9
    edges = _trade_edges_shared(spark, sf_dir).filter(
        F.col("w") >= 3
    ).select("src", "dst")
    labels = _graph.label_propagation(
        edges,
        iterations=5,
        assume_normalized=True,
        cut_input=False,  # the shared stage is a checkpointed RDD
        frontier=True,  # delta half-steps: the trade graph's label
        # churn dies by iteration 3 (measured profile ends
        # .../1524/0/0/0/0/0), so the joint-fixpoint bail-out skips
        # the dead half-steps — in-session interleaved A/B at sf0.1:
        # 5.62 -> 4.71 s median (0.84 pairwise), labels bit-equal
    )
    comm = labels.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_members")
    )
    tag = F.concat(
        F.when(F.col("label") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
        F.expr("CAST(label DIV 2 AS STRING)"),
    )
    return (
        comm.select(tag.alias("community"), "n_members")
        .orderBy(F.desc("n_members"), "community")
        .limit(25)
    )


# the weighted trade graph: lineitem count per (customer, supplier)
# pair as edge weight, both orientations — the same aggregate that
# builds the shared stage (trade_edges carries w/ws since r8)
_G4_EDGE_SQL = """
    WITH cs AS (
        SELECT CAST(o_custkey AS BIGINT) * 2 AS c,
               CAST(l_suppkey AS BIGINT) * 2 + 1 AS s,
               COUNT(*) AS w
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    )
    SELECT c AS src, s AS dst, w FROM cs
    UNION ALL
    SELECT s AS src, c AS dst, w FROM cs
"""


@register(
    "g4_weighted_pagerank",
    oracle=(
        "WITH pr AS (\n"
        + _graph.pagerank_sql(_G4_EDGE_SQL, iterations=10, weighted=True)
        + f"\n) SELECT {_G1_LABEL_SQL} AS node, rank_fp FROM pr\n"
        "ORDER BY rank_fp DESC, node LIMIT 25"
    ),
    doc="WEIGHTED fixed-point PageRank over the trade graph: the "
    "walker follows edge (s, d) with probability w/Σw — trade VOLUME "
    "(lineitems per customer-supplier pair), not mere existence, "
    "drives the centrality, which is how production host-ranking "
    "weights link multiplicity (g1 treats a 1-lineitem and a "
    "100-lineitem relationship identically). Same determinism "
    "contract: the per-edge term is (r*w) DIV ws in BIGINT, weight 1 "
    "everywhere reproduces g1 bit-for-bit (tested), positive-weight "
    "and int64-headroom guards fail loudly. The weights ride the "
    "shared trade_edges artifact (w, ws columns) so the per-query "
    "cost is identical to g1's. operators/graph.py:pagerank(weight=).",
)
def q_g4_weighted_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = _graph.pagerank(
        _trade_edges_shared(spark, sf_dir),
        iterations=10,
        weight="w",
        assume_normalized=True,
        cut_input=False,  # the shared stage is a checkpointed RDD
        checkpoint_every=5,  # exercised on this plan shape (see g1)
        nodes=_trade_nodes_shared(spark, sf_dir),  # vouched (see g1)
        n_nodes=_trade_stats_shared(spark, sf_dir)["n_nodes"],
    )
    label = F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
        F.expr("CAST(node DIV 2 AS STRING)"),
    )
    return (
        ranks.select(label.alias("node"), "rank_fp")
        .orderBy(F.desc("rank_fp"), "node")
        .limit(25)
    )


@register(
    "g5_kcore_backbone",
    oracle=(
        "WITH kc AS (\n"
        + _graph.k_core_sql(_G3_EDGE_SQL, k=3, rounds=6)
        + "\n) SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE "
        "'supplier' END AS side, deg, CAST(COUNT(*) AS BIGINT) AS "
        "n_nodes FROM kc GROUP BY 1, 2"
    ),
    doc="K-CORE decomposition (k=3, 6 peeling rounds — fixpoint by "
    "round 4 at every test SF, asserted in unit tests) over the "
    "strong-tie trade backbone, reported as a (side, deg) histogram "
    "of the surviving core — the density signal of the graph-quality "
    "family: PageRank ranks who MATTERS (g1/g4), label propagation "
    "says who moves TOGETHER (g3), k-core finds who sits in the "
    "densely-connected backbone (the crawl-frontier / spam-farm "
    "discriminator — a link farm inflates PageRank but cannot "
    "inflate its core number without real dense interconnection). "
    "Consumes the SHARED trade_edges artifact filtered to w≥3 — the "
    "same strong-tie sparsification as g3, already materialized, so "
    "the per-query cost is pure peeling: per round two semi-joins of "
    "the edge list against the survivor set + one combinable count, "
    "integer-only state, lineage cut per round. Bit-equal to the "
    "unrolled DuckDB twin (AS MATERIALIZED CTEs — each round "
    "references its predecessor twice). operators/graph.py:k_core.",
)
def q_g5_kcore_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _trade_edges_shared(spark, sf_dir).filter(F.col("w") >= 3)
    deg = _graph.k_core(
        edges,
        k=3,
        rounds=6,
        assume_normalized=True,
        cut_input=False,  # the shared stage is a checkpointed RDD
    )
    side = (
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
    )
    return deg.groupBy(side.alias("side"), "deg").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )


@register(
    "g7_coreness",
    oracle=(
        "WITH kc AS (\n"
        + _graph.coreness_sql(_G3_EDGE_SQL, rounds=10)
        + "\n) SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE "
        "'supplier' END AS side, coreness, CAST(COUNT(*) AS BIGINT) "
        "AS n_nodes FROM kc GROUP BY 1, 2"
    ),
    doc="FULL k-core decomposition — every node's core number — via "
    "the distributed h-index iteration (Montresor et al. 2011): "
    "c₀ = degree, cᵢ₊₁(u) = h-index of neighbors' estimates, "
    "monotonically decreasing integers that converge to the exact "
    "coreness (fixpoint by round 8 on this graph at every test SF, "
    "probed; 10 rounds registered for margin). g5 answers 'who "
    "survives at k=3'; this is the per-node graph-quality FEATURE a "
    "curation pipeline joins onto its source table alongside rank "
    "(g1/g4) and community (g3) — reported as a (side, coreness) "
    "histogram over the shared strong-tie backbone. Unit tests prove "
    "CROSS-OPERATOR consistency: {coreness ≥ k} equals the k_core "
    "survivor set for every k — two independent algorithms agreeing "
    "on the same decomposition. Per round: one state-onto-edges "
    "equi-join + one degree-bounded per-node window + one combinable "
    "max; the h-index over ties is order-independent, so the result "
    "is deterministic and bit-equal to the unrolled AS MATERIALIZED "
    "DuckDB twin. operators/graph.py:coreness.",
)
def q_g7_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _trade_edges_shared(spark, sf_dir).filter(
        F.col("w") >= 3
    ).select("src", "dst")
    # cadence 2 exercised on THIS plan shape up to 16 rounds (the
    # raise-only-if-exercised rule): linear-chain state, one ref/round
    cor = _graph.coreness(edges, rounds=10, checkpoint_every=2)
    side = (
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
    )
    return cor.groupBy(side.alias("side"), "coreness").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )


_G6_PROJ_SQL = """
    WITH li AS (
        SELECT DISTINCT l_orderkey AS o, CAST(l_suppkey AS BIGINT) AS s
        FROM lineitem
    ),
    p AS (
        SELECT a.s AS s1, b.s AS s2, COUNT(*) AS cnt
        FROM li a JOIN li b ON a.o = b.o AND a.s < b.s
        GROUP BY 1, 2
    ),
    d AS (
        SELECT s1 AS s, s2 AS q, cnt FROM p
        UNION ALL SELECT s2, s1, cnt FROM p
    )
    SELECT s AS src, q AS dst FROM (
        SELECT s, q, ROW_NUMBER() OVER (
            PARTITION BY s ORDER BY cnt DESC, q
        ) AS rn FROM d
    ) r WHERE rn <= 8
"""


def _cosupply_pairs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(item_a, item_b, cnt): the raw supplier co-supply pair table —
    market-basket projection of orders onto suppliers
    (graph.basket_pairs — pair generation is QUADRATIC per order;
    TPC-H carries <=7 lineitems/order by generator design, the
    max_basket_size=16 guard fails LOUDLY on any dataset with hub
    baskets). The expensive part (lineitem distinct + per-basket guard
    window + self-join + pair aggregate) is shared by the kNN backbone
    build (g6/g8/g9's substrate) and g10's Jaccard ranking."""

    def build() -> DataFrame:
        li = t(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o"),
            F.col("l_suppkey").cast("bigint").alias("s"),
        )
        return _graph.basket_pairs(
            li, basket="o", item="s", max_basket_size=16, on_oversize="error"
        )

    return _shared(spark, sf_dir, "cosupply_pairs", build)


def _cosupply_knn_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier co-supply kNN backbone (src, dst): the shared pair
    table sparsified to each node's top-8 partners by shared-order
    count (ties to the smaller id — <=8n edges at ANY SF where every
    threshold rule probed degenerate). Session-shared like
    trade_edges: g6 (triangles), g8 (k-truss) and g9 (ANF) consume it,
    the iterative consumers scanning it many times per query."""

    def build() -> DataFrame:
        pairs = _cosupply_pairs_shared(spark, sf_dir)
        directed = pairs.selectExpr(
            "item_a AS s", "item_b AS q", "cnt"
        ).unionByName(pairs.selectExpr("item_b AS s", "item_a AS q", "cnt"))
        w = Window.partitionBy("s").orderBy(F.desc("cnt"), "q")
        return (
            directed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 8)
            .select(F.col("s").alias("src"), F.col("q").alias("dst"))
        )

    # checkpoint (row RDD), not persist: the k-truss peeling scans the
    # edge set several times per round — the trade_edges rationale
    return _shared(spark, sf_dir, "cosupply_knn", build, "checkpoint")



@register(
    "g6_cosupply_triangles",
    oracle=(
        "WITH tc AS (\n"
        + _graph.triangle_count_sql(_G6_PROJ_SQL)
        + "\n) SELECT node, triangles FROM tc\n"
        "ORDER BY triangles DESC, node LIMIT 25"
    ),
    doc="Per-node TRIANGLE COUNTS over the supplier co-supply kNN "
    "backbone (market-basket projection: suppliers fulfilling the "
    "same order; each supplier keeps its top-8 partners by "
    "shared-order count, ties to the smaller id — the standard "
    "kNN-graph sparsification, chosen because every THRESHOLD rule "
    "is scale-degenerate on this distribution: a fixed cutoff or "
    "2×-mean is empty below sf0.1, while above-mean keeps 43% of a "
    "near-complete graph whose ~13M triangles cost 12 s; the kNN "
    "backbone is non-degenerate and sparse at EVERY SF by "
    "construction, ≤8n edges), top 25 suppliers. Local cohesion "
    "completes the graph-quality family (rank = g1/g4, communities "
    "= g3, global density = g5): a link farm inflates degree and "
    "PageRank cheaply but triangles require real mutual "
    "interconnection — the classic spam discriminator. The per-node "
    "top-k is a PARTITIONED window (bounded by the node's partner "
    "list, never global). The operator is the degree-ordered "
    "compact-forward scheme (orientation by (degree, id) bounds "
    "every wedge fan-out by O(√m), so a hub cannot explode the "
    "self-join; canonical and oriented edge sets are materialized "
    "once); the DuckDB twin closes u<v<w wedges directly — per-node "
    "counts are algorithm-independent, so the twin checks the "
    "SEMANTICS, not the schedule. Pure integer counting, hash-gated. "
    "Pair generation (graph.basket_pairs) is O(sum basket_size^2) — "
    "bounded here by TPC-H's <=7 lineitems/order and guarded by an "
    "executor-side max_basket_size=16 assert so hub baskets fail "
    "loudly, never quadratically. "
    "operators/graph.py:triangle_count, basket_pairs.",
)
def q_g6_cosupply_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    tc = _graph.triangle_count(_cosupply_knn_shared(spark, sf_dir))
    return tc.orderBy(F.desc("triangles"), "node").limit(25)


@register(
    "g8_truss_backbone",
    oracle=(
        "WITH tr AS (\n"
        + _graph.k_truss_sql(_G6_PROJ_SQL, k=3, rounds=4)
        + "\n), nd AS (\n"
        "    SELECT node, CAST(COUNT(*) AS BIGINT) AS truss_degree\n"
        "    FROM (SELECT u AS node FROM tr\n"
        "          UNION ALL SELECT v FROM tr) x GROUP BY 1\n"
        ")\n"
        "SELECT node, truss_degree FROM nd\n"
        "ORDER BY truss_degree DESC, node LIMIT 25"
    ),
    doc="K-TRUSS backbone (k=3: every surviving edge sits in >=1 "
    "triangle within the subgraph, the triangle-supported skeleton) "
    "over the shared co-supply kNN projection, reported as the "
    "top-25 suppliers by truss degree. Completes the cohesion family "
    "EDGE-wise: g5's k-core keeps nodes with enough neighbors, g6 "
    "counts each node's triangles, the truss keeps only edges with "
    "MUTUAL reinforcement — the standard strong-backbone extraction "
    "(every k-truss lives inside the (k-1)-core), and the hardest of "
    "the three for a link farm to fake since support must survive "
    "the peeling cascade. k itself is SCALE-PROBED like the g6 "
    "projection rule: k=3 yields 43/376/513 edges at "
    "sf0.001/0.01/0.1 while k=4 is EMPTY at sf0.1 (the top-8 kNN "
    "neighbors spread thinner as the supplier pool grows) — the "
    "non-degenerate-at-every-SF rule picks k=3. Fixed 4 peeling "
    "rounds (fixpoint by round 3 at every test SF, probed "
    "rounds-vs-rounds+1); triangles are enumerated ONCE "
    "(degree-ordered compact-forward, O(sqrt m) wedge fan-out) and "
    "DELTA-maintained per round — support is one combinable count "
    "over the surviving triangle set and the set shrinks by "
    "anti-joining the just-removed edges, with a limit-1 fixpoint "
    "early-exit. Pure integer peeling — bit-equal to the unrolled "
    "AS MATERIALIZED DuckDB twin (full per-round re-enumeration). "
    "operators/graph.py:k_truss.",
)
def q_g8_truss_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = _graph.k_truss(
        _cosupply_knn_shared(spark, sf_dir), k=3, rounds=4
    )
    td = (
        tr.select(F.col("u").alias("node"))
        .unionByName(tr.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("truss_degree"))
    )
    return td.orderBy(F.desc("truss_degree"), "node").limit(25)


@register(
    "g10_cosupply_jaccard",
    oracle="""
        WITH li AS (
            SELECT DISTINCT l_orderkey AS o, CAST(l_suppkey AS BIGINT) AS s
            FROM lineitem
        ),
        deg AS (SELECT s, COUNT(*) AS d FROM li GROUP BY 1),
        p AS (
            SELECT a.s AS s1, b.s AS s2, COUNT(*) AS cnt
            FROM li a JOIN li b ON a.o = b.o AND a.s < b.s
            GROUP BY 1, 2
        )
        SELECT s1 AS item_a, s2 AS item_b,
               CAST(cnt AS BIGINT) AS cnt,
               CAST(cnt * 1000000 // (d1.d + d2.d - cnt) AS BIGINT)
                   AS jacc_e6
        FROM p
        JOIN deg d1 ON d1.s = p.s1
        JOIN deg d2 ON d2.s = p.s2
        ORDER BY 4 DESC, 1, 2 LIMIT 25
    """,
    doc="Jaccard-weighted co-supply similarity: top-25 supplier pairs "
    "by |orders(a) ∩ orders(b)| / |orders(a) ∪ orders(b)| — the "
    "ENTITY near-duplicate signal of the graph family (raw "
    "co-occurrence counts rank prolific suppliers; Jaccard ranks "
    "SUBSTITUTABLE ones — the same normalization MinHash estimates "
    "for documents, here exact because per-supplier order sets are "
    "join-countable). Second consumer of graph.basket_pairs (the "
    "guarded quadratic projection); union size by inclusion-"
    "exclusion deg_a + deg_b − cnt, similarity in exact integer "
    "1e-6 units (cnt·10⁶ DIV union — floor division agrees across "
    "engines where a float ratio could flip the top-25 boundary). "
    "Scale shape: one distinct, one per-basket pair aggregate, one "
    "degree aggregate joined twice (bounded by supplier "
    "cardinality, AQE-broadcast), one TakeOrdered. "
    "operators/graph.py:basket_pairs.",
)
def q_g10_cosupply_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"),
        F.col("l_suppkey").cast("bigint").alias("s"),
    )
    deg = (
        li.distinct()
        .groupBy("s")
        .agg(F.count("*").alias("d"))
    )
    pairs = _cosupply_pairs_shared(spark, sf_dir)
    return (
        pairs.join(deg.selectExpr("s AS item_a", "d AS da"), "item_a")
        .join(deg.selectExpr("s AS item_b", "d AS db"), "item_b")
        .select(
            "item_a",
            "item_b",
            "cnt",
            F.expr("cnt * 1000000 DIV (da + db - cnt)").alias("jacc_e6"),
        )
        .orderBy(F.desc("jacc_e6"), "item_a", "item_b")
        .limit(25)
    )


# Edge COST for g11: integer "resistance" inverse to trade volume —
# GREATEST(1, 1e6 DIV w) — so high-volume relationships are SHORT and
# the shortest path is the cheapest chain of strong ties. Integral by
# construction (positive, <= 1e6), exact in both engines (integer
# floor division), and 8 rounds x 1e6 is far inside int64.
_G11_EDGE_SQL = (
    "SELECT src, dst, GREATEST(CAST(1 AS BIGINT), "
    f"CAST(1000000 AS BIGINT) // w) AS w FROM ({_G4_EDGE_SQL}) te"
)


@register(
    "g11_sssp_trusted_distance",
    oracle=(
        "WITH sp AS (\n"
        + _graph.sssp_sql(
            _G11_EDGE_SQL, _G2_SEED_SQL, rounds=8, weighted=True
        )
        + f"\n) SELECT {_G1_LABEL_SQL} AS node, dist FROM sp "
        "WHERE dist > 0 ORDER BY dist, sp.node LIMIT 25"
    ),
    doc="WEIGHTED single-source shortest paths (multi-source, fixed "
    "8-round distributed Bellman-Ford relax) over the shared trade "
    "graph from the g2 trusted-supplier decile, edge cost = integer "
    "resistance GREATEST(1, 1e6 DIV trade_volume): the 25 closest "
    "non-seed nodes by cheapest chain of STRONG relationships — "
    "distance-to-trusted-seed tiers, the deterministic complement of "
    "g2's random-walk proximity for source curation (far-from-every-"
    "trusted-seed = quarantine candidate). Per round ONE equi-join "
    "of the (node, BIGINT dist) state onto the cost edges + ONE "
    "combinable MIN — map-side partials, lineage cut per round; "
    "BIGINT costs make the truncated-at-8-hops distances BIT-EQUAL "
    "to the unrolled AS-MATERIALIZED DuckDB twin. "
    "operators/graph.py:sssp(+_sql).",
)
def q_g11_sssp_trusted_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    art = _trade_edges_shared(spark, sf_dir)
    cost_edges = art.select(
        "src",
        "dst",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.expr("CAST(1000000 AS BIGINT) DIV w"),
        ).alias("w"),
    )
    seeds = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 1)
        .select((F.col("s_suppkey").cast("bigint") * 2 + 1).alias("node"))
    )
    d = _graph.sssp(
        cost_edges,
        seeds,
        weight="w",
        rounds=8,
        assume_normalized=True,  # artifact is deduped/self-loop-free;
        # the cost column is positive <= 1e6 by construction
        cut_input=False,  # projection of the checkpointed shared stage
        frontier=True,  # delta relax: most distances settle in 2-3 of
        # the 8 rounds; in-session interleaved A/B 3.22 -> 2.14 s
        # median at sf0.1 (0.62-0.69 pairwise), results identical
        # (property-tested + same oracle)
    )
    label = F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
        F.expr("CAST(node DIV 2 AS STRING)"),
    )
    return (
        d.filter(F.col("dist") > 0)
        .orderBy("dist", "node")
        .limit(25)
        .select(label.alias("node"), "dist")
    )


@register(
    "g12_hop_histogram",
    oracle=(
        "WITH sp AS (\n"
        + _graph.sssp_sql(_G1_EDGE_SQL, _G2_SEED_SQL, rounds=4,
                          weighted=False)
        + "\n) SELECT dist, CASE WHEN node % 2 = 0 THEN 'customer' "
        "ELSE 'supplier' END AS side, CAST(COUNT(*) AS BIGINT) AS "
        "n_nodes FROM sp GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    doc="HOP-distance histogram from the trusted seed set — the same "
    "sssp relax as g11 with unit cost (multi-source BFS distance), "
    "rolled up to (hop tier, customer/supplier side) node counts: the "
    "curation dashboard view of graph proximity (how much of the "
    "corpus sits 1, 2, 3 hops from the trusted sources; nodes absent "
    "from every tier are the quarantine set). Unweighted + exact "
    "counts ⇒ fully deterministic, no tolerance needed. "
    "operators/graph.py:sssp(weight=None).",
)
def q_g12_hop_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    art = _trade_edges_shared(spark, sf_dir)
    seeds = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 1)
        .select((F.col("s_suppkey").cast("bigint") * 2 + 1).alias("node"))
    )
    d = _graph.sssp(
        art.select("src", "dst"),
        seeds,
        rounds=4,
        assume_normalized=True,  # artifact is deduped/self-loop-free
        cut_input=False,  # projection of the checkpointed shared stage
        frontier=True,  # hop distances settle by round 2-3 on the
        # near-complete bipartite trade graph - the delta bail-out
        # skips the dead rounds (same A/B basis as g11)
    )
    side = (
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("side")
    )
    return (
        d.groupBy("dist", side)
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
        .orderBy("dist", "side")
    )


# Landmark set for g13: a FIXED SMALL subset of the trusted suppliers
# (every 100th key, RAW supplier ids — the kNN backbone's node space) —
# the landmark-selection contract of per-seed SSSP: state scales by
# the landmark count, so it is tens of nodes, never a percentage of
# the graph (10 landmarks at sf0.1, 1 at sf0.01).
_G13_SEED_SQL = (
    "SELECT CAST(s_suppkey AS BIGINT) AS node"
    " FROM supplier WHERE s_suppkey % 100 = 1"
)


@register(
    "g13_harmonic_closeness",
    oracle=(
        "WITH sp AS (\n"
        + _graph.sssp_sql(
            _G6_PROJ_SQL, _G13_SEED_SQL, rounds=4,
            weighted=False, per_seed=True,
        )
        + "\n) SELECT sp.node, "
        "CAST(COUNT(*) AS BIGINT) AS n_landmarks, "
        "CAST(SUM(CAST(1000000 AS BIGINT) // dist) AS BIGINT) AS harm_e6 "
        "FROM sp WHERE dist > 0 GROUP BY sp.node "
        "ORDER BY harm_e6 DESC, sp.node LIMIT 25"
    ),
    doc="Landmark harmonic closeness over the co-supply kNN backbone: "
    "per-landmark truncated BFS (sssp per_seed=True — state keyed "
    "(seed, node), the landmark generalization of g11's min-collapse "
    "relax) from 10 fixed trusted landmark suppliers, rolled up to "
    "Σ_landmarks 1e6 DIV hops in exact integer units: ranks suppliers "
    "by being a FEW hops from MANY trusted landmarks — g11's "
    "min-distance finds the closest tie to ANY seed, harmonic "
    "closeness finds the consensus-central ones (one hop from one "
    "landmark but unreached from the rest ranks below moderately "
    "close to all ten). TWO scale disciplines on display: the "
    "landmark count is tens, never a percentage (per-seed state and "
    "shuffle scale by it), and the substrate is the SPARSIFIED top-8 "
    "backbone (≤8n edges, the g6/g8/g9 artifact — fourth consumer), "
    "never the raw bipartite fact graph, whose per-seed fan-out "
    "measured 10-16 s where this runs in well under a second. "
    "Frontier-delta relax, 4-round truncation, BIGINT floor division "
    "⇒ bit-equal to the unrolled per-seed DuckDB twin. "
    "operators/graph.py:sssp(per_seed=True).",
)
def q_g13_harmonic_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    proj = _cosupply_knn_shared(spark, sf_dir)
    landmarks = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 100 == 1)
        .select(F.col("s_suppkey").cast("bigint").alias("node"))
    )
    d = _graph.sssp(
        proj,
        landmarks,
        rounds=4,
        per_seed=True,
        assume_normalized=True,  # backbone is deduped/self-loop-free
        cut_input=False,  # projection of the checkpointed shared stage
        frontier=False,  # on the BOUNDED backbone the relax volume is
        # tiny and per-round fixed overhead dominates — the frontier
        # diff join + emptiness probe COST here, in-session A/B
        # (3 reps each): full relax 1.5 s vs delta 2.4-4.3 s; delta
        # pays off on the big trade graph (g11/g12), not here
    )
    return (
        d.filter(F.col("dist") > 0)
        .groupBy("node")
        .agg(
            F.count("*").cast("bigint").alias("n_landmarks"),
            F.sum(F.expr("CAST(1000000 AS BIGINT) DIV dist"))
            .cast("bigint")
            .alias("harm_e6"),
        )
        .orderBy(F.desc("harm_e6"), "node")
        .limit(25)
    )


def _g9_bfs_oracle(d: int = 3, n_seeds: int = 20) -> str:
    parts = [
        f"raw AS MATERIALIZED ({_G6_PROJ_SQL})",
        "e AS MATERIALIZED ("
        "SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v "
        "FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL "
        "AND src <> dst)",
        "sym AS MATERIALIZED ("
        "SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e)",
        f"seeds AS MATERIALIZED (SELECT DISTINCT a AS node FROM sym "
        f"ORDER BY 1 LIMIT {n_seeds})",
        "p0 AS MATERIALIZED (SELECT node AS seed, node FROM seeds)",
    ]
    for r in range(d):
        parts.append(
            f"p{r + 1} AS MATERIALIZED (SELECT DISTINCT seed, node FROM ("
            f"SELECT seed, node FROM p{r} "
            f"UNION ALL SELECT p{r}.seed, sym.b FROM p{r} "
            f"JOIN sym ON sym.a = p{r}.node) x)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT seed AS node, CAST(COUNT(*) AS BIGINT) AS reach_exact,"
        f" TRUE AS within_tolerance FROM p{d} GROUP BY 1"
    )


@register(
    "g9_neighborhood_anf",
    oracle=_g9_bfs_oracle(d=3, n_seeds=20),
    doc="Approximate neighborhood function (ANF, Palmer KDD'02 / "
    "HyperBall): per-node 3-hop reach over the shared co-supply "
    "backbone via HLL SKETCH-STATE propagation — the only operator "
    "whose dataflow state is a mergeable sketch, not an integer: "
    "c0(v) = HLL{v}, each round one state-onto-edges equi-join + one "
    "combinable hll_union_agg (register-wise max — associative, "
    "map-side partial), kB state per node where the exact answer "
    "needs O(n*reach) pairs. Curation reading: tiny d-hop "
    "neighborhoods mark isolated clusters/link farms, huge ones the "
    "backbone. Sketch binaries have no SQL twin, so the gate is the "
    "TOLERANCE-VERDICT pattern (a5/a26): the query ALSO runs the "
    "exact BFS (graph.bfs_reach_counts) for the 20 smallest node ids "
    "— a bounded seed set, the only scale at which exact reach is "
    "affordable — and returns (node, reach_exact, within_tolerance) "
    "with |est − exact| <= max(5%·exact, 3) (HLL rsd at lg_k=12 is "
    "~1.6%, and small sets sit in the sparse-exact regime); the "
    "DuckDB oracle unrolls the same BFS AS MATERIALIZED and asserts "
    "exact counts + all-true. operators/graph.py:"
    "neighborhood_function, bfs_reach_counts.",
)
def q_g9_neighborhood_anf(spark: SparkSession, sf_dir: str) -> DataFrame:
    proj = _cosupply_knn_shared(spark, sf_dir)
    est = _graph.neighborhood_function(proj, d=3, lg_k=12)
    seeds = est.select("node").orderBy("node").limit(20)
    exact = _graph.bfs_reach_counts(proj, seeds, d=3)
    return (
        exact.join(est, "node")
        .select(
            "node",
            F.col("reach").alias("reach_exact"),
            (
                F.abs(F.col("reach_est") - F.col("reach"))
                <= F.greatest(0.05 * F.col("reach"), F.lit(3.0))
            ).alias("within_tolerance"),
        )
    )


@register(
    "o14_join_skew_report",
    oracle="""
        WITH per_key AS (
            SELECT l_suppkey AS k, COUNT(*) AS n
            FROM lineitem GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(MAX(n) AS BIGINT) AS max_rows_per_key,
               ROUND(AVG(n), 2) AS avg_rows_per_key,
               ROUND(MAX(n) / AVG(n), 2) AS skew_factor,
               CAST(COUNT(*) FILTER (WHERE n > 2 * (
                   SELECT AVG(n) FROM per_key)) AS BIGINT) AS n_hot_keys
        FROM per_key
    """,
    doc="Join-key skew diagnostic: per-key row counts for a prospective "
    "join/shuffle key reduced to one row (max/avg skew factor, hot-key "
    "count above 2x average) — the report that decides between a plain "
    "hash join, AQE skew-split, and explicit salting "
    "(operators/partitioning.salted_join). One combinable count plus "
    "a 6-value aggregate; nothing is sorted or collected.",
)
def q_o14_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_key = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("k"))
        .agg(F.count("*").alias("n"))
    )
    avg_n = per_key.agg(F.avg("n").alias("a"))
    return (
        per_key.crossJoin(F.broadcast(avg_n))
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.max("n").cast("bigint").alias("max_rows_per_key"),
            F.round(F.avg("n"), 2).alias("avg_rows_per_key"),
            F.round(F.max("n") / F.avg("n"), 2).alias("skew_factor"),
            F.count_if(F.col("n") > 2 * F.col("a"))
            .cast("bigint")
            .alias("n_hot_keys"),
        )
    )


@register(
    "llm_l2_topk",
    oracle=_sim.l2_topk_sql(max_query_id=10, k=5),
    doc="Brute-force EXACT squared-L2 top-5 (vec_id<10 queries "
    "broadcast, corpus streamed) — the ground truth the PQ paths are "
    "graded against: PQ approximates ‖q−x‖², so cosine ground truth "
    "would conflate metric mismatch with compression loss. "
    "operators/similarity.py:l2_topk.",
)
def q_llm_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _l2_truth10_shared(spark, sf_dir)


@register(
    "llm_pq_recall",
    oracle=f"""
        WITH truth AS ({_sim.l2_topk_sql(max_query_id=10, k=5)}),
        approx AS ({_sim.pq_topk_sql(max_query_id=10, k=5)}),
        per_q AS (
            SELECT t.query_id,
                   COUNT(*) AS k,
                   COUNT(a.neighbor_id) AS hits
            FROM truth t
            LEFT JOIN approx a
              ON t.query_id = a.query_id
             AND t.neighbor_id = a.neighbor_id
            GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               ROUND(AVG(hits * 1.0 / k), 4) AS mean_recall,
               ROUND(MIN(hits * 1.0 / k), 4) AS min_recall
        FROM per_q
    """,
    doc="PQ compression-quality gate: per-query recall of the "
    "compressed-domain PQ top-5 against the exact squared-L2 ground "
    "truth (same metric — isolates quantization loss), mean/min in "
    "one row. The PQ side reuses the session-shared corpus code "
    "table.",
)
def q_llm_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    truth = _l2_truth10_shared(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    approx = _sim.pq_topk(
        emb, q, k=5, codes=_pq_codes_shared(spark, sf_dir)
    ).select("query_id", "neighbor_id")
    return _recall_report(truth, approx)


@register(
    "llm_pq_topk",
    oracle=_sim.pq_topk_sql(max_query_id=10, k=5),
    doc="Product-quantization ANN (the FAISS compression workhorse): "
    "vectors encode to one small code per subspace (argmin distance "
    "to deterministic per-subspace codebooks — array_min over "
    "(dist, j) structs, scores evaluated once, map-only) and search "
    "scores in the COMPRESSED domain: per query one k-entry LUT per "
    "subspace, per corpus vector 8 array lookups instead of a 64-"
    "float dot product. Production composition is PQ-within-IVF "
    "(probe cells, PQ-score only those codes). "
    "operators/similarity.py:pq_encode,pq_topk.",
)
def q_llm_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return _sim.pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        codes=_pq_codes_shared(spark, sf_dir),
    )


@register(
    "llm_pq_ivf_topk",
    oracle=_sim.pq_ivf_topk_sql(
        max_query_id=10, k=5, cent_sql=_KMEANS_CENT_SQL
    ),
    doc="PQ-within-IVF (the FAISS IVFPQ production composition): "
    "queries probe their nprobe nearest TRAINED (kmeans_fp) cells, "
    "then PQ-score ONLY the probed cells' codes in the compressed "
    "domain — IVF bounds the candidate set sublinearly, PQ makes each "
    "candidate 8 LUT lookups with no float vectors at search time. "
    "Both corpus artifacts (the shared trained cell assignment, the "
    "code table) are shareable/materializable; the search join "
    "shuffles cell_id + 8 small ints per vector. "
    "operators/similarity.py:pq_ivf_topk.",
)
def q_llm_pq_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return _sim.pq_ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        codes=_pq_codes_shared(spark, sf_dir),
        corpus_cells=_ivf_cells_shared(spark, sf_dir).select(
            "neighbor_id", "cell_id", F.col("c_emb")
        ),
        centroids=_kmeans_cents_shared(spark, sf_dir),
    )


def _sq_scales_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQ index's per-dimension scales row — PART OF the index
    artifact (codes scored against different scales live in a
    different lattice), shared by both SQ queries so their query-side
    re-encode uses the exact corpus scales."""
    return _shared(
        spark,
        sf_dir,
        "sq_scales",
        lambda: _sim.sq_scales(t(spark, sf_dir, "embeddings")),
    )


def _sq_codes_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar-quantization code table (per-dim scales broadcast,
    map-only encode) — consumed by llm_sq_topk and llm_sq_recall
    (disk twin: the SQ code artifact an index rebuild materializes)."""
    return _shared(
        spark,
        sf_dir,
        "sq_codes",
        lambda: _sim.sq_encode(
            t(spark, sf_dir, "embeddings"),
            _sq_scales_shared(spark, sf_dir),
        ),
    )


@register(
    "llm_sq_topk",
    oracle=_sim.sq_topk_sql(max_query_id=10, k=5),
    doc="int8 scalar-quantized ANN (the FAISS SQ8 tier between "
    "float brute force and PQ): per-dimension max|x| scales quantize "
    "every vector to floor(x·127/s) ∈ [−127, 127], search ranks by "
    "the INTEGER dot of the codes — 4× smaller vectors, integer "
    "SIMD-friendly scoring, and (unlike every float path) zero "
    "rounding contract: codes and scores are exact BIGINTs, bit-equal "
    "cross-engine. Scales are one broadcast scalar row; the encode is "
    "map-side zip_with; the code table is the shareable corpus "
    "artifact. operators/similarity.py:sq_encode,sq_topk.",
)
def q_llm_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return _sim.sq_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        codes=_sq_codes_shared(spark, sf_dir),
        scales=_sq_scales_shared(spark, sf_dir),
    )


@register(
    "llm_sq_recall",
    oracle=f"""
        WITH brute AS ({_sim.cosine_topk_sql(max_query_id=25, k=5)}),
        ann AS ({_sim.sq_topk_sql(max_query_id=25, k=5)}),
        per_q AS (
            SELECT b.query_id,
                   COUNT(*) AS k,
                   COUNT(a.neighbor_id) AS hits
            FROM brute b
            LEFT JOIN ann a
              ON b.query_id = a.query_id
             AND b.neighbor_id = a.neighbor_id
            GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               ROUND(AVG(hits * 1.0 / k), 4) AS mean_recall,
               ROUND(MIN(hits * 1.0 / k), 4) AS min_recall
        FROM per_q
    """,
    doc="SQ8 quality gate: per-query recall of the scalar-quantized "
    "top-5 against the brute-force cosine ground truth (the shared "
    "25-query table), mean/min — completes the per-index recall "
    "reports (LSH/IVF/PQ/SQ), so every compression tier ships with "
    "its measured accuracy. Hit counting via the JOIN-FREE "
    "_recall_report union+aggregate.",
)
def q_llm_sq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    truth = _cosine_truth25_shared(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ann = _sim.sq_topk(
        emb,
        emb.filter(F.col("vec_id") < 25),
        k=5,
        codes=_sq_codes_shared(spark, sf_dir),
        scales=_sq_scales_shared(spark, sf_dir),
    ).select("query_id", "neighbor_id")
    return _recall_report(truth, ann)


@register(
    "llm_packing_efficiency",
    oracle="""
        WITH toks AS (
            SELECT greatest(len(list_filter(
                       regexp_split_to_array(trim(text), '\\s+'),
                       x -> x <> '')), 1) AS n
            FROM documents
        )
        SELECT 128 AS seq_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS total_tokens,
               CAST(SUM(CAST(ceil(n / 128.0) AS BIGINT)) AS BIGINT)
                   AS padded_sequences,
               ROUND(1.0 - CAST(SUM(n) AS DOUBLE)
                     / (128 * SUM(CAST(ceil(n / 128.0) AS BIGINT))), 6)
                   AS padded_waste_frac,
               CAST(ceil(SUM(n) / 128.0) AS BIGINT) AS packed_sequences
        FROM toks
    """,
    doc="Packing-efficiency report: the budget case FOR "
    "llm_pack_sequences — under a one-doc-per-sequence pad-to-128 "
    "policy, how many sequences and what padding fraction does this "
    "corpus cost vs concat-and-chunk's ceil(total/128)? One "
    "combinable aggregate over per-doc token counts (empty docs "
    "floor at 1 token — one BOS/EOS slot); the waste fraction is the "
    "compute you burn training on pad tokens. Pure map + one agg, "
    "no shuffle of anything but partial sums.",
)
def q_llm_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = 128
    n = F.greatest(
        F.size(
            F.filter(
                F.split(F.trim("text"), r"\s+"), lambda x: x != F.lit("")
            )
        ).cast("bigint"),
        F.lit(1),
    )
    toks = t(spark, sf_dir, "documents").select(n.alias("n"))
    padded_seqs = F.sum(F.expr(f"(n + {b - 1}) DIV {b}"))
    return toks.agg(
        F.lit(b).alias("seq_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        padded_seqs.cast("bigint").alias("padded_sequences"),
        F.round(
            F.lit(1.0) - F.sum("n") / (F.lit(b) * padded_seqs), 6
        ).alias("padded_waste_frac"),
        F.expr(f"(sum(n) + {b - 1}) DIV {b}").cast("bigint").alias(
            "packed_sequences"
        ),
    )


# --- Gate-priority ordering -------------------------------------------------
# The driver's CORRECTNESS gate walks REGISTRY in dict-insertion order with a
# ~50-row budget. Since round 14 the rotation is DERIVED FROM THE ARTIFACTS,
# not a hand-kept note (the r13 verdict caught the note drifting: WORKLOG
# claimed "nothing older than r10" while llm_cooccurrence and g7_coreness
# were r9-latest — absent from every r10-r13 gate because the hand-ordered
# tier-1 tail fell past the 50-row budget):
#   tier 0 — _GATE_TIER0 below, hand-kept: queries whose PLAN changed this
#            round (artifacts cannot know that) — re-gate before anything,
#   rest   — every other oracle-backed query ordered by (latest hash-green
#            round replayed from CORRECTNESS_r*.json, then bench cost
#            cheapest-first from BENCH_FULL.json, then name): never-green
#            registrations sort first, the stalest greens next, so the
#            budget always eats the oldest tail and no query can silently
#            stay ungated while fresher ones re-confirm,
#   tail   — rows-only (no-oracle) queries, EMPTY since r10.
# New registrations need NO list edit: with no CORRECTNESS row they sort
# ahead of every green query automatically. tests/test_gate_priority.py
# asserts the monotone-staleness invariant and that the stalest rows sit
# inside the budget.
_GATE_ROWS_ONLY_ROTATED: list[str] = [
    # empty this round — every oracle-free query already has its
    # rows_match row on file (a26's landed in r7)
]
_GATE_TAIL_ROWS_ONLY: list[str] = [
    # EMPTY since round 10: the three approximate twins (a5_distinct_
    # approx, llm_quality_quantile_approx, a26_hll_shard_union) were
    # reformulated to return deterministic TOLERANCE VERDICTS and are
    # oracle-backed tier-0 entries now — no permanently-ungated rows
    # remain. Kept as a slot for any future intentionally-oracle-free
    # registration.
]
_GATE_TIER0 = [
    # round 14: the reshaped trainer gate (never driver-green — the r13
    # array-column canonicalizer crash) + every query whose plan changed
    # with the trained-cell unification (the one kmeans_corpus_cells
    # table now feeds all nearest-centroid consumers)
    "llm_kmeans_cells",
    "llm_ann_ivf",
    "llm_ivf_recall",
    "llm_ivf_kmeans_recall",
    "llm_pq_ivf_topk",
    "llm_semantic_dedup",
    "llm_cluster_balanced_mix",
]


def _repo_root() -> str:
    import os

    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def latest_green_rounds() -> dict[str, int]:
    """Replay every committed CORRECTNESS_r*.json: the latest round each
    query hash-matched its oracle (rows_match for oracle-free rows).
    THE source of gate-freshness truth — never a WORKLOG note."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    latest: dict[str, int] = {}
    for path in sorted(
        _glob.glob(_os.path.join(_repo_root(), "CORRECTNESS_r*.json"))
    ):
        m = _re.search(r"r(\d+)", _os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = _json.load(open(path))
        except (OSError, ValueError):
            continue
        for q, res in rows.items():
            ok = res.get("hash_match") or (
                res.get("hash_match") is None and res.get("rows_match")
            )
            if ok:
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


def _bench_costs() -> dict[str, float]:
    import json as _json
    import os as _os

    try:
        d = _json.load(
            open(_os.path.join(_repo_root(), "BENCH_FULL.json"))
        )
        return dict(d.get("queries") or {})
    except (OSError, ValueError):
        return {}


def gate_freshness_histogram() -> dict[int, int]:
    """{latest-green round: query count} over the registry (0 = never
    green) — paste THIS into WORKLOG, never a hand count."""
    latest = latest_green_rounds()
    hist: dict[int, int] = {}
    for name in REGISTRY:
        r = latest.get(name, 0)
        hist[r] = hist.get(r, 0) + 1
    return dict(sorted(hist.items()))


_latest_green = latest_green_rounds()
_gate_cost = _bench_costs()
_GATE_REST = sorted(
    (
        n
        for n in REGISTRY
        if n not in set(_GATE_TIER0)
        and n not in set(_GATE_TAIL_ROWS_ONLY)
    ),
    key=lambda n: (
        _latest_green.get(n, -1),
        _gate_cost.get(n, float("inf")),
        n,
    ),
)
_GATE_PRIORITY = _GATE_TIER0 + _GATE_REST + _GATE_TAIL_ROWS_ONLY
assert set(_GATE_PRIORITY) == set(REGISTRY), (
    "gate-priority list drifted from registry: "
    f"missing={sorted(set(REGISTRY) - set(_GATE_PRIORITY))} "
    f"stale={sorted(set(_GATE_PRIORITY) - set(REGISTRY))}"
)
assert len(_GATE_PRIORITY) == len(set(_GATE_PRIORITY)), "duplicate gate names"
_ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY}
REGISTRY.clear()
REGISTRY.update(_ordered)
