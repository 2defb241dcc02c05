"""Physical-plan lint over EVERY registry query: the CLAUDE.md scale
invariants, enforced mechanically instead of by review.

Banned in any query plan:
  * CartesianProduct — an unconditioned join that didn't broadcast;
    at 100 TB this is the job that never finishes. (The intentional
    O(N·K) centroid/plane joins broadcast a ≤K-row side and appear as
    BroadcastNestedLoopJoin, which is allowed.)
  * BatchEvalPython — a row-at-a-time Python UDF; Python is allowed
    only through Arrow (MapInPandas / ArrowEvalPython).
  * Exchange SinglePartition over unaggregated data — a global sort /
    empty-partition-spec Window collapsing fact-scale input onto ONE
    task (the w8 lesson). Single-partition exchanges above an
    aggregate (per-shard counts, vocab ranking, threshold curves —
    bounded, kilobyte-scale inputs) are the legitimate pattern and
    stay allowed.

Plans are built at sf0.001 — this lints plan SHAPE, not timing.
"""

from __future__ import annotations

import pytest

from ad_data_pipelines_spark.plans.testdata_queries import REGISTRY
from tests.conftest import SF_MEDIUM, SF_SMALL

ALL_QUERIES = sorted(REGISTRY)

#: plan lines that read stored/materialized data — reaching one of
#: these below a SinglePartition exchange without crossing an
#: aggregate means raw (unbounded) rows were collapsed to one task
_LEAF_MARKERS = (
    "Scan parquet",
    "FileScan",
    "Scan ExistingRDD",
    "InMemoryTableScan",
    "Scan csv",
    "Scan json",
)
_AGG_MARKERS = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")

#: first column of each parquet table whose row count scales linearly
#: with the scale factor — a broadcast HINT on a relation that bottoms
#: out in one of these is a pinned OOM at 100 TB (AQE cannot override
#: an explicit hint). nation/region (25 / 5 rows at every SF) are
#: deliberately absent.
_SCALED_TABLE_COLS = (
    "c_custkey",
    "o_orderkey",
    "l_orderkey",
    "p_partkey",
    "s_suppkey",
    "doc_id",
    "vec_id",
    "event_id",
)

#: transit pipelines use customer/supplier/part as stand-ins for the
#: reference's genuinely-KB VDV dims (LINE / OPERATING_DEPARTMENT /
#: stop registry), so their hints model the reference correctly;
#: j21's brute-pass broadcast side is bounded at RUNTIME by
#: grid_knn_join's max_brute_frac count guard (geo.py), which the
#: static plan cannot show
#: llm_contamination's hinted side is the eval-suite gram set — bounded
#: TRANSITIVELY by an inner join whose other input carries the
#: `doc_id < 25` filter; the subtree walk can't trace join-propagated
#: bounds, so it's exempted by name (adjudicated scale-correct in the
#: r7 verdict: "eval side broadcast; corpus text never shuffles");
#: llm_decontam_blast_radius composes the same contamination_check
#: subtree and inherits exactly that hint shape (r12)
_SCALED_HINT_EXEMPT = {
    "j1_broadcast_enrich",
    "j5_regional_volume",
    "o7_topk_rank",
    "a9_rollup_overall",
    "j21_grid_knn",
    "llm_contamination",
    "llm_decontam_blast_radius",
}

#: a Filter whose predicate pins a unique-id column under a literal
#: (vec_id#12L < 25, doc_id#3L <= 100, = k, IN (…)) bounds its subtree
#: to a constant row count at EVERY scale factor — the ANN query-set /
#: eval-benchmark construction
_BOUNDED_ID_FILTER = __import__("re").compile(
    r"\b(vec_id|doc_id|c_custkey|o_orderkey|l_orderkey|p_partkey"
    r"|s_suppkey|event_id)#\d+L?\s*(?:<=|<|=|IN \()\s*(?:cast\()?\s*\d"
)


def _tree_depth(line: str) -> int:
    """Indentation depth in a logical-plan tree string: length of the
    leading `:  +- ` scaffolding before the node name."""
    i = 0
    while i < len(line) and line[i] in ":+- ":
        i += 1
    return i


def hinted_scaled_leaves(analyzed: str) -> list[str]:
    """ResolvedHint(broadcast) subtrees that bottom out in a parquet
    scan of an sf-scaled table with NO bounding node in between — i.e.
    an explicit broadcast pin on a relation whose size grows with the
    data. Bounding nodes that make the hint safe at every SF: an
    Aggregate or GlobalLimit (scalars, offset tables, per-group
    counts), or a Filter pinning a unique-id column under a literal
    (``vec_id < 25`` — the ANN query-set / eval-benchmark shape,
    constant rows at any scale factor)."""
    lines = analyzed.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line or "broadcast" not in line.lower():
            continue
        d = _tree_depth(line)
        agg_depths: list[int] = []
        for below in lines[i + 1:]:
            bd = _tree_depth(below)
            if bd <= d:
                break  # left the hint's subtree
            while agg_depths and bd <= agg_depths[-1]:
                agg_depths.pop()
            if (
                "Aggregate" in below
                or "GlobalLimit" in below
                or ("Filter" in below and _BOUNDED_ID_FILTER.search(below))
            ):
                agg_depths.append(bd)
                continue
            if (
                not agg_depths
                and "parquet" in below
                and "Relation" in below
                and any(c in below for c in _SCALED_TABLE_COLS)
            ):
                bad.append(below.strip()[:120])
    return bad


def single_partition_collapses(plan: str) -> list[str]:
    """Lines where an `Exchange SinglePartition` feeds on unaggregated
    stored data. The physical plan prints depth-first, so the lines
    after an exchange are its subtree: if a leaf scan appears before
    any aggregate, the exchange is funneling raw rows into one task."""
    final = plan.split("+- == Initial Plan ==")[0]
    lines = final.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        for below in lines[i + 1:]:
            if any(m in below for m in _AGG_MARKERS):
                break  # bounded: exchange input is post-aggregation
            if any(m in below for m in _LEAF_MARKERS):
                bad.append(line.strip())
                break
    return bad


def nested_output_cols(schema) -> list[str]:
    """Columns whose type the driver's gate canonicalizer cannot hash:
    the registry's output convention is date/string/bigint/rounded-
    double ONLY (testdata_queries.py module docstring). r13 shipped the
    first array<bigint> result column and the external gate's pandas
    canonicalizer crashed on it (`unhashable type: 'list'`,
    CORRECTNESS_r13) while the local verify skill tuple-ized it — this
    lint turns the docstring convention into an enforced invariant so
    the local-green/driver-red class can never ship again."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_cartesian_no_row_udfs(name, spark):
    df = REGISTRY[name].fn(spark, SF_SMALL)
    nested = nested_output_cols(df.schema)
    assert not nested, (
        f"{name}: non-flat result column(s) {nested} — the driver "
        f"gate's canonicalizer crashes on array/map/struct cells "
        f"(CORRECTNESS_r13 llm_kmeans_cells); posexplode or "
        f"concat_ws to gate-safe scalars"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{name}: unconditioned non-broadcast join\n{plan}"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan\n{plan}"
    )
    collapses = single_partition_collapses(plan)
    assert not collapses, (
        f"{name}: single-partition collapse of unaggregated data "
        f"(global sort / empty-partition-spec Window over a fact "
        f"input): {collapses}\n{plan}"
    )
    if name not in _SCALED_HINT_EXEMPT:
        analyzed = df._jdf.queryExecution().analyzed().toString()
        pins = hinted_scaled_leaves(analyzed)
        assert not pins, (
            f"{name}: explicit broadcast hint pinned on an sf-scaled "
            f"relation (AQE cannot override a hint — forced OOM at "
            f"100 TB; use plans.transit_common.maybe_broadcast or no "
            f"hint at all): {pins}"
        )


def test_shared_stages_key_on_sf_dir(spark):
    """The session-scoped _shared persist cache must key on the data
    directory: the same query against two SFs returns different data,
    never a cache hit across directories."""
    from ad_data_pipelines_spark.plans import testdata_queries as tq

    small = {
        tuple(r)
        for r in tq.REGISTRY["llm_boilerplate_ngrams"].fn(spark, SF_SMALL).collect()
    }
    medium = {
        tuple(r)
        for r in tq.REGISTRY["llm_boilerplate_ngrams"].fn(spark, SF_MEDIUM).collect()
    }
    assert small != medium


def test_shared_corpus_stages_actually_reused(spark):
    """Breaking the _shared pattern silently reintroduces per-query
    corpus re-assignment (r2's top perf defect) — assert the ANN and
    shingle consumers read the persisted stage (InMemoryTableScan),
    not a fresh scan chain."""
    from ad_data_pipelines_spark.plans import testdata_queries as tq

    for name in ["llm_ann_lsh", "llm_ann_ivf", "llm_boilerplate_ngrams"]:
        df = tq.REGISTRY[name].fn(spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, name


def test_scaled_hint_lint_catches_pinned_broadcast(spark):
    """Negative control for the broadcast-hint lint: an explicit
    F.broadcast on a raw scaled-table scan is flagged; the same hint
    on (a) an aggregate of that table or (b) the 25-row nation dim is
    not."""
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    nat = spark.read.parquet(f"{SF_SMALL}/nation.parquet")

    pinned = li.join(F.broadcast(cust), li.l_orderkey == cust.c_custkey)
    assert hinted_scaled_leaves(
        pinned._jdf.queryExecution().analyzed().toString()
    )

    bounded = li.join(
        F.broadcast(cust.groupBy("c_nationkey").count()),
        li.l_suppkey == F.col("c_nationkey"),
    )
    assert not hinted_scaled_leaves(
        bounded._jdf.queryExecution().analyzed().toString()
    )

    dim = li.join(F.broadcast(nat), li.l_suppkey == nat.n_nationkey)
    assert not hinted_scaled_leaves(
        dim._jdf.queryExecution().analyzed().toString()
    )


def test_unhinted_scaled_joins_still_broadcast_at_runtime(spark):
    """The round-8 un-hinting contract: dropping F.broadcast() from
    sf-scaled relations must NOT change the physical strategy at test
    SFs — AQE's runtime size stats pick the broadcast join on their
    own (and, unlike the hint, can fall back to shuffle at 100 TB).
    Executes a representative un-hinted TPC-H shape and asserts the
    FINAL adaptive plan still broadcast-joins, with no sort-merge
    fallback."""
    df = REGISTRY["j31_returned_item_customers"].fn(spark, SF_MEDIUM)
    df.collect()  # AQE finalizes the plan only on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert "isFinalPlan=true" in plan, "AQE did not finalize the plan"
    assert "BroadcastHashJoin" in final, final
    assert "SortMergeJoin" not in final, final


def test_a30_inlist_stays_pushed_and_broadcast_only(spark):
    """Round-9 regression guard for the one REAL un-pin misplan: a30's
    customer restriction must stay a literal IN-list pushed into the
    parquet scan (manual DPP), never revert to the join form whose
    product-of-children size estimate forced a sort-merge join that
    AQE refused to back out (+41% measured, interleaved). Asserts the
    pushed In-filter on c_nationkey and an SMJ/SHJ-free final plan."""
    df = REGISTRY["a30_market_share"].fn(spark, SF_MEDIUM)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert "isFinalPlan=true" in plan, "AQE did not finalize the plan"
    assert "SortMergeJoin" not in final, final
    assert "ShuffledHashJoin" not in final, final
    import re

    scan = re.search(r"FileScan parquet \[c_custkey[^\n]*", final)
    assert scan and re.search(r"PushedFilters: \[[^\]]*In\(c_nationkey",
                              scan.group(0)), final
    # r10 guard for the BUILD-SIDE variant of the same misplan: when
    # the supplier side carried a join-output product estimate, the
    # planner broadcast THE FACT (BuildLeft on lineitem) and probed it
    # with supplier — ~32% pairwise. The supplier side is a leaf now;
    # the fact join must build the dim (BuildRight), never the fact.
    supp_join = re.search(
        r"BroadcastHashJoin \[l_suppkey[^\n]*", final
    )
    assert supp_join and "BuildRight" in supp_join.group(0), final


def test_flat_output_lint_catches_nested_columns(spark):
    """Negative control for the flat-output lint: the exact r13 shape
    (an array<bigint> result column) is flagged; its posexploded flat
    twin is not."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    bad = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x * 100 AS BIGINT))").alias(
            "centroid_fp"
        ),
    )
    assert nested_output_cols(bad.schema) == ["centroid_fp"]
    ok = bad.select("vec_id", F.posexplode("centroid_fp").alias("dim", "q"))
    assert not nested_output_cols(ok.schema)


def test_single_partition_collapse_lint_catches_global_window(spark):
    """Negative control: the exact shape the lint exists for — an
    empty-partition-spec Window straight over a parquet scan (the
    pre-r7 w8 form) — is flagged, while the same window over an
    aggregate is not."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    bad = cust.select(
        F.ntile(10).over(Window.orderBy("c_acctbal", "c_custkey")).alias("d")
    )
    plan = bad._jdf.queryExecution().executedPlan().toString()
    assert single_partition_collapses(plan), plan

    ok = (
        cust.groupBy("c_nationkey")
        .count()
        .select(
            "c_nationkey",
            F.sum("count").over(
                Window.orderBy("c_nationkey").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ).alias("running"),
        )
    )
    plan_ok = ok._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" in plan_ok  # the window is global
    assert not single_partition_collapses(plan_ok), plan_ok


def test_dim_keys_memo_keys_on_sf_dir(spark):
    """The _dim_keys IN-list memo must key on (session, sf_dir, name):
    a collision would push ONE directory's key list into another
    directory's scan filter — silently wrong results, not a perf bug.
    a30 exercises the memo; its results must differ across SFs, and
    the cache must hold separate entries per directory."""
    from ad_data_pipelines_spark.plans import testdata_queries as tq

    small = {
        tuple(r)
        for r in tq.REGISTRY["a30_market_share"].fn(spark, SF_SMALL).collect()
    }
    medium = {
        tuple(r)
        for r in tq.REGISTRY["a30_market_share"].fn(spark, SF_MEDIUM).collect()
    }
    assert small != medium
    dirs = {
        k[1] for k in tq._DIM_KEYS_CACHE if k[2] == "asia_nations"
    }
    assert {SF_SMALL, SF_MEDIUM} <= dirs


#: The r9→r10 standing audit (VERDICT r9 "What's missing #1"): every
#: SortMergeJoin / ShuffledHashJoin in an EXECUTED sf0.1 final plan
#: must be on this list — each entry is an INTENTIONAL fact-fact
#: shuffle where both sides scale with the data (co-partitioned SMJ is
#: the correct 100 TB plan) or a join type that cannot broadcast
#: (FullOuter). Anything else is the a30/j28 misplan class: a probe
#: side that SHOULD broadcast carrying a product-of-children size
#: estimate the static planner rejects and AQE never backs out.
#: Documented in SCALE.md ("SMJ/SHJ allowlist").
_SMJ_ALLOWED = {
    # graph family: per-iteration (node,state) x edge-list equi-joins —
    # both fact-scale, co-partitioned on the node key by design
    "g1_pagerank_suppliers",
    "g2_ppr_trusted_suppliers",
    # g3 left this list in round 11: frontier=True materializes the
    # label state per half-step, so every vote join probes a
    # checkpointed (node, label) frame small enough for AQE to
    # broadcast — the final sf0.1 plan is SMJ/SHJ-free
    "g4_weighted_pagerank",
    # g14_hits_authorities left this list in r14 (optimization round):
    # hits now cuts the (node, raw) score state before each 1-row
    # normalizer broadcast, so EVERY half-step's state joins probe a
    # checkpointed node-count frame small enough for AQE to broadcast
    # — the final sf0.1 plan is SMJ/SHJ-free, like g3's frontier mode
    "g6_cosupply_triangles",  # wedge/orientation self-joins, fact-fact
    # g7_coreness left this list in r15 (optimization round 2): the
    # fixpoint early-exit returns one filter off a CUT state frame, so
    # the final sf0.1 plan no longer carries the uncut odd-round tail
    # whose state joins planned as SMJ — it is SMJ/SHJ-free now (the
    # g3/g14 precedent)
    "g9_neighborhood_anf",  # per-round sketch-state x edges join: the
    # state is ~kB/node (HLL binaries), node-count-scaled on BOTH
    # sides — co-partitioned SMJ is the right 100 TB plan
    "g10_cosupply_jaccard",  # the SMJ is the basket-keyed pair
    # self-join EMBEDDED in the persisted cosupply_pairs stage's
    # cached-plan text (runs once at warm, not per query; an
    # InMemoryRelation prints its build plan inside every consumer);
    # g10's own joins are all BroadcastHashJoin
    # g8_truss_backbone is NOT here: its per-round survivor sets are
    # small enough at sf0.1 that AQE broadcasts every enumeration join
    # TPC-H fact-fact shapes
    "j8_full_outer_3way",       # FullOuter cannot broadcast
    "j21_grid_knn",             # grid-cell self-join of the point set
    "j24_sole_late_supplier",   # per-(order,supplier) agg x fact
    "j30_late_order_priorities",  # orders LeftSemi lineitem
    # dedup/similarity: gram/bucket/cell-keyed self- or history-joins —
    # candidate generation is bucketed, but both sides are corpus-scale
    "llm_containment",
    "llm_dup_span_removal",
    "llm_dup_spans",
    "llm_incremental_dedup",    # history x new batch, both corpus-scale
    "llm_ngram_jaccard",
    "llm_semantic_dedup",       # within-cell pair join
    "llm_snapshot_diff",        # FullOuter of two snapshots
    "o15_entity_clusters",      # CC label join-back at entity grain
    # doc-grain LeftOuter join-backs (doc x per-doc aggregate)
    "llm_nb_quality",
    "llm_remove_boilerplate",
    "llm_decontam_blast_radius",  # dup-cluster membership x
    # contamination flags, both per-doc corpus-scale tables —
    # co-partitioned doc_id SMJ is the right 100 TB plan
    # versioned-table merge: FullOuter strategy variant
    "s16_merge_apply",
}

SF_LARGE = "/root/testdata/sf0.1"

#: the TRUE fact tables — broadcasting one of these is the BUILD-SIDE
#: variant of the a30 misplan (both sides under the threshold, the dim
#: side a join output whose product estimate beats the fact's, so the
#: planner builds THE FACT); a30 and j29 were caught and fixed in r10.
#: First columns identify the scans. `orders` is a fact too (ADVICE
#: r10: the guard must catch a plan that broadcasts the orders scan —
#: same misplan class); legitimately pre-aggregated or id-pinned
#: orders subtrees pass via the _BOUND_NODES / bounded-id-filter
#: exemption that already applies to every fact.
_FACT_SCAN_COLS = ("l_orderkey", "event_id", "o_orderkey")

#: Queries allowed to broadcast an ORDERS-scan-rooted subtree. Unlike
#: lineitem/events (always over the 10 MB broadcast threshold at
#: sf0.1 — any broadcast of them is an estimate bug), orders sits
#: UNDER the threshold at the tested SF with honest FILE-SIZE stats,
#: so these broadcasts are size-driven decisions that demote to a
#: shuffle as the scan grows — scale-adaptive by construction, not
#: the a30 class (whose signature is a bogus PRODUCT estimate on a
#: join-output side). Each entry was read individually: the probe
#: side is the bigger lineitem fact, or the join type forces the
#: orders build (Q13-shape LEFT OUTER customer⟕orders can only build
#: right). The set is closed: a NEW query broadcasting orders fails
#: the sweep until a human adds it here with the same reading, and a
#: stale entry (no orders broadcast anymore) fails too.
_ORDERS_BROADCAST_OK = {
    "a10_journey_reagg",
    "a27_large_volume_orders",
    "a30_market_share",
    "j14_match_rate",
    "j18_shipping_priority",
    "j24_sole_late_supplier",
    "j27_customer_order_distribution",
    "j28_nation_trade_volume",
    "j29_local_supplier_volume",
    "j30_late_order_priorities",
    "j31_returned_item_customers",
    "j5_regional_volume",
    "j7_dedup_then_join",
    "o6_topn_revenue",
}
_BOUND_NODES = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "GlobalLimit",
    "TakeOrderedAndProject",
    "CollectLimit",
)


def broadcast_fact_builds(final: str) -> list[str]:
    """BroadcastExchange subtrees in an executed FINAL plan that bottom
    out in a fact-table scan with no bounding node (aggregate / limit /
    unique-id-pinning filter) in between — i.e. the plan is building a
    broadcast hash table out of the biggest relation in the query."""
    lines = final.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = _tree_depth(line)
        bound_depths: list[int] = []
        for below in lines[i + 1:]:
            bd = _tree_depth(below)
            if bd <= d:
                break
            while bound_depths and bd <= bound_depths[-1]:
                bound_depths.pop()
            if any(m in below for m in _BOUND_NODES) or (
                "Filter" in below and _BOUNDED_ID_FILTER.search(below)
            ):
                bound_depths.append(bd)
                continue
            if (
                not bound_depths
                and ("FileScan" in below or "Scan parquet" in below)
                and any(c in below for c in _FACT_SCAN_COLS)
            ):
                bad.append(below.strip()[:120])
                break
    return bad


@pytest.mark.slow
def test_sf01_executed_plans_smj_shj_allowlist(spark):
    """Execute EVERY registry query at sf0.1 and fail on any
    SortMergeJoin / ShuffledHashJoin in the FINAL adaptive plan that
    is not on the explicit allowlist above. This is the permanent
    form of the ad hoc sweep that caught a30 (r9) and j28 (r10):
    the misplan class — join-output probe sides whose
    product-of-children size estimate forces a static SMJ that AQE
    will not back-convert — produces no wrong answers and no test
    failure anywhere else; it only shows up as quiet 1.5-2x bench
    steps. Executed plans (noop sink), not explain: AQE finalizes
    join strategies only on execution. Also fails on STALE allowlist
    entries (listed but now SMJ-free) so the list stays tight."""
    unexpected: dict[str, tuple[int, int]] = {}
    seen_smj: set[str] = set()
    fact_builds: dict[str, list[str]] = {}
    stale_orders_ok: set[str] = set(_ORDERS_BROADCAST_OK)
    for name in ALL_QUERIES:
        df = REGISTRY[name].fn(spark, SF_LARGE)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("+- == Initial Plan ==")[0]
        smj = final.count("SortMergeJoin")
        shj = final.count("ShuffledHashJoin")
        if smj or shj:
            seen_smj.add(name)
            if name not in _SMJ_ALLOWED:
                unexpected[name] = (smj, shj)
        builds = broadcast_fact_builds(final)
        if name in _ORDERS_BROADCAST_OK:
            if any("o_orderkey" in b for b in builds):
                stale_orders_ok.discard(name)
            builds = [b for b in builds if "o_orderkey" not in b]
        if builds:
            fact_builds[name] = builds
    assert not stale_orders_ok, (
        "stale _ORDERS_BROADCAST_OK entries (no orders-scan broadcast "
        f"in their executed plans anymore — keep the list tight): "
        f"{sorted(stale_orders_ok)}"
    )
    assert not fact_builds, (
        "broadcast hash table built from a FACT scan — the build-side "
        "variant of the a30 misplan (a join-output dim side's product "
        "estimate beat the fact's): make the dim side a leaf "
        "(IN-list / literal CASE map like a30, j28, j29): "
        f"{fact_builds}"
    )
    assert not unexpected, (
        "sort-merge / shuffled-hash joins outside the allowlist — "
        "either a new intentional fact-fact shuffle (add it to "
        "_SMJ_ALLOWED with a reason AND to SCALE.md) or the "
        "a30/j28 static-estimate misplan class (fix it like a30: "
        "schema-bounded IN-list / join-free restatement): "
        f"{unexpected}"
    )
    stale = _SMJ_ALLOWED - seen_smj
    assert not stale, (
        "allowlist entries whose sf0.1 final plans are now SMJ/SHJ-"
        f"free — remove them to keep the gate tight: {sorted(stale)}"
    )
