"""Volume probes beyond sf0.1 for the dedup chain and ANN search.

The plan-hygiene suite proves the SHAPES are right (no cartesian, no
row UDFs, banded joins); this file proves the claims hold when data
actually grows: the full shingles → signatures → LSH pairs →
components chain runs at 5k and 50k docs, runtime grows ~linearly
(generous 3× slack per 10× data — a quadratic regression would blow
the bound by an order of magnitude), recall of planted duplicates
stays complete, and no keyed stage collapses to a single partition.

Why a synthetic corpus instead of replicating sf0.1 documents: the
testdata texts are word salads over a ~30-word vocabulary, so the
observed shingle universe is tiny and MinHash banding is dominated by
whichever near-universal shingle wins each permutation's min —
candidate-pair counts swing ~18× between hash realizations (measured:
18.8k vs 332k pairs for two alphabet-rotated copies of the SAME
corpus). Planted near-dups over md5-derived text blocks give a huge
shingle universe, Jaccard ≈ 0.8 partners whose band collision
probability is ~1 under ANY realization, and ~zero false candidates —
making pair counts, recall, and runtime all stable probe targets.
The ANN probes DO replicate sf0.1 embeddings (10×): vector hashing has
no such pathology. Measured figures live in SCALE.md §volume-probe.
"""

from __future__ import annotations

import time
from functools import reduce

import pytest

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators import dedup, similarity
from ad_data_pipelines_spark.plans import testdata_queries as tq

SF_LARGE = "/root/testdata/sf0.1"
REPLICAS = 10
OFFSET = 10_000_000


def _planted_corpus(spark, n_docs: int) -> DataFrame:
    """n_docs documents, consecutive even/odd ids planted as near-dup
    partners: six shared 32-hex-char blocks plus an 8-char differing
    tail — shingle Jaccard ≈ 0.93, so banded-MinHash collision
    probability is ≈ 1 (4 bands × 4 rows: 1-(1-0.93⁴)⁴ ≈ 0.995) under
    ANY hash realization; unrelated docs share nothing (J ≈ 0). Pure
    column expressions: generates distributed, no driver data."""
    grp = F.expr("id div 2").cast("string")
    blocks = [F.md5(F.concat(grp, F.lit(f"#b{j}"))) for j in range(6)]
    tail = F.substring(
        F.md5(F.concat(grp, F.lit("#tail"), (F.col("id") % 2).cast("string"))),
        1,
        8,
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *blocks, tail).alias("text"),
    )


def _run_dedup_chain(docs: DataFrame) -> tuple[int, int, str]:
    """shingles → signatures → LSH pairs → components; returns
    (n_pairs, n_cluster_members, physical pairs plan)."""
    sigs = dedup.minhash_signatures(docs, shingled=dedup.char_shingles(docs))
    pairs = dedup.lsh_candidate_pairs(sigs)
    pairs = pairs.persist()
    try:
        n_pairs = pairs.count()
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        comp = dedup.dup_components_from_pairs(
            pairs.filter(F.col("n_eq") >= 8)
        )
        n_members = comp.count()
    finally:
        pairs.unpersist()
    return n_pairs, n_members, plan


def test_dedup_chain_10x_linear_runtime_and_partitioning(spark):
    n_small, n_big = 5_000, 50_000

    t0 = time.perf_counter()
    small_pairs, small_members, _ = _run_dedup_chain(
        _planted_corpus(spark, n_small)
    )
    t1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    big_pairs, big_members, plan = _run_dedup_chain(
        _planted_corpus(spark, n_big)
    )
    t10 = time.perf_counter() - t0

    # recall + precision of the planted structure at both scales:
    # ~every partner pair is a candidate (J≈0.8 ⇒ band collision
    # probability ≈ 1), and false candidates are ~zero (J≈0)
    assert n_small // 2 * 0.95 <= small_pairs <= n_small // 2 * 1.1
    assert n_big // 2 * 0.95 <= big_pairs <= n_big // 2 * 1.1
    assert small_members >= n_small * 0.9  # both partners clustered
    assert big_members >= n_big * 0.9

    # runtime: 10× data in ≤ 3× per-unit cost (shared-sandbox slack);
    # a quadratic chain would land ~100× and fail by an order of
    # magnitude. Floor the base at 2 s so JVM noise can't fake a fail.
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"dedup chain 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — "
        "grows super-linearly"
    )

    # no keyed stage collapsed to one task: the band self-join and the
    # signature joins must all shuffle on hashpartitioning, never a
    # SinglePartition exchange (AQE may *coalesce*, which is fine)
    assert "SinglePartition" not in plan, plan


def _replicated_embeddings(spark, n: int = REPLICAS) -> DataFrame:
    base = tq.t(spark, SF_LARGE, "embeddings").select("vec_id", "embedding")
    reps = [
        base.select(
            (F.col("vec_id") + F.lit(i * OFFSET)).alias("vec_id"), "embedding"
        )
        for i in range(n)
    ]
    return reduce(DataFrame.unionByName, reps)


def test_lsh_ann_10x_bounded_and_complete(spark):
    queries = (
        tq.t(spark, SF_LARGE, "embeddings")
        .filter(F.col("vec_id") < 25)
        .select("vec_id", "embedding")
    )

    def run(corpus):
        t0 = time.perf_counter()
        buckets = similarity.lsh_bucket(corpus, n_planes=4)
        out = similarity.lsh_topk(
            corpus, queries, k=5, corpus_buckets=buckets
        )
        n = out.count()
        return n, time.perf_counter() - t0

    n1, t1 = run(_replicated_embeddings(spark, 1))
    n10, t10 = run(_replicated_embeddings(spark, REPLICAS))
    # every query keeps a full top-k at both scales
    assert n1 == 25 * 5 and n10 == 25 * 5
    assert t10 <= 3.0 * REPLICAS * max(t1, 2.0), (
        f"LSH ANN 10x runtime {t10:.1f}s vs 1x {t1:.1f}s"
    )


def test_ivf_ann_10x_bounded_and_complete(spark):
    queries = (
        tq.t(spark, SF_LARGE, "embeddings")
        .filter(F.col("vec_id") < 25)
        .select("vec_id", "embedding")
    )
    corpus = _replicated_embeddings(spark, REPLICAS)
    cells = similarity.ivf_cells(
        corpus,
        similarity.ivf_centroids(corpus, n_cells=4),
        "neighbor_id",
        "c_emb",
        1,
    )
    out = similarity.ivf_topk(
        corpus, queries, k=5, n_cells=4, nprobe=2, corpus_cells=cells
    )
    assert out.count() == 25 * 5


def test_lsh_band_join_skew_splits_under_aqe(spark):
    """SCALE.md's standing claim: a boilerplate-heavy band bucket (here
    1k near-identical docs, which collide into ONE bucket per band) is
    split by AQE skew-join handling rather than serializing one task.
    Thresholds are lowered to make the 1k-doc bucket 'skewed' at test
    scale; at 100 TB the default 256 MB threshold plays the same role.
    """
    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(base), F.col("id").cast("string")).alias("text"),
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        sigs = dedup.minhash_signatures(docs)
        pairs = dedup.lsh_candidate_pairs(sigs)
        # collect() (not count()) so the AQE-final plan lands on THIS
        # Dataset's QueryExecution — count() builds a separate one
        n = len(pairs.collect())
        assert n >= 1000 * 999 / 2 * 0.9  # near-identical: almost all-pairs
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "hot band bucket did not skew-split under AQE:\n" + plan
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _token_corpus(spark, n_docs: int) -> DataFrame:
    """n_docs docs of 8 tokens drawn from a 1000-token md5 vocabulary —
    realistic fan-in for LM/TF-IDF joins (each token/bigram reappears
    across many docs), generated distributed."""
    toks = [
        F.md5(((F.col("id") * 7 + F.lit(j)) % 1000).cast("string"))
        for j in range(8)
    ]
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *toks).alias("text"),
        (F.col("id") % 10).cast("string").alias("source"),
    )


def test_bigram_lm_and_tfidf_10x_linear(spark):
    """The LM train+score chain and the TF-IDF report both grow ~
    linearly in docs (the LM join fan-out is bounded by corpus bigram
    counts, TF-IDF by |vocab|x|groups|) and neither plan collapses any
    keyed stage to a single partition."""
    from ad_data_pipelines_spark.operators import lm, textstats

    def run(n):
        docs = _token_corpus(spark, n)
        t0 = time.perf_counter()
        scored = lm.bigram_lm_score(docs)
        assert scored.count() == n
        kw = textstats.tfidf_keywords(docs, "source", k=5)
        assert kw.count() == 50
        elapsed = time.perf_counter() - t0
        plan = scored._jdf.queryExecution().executedPlan().toString()
        return elapsed, plan

    t1, _ = run(5_000)
    t10, plan = run(50_000)
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"LM/TF-IDF 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — "
        "grows super-linearly"
    )
    # keyed stages stay hash-partitioned; the only SinglePartition
    # exchange allowed is the 1-row vocabulary-size scalar aggregate
    # (a broadcast-joined scalar MUST collapse — its partial agg is
    # still distributed)
    assert "hashpartitioning(doc_id" in plan, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_cooccurrence_and_zipf_10x_linear(spark):
    """PMI co-occurrence and the Zipf slope both grow ~linearly in docs
    (pair extraction is array-side so the pre-aggregation stage is
    narrow; aggregate fan-in is bounded by |vocab|² resp. |vocab|) and
    keyed stages stay hash-partitioned."""
    from ad_data_pipelines_spark.operators import corpusstats

    def run(n):
        docs = _token_corpus(spark, n).withColumn(
            "lang", (F.col("doc_id") % 5).cast("string")
        )
        t0 = time.perf_counter()
        top = corpusstats.cooccurrence_pmi(docs, min_pair=2, top_n=50)
        assert top.count() == 50
        z = corpusstats.zipf_slope(docs, top_n=100)
        assert z.count() == 5
        elapsed = time.perf_counter() - t0
        plan = top._jdf.queryExecution().executedPlan().toString()
        return elapsed, plan

    t1, _ = run(5_000)
    t10, plan = run(50_000)
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"PMI/Zipf 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — "
        "grows super-linearly"
    )
    # pair/unigram counts stay hash-partitioned; the only single-
    # partition stages are the two 1-row scalar totals and the final
    # top-N TakeOrdered
    assert "hashpartitioning(pair" in plan, plan
    assert plan.count("Exchange SinglePartition") <= 2, plan


def test_overlap_join_10x_explode_bound_and_linear(spark):
    """The interval-overlap join at 10× volume: the exploded interval
    row count respects ceil(span/width)+1 per interval, runtime grows
    ~linearly, and no keyed stage collapses to one partition."""
    import datetime as dt

    from ad_data_pipelines_spark.operators.intervals import (
        bucketed_intervals,
        overlap_join,
        width_micros,
    )

    T0 = dt.datetime(2024, 1, 1)

    def intervals(n, span_hours=30):
        # deterministic staggered intervals over ~90 days, 20 keys
        return spark.range(n).select(
            F.col("id").alias("iv_id"),
            (F.col("id") % 20).alias("k"),
            F.timestamp_seconds(
                F.lit(int(T0.timestamp())) + (F.col("id") % 2160) * 3600
            ).alias("a_start"),
            F.timestamp_seconds(
                F.lit(int(T0.timestamp()))
                + (F.col("id") % 2160) * 3600
                + span_hours * 3600
            ).alias("a_end"),
        )

    def run(n):
        left = intervals(n)
        right = (
            intervals(n // 4)
            .withColumnRenamed("iv_id", "b_id")
            .withColumnRenamed("a_start", "b_start")
            .withColumnRenamed("a_end", "b_end")
        )
        t0 = time.perf_counter()
        out = overlap_join(left, right, keys=["k"], bucket_width="1 week")
        cnt = out.count()
        elapsed = time.perf_counter() - t0
        return cnt, elapsed

    n1, t1 = run(2_000)
    n10, t10 = run(20_000)
    assert n10 > n1 > 0
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"overlap 10x runtime {t10:.1f}s vs 1x {t1:.1f}s"
    )

    # explode bound: ceil(span/width)+1 per interval (span 30h, 1w)
    import math

    w_us = width_micros("1 week")
    per_iv = math.ceil(30 * 3600 * 1e6 / w_us) + 1
    exploded = bucketed_intervals(
        intervals(20_000), "a_start", "a_end", "1 week"
    ).count()
    assert exploded <= 20_000 * per_iv


def test_dup_span_coverage_10x_linear_and_partitioned(spark):
    """The EXACTSUBSTR pass grows ~linearly in corpus size (position
    grams are ~n_chars/doc, the cross-doc test is a combinable
    min/max agg, islands are per-doc window state), keyed stages stay
    hash-partitioned, and the planted-pair corpus comes back with the
    expected high duplicated coverage (shared prefix blocks) while
    the differing tails stay uncovered."""
    from ad_data_pipelines_spark.operators import dedup

    def run(n):
        docs = _planted_corpus(spark, n)
        t0 = time.perf_counter()
        out = dedup.dup_span_coverage(docs, k=20)
        rows = out.count()
        elapsed = time.perf_counter() - t0
        assert rows == n
        return out, elapsed

    out1, t1 = run(2_000)
    out10, t10 = run(20_000)
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"dup-span 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — "
        "grows super-linearly"
    )
    # every doc shares its six 32-hex blocks with its planted partner:
    # coverage is high but NEVER total (the 8-char tail region differs)
    stats = out10.agg(
        F.min("dup_frac").alias("mn"), F.max("dup_frac").alias("mx")
    ).collect()[0]
    assert stats.mn > 0.8, stats
    assert stats.mx < 1.0, stats
    # presence asserts only, so search the WHOLE plan string. The gram
    # aggregate must hash-partition; the islands window must be KEYED
    # on doc_id but needs no exchange of its own here — the generated
    # corpus is already partitioned by doc_id (Range lineage), and
    # Spark satisfies the window's clustering without a shuffle, which
    # is exactly the co-location reuse the operator's docstring claims.
    plan = out10._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(gram" in plan, plan
    assert "windowspecdefinition(doc_id" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_prefix_jaccard_10x_complete_and_linear(spark):
    """The prefix-filtered set-similarity join stays ~linear when the
    corpus grows 10× (the planted corpus has a huge vocabulary, so
    prefix tokens are genuinely rare — df=2 — and the candidate join
    is pair-bounded) and finds EVERY planted partner pair (J=0.75 ≥
    0.5) with zero false positives (unrelated docs share no token)."""
    from ad_data_pipelines_spark.operators import dedup

    def run(n):
        docs = _planted_corpus(spark, n)
        t0 = time.perf_counter()
        out = dedup.prefix_jaccard_pairs(docs, threshold=0.5)
        pairs = out.count()
        elapsed = time.perf_counter() - t0
        return out, pairs, elapsed

    _, p1, t1 = run(2_000)
    out10, p10, t10 = run(20_000)
    assert p1 == 1_000 and p10 == 10_000  # exactly the planted pairs
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"prefix-jaccard 10x runtime {t10:.1f}s vs 1x {t1:.1f}s"
    )
    sample = out10.limit(5).collect()
    for r in sample:
        assert r.doc_b == r.doc_a + 1 and r.doc_a % 2 == 0
        assert r.jac == 0.75  # 6 shared of 8 union, exact


def test_star_cc_10x_round_count_and_exact_labels(spark):
    """Large-star/small-star connected components on the propagation
    worst case (length-100 chains): the round count is governed by
    component DIAMETER, not graph size — 10× more chains converge in
    the same number of rounds (measured: 8 at both 10k and 100k
    nodes), every label is exact, runtime stays ~linear, and no keyed
    stage collapses to a single partition."""
    def run(n):
        edges = spark.range(n).filter((F.col("id") % 100) != 99).select(
            F.col("id").alias("u"), (F.col("id") + 1).alias("v")
        )
        t0 = time.perf_counter()
        labels, rounds = dedup._cc_star_contraction(edges, 20)
        bad = labels.filter(
            F.col("component") != (F.col("doc_id") - F.col("doc_id") % 100)
        ).count()
        n_nodes = labels.count()
        plan = labels._jdf.queryExecution().executedPlan().toString()
        return rounds, bad, n_nodes, plan, time.perf_counter() - t0

    r1, bad1, nodes1, _, t1 = run(10_000)
    r10, bad10, nodes10, plan, t10 = run(100_000)
    assert bad1 == 0 and bad10 == 0
    assert nodes1 == 10_000 and nodes10 == 100_000
    assert r1 <= 12 and r10 <= r1 + 1, (r1, r10)
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"star CC 10x runtime {t10:.1f}s vs 1x {t1:.1f}s"
    )
    assert "SinglePartition" not in plan.split("+- == Initial Plan ==")[0]


def test_grid_knn_10x_linear_and_certified(spark):
    """Grid-KNN on 10× the points: runtime stays ~linear and the brute
    fallback stays a sliver (max_brute_frac=0.05 would raise
    otherwise) when `cell` matches the density — the 3×3 certificate
    resolves ~everything grid-side. Coordinates are deterministic
    hash-scattered ints; density is held constant as n grows (area
    scales with n), which is how a real catalog grows."""
    from ad_data_pipelines_spark.operators import geo

    def run(n):
        # ~n points in a sqrt(n*400)-sized square → ~4 right points
        # per 40-unit cell at every scale
        side = int((n * 1600) ** 0.5)
        pts = spark.range(n).select(
            F.col("id"),
            ((F.col("id") * 2654435761) % side).alias("x"),
            ((F.col("id") * 40503) % side).alias("y"),
        )
        left = pts.select(F.col("id").alias("lid"), "x", "y")
        right = pts.select(
            (F.col("id") + 10_000_000).alias("rid"),
            ((F.col("x") + 13) % side).alias("x"),
            ((F.col("y") + 7) % side).alias("y"),
        )
        t0 = time.perf_counter()
        out = geo.grid_knn_join(
            left, right, "lid", "rid", "x", "y", "x", "y",
            cell=120, max_brute_frac=0.05,
        )
        n_out = out.count()
        return n_out, time.perf_counter() - t0

    n1, t1 = run(5_000)
    n10, t10 = run(50_000)
    assert n1 == 5_000 and n10 == 50_000  # every left row resolved
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"grid-KNN 10x runtime {t10:.1f}s vs 1x {t1:.1f}s"
    )


def test_fuzzy_block_pricing_predicts_join_fanout(spark):
    """block_size_report's Σ n·(n−1)/2 is an EXACT price for the
    blocked pair join's fan-out: with the distance filter disabled,
    blocked_levenshtein_pairs emits exactly the predicted pair count
    on a skewed-block catalog, the report isolates the hot block that
    dominates the price, and a balanced 10× catalog (quadratic price
    ~flat per block) keeps runtime ~linear."""
    from ad_data_pipelines_spark.operators import fuzzy

    # skewed catalog: one hot block ("corp") with 200 names, 50 cold
    # blocks of 4 — Σ = 200·199/2 + 50·(4·3/2) = 19_900 + 300
    hot = spark.range(200).select(
        F.concat(F.lit("name"), F.col("id"), F.lit(" corp")).alias("name")
    )
    cold = spark.range(200).select(
        F.concat(
            F.lit("x"), F.col("id"),
            F.lit(" cold"), (F.col("id") % 50),
        ).alias("name")
    )
    catalog = hot.unionByName(cold)
    blk = fuzzy.last_word("text")  # block exprs bind to the operator-internal alias
    report = {
        r.blk: r.n_candidate_pairs
        for r in fuzzy.block_size_report(catalog, "name", blk).collect()
    }
    assert report["corp"] == 19_900
    assert sum(v for k, v in report.items() if k != "corp") == 300
    priced = sum(report.values())
    actual = fuzzy.blocked_levenshtein_pairs(
        catalog, "name", blk, max_dist=10_000, min_dist=0
    ).count()
    assert actual == priced  # pricing is exact, not an estimate

    # balanced scaling: 10× names across 10× blocks → per-block size
    # constant → priced work grows ~linearly, runtime follows
    def run(n):
        cat = spark.range(n).select(
            F.concat(
                F.lit("v"), F.col("id"),
                F.lit(" b"), (F.col("id") % (n // 8)),
            ).alias("name")
        )
        t0 = time.perf_counter()
        out = fuzzy.blocked_levenshtein_pairs(
            cat, "name", fuzzy.last_word("text"), max_dist=10_000,
            min_dist=0,
        ).count()
        return out, time.perf_counter() - t0

    p1, t1 = run(4_000)
    p10, t10 = run(40_000)
    assert p1 == 4_000 * 7 // 2 and p10 == 40_000 * 7 // 2
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"fuzzy blocked join 10x runtime {t10:.1f}s vs 1x {t1:.1f}s"
    )


def test_merge_broadcast_10x_target_linear(spark):
    """merge_plan's broadcast strategy scales with the TARGET scan,
    not the join: a fixed 1k-row change batch applied to 10× the
    target rows stays ~linear (the update/delete pass is map-side;
    only the projected key column of the target feeds the insert
    anti-join), and the result cardinality is exact at both scales."""
    from ad_data_pipelines_spark.operators import merge as M

    changes = spark.range(1_000).select(
        (F.col("id") * 7).alias("k"),         # hits every 7th key
        (F.col("id") + 1_000_000).alias("payload"),
        F.when(F.col("id") % 5 == 0, "D").otherwise("U").alias("op"),
    )

    def run(n):
        target = spark.range(n).select(
            F.col("id").alias("k"), F.col("id").alias("payload")
        )
        t0 = time.perf_counter()
        out = M.merge_plan(target, changes, ["k"], op_col="op")
        n_out = out.count()
        return n_out, time.perf_counter() - t0

    # keys 0..6993 step 7; deletes are ids ≡ 0 (mod 5) → 200 of 1000
    n1, t1 = run(100_000)
    n10, t10 = run(1_000_000)
    assert n1 == 100_000 - 200 and n10 == 1_000_000 - 200
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"merge broadcast 10x runtime {t10:.1f}s vs 1x {t1:.1f}s"
    )


def test_star_cc_raises_on_max_iter_exhaustion(spark):
    """An unconverged star contraction can leave a node with multiple
    labels (the final join would fan out); the operator must fail
    loudly, not return silently-wrong clusters. max_iter=1 can never
    confirm the fixpoint, so any edge set raises."""
    edges = spark.range(50).filter(F.col("id") < 49).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup._cc_star_contraction(edges, 1)


def test_merge_10x_both_sides_linear_and_no_wide_target_shuffle(
    spark, tmp_path
):
    """10× change batch against a 10× parquet target under the default
    broadcast strategy: runtime stays ~linear, and NO exchange in the
    physical plan carries the target's wide rows — every
    hashpartitioning exchange's subtree bottoms out at the KEY-pruned
    target scan (ReadSchema struct<k:bigint>) or the tiny change
    batch; the wide scan feeds the update BroadcastHashJoin directly.
    This is the merge contract at 100 TB: updates/deletes are
    map-side, inserts shuffle one projected key column."""
    from ad_data_pipelines_spark.operators import merge as M

    def run(n):
        tdir = str(tmp_path / f"target_{n}")
        spark.range(n).select(
            F.col("id").alias("k"),
            F.col("id").alias("p1"),
            (F.col("id") * 2).alias("p2"),
            F.md5(F.col("id").cast("string")).alias("p3"),
        ).write.parquet(tdir)
        target = spark.read.parquet(tdir)
        changes = spark.range(n // 10).select(
            (F.col("id") * 7).alias("k"),
            (F.col("id") + 1).alias("p1"),
            F.when(F.col("id") % 5 == 0, "D").otherwise("U").alias("op"),
        )
        t0 = time.perf_counter()
        out = M.merge_plan(target, changes, ["k"], op_col="op")
        n_out = out.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
        return n_out, plan, time.perf_counter() - t0

    def wide_cols_below_exchange(plan):
        """FileScan ReadSchemas reachable from a hashpartitioning
        exchange without crossing an aggregate/broadcast boundary."""
        final = plan.split("+- == Initial Plan ==")[0]
        lines = final.splitlines()
        schemas = []
        for i, line in enumerate(lines):
            if "Exchange hashpartitioning" not in line:
                continue
            for below in lines[i + 1:]:
                if "BroadcastExchange" in below or "HashAggregate" in below:
                    break
                if "ReadSchema" in below or "FileScan" in below:
                    schemas.append(below)
                    break
        return [s for s in schemas if "p3" in s or "p2" in s]

    n1, plan1, t1 = run(100_000)
    n10, plan10, t10 = run(1_000_000)
    # deletes: change ids ≡ 0 (mod 5) whose key lands inside the target
    assert n1 == 100_000 - 2_000 and n10 == 1_000_000 - 20_000
    for plan in (plan1, plan10):
        assert "BroadcastHashJoin" in plan
        assert not wide_cols_below_exchange(plan), plan
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"merge 10x-both-sides runtime {t10:.1f}s vs 1x {t1:.1f}s"
    )


def test_merge_hot_key_batch_bounded_collapse_and_sortmerge_path(spark):
    """A pathologically hot change feed (50% of 1M events on ONE key)
    cannot skew the merge: (1) latest_change_per_key's rank-1 filter
    plans a PARTIAL WindowGroupLimit BEFORE the exchange, so the hot
    key ships at most one row per map partition into the shuffle —
    collapse output is exact (max-seq event wins); (2) the collapsed
    batch is unique per key BY CONSTRUCTION, so the
    broadcast_changes=False sort-merge full-outer join has no
    fan-out-capable key on either side — per-partition weight is
    bounded by distinct-key count, the shape AQE rebalances freely.
    The skew surface of a keyed MERGE is the collapse window, and it
    is map-side bounded."""
    from ad_data_pipelines_spark.operators import merge as M

    hot = spark.range(1_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("payload"),
        F.col("id").alias("seq"),
    )
    t0 = time.perf_counter()
    collapsed = M.latest_change_per_key(hot, ["k"], "seq")
    plan = collapsed._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan
    rows = {r.k: r.payload for r in collapsed.collect()}
    t_collapse = time.perf_counter() - t0
    # hot key 0: evens 0..999998 → max seq 999998 wins; 500_000 odd
    # singleton keys survive untouched
    assert rows[0] == 999_998 and len(rows) == 500_001

    target = spark.range(2_000_000).select(
        F.col("id").alias("k"), F.lit(-1).alias("payload")
    )
    t0 = time.perf_counter()
    out = M.merge_plan(
        target,
        collapsed.drop("seq"),
        ["k"],
        broadcast_changes=False,
    )
    n_out = out.count()
    t_merge = time.perf_counter() - t0
    assert n_out == 2_000_000  # pure upserts of existing keys
    jplan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in jplan or "ShuffledHashJoin" in jplan, jplan
    # bounded-time sanity on the hot feed (not a tight benchmark)
    assert t_collapse < 60 and t_merge < 120, (t_collapse, t_merge)


def test_pagerank_10x_linear_and_partitioned(spark):
    """PageRank on a 10× random graph: runtime stays ~linear (each
    iteration is one equi-join + one combinable aggregate — anything
    super-linear means the rank state or edges stopped hash-
    partitioning), results stay deterministic, and no keyed stage
    collapses to one partition. Iteration count is FIXED, so total
    work is iterations × O(E)."""
    from ad_data_pipelines_spark.operators import graph

    def ring_graph(n):
        # ring + chords: every node outdeg 2, connected, skew-free
        return spark.range(n).selectExpr(
            "concat('n', id) AS src",
            "concat('n', (id + 1) % {n}) AS dst".format(n=n),
        ).unionByName(
            spark.range(n).selectExpr(
                "concat('n', id) AS src",
                "concat('n', (id * 7 + 3) % {n}) AS dst".format(n=n),
            )
        )

    n_small, n_big = 3_000, 30_000
    t0 = time.perf_counter()
    small = graph.pagerank(ring_graph(n_small), iterations=5)
    n1 = small.count()
    t1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    big_df = graph.pagerank(ring_graph(n_big), iterations=5)
    n10 = big_df.count()
    t10 = time.perf_counter() - t0

    assert n1 == n_small and n10 == n_big
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"pagerank 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — "
        "grows super-linearly"
    )
    # (no partition-count assert here: AQE rightly coalesces ~30k
    # 2-long rows to few partitions; the registry plan's no-single-
    # partition-collapse discipline is enforced by test_plan_hygiene)
    # mass conservation sanity at scale: Σ rank ≤ scale, > 99%
    total = big_df.agg(F.sum("rank_fp")).collect()[0][0]
    assert 0.99 * 10**12 < total <= 10**12


def test_label_propagation_10x_linear(spark):
    """Label propagation on a 10× graph of disjoint 4-cliques: runtime
    stays ~linear (each half-step is one equi-join + one combinable
    count + a degree-bounded window), every clique resolves to its own
    community (min member id), and the label count equals the clique
    count — structure verified at scale, not just timing."""
    from ad_data_pipelines_spark.operators import graph

    def cliques(n_cliques):
        # nodes 4k..4k+3 fully connected within each clique
        base = spark.range(n_cliques * 12).selectExpr(
            "id DIV 12 AS q", "(id % 12) DIV 3 AS a", "id % 3 AS o"
        )
        return base.selectExpr(
            "q * 4 + a AS src",
            # the 3 other members of the clique
            "q * 4 + (a + o + 1) % 4 AS dst",
        )

    n_small, n_big = 500, 5_000
    t0 = time.perf_counter()
    small = graph.label_propagation(cliques(n_small), iterations=3)
    k1 = small.select("label").distinct().count()
    t1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    big = graph.label_propagation(cliques(n_big), iterations=3)
    k10 = big.select("label").distinct().count()
    t10 = time.perf_counter() - t0

    assert k1 == n_small and k10 == n_big  # one community per clique
    # every community label is its clique's min node id (4q)
    bad = big.filter(F.col("label") % 4 != 0).count()
    assert bad == 0
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"label_propagation 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — "
        "grows super-linearly"
    )


def test_k_core_10x_linear_and_structure(spark):
    """k-core peeling on a 10× graph: runtime stays ~linear (per round
    two semi-joins + one combinable count; survivor state one long per
    node) and the structure is exact at scale — a graph of disjoint
    K5s with pendant chains keeps EXACTLY the K5 cores (deg 4) and
    peels every chain node."""
    from ad_data_pipelines_spark.operators import graph

    def k5_with_tails(n_blocks):
        # block b: nodes 8b..8b+4 are K5; 8b+5..8b+7 a pendant chain
        base = spark.range(n_blocks * 20).selectExpr(
            "id DIV 20 AS b", "(id % 20) DIV 4 AS a", "id % 4 AS o"
        )
        k5 = base.selectExpr(
            "b * 8 + a AS src",
            "b * 8 + (a + o + 1) % 5 AS dst",
        )
        chain = spark.range(n_blocks * 3).selectExpr(
            "(id DIV 3) * 8 + 4 + id % 3 AS src",
            "(id DIV 3) * 8 + 5 + id % 3 AS dst",
        )
        return k5.unionByName(chain).unionByName(
            k5.selectExpr("dst AS src", "src AS dst")
        ).unionByName(chain.selectExpr("dst AS src", "src AS dst"))

    n_small, n_big = 300, 3_000
    t0 = time.perf_counter()
    small = graph.k_core(k5_with_tails(n_small), k=3, rounds=4)
    c1 = small.count()
    t1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    big = graph.k_core(k5_with_tails(n_big), k=3, rounds=4)
    c10 = big.count()
    t10 = time.perf_counter() - t0

    assert c1 == 5 * n_small and c10 == 5 * n_big
    assert big.filter(F.col("deg") != 4).count() == 0  # exact K5 cores
    assert big.filter(F.col("node") % 8 > 4).count() == 0  # tails gone
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"k_core 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — "
        "grows super-linearly"
    )


def test_triangle_count_10x_linear_and_hub_safe(spark):
    """Triangle counting on a 10× graph with a GLOBAL HUB: the
    degree-ordered orientation keeps the hub's wedge fan-out bounded
    (the hub ranks highest, so it originates NO wedges — naive
    id-ordering would square its degree), runtime stays ~linear, and
    counts are exact at scale: ring node = 1 hub triangle per incident
    ring edge x2, hub = n ring triangles."""
    from ad_data_pipelines_spark.operators import graph

    def wheel(n):
        # node n is the hub of an n-ring (wheel graph W_n)
        ring = spark.range(n).selectExpr(
            "id AS src", f"(id + 1) % {n} AS dst"
        )
        spokes = spark.range(n).selectExpr(f"{n}L AS src", "id AS dst")
        return ring.unionByName(spokes)

    n_small, n_big = 2_000, 20_000
    t0 = time.perf_counter()
    small = graph.triangle_count(wheel(n_small))
    s = {r.node: r.triangles for r in small.collect()}
    t1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    big = graph.triangle_count(wheel(n_big))
    hub = big.filter(F.col("node") == n_big).collect()[0].triangles
    wrong_rim = big.filter(
        (F.col("node") != n_big) & (F.col("triangles") != 2)
    ).count()
    t10 = time.perf_counter() - t0

    assert s[n_small] == n_small and hub == n_big  # hub in every ring tri
    assert wrong_rim == 0  # every rim node in exactly 2 triangles
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"triangle_count 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — "
        "grows super-linearly"
    )


def test_coreness_10x_linear_and_structure(spark):
    """Coreness h-index iteration on a 10× graph of disjoint K5s with
    pendant chains: exact at scale (K5 members coreness 4, chain nodes
    1) and ~linear — per round one equi-join + one degree-bounded
    window + one combinable max."""
    from ad_data_pipelines_spark.operators import graph

    def k5_with_tails(n_blocks):
        base = spark.range(n_blocks * 20).selectExpr(
            "id DIV 20 AS b", "(id % 20) DIV 4 AS a", "id % 4 AS o"
        )
        k5 = base.selectExpr(
            "b * 8 + a AS src",
            "b * 8 + (a + o + 1) % 5 AS dst",
        )
        chain = spark.range(n_blocks * 3).selectExpr(
            "(id DIV 3) * 8 + 4 + id % 3 AS src",
            "(id DIV 3) * 8 + 5 + id % 3 AS dst",
        )
        return k5.unionByName(chain)

    n_small, n_big = 300, 3_000
    t0 = time.perf_counter()
    small = graph.coreness(k5_with_tails(n_small), rounds=4)
    c1 = small.count()
    t1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    big = graph.coreness(k5_with_tails(n_big), rounds=4)
    c10 = big.count()
    t10 = time.perf_counter() - t0

    assert c1 == 8 * n_small and c10 == 8 * n_big
    # K5 members (node % 8 <= 4) coreness 4; chain nodes coreness 1
    assert big.filter(
        (F.col("node") % 8 <= 4) & (F.col("coreness") != 4)
    ).count() == 0
    assert big.filter(
        (F.col("node") % 8 > 4) & (F.col("coreness") != 1)
    ).count() == 0
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"coreness 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — "
        "grows super-linearly"
    )


def test_k_truss_10x_linear_and_structure(spark):
    """k-truss peeling on a 10× triangle-chain graph with pendant
    noise: structure exact at both scales (the 3-truss keeps exactly
    the triangle edges, pendants peel), runtime ~linear in edges —
    the per-round triangle enumeration reuses the degree-ordered
    orientation whose wedge fan-out is O(sqrt m), so scaling node
    count 10x must not scale wedge work 100x."""
    from ad_data_pipelines_spark.operators import graph

    def tri_chain(n):
        # n triangles (3i, 3i+1, 3i+2) chained by bridge edges and a
        # pendant hanging off every triangle — triangles survive k=3,
        # bridges and pendants peel
        base = spark.range(n)
        tri = (
            base.selectExpr("id*4 AS src", "id*4+1 AS dst")
            .unionByName(base.selectExpr("id*4+1 AS src", "id*4+2 AS dst"))
            .unionByName(base.selectExpr("id*4 AS src", "id*4+2 AS dst"))
        )
        noise = base.selectExpr("id*4+2 AS src", "id*4+3 AS dst").unionByName(
            base.filter(f"id < {n - 1}").selectExpr(
                "id*4+2 AS src", "(id+1)*4 AS dst"
            )
        )
        return tri.unionByName(noise)

    n_small, n_big = 1_000, 10_000
    t0 = time.perf_counter()
    small = graph.k_truss(tri_chain(n_small), k=3, rounds=2)
    assert small.count() == 3 * n_small  # exactly the triangle edges
    t1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    big = graph.k_truss(tri_chain(n_big), k=3, rounds=2)
    assert big.count() == 3 * n_big
    # no pendant node (id%4==3) survives in any edge
    assert big.filter("u % 4 = 3 OR v % 4 = 3").count() == 0
    t10 = time.perf_counter() - t0

    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"k_truss 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — "
        "grows super-linearly"
    )


def test_neighborhood_function_10x_linear_and_exact(spark):
    """ANF at 10× nodes: a ring's d-hop reach is the closed form
    2d+1 for EVERY node at EVERY scale (sparse-regime HLL is exact
    here), and runtime stays ~linear — the sketch state is constant
    per node, so scaling nodes 10× scales work 10×, where the exact
    pair materialization would scale the state quadratically on
    denser graphs (that asymmetry is the operator's reason to
    exist)."""
    from ad_data_pipelines_spark.operators import graph

    def ring(n):
        return spark.range(n).selectExpr(
            "id AS src", f"(id + 1) % {n} AS dst"
        )

    n_small, n_big, d = 2_000, 20_000, 3
    t0 = time.perf_counter()
    small = graph.neighborhood_function(ring(n_small), d=d)
    wrong = small.filter(F.col("reach_est") != 2 * d + 1).count()
    t1 = time.perf_counter() - t0
    assert wrong == 0

    t0 = time.perf_counter()
    big = graph.neighborhood_function(ring(n_big), d=d)
    wrong_big = big.filter(F.col("reach_est") != 2 * d + 1).count()
    t10 = time.perf_counter() - t0
    assert wrong_big == 0
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"neighborhood_function 10x runtime {t10:.1f}s vs 1x {t1:.1f}s"
    )


def test_sssp_10x_linear_and_exact(spark):
    """Fixed-round SSSP at 10× nodes: on a symmetric ring seeded at
    every 10th node, the closed-form distance to the nearest seed is
    min(v mod 10, 10 − v mod 10) ≤ 5 — exact at EVERY scale with
    rounds=5 — and runtime stays ~linear (per round one equi-join of
    the (node, BIGINT) state + one combinable MIN; anything
    super-linear means the state stopped hash-partitioning)."""
    from ad_data_pipelines_spark.operators import graph

    def ring(n):
        fwd = spark.range(n).selectExpr(
            "id AS src", f"(id + 1) % {n} AS dst"
        )
        return fwd.unionByName(fwd.selectExpr("dst AS src", "src AS dst"))

    def seeds(n):
        return spark.range(0, n, 10).selectExpr("id AS node")

    def run(n):
        t0 = time.perf_counter()
        out = graph.sssp(ring(n), seeds(n), rounds=5)
        wrong = out.filter(
            F.col("dist")
            != F.least(F.col("node") % 10, 10 - F.col("node") % 10)
        ).count()
        n_rows = out.count()
        return wrong, n_rows, time.perf_counter() - t0

    n_small, n_big = 3_000, 30_000
    wrong1, rows1, t1 = run(n_small)
    assert wrong1 == 0 and rows1 == n_small
    wrong10, rows10, t10 = run(n_big)
    assert wrong10 == 0 and rows10 == n_big
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"sssp 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — grows "
        "super-linearly"
    )


def test_sssp_per_seed_10x_linear_and_exact(spark):
    """Landmark mode (per_seed=True) at 10× nodes: on a symmetric ring
    with FOUR fixed landmarks (0, n/4, n/2, 3n/4 — the landmark-count-
    is-constant contract), the per-landmark closed form is dist(L, v) =
    min ring distance ≤ rounds, so the output is exactly 4 × 11 rows at
    ANY scale (5 hops each way + the landmark itself); runtime stays
    ~linear in the edge count (the relax join scans edges once per
    round; the per-seed key widening must not change the growth
    rate)."""
    from ad_data_pipelines_spark.operators import graph

    def ring(n):
        fwd = spark.range(n).selectExpr(
            "id AS src", f"(id + 1) % {n} AS dst"
        )
        return fwd.unionByName(fwd.selectExpr("dst AS src", "src AS dst"))

    def run(n):
        marks = [0, n // 4, n // 2, 3 * n // 4]
        seeds = spark.createDataFrame(
            [(m,) for m in marks], "node bigint"
        )
        t0 = time.perf_counter()
        out = graph.sssp(ring(n), seeds, rounds=5, per_seed=True)
        rows = [tuple(r) for r in out.collect()]
        el = time.perf_counter() - t0
        want = set()
        for m in marks:
            for d in range(6):
                want.add((m, (m + d) % n, d))
                want.add((m, (m - d) % n, d))
        assert set(rows) == want, n
        assert len(rows) == 4 * 11, n
        return el

    t1 = run(3_000)
    t10 = run(30_000)
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"per-seed sssp 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — grows "
        "super-linearly"
    )


def test_shingles_stage_10x_linear_and_no_shuffle(spark):
    """The shingles shared stage (char_shingles over documents — the
    most expensive shared-stage build at sf0.1) at 10× generated docs:
    output rows scale exactly with input (per-doc distinct shingles of
    fixed-length texts), runtime stays ~linear, the keyed output does
    not collapse to one partition, and the plan contains NO exchange —
    per-doc array_distinct before explode is the whole point (a global
    distinct here would be the biggest avoidable shuffle of the dedup
    pipeline at 100 TB)."""
    def docs(n):
        # ~200-char md5-block texts, all distinct content
        blocks = [
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f"#p{j}")))
            for j in range(6)
        ]
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *blocks).alias("text"),
        )

    def run(n):
        t0 = time.perf_counter()
        sh = dedup.char_shingles(docs(n))
        rows = sh.count()
        return rows, sh, time.perf_counter() - t0

    n_small, n_big = 5_000, 50_000
    rows1, _, t1 = run(n_small)
    rows10, big, t10 = run(n_big)
    # per-doc array_distinct varies by a few duplicate shingles in
    # the md5 text blocks, so 10x docs is 10x rows within a hair
    assert 9.9 * rows1 <= rows10 <= 10.1 * rows1
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"shingles 10x runtime {t10:.1f}s vs 1x {t1:.1f}s"
    )
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("+- == Initial Plan ==")[0], (
        "the shingle stage must stay shuffle-free (per-doc "
        "array_distinct before explode)"
    )
    assert big.rdd.getNumPartitions() > 1


def test_trade_edges_stage_10x_linear_and_partitioned(spark):
    """The trade_edges shared stage shape (orders⋈lineitem → one
    dedup+weight aggregate → both orientations → degree join-back;
    the second most expensive shared build at sf0.1) on generated
    10× facts: edge count is governed by the DISTINCT pair universe,
    weights conserve the joined row count exactly (Σw over one
    orientation == joined rows), runtime stays ~linear, and the keyed
    aggregate does not collapse to one partition."""
    from ad_data_pipelines_spark.plans.testdata_queries import (
        trade_edges_build,
    )

    def facts(n_orders):
        o = spark.range(n_orders).selectExpr(
            "id AS o_orderkey",
            f"id % {max(n_orders // 10, 7)} AS o_custkey",
        )
        li = spark.range(4 * n_orders).selectExpr(
            f"id % {n_orders} AS l_orderkey",
            f"(id * 7919) % {max(n_orders // 100, 5)} AS l_suppkey",
        )
        return o, li

    def run(n_orders):
        o, li = facts(n_orders)
        t0 = time.perf_counter()
        e = trade_edges_build(o, li)
        n_edges = e.count()
        wsum = (
            e.filter(F.col("src") % 2 == 0)
            .agg(F.sum("w"))
            .collect()[0][0]
        )
        return n_edges, wsum, e, time.perf_counter() - t0

    n_small, n_big = 20_000, 200_000
    edges1, wsum1, _, t1 = run(n_small)
    edges10, wsum10, big, t10 = run(n_big)
    # weight conservation: every joined (order, lineitem) row lands in
    # exactly one customer-orientation edge's weight
    assert wsum1 == 4 * n_small and wsum10 == 4 * n_big
    assert edges1 > 0 and edges10 > 0
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"trade_edges 10x runtime {t10:.1f}s vs 1x {t1:.1f}s"
    )
    # (no partition-count assert: AQE rightly coalesces the 5-column
    # edge rows to few partitions at this volume; the registry plans'
    # no-single-partition-collapse discipline is enforced by
    # test_plan_hygiene, the pagerank-probe precedent)


def test_hits_10x_linear_and_structure(spark):
    """HITS volume probe: a generated directed graph with a planted
    super-authority runs at 1x and 10x edges — per-unit cost <= 3x
    (each iteration is two state-join + combinable-agg half-steps, so
    anything super-linear means a join degenerated), and the planted
    structure (node 1 receives an edge from every 17th source) stays
    the top authority at both scales."""
    from ad_data_pipelines_spark.operators import graph

    def build(n_edges: int):
        n_nodes = max(n_edges // 8, 100)
        base = spark.range(n_edges).select(
            ((F.col("id") * 13 + 5) % n_nodes).alias("src"),
            ((F.col("id") * 29 + 1) % n_nodes).alias("dst"),
        )
        planted = spark.range(n_edges // 17).select(
            ((F.col("id") * 17 + 3) % n_nodes).alias("src"),
            F.lit(1).cast("bigint").alias("dst"),
        )
        return base.unionByName(planted).filter(F.col("src") != F.col("dst"))

    def run(n_edges: int):
        t0 = time.perf_counter()
        hs = graph.hits(build(n_edges), iterations=6)
        top = (
            hs.filter(F.col("side") == "auth")
            .orderBy(F.desc("score_fp"), "node")
            .limit(1)
            .collect()[0]
        )
        return top.node, time.perf_counter() - t0

    top1, t1 = run(50_000)
    top10, t10 = run(500_000)
    assert top1 == 1 and top10 == 1
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"hits 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — super-linear"
    )


def test_kmeans_fp_10x_linear_and_structure(spark):
    """Deterministic Lloyd trainer at 10× the vectors: a planted
    8-blob corpus (blob axis = vec_id % 8, seeds 0..7 land one per
    blob) must classify membership EXACTLY at both scales — n/8
    members per cell, each centroid's dominant axis its blob's — and
    per-unit runtime must stay within 3× (the per-iteration work is
    one cached-corpus pass + a K×dim driver collect; anything
    super-linear here would be a recompute or an unpersisted
    re-quantization)."""
    import time

    from ad_data_pipelines_spark.operators import similarity

    dim, k = 16, 8

    def build(n: int):
        cell = (F.col("id") % k).cast("int")
        # noise in [0, 0.1) per (id, dim) from md5 — deterministic,
        # engine-free generation; blob axis gets 0.8 + noise
        dims = [
            (
                F.when(cell == d, F.lit(0.8)).otherwise(F.lit(0.0))
                + F.expr(
                    f"conv(substring(md5(concat(id, '_', {d})), 1, 4), "
                    "16, 10)"
                ).cast("double")
                / 655360.0
            ).alias(f"d{d}")
            for d in range(dim)
        ]
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*dims).alias("embedding"),
        )

    def run(n: int):
        t0 = time.perf_counter()
        out = {
            r.cell_id: (r.n_members, list(r.centroid_fp))
            for r in similarity.kmeans_fp(
                build(n), n_cells=k, iterations=3
            ).collect()
        }
        return out, time.perf_counter() - t0

    out1, t1 = run(20_000)
    out10, t10 = run(200_000)
    for n, out in ((20_000, out1), (200_000, out10)):
        assert sorted(v[0] for v in out.values()) == [n // k] * k
        for j, (_, cent) in out.items():
            assert max(range(dim), key=lambda d: cent[d]) == j
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"kmeans 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — super-linear"
    )


def test_dsir_and_bm25_10x_linear_and_partitioned(spark):
    """The round-14 retrieval/targeting family grows ~linearly in
    docs: DSIR fit+score+Gumbel-select (model bounded by n_features,
    selection a TakeOrdered) and batch BM25 (term-filtered explode,
    broadcast stats/idf/query expansion, per-query window over
    bounded candidates). No sort-merge join or Cartesian product
    anywhere; the only SinglePartition exchange is the 1-row
    totals scalar. (Over a range source Spark even elides the
    per-doc score exchange — RangePartitioning(id) already satisfies
    the doc_id grouping; a parquet source gets the ordinary
    hash-partitioned aggregate, as the registry plan lint shows.)"""
    import hashlib

    from ad_data_pipelines_spark.operators import classify, retrieval, sampling

    def run(n):
        docs = _token_corpus(spark, n)
        # ~10% of sources form the target domain
        target = docs.filter(F.col("source") == "0")
        raw = docs.filter(F.col("source") != "0")
        t0 = time.perf_counter()
        scored = classify.dsir_weights(raw, target, n_features=1024)
        sel = sampling.gumbel_topk_sample(
            scored, F.col("log_w"), k=50, key="doc_id"
        )
        assert sel.count() == 50
        # query terms from the md5 vocabulary (present by construction,
        # each in ~n/125 docs)
        q = [
            (0, [hashlib.md5(b"1").hexdigest(), hashlib.md5(b"2").hexdigest()]),
            (1, [hashlib.md5(b"3").hexdigest()]),
            (2, [hashlib.md5(b"2").hexdigest(), hashlib.md5(b"4").hexdigest()]),
        ]
        bm = retrieval.bm25_batch_topk(docs, q, k=20)
        assert bm.count() == 60  # 3 queries x k
        elapsed = time.perf_counter() - t0
        plan = scored._jdf.queryExecution().executedPlan().toString()
        return elapsed, plan

    t1, _ = run(5_000)
    t10, plan = run(50_000)
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"DSIR/BM25 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — "
        "grows super-linearly"
    )
    final = plan.split("+- == Initial Plan ==")[0]
    assert "SortMergeJoin" not in final and "CartesianProduct" not in final
    assert final.count("Exchange SinglePartition") <= 1, final
