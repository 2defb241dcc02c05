"""10× volume probe for the END-TO-END curation DAG (r11 verdict #1).

The transit pipelines got the SCALE.md treatment in r10-r11; this file
gives `jobs/curate_corpus.curate` the same: a generated corpus with
PLANTED structure runs the full waterfall (normalize → quality →
MinHash/LSH/CC dedup → bloom decontam → temperature mix → pack →
parquet writes) at 1× and 10×, and the probe asserts

  * per-unit cost ≤ 3× at 10× the docs (a quadratic stage would blow
    the bound by an order of magnitude),
  * EXHAUSTIVE/DISJOINT keep+drop accounting: every stage's count is a
    subset of the previous stage's (monotone waterfall), the planted
    drops land in the right stage (short docs die at quality — exact;
    near-dup odd partners die at dedup — banded-LSH bound; the eval
    source and its gram-sharing plants die at decontam — bloom's
    no-false-negative guarantee makes the planted part exact),
  * the WRITTEN outputs agree with the stats: curated doc_ids are
    unique, a subset of the input, exactly n_curated rows; the packing
    table covers exactly the curated docs and its sequence ids are
    contiguous from 0 (n_sequences total).

Corpus construction (pure column expressions, generated distributed):
  * ids ≡ 0 (mod 7): SHORT docs (8 four-char tokens) — the quality
    gate's n_tokens ∈ [50, 100000] band drops them, deterministically;
  * all other ids: 14 md5 blocks → 112 four-char tokens keyed by the
    PAIR id (id div 2) plus an 8-token tail keyed by the doc, so the
    even/odd partners that BOTH survive quality are near-dup pairs
    (char-shingle J ≈ 0.9) and dedup keeps the even (min-id) one;
  * ids ≡ 0 and ≡ 4 (mod 10) swap block 0 for a CENTURY-shared block
    (key id div 100): source s0 is the held-out eval set, so every
    surviving s4 doc in a century that still has a surviving s0 doc
    shares a word-8-gram run with the eval set and MUST be
    bloom-flagged (no false negatives).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ad_data_pipelines_spark.jobs.curate_corpus import curate


def _curation_corpus(spark, n_docs: int) -> DataFrame:
    pair = F.expr("id div 2").cast("string")
    century = F.expr("id div 100").cast("string")
    shared0 = F.md5(F.concat(F.lit("shared#"), century))
    own0 = F.md5(F.concat(pair, F.lit("#b0")))
    b0 = F.when((F.col("id") % 10).isin(0, 4), shared0).otherwise(own0)
    blocks = [b0] + [
        F.md5(F.concat(pair, F.lit(f"#b{j}"))) for j in range(1, 14)
    ]
    tail = F.md5(F.concat(F.col("id").cast("string"), F.lit("#tail")))
    # each 32-hex block becomes 8 four-char tokens
    spaced = [
        F.rtrim(F.regexp_replace(b, "(....)", "$1 ")) for b in blocks + [tail]
    ]
    long_text = F.concat_ws(" ", *spaced)
    short_text = F.rtrim(F.regexp_replace(tail, "(....)", "$1 "))
    langs = ["en", "de", "zh", "fr", "es"]
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 7 == 0, short_text)
        .otherwise(long_text)
        .alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in langs]),
            (F.col("id") % len(langs) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("s"), (F.col("id") % 10).cast("string")).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text"))


def _run(spark, tmp_path, n: int) -> tuple[dict, dict, float, str]:
    docs = _curation_corpus(spark, n)
    stage: dict[str, float] = {}
    out = str(tmp_path / f"curated_{n}")
    t0 = time.perf_counter()
    stats = curate(
        spark,
        docs,
        out,
        budget=n // 4,
        eval_source="s0",
        decontam="bloom",
        seq_tokens=512,
        stage_timings=stage,
    )
    return stats, stage, time.perf_counter() - t0, out


@pytest.mark.slow
def test_curate_corpus_10x_linear_and_accounted(spark, tmp_path):
    n_small, n_big = 1_500, 15_000

    stats1, stage1, t1, out1 = _run(spark, tmp_path, n_small)
    stats10, stage10, t10, out10 = _run(spark, tmp_path, n_big)

    # --- per-unit cost: 10× docs in ≤ 3× per-unit (floor the base at
    # 2 s so JVM/session noise can't fake a failure)
    assert t10 <= 3.0 * 10 * max(t1, 2.0), (
        f"curation DAG 10x runtime {t10:.1f}s vs 1x {t1:.1f}s — "
        "grows super-linearly"
    )

    for n, stats, stage, out in (
        (n_small, stats1, stage1, out1),
        (n_big, stats10, stage10, out10),
    ):
        ids = list(range(n))
        short = {i for i in ids if i % 7 == 0}

        # --- stage accounting: monotone waterfall, every stage present
        assert set(stage) == {
            "input", "normalize_quality", "dedup", "decontam", "mix",
            "pack", "write",
        }
        assert all(v >= 0 for v in stage.values())
        waterfall = [
            stats["n_input"], stats["n_after_quality"],
            stats["n_after_dedup"], stats["n_after_decontam"],
            stats["n_curated"],
        ]
        assert waterfall == sorted(waterfall, reverse=True)

        # --- quality: EXACT — short docs die, 120-token docs pass
        assert stats["n_input"] == n
        survivors = [i for i in ids if i not in short]
        assert stats["n_after_quality"] == len(survivors)

        # --- dedup: every surviving (even, odd) pair loses exactly its
        # odd member when banded LSH catches it (tail-only pairs
        # J≈0.88 ⇒ ~97% band collision; the 1-in-5 pairs that also
        # differ in the swapped block 0 sit at J≈0.76 ⇒ ~80% — overall
        # expected catch ≈ 0.93, asserted ≥ 0.85 because the
        # md5-deterministic realization is fixed, not resampled);
        # singles (partner was short) survive
        surv = set(survivors)
        full_pairs = {i // 2 for i in surv if (i ^ 1) in surv}
        expect_max = len(surv) - int(len(full_pairs) * 0.85)
        expect_min = len(surv) - len(full_pairs)
        assert expect_min <= stats["n_after_dedup"] <= expect_max, (
            f"n={n}: dedup kept {stats['n_after_dedup']}, expected "
            f"[{expect_min}, {expect_max}]"
        )

        # --- written documents agree with the stats and the plants
        import pyarrow.dataset as ds

        kept = ds.dataset(f"{out}/documents").to_table().to_pydict()
        kept_ids = kept["doc_id"]
        assert len(kept_ids) == stats["n_curated"]
        assert len(set(kept_ids)) == len(kept_ids)  # unique
        assert set(kept_ids) <= set(ids)
        # decontam drops the whole eval source (bloom: no false
        # negatives on the eval docs themselves) ...
        assert all(s != "s0" for s in kept["source"])
        # ... and every s4 keeper sharing a century block with a
        # quality-surviving eval doc (both survive dedup as even=min-id
        # keepers, so the gram-sharing plant MUST be flagged)
        eval_centuries = {i // 100 for i in surv if i % 10 == 0}
        planted = {
            i for i in surv
            if i % 10 == 4 and i // 100 in eval_centuries
        }
        leaked = planted & set(kept_ids)
        assert not leaked, f"n={n}: bloom missed planted grams {leaked}"

        # --- mix: the n//4 budget BINDS at both scales (waterfall
        # survivors ≈ 0.36n). temperature_mix gives stratum l
        # min(n_l, floor(budget·n_l^τ / Σ n^τ)) with NO redistribution
        # of a capped stratum's shortfall — and decontam depletes two
        # lang strata here (the s0/s4 drops are all ids ≡ 0, 4 mod 10,
        # i.e. langs 0 and 4 among the surviving even ids), so the
        # curated count lands below budget by the capped shortfall:
        # within [0.85·budget, budget], never over
        budget = n // 4
        assert stats["n_after_decontam"] > budget  # budget must bind
        assert budget * 0.85 <= stats["n_curated"] <= budget

        # --- the bloom auto-sizing tracked the eval-list growth (the
        # fixed 2^18 default SATURATES at the 10× list — every doc
        # false-flags and the corpus empties; this stat is the guard)
        assert stats["bloom_bits_log2"] >= 18

        # --- blast-radius accounting (r12 verdict #3), reconciled
        # EXACTLY against the planted corpus: Σ n_direct is the number
        # of corpus docs the decontam stage dropped — (non-eval dedup
        # survivors) − (decontam survivors). Eval docs (s0, even ids)
        # are min-id keepers of their pair clusters, so every
        # quality-surviving eval doc survives dedup.
        n_eval_surv = len([i for i in surv if i % 10 == 0])
        assert stats["decontam_n_direct"] == (
            stats["n_after_dedup"] - n_eval_surv
            - stats["n_after_decontam"]
        )
        # the planted gram-sharers are a guaranteed subset of the
        # direct flags (bloom: no false negatives)
        assert stats["decontam_n_direct"] >= len(planted)
        # Σ identity of the cluster report
        assert stats["decontam_n_members"] == (
            stats["decontam_n_direct"] + stats["decontam_n_dragged"]
        )
        # cluster-atomicity prices REAL drag here: every flagged s4
        # keeper whose odd partner survived quality heads a 2-member
        # cluster, so the atomic rule charges strictly more than the
        # direct rule at both scales
        assert stats["decontam_n_dragged"] > 0

        # --- packing covers exactly the curated docs, sequences
        # contiguous from 0
        pk = ds.dataset(f"{out}/packing").to_table().to_pydict()
        assert sorted(pk["doc_id"]) == sorted(kept_ids)
        assert min(pk["first_seq"]) == 0
        assert max(pk["last_seq"]) == stats["n_sequences"] - 1

    assert stats10["bloom_bits_log2"] > stats1["bloom_bits_log2"]
