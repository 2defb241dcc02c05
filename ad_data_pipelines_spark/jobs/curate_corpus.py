"""End-to-end corpus curation: the training-data pipeline the LLM
operator layer exists for, as ONE runnable composition.

    spark-submit -m ad_data_pipelines_spark.jobs.curate_corpus \
        --corpus /data/corpus/sf1 --out /data/curated/run1 \
        --budget 100000 --tau 0.5 --seq-tokens 2048

Stages (each an already-tested operator; this job only wires them):

  1. normalize   — lowercase/whitespace canonicalization BEFORE any
                   hashing, so case/spacing variants collide
                   (operators/scrub.normalize_text);
  2. quality     — composite Gopher/C4 keep-or-drop verdict
                   (operators/textstats.quality_verdicts);
  3. dedup       — MinHash→LSH→connected components on the surviving
                   docs, keep one representative per cluster
                   (operators/dedup.dup_components);
  4. decontam    — optional benchmark decontamination: drop corpus
                   docs sharing an 8-gram with the held-out eval set,
                   and the eval docs themselves — exact broadcast scan
                   (operators/dedup.contamination_check) or the
                   auto-sized bloom probe for production-size lists
                   (operators/dedup.bloom_contamination_filter);
  5. mix         — optional temperature-weighted per-language budgets
                   (operators/sampling.temperature_mix);
  6. pack        — concat-and-chunk sequence packing plan
                   (operators/packing.pack_sequences).

Writes `<out>/documents` (curated docs, normalized text) and
`<out>/packing` (per-doc token offsets and sequence ranges), and
prints ONE JSON line of per-stage row counts — the waterfall a
curation run is judged by. Every stage is deterministic (hash-rank
sampling, min-id keepers), so reruns reproduce byte-identical
outputs.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators import dedup as _dedup
from ad_data_pipelines_spark.operators import packing as _packing
from ad_data_pipelines_spark.operators import sampling as _sampling
from ad_data_pipelines_spark.operators import scrub as _scrub
from ad_data_pipelines_spark.operators import textstats as _ts


def curate(
    spark: SparkSession,
    docs: DataFrame,
    out_path: str,
    budget: int | None = None,
    tau: float = 0.5,
    seq_tokens: int = 2048,
    min_eq: int = 8,
    eval_source: str | None = None,
    export_jsonl: bool = False,
    exactsubstr_k: int | None = None,
    min_kept_chars: int = 50,
    classifier_seed_source: str | None = None,
    classifier_min_score: float = 0.0,
    decontam: str = "exact",
    bloom_bits_log2: int | None = None,
    stage_timings: dict[str, float] | None = None,
) -> dict[str, int]:
    """Run the curation waterfall over `docs` (doc_id, text, lang, …),
    write curated documents + packing plan under `out_path`, return
    per-stage counts.

    `decontam` picks the stage-4 engine: "exact" broadcasts the eval
    set's full distinct gram-hash set (`contamination_check` — right
    for one benchmark), "bloom" probes a 32 KB broadcast bloom scalar
    instead (`bloom_contamination_filter` — the 100 TB shape for a
    full decontamination list; may over-drop by its ~0.2% gram FP
    rate, a superset of the exact drop by construction).

    `stage_timings`, if a dict is passed, is filled with per-stage
    wall seconds. Attribution is BY ACTION BARRIER: each stage's
    number is the time from the previous stage's action to this one's
    (count / agg / write), so it includes whatever lazy upstream work
    the barrier forced — the honest schedule a DAG monitor would see,
    not a per-operator microbenchmark."""
    if decontam not in ("exact", "bloom"):
        raise ValueError(
            f"decontam={decontam!r}: expected 'exact' or 'bloom'"
        )
    import time as _time

    _t0 = _time.perf_counter()

    def _mark(stage: str) -> None:
        nonlocal _t0
        now = _time.perf_counter()
        if stage_timings is not None:
            stage_timings[stage] = round(
                stage_timings.get(stage, 0.0) + (now - _t0), 4
            )
        _t0 = now

    stats: dict[str, int] = {"n_input": docs.count()}
    _mark("input")

    # 1. normalize — replace text with its canonical form
    norm = _scrub.normalize_text(docs).select("doc_id", "norm_text")
    canon = (
        docs.drop("n_chars")
        .join(norm, "doc_id")
        .withColumn("text", F.col("norm_text"))
        .drop("norm_text")
        .withColumn("n_chars", F.length("text"))
    )

    # 2. quality verdicts (doc-local signals)
    verdicts = _ts.quality_verdicts(canon).filter(F.col("pass"))
    quality_docs = canon.join(verdicts.select("doc_id"), "doc_id")
    # the filtered frame feeds two chain stages — persist once
    quality_docs = quality_docs.persist()
    stats["n_after_quality"] = quality_docs.count()
    _mark("normalize_quality")

    # 2b. optional model-based filter (CCNet-style): train the hashed
    # NB classifier with `classifier_seed_source` docs as the positive
    # class (the curated reference subset), score everything, keep
    # docs at or above the log-odds threshold — PLUS the seed itself
    # (the reference set must not filter itself out on boundary
    # scores). Train+score are pure aggregation (operators/classify).
    if classifier_seed_source is not None:
        from ad_data_pipelines_spark.operators import classify as _classify

        seed_pred = F.col("source") == classifier_seed_source
        weights, consts = _classify.train_nb(quality_docs, seed_pred)
        scored = _classify.nb_score(quality_docs, weights, consts)
        keep_ids = (
            quality_docs.join(scored, "doc_id")
            .filter(
                (F.col("score") >= classifier_min_score) | seed_pred
            )
            .select("doc_id")
        )
        filtered = quality_docs.join(keep_ids, "doc_id").persist()
        stats["n_after_classifier"] = filtered.count()
        _mark("classifier")
        quality_docs.unpersist()
        quality_docs = filtered

    # 3. near-dedup: drop non-keeper cluster members
    losers = _dedup.dup_components(quality_docs, min_eq=min_eq).filter(
        F.col("is_keeper") == 0
    )
    deduped = quality_docs.join(
        losers.select("doc_id"), "doc_id", "left_anti"
    ).persist()
    stats["n_after_dedup"] = deduped.count()
    _mark("dedup")

    # 3b. optional EXACTSUBSTR span removal (Lee et al. 2022) inside
    # the kept corpus: document-level near-dedup can't see a boilerplate
    # paragraph shared by otherwise-distinct docs — this excises it from
    # every non-owner copy and drops docs whose remaining text is too
    # short to train on
    if exactsubstr_k is not None:
        cleaned = _dedup.remove_dup_spans(deduped, k=exactsubstr_k)
        rebuilt = (
            deduped.drop("text", "n_chars")
            .join(
                cleaned.select(
                    "doc_id", F.col("kept_text").alias("text")
                ),
                "doc_id",
            )
            .withColumn("n_chars", F.length("text"))
            .filter(F.col("n_chars") >= min_kept_chars)
            .persist()
        )
        stats["n_after_exactsubstr"] = rebuilt.count()
        _mark("exactsubstr")
        deduped.unpersist()
        deduped = rebuilt

    # 4. optional benchmark decontamination: the eval docs AND every
    # corpus doc sharing an 8-gram with them leave the training set
    if eval_source is not None:
        eval_pred = F.col("source") == eval_source
        if decontam == "bloom":
            if bloom_bits_log2 is None:
                # AUTO-SIZE the filter to the eval list: a fixed m
                # saturates once the list outgrows it (at ~5 positions
                # per gram a 2^18-bit bloom is ~full by 150k grams —
                # FP per gram ≈ 73%, so EVERY corpus doc false-flags
                # and the stage silently empties the corpus; measured
                # in tests/test_curate_scale.py before this sizing).
                # ~32 bits per distinct gram keeps fill ≈ 14%, per-
                # gram FP ≈ 0.145^5 ≈ 6e-5, so a 100-gram doc false-
                # flags at ~0.7%. Counting the DISTINCT eval grams is
                # one aggregate over the eval side only — small by
                # definition (it's a benchmark list). Clamp to
                # [18, 26]: a 32 KB floor and a 8 MB / 2M-word ceiling
                # (good for ~2M distinct grams at 32 bits each; a
                # bigger list should pass bloom_bits_log2 explicitly
                # and accept the FP arithmetic, or shard the filter).
                n_eval_grams = (
                    _dedup.word_ngram_hashes(
                        deduped.filter(eval_pred), 8
                    )
                    .select("gh")
                    .distinct()
                    .count()
                )
                bloom_bits_log2 = max(
                    18,
                    min(26, (32 * max(n_eval_grams, 1) - 1).bit_length()),
                )
                stats["bloom_bits_log2"] = bloom_bits_log2
            contaminated = _dedup.bloom_contamination_filter(
                deduped, eval_pred, bits_log2=bloom_bits_log2
            )
        else:
            contaminated = _dedup.contamination_check(deduped, eval_pred)
        clean = (
            deduped.filter(~eval_pred)
            .join(contaminated.select("doc_id"), "doc_id", "left_anti")
            .persist()
        )
        stats["n_after_decontam"] = clean.count()
        _mark("decontam")
        deduped.unpersist()
        deduped = clean

    # 5. optional temperature mix to a row budget
    if budget is not None:
        mixed = _sampling.temperature_mix(
            deduped, "lang", "doc_id", budget=budget, tau=tau
        ).select(*deduped.columns)
    else:
        mixed = deduped
    stats["n_curated"] = mixed.count()
    _mark("mix")

    # 6. packing plan for the curated corpus
    packing = _packing.pack_sequences(mixed, seq_tokens=seq_tokens)
    stats["n_sequences"] = (
        packing.agg(F.max("last_seq").cast("bigint")).collect()[0][0] or -1
    ) + 1
    _mark("pack")

    mixed.write.mode("overwrite").parquet(f"{out_path}/documents")
    packing.write.mode("overwrite").parquet(f"{out_path}/packing")
    _mark("write")

    # optional delivery format: gzip JSONL shards at ~target size —
    # what a training loader consumes directly
    if export_jsonl:
        from ad_data_pipelines_spark.operators.partitioning import (
            partitions_for_target_size,
        )
        from ad_data_pipelines_spark.sources.jsonl import write_jsonl

        n_shards = partitions_for_target_size(mixed, target_mb=256)
        write_jsonl(
            mixed.repartition(n_shards),
            f"{out_path}/jsonl",
            compression="gzip",
        )
        stats["n_jsonl_shards"] = n_shards

    quality_docs.unpersist()
    deduped.unpersist()
    return stats


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", required=True,
                    help="corpus dir containing documents.parquet")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--budget", type=int, default=None,
                    help="optional row budget for the temperature mix")
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--seq-tokens", type=int, default=2048)
    ap.add_argument("--eval-source", default=None,
                    help="source value marking held-out eval docs; "
                    "enables benchmark decontamination")
    ap.add_argument("--export-jsonl", action="store_true",
                    help="also write gzip JSONL shards (training "
                    "loader delivery format)")
    ap.add_argument("--decontam", choices=["exact", "bloom"],
                    default="exact",
                    help="decontamination engine: exact gram-set "
                    "broadcast, or the auto-sized bloom probe")
    ap.add_argument("--bloom-bits-log2", type=int, default=None,
                    help="override the bloom filter's auto-sizing "
                    "(log2 of the bit count)")
    ap.add_argument("--exactsubstr-k", type=int, default=None,
                    help="enable EXACTSUBSTR span removal with this "
                    "k-gram length (e.g. 50); off by default")
    ap.add_argument("--min-kept-chars", type=int, default=50,
                    help="drop docs shorter than this after span "
                    "removal")
    ap.add_argument("--classifier-seed-source", default=None,
                    help="source value marking the positive-class "
                    "reference subset; enables the CCNet-style "
                    "model-based filter (operators/classify.py)")
    ap.add_argument("--classifier-min-score", type=float, default=0.0,
                    help="keep docs with NB log-odds score >= this")
    args = ap.parse_args(argv)

    from ad_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="curate_corpus")
    docs = spark.read.parquet(f"{args.corpus}/documents.parquet")
    print(json.dumps(curate(
        spark, docs, args.out,
        budget=args.budget, tau=args.tau, seq_tokens=args.seq_tokens,
        eval_source=args.eval_source, export_jsonl=args.export_jsonl,
        decontam=args.decontam, bloom_bits_log2=args.bloom_bits_log2,
        exactsubstr_k=args.exactsubstr_k,
        min_kept_chars=args.min_kept_chars,
        classifier_seed_source=args.classifier_seed_source,
        classifier_min_score=args.classifier_min_score,
    )))


if __name__ == "__main__":
    main()
