"""End-to-end corpus curation: the training-data pipeline the LLM
operator layer exists for, as ONE runnable composition.

    spark-submit -m ad_data_pipelines_spark.jobs.curate_corpus \
        --corpus /data/corpus/sf1 --out /data/curated/run1 \
        --budget 100000 --tau 0.5 --seq-tokens 2048 \
        --checkpoint-dir /data/curated/run1_ckpt

Stages (each an already-tested operator; this job only wires them):

  1. normalize   — lowercase/whitespace canonicalization BEFORE any
                   hashing, so case/spacing variants collide
                   (operators/scrub.normalize_text);
  2. quality     — composite Gopher/C4 keep-or-drop verdict
                   (operators/textstats.quality_verdicts);
  3. dedup       — MinHash→LSH→connected components on the surviving
                   docs, keep one representative per cluster
                   (operators/dedup.dup_components). Pass
                   ``dedup_threshold`` to derive the LSH banding AND
                   the verification bar from the target Jaccard via
                   `dedup.dedup_plan_for_threshold` instead of the
                   shipped high-similarity constants;
  4. decontam    — optional benchmark decontamination: drop corpus
                   docs sharing an 8-gram with the held-out eval set,
                   and the eval docs themselves — exact broadcast scan
                   (operators/dedup.contamination_check) or the
                   auto-sized bloom probe for production-size lists
                   (operators/dedup.bloom_contamination_filter). The
                   eval side is sourced from the FULL normalized input
                   (ADVICE r12: eval docs dropped by quality/dedup
                   must still contribute grams — a corpus doc
                   contaminated only by a quality-dropped eval doc
                   must not escape). The stage also prices the
                   CLUSTER-ATOMIC removal policy via
                   `dedup.decontam_blast_radius` (reusing the run's
                   own flag + component artifacts — one extra join,
                   zero extra scans) into the stats waterfall;
  5. mix         — optional temperature-weighted per-language budgets
                   (operators/sampling.temperature_mix);
  6. pack        — concat-and-chunk sequence packing plan
                   (operators/packing.pack_sequences).

Writes `<out>/documents` (curated docs, normalized text) and
`<out>/packing` (per-doc token offsets and sequence ranges), and
prints ONE JSON line of per-stage row counts — the waterfall a
curation run is judged by. Every stage is deterministic (hash-rank
sampling, min-id keepers), so reruns reproduce identical outputs.

RESUMABLE RUNS (``checkpoint_dir``): at 100 TB a failure in stage 5
of 7 must not re-pay normalize+quality+dedup — the three most
expensive, super-linear stages. With a checkpoint dir, each expensive
stage (quality, classifier, dedup, exactsubstr, decontam) persists
its output as a versioned-parquet table (operators/merge.py atomic
pointer commit) and THEN atomically moves a stage marker — the
write-then-marker crash-safety pair the folder importer uses
(sources/manifest.py; the reference's own restart device:
data_ingestion/folder_import.R:69-91 `.imported` markers). A rerun
resumes from the last completed stage: a crash between write and
marker leaves no marker, so the stage recomputes (idempotent
overwrite of v000001). Stage markers carry a CHAINED config
fingerprint (this stage's knobs + every upstream stage's knobs and
row counts): a marker whose fingerprint mismatches the current run
config is REFUSED loudly (the bloom-artifact contract — never
silently mix artifacts across configs), while markers downstream of
a recomputed stage are presumed stale and overwritten.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ad_data_pipelines_spark.functions import hashing as _hashing
from ad_data_pipelines_spark.operators import dedup as _dedup
from ad_data_pipelines_spark.operators import merge as _merge
from ad_data_pipelines_spark.operators import packing as _packing
from ad_data_pipelines_spark.operators import sampling as _sampling
from ad_data_pipelines_spark.operators import scrub as _scrub
from ad_data_pipelines_spark.operators import textstats as _ts

#: stages that persist a resumable artifact under --checkpoint-dir
CHECKPOINT_STAGES = (
    "quality", "classifier", "dedup", "exactsubstr", "decontam",
)


def _fingerprint(parts: dict) -> str:
    """Stable 16-hex fingerprint of a stage's cumulative run config
    (JSON-canonicalized). Chained: each stage's parts include every
    upstream stage's knobs AND counts, so a changed upstream outcome
    invalidates every downstream marker automatically."""
    blob = json.dumps(parts, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def _ckpt_marker(ckpt_dir: str, stage: str) -> str:
    return os.path.join(ckpt_dir, f"{stage}.done.json")


def _ckpt_commit(
    ckpt_dir: str,
    stage: str,
    frames: dict[str, DataFrame],
    fingerprint: str,
    stage_stats: dict,
) -> dict[str, DataFrame]:
    """Persist each frame as `<ckpt>/<stage>/<name>` (versioned
    parquet, atomic `_CURRENT` pointer), THEN atomically move the
    stage marker. Returns the READ-BACK frames so downstream stages
    consume the materialized artifact, not live lineage — the point
    of checkpointing is that a later failure replays nothing above
    this line.

    INVALIDATE-THEN-WRITE-THEN-COMMIT (r13 review): before touching
    the parquet, the stage's OWN marker and every DOWNSTREAM stage's
    marker are deleted — (a) `table_init` overwrites v000001 in
    place, so a crash mid-overwrite must not leave a marker vouching
    for half-written parquet, and (b) downstream artifacts derive
    from the output being replaced, so a run that dies between this
    commit and the next stage's must make the rerun RECOMPUTE
    downstream rather than refuse on a now-stale fingerprint (or
    worse, resume it)."""
    spark = next(iter(frames.values())).sparkSession
    for later in CHECKPOINT_STAGES[CHECKPOINT_STAGES.index(stage):]:
        try:
            os.remove(_ckpt_marker(ckpt_dir, later))
        except FileNotFoundError:
            pass
    out: dict[str, DataFrame] = {}
    for name, df in frames.items():
        root = os.path.join(ckpt_dir, stage, name)
        _merge.table_init(df, root)
        out[name] = _merge.table_read(spark, root)
    marker = {"fingerprint": fingerprint, "stats": stage_stats}
    path = _ckpt_marker(ckpt_dir, stage)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(marker, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # marker AFTER the writes — crash-safe pair
    return out


def _ckpt_load(
    spark: SparkSession,
    ckpt_dir: str,
    stage: str,
    fingerprint: str,
    names: list[str],
) -> tuple[dict[str, DataFrame], dict] | None:
    """Resume `stage` from its marker, or None when no marker exists.
    A marker built under a DIFFERENT config is refused loudly — a
    checkpoint dir is per-run-config, same contract as the bloom
    artifact's (scheme, k, bits) stamp."""
    path = _ckpt_marker(ckpt_dir, stage)
    try:
        with open(path, encoding="utf-8") as f:
            marker = json.load(f)
    except FileNotFoundError:
        return None
    if marker.get("fingerprint") != fingerprint:
        raise ValueError(
            f"checkpoint stage {stage!r} at {ckpt_dir} was built under "
            f"a different run config (marker fingerprint "
            f"{marker.get('fingerprint')!r} != expected {fingerprint!r})"
            " — pass a fresh --checkpoint-dir or delete the old one"
        )
    frames = {
        n: _merge.table_read(spark, os.path.join(ckpt_dir, stage, n))
        for n in names
    }
    return frames, marker["stats"]


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
    dedup_threshold: float | None = None,
    dsir_target: str | None = None,
    checkpoint_dir: str | None = None,
    stage_timings: dict[str, float] | None = None,
    _fail_after_stage: str | None = None,
) -> dict:
    """Run the curation waterfall over `docs` (doc_id, text, lang, …),
    write curated documents + packing plan under `out_path`, return
    per-stage counts.

    `decontam` picks the stage-4 engine: "exact" broadcasts the eval
    set's full distinct gram-hash set (`contamination_check` — right
    for one benchmark), "bloom" probes a 32 KB broadcast bloom scalar
    instead (`bloom_contamination_filter` — the 100 TB shape for a
    full decontamination list; may over-drop by its ~0.2% gram FP
    rate, a superset of the exact drop by construction). Either way
    the eval gram set covers the WHOLE eval source as found in the
    input (normalized), not just eval docs surviving stages 1-3
    (ADVICE r12), and the stage reports the cluster-atomic removal
    price (decontam_n_direct / decontam_n_members /
    decontam_n_dragged — see `dedup.decontam_blast_radius`; n_members
    counts PRE-dedup cluster membership for every cluster whose
    surviving representative is flagged, i.e. the contaminated text
    family's full original footprint).

    `dedup_threshold` (target Jaccard) derives the stage-3 LSH
    banding and min_eq bar via `dedup.dedup_plan_for_threshold`
    (r12 verdict #2); the chosen plan is recorded in the stats line
    (dedup_n_bands / dedup_rows_per_band / dedup_min_eq /
    dedup_p_at_threshold). Default: the fixed high-similarity
    banding, `min_eq` as passed.

    `dsir_target` (a source value) swaps the stage-5 selection from
    language-temperature mixing to DSIR importance targeting (Xie et
    al. 2023): the target source's surviving docs fit the reference
    bag-of-hashed-ngram model, every OTHER surviving doc gets a log
    importance weight, and the budget is filled by a fixed-size
    Gumbel-top-k resample ∝ exp(log_w) — the pretraining mixture
    shifts toward the target domain instead of toward a flat language
    mix. The target docs themselves act as the reference only and do
    not enter the curated output (the selection is OF the raw pool);
    requires `budget`. Deterministic: hash-keyed Gumbel noise, unique
    (key, doc_id) order.

    `checkpoint_dir` enables stage-checkpointed RESUMABLE runs (see
    module docstring); resumed stage names land in
    stats["resumed_stages"]. `_fail_after_stage` is the test-only
    fault-injection hook (raises right after that stage's checkpoint
    commit — the S11 mid-write fault pattern, tests/test_sources.py).

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
    if dsir_target is not None and budget is None:
        raise ValueError(
            "dsir_target requires a budget (the DSIR stage is a "
            "fixed-size resample of the raw pool)"
        )
    if _fail_after_stage is not None and (
        _fail_after_stage not in CHECKPOINT_STAGES
    ):
        raise ValueError(
            f"_fail_after_stage={_fail_after_stage!r}: not a "
            f"checkpointable stage {CHECKPOINT_STAGES}"
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

    # count + content fingerprint in ONE aggregate pass: seeding the
    # checkpoint chain with the row count alone let a checkpoint dir be
    # reused against DIFFERENT input data of the same size — stale stage
    # artifacts resumed silently instead of the documented loud refusal
    # (r13 advice). The fingerprint is a bit_xor of per-doc hashes over
    # (doc_id, length) — combinable, order/partition independent, and
    # overflow-free at ANY row count (SUM of 63-bit hashes overflows
    # int64 under ANSI); catches id changes and text edits that keep
    # the row count.
    _in_agg = docs.agg(
        F.count("*").alias("n"),
        F.bit_xor(
            _hashing.portable_hash64(
                F.concat_ws("\x1f", F.col("doc_id"), F.length("text")),
                fast=True,
            )
        ).alias("content_fp"),
    ).collect()[0]
    stats: dict = {"n_input": int(_in_agg.n)}
    _input_content_fp = int(_in_agg.content_fp or 0)
    _mark("input")

    # ---- checkpoint plumbing -------------------------------------------
    ckpt = checkpoint_dir
    if ckpt is not None:
        os.makedirs(ckpt, exist_ok=True)
        stats["resumed_stages"] = []
    upstream_resumed = True  # False from the first recomputed stage on

    def _resume(stage: str, fp: str, names: list[str]):
        """Stage artifacts + their recorded stats, or None to compute.
        Once any upstream stage recomputed, downstream markers are
        stale by construction — ignore (and later overwrite) them."""
        if ckpt is None or not upstream_resumed:
            return None
        hit = _ckpt_load(spark, ckpt, stage, fp, names)
        if hit is None:
            return None
        stats.update(hit[1])
        stats["resumed_stages"].append(stage)
        return hit[0]

    def _commit(
        stage: str, fp: str, frames: dict[str, DataFrame], before: set
    ) -> dict[str, DataFrame]:
        nonlocal upstream_resumed
        upstream_resumed = False
        if ckpt is not None:
            stage_stats = {k: stats[k] for k in set(stats) - before}
            frames = _ckpt_commit(ckpt, stage, frames, fp, stage_stats)
        if _fail_after_stage == stage:
            raise RuntimeError(
                f"injected fault after stage {stage!r} (test hook)"
            )
        return frames

    # chained fingerprint parts: grow with each stage's knobs + counts,
    # seeded with the input's count AND content fingerprint
    fp_parts: dict = {
        "n_input": stats["n_input"],
        "input_fp": _input_content_fp,
    }

    def _canonize(frame: DataFrame) -> DataFrame:
        """Replace text with its normalized form (stage-1 transform,
        reusable on arbitrary doc subsets — the decontam stage applies
        it to the full eval source independently of stages 1-3).
        MAP-ONLY (r14 opt): the normalized text is a pure function of
        the row, so it is computed in place — the previous
        normalize_text self-join by doc_id shuffled the whole text
        payload on both sides for it (guide §8). Column order kept
        bit-compatible with the old join output (doc_id first,
        n_chars last)."""
        out_cols = (
            ["doc_id"]
            + [c for c in frame.columns if c not in ("doc_id", "n_chars")]
            + ["n_chars"]
        )
        return (
            frame.withColumn("text", _scrub.normalized_text_expr("text"))
            .withColumn("n_chars", F.length("text"))
            .select(*out_cols)
        )

    # ---- 1+2. normalize + quality verdicts (doc-local signals) --------
    fp = _fingerprint(fp_parts)
    hit = _resume("quality", fp, ["docs"])
    if hit is not None:
        quality_docs = hit["docs"]
        _mark("normalize_quality")
    else:
        _before = set(stats)
        # NEGATIVE RESULT (r15): materializing canon here
        # (localCheckpoint) looked right — the three quality signals
        # and the verdict join re-scan it, 6 corpus parses measured at
        # sf0.1 — and won ~15% on the ISOLATED stage, but interleaved
        # end-to-end job runs showed the DOWNSTREAM dedup stage 2-3×
        # slower with the cut in place (d=6.3-10.6 s vs 2.4-3.0 s
        # without, 5 samples each; the RDD-blocked lineage under the
        # persisted quality_docs is the suspected mechanism). Do not
        # re-add without A/B-ing the WHOLE job.
        canon = _canonize(docs)
        verdicts = _ts.quality_verdicts(canon).filter(F.col("pass"))
        live = canon.join(verdicts.select("doc_id"), "doc_id").persist()
        stats["n_after_quality"] = live.count()
        quality_docs = _commit("quality", fp, {"docs": live}, _before)[
            "docs"
        ]
        if quality_docs is not live:
            live.unpersist()
        _mark("normalize_quality")
    # the filtered frame feeds two chain stages — keep it warm when it
    # is live lineage (persist on a parquet read-back is a no-op cost)
    quality_docs = quality_docs.persist()
    fp_parts["n_after_quality"] = stats["n_after_quality"]

    # ---- 2b. optional model-based filter (CCNet-style) ----------------
    # train the hashed NB classifier with `classifier_seed_source` docs
    # as the positive class, score everything, keep docs at or above
    # the log-odds threshold — PLUS the seed itself (the reference set
    # must not filter itself out on boundary scores)
    if classifier_seed_source is not None:
        fp_parts["classifier"] = [
            classifier_seed_source, classifier_min_score,
        ]
        fp = _fingerprint(fp_parts)
        hit = _resume("classifier", fp, ["docs"])
        if hit is not None:
            quality_docs.unpersist()
            quality_docs = hit["docs"].persist()
            _mark("classifier")
        else:
            from ad_data_pipelines_spark.operators import (
                classify as _classify,
            )

            _before = set(stats)
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
            live = quality_docs.join(keep_ids, "doc_id").persist()
            stats["n_after_classifier"] = live.count()
            filtered = _commit(
                "classifier", fp, {"docs": live}, _before
            )["docs"]
            if filtered is not live:
                live.unpersist()
            _mark("classifier")
            quality_docs.unpersist()
            quality_docs = filtered.persist()
        fp_parts["n_after_classifier"] = stats["n_after_classifier"]

    # ---- 3. near-dedup: drop non-keeper cluster members ----------------
    # `comp` (doc_id, component, is_keeper) is a first-class stage
    # artifact: the decontam stage's blast-radius accounting reuses it,
    # and a resumed run must not re-pay the LSH chain to get it.
    if dedup_threshold is not None:
        dplan = _dedup.dedup_plan_for_threshold(dedup_threshold)
        stats["dedup_n_bands"] = dplan["n_bands"]
        stats["dedup_rows_per_band"] = dplan["rows_per_band"]
        stats["dedup_min_eq"] = dplan["min_eq"]
        stats["dedup_p_at_threshold"] = dplan["p_at_threshold"]
    fp_parts["dedup"] = [min_eq, dedup_threshold]
    fp = _fingerprint(fp_parts)
    hit = _resume("dedup", fp, ["docs", "components"])
    if hit is not None:
        deduped, comp = hit["docs"], hit["components"]
        _mark("dedup")
    else:
        _before = set(stats)
        live_comp = _dedup.dup_components(
            quality_docs, min_eq=min_eq, threshold=dedup_threshold
        ).persist()
        live = quality_docs.join(
            live_comp.filter(F.col("is_keeper") == 0).select("doc_id"),
            "doc_id",
            "left_anti",
        ).persist()
        stats["n_after_dedup"] = live.count()
        committed = _commit(
            "dedup", fp, {"docs": live, "components": live_comp}, _before
        )
        deduped, comp = committed["docs"], committed["components"]
        if deduped is not live:
            live.unpersist()
            live_comp.unpersist()
        _mark("dedup")
    deduped = deduped.persist()
    comp = comp.persist()
    fp_parts["n_after_dedup"] = stats["n_after_dedup"]

    # ---- 3b. optional EXACTSUBSTR span removal (Lee et al. 2022) ------
    # inside the kept corpus: document-level near-dedup can't see a
    # boilerplate paragraph shared by otherwise-distinct docs — this
    # excises it from every non-owner copy and drops docs whose
    # remaining text is too short to train on
    if exactsubstr_k is not None:
        fp_parts["exactsubstr"] = [exactsubstr_k, min_kept_chars]
        fp = _fingerprint(fp_parts)
        hit = _resume("exactsubstr", fp, ["docs"])
        if hit is not None:
            deduped.unpersist()
            deduped = hit["docs"].persist()
            _mark("exactsubstr")
        else:
            _before = set(stats)
            cleaned = _dedup.remove_dup_spans(deduped, k=exactsubstr_k)
            live = (
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
            stats["n_after_exactsubstr"] = live.count()
            rebuilt = _commit(
                "exactsubstr", fp, {"docs": live}, _before
            )["docs"]
            if rebuilt is not live:
                live.unpersist()
            _mark("exactsubstr")
            deduped.unpersist()
            deduped = rebuilt.persist()
        fp_parts["n_after_exactsubstr"] = stats["n_after_exactsubstr"]

    # ---- 4. optional benchmark decontamination -------------------------
    # the eval docs AND every corpus doc sharing an 8-gram with them
    # leave the training set
    if eval_source is not None:
        fp_parts["decontam"] = [eval_source, decontam, bloom_bits_log2]
        fp = _fingerprint(fp_parts)
        hit = _resume("decontam", fp, ["docs"])
        if hit is not None:
            deduped.unpersist()
            deduped = hit["docs"].persist()
            _mark("decontam")
        else:
            _before = set(stats)
            eval_pred = F.col("source") == eval_source
            # ADVICE r12 (+ r13 review): the eval gram set must cover
            # the WHOLE eval source AS FOUND IN THE INPUT — an eval
            # doc dropped by the quality gate or as a dedup loser
            # still contaminates, and an eval doc that SURVIVED but
            # had a boilerplate span excised by the exactsubstr stage
            # must still contribute the excised span's grams (the span
            # owner keeps that text in the corpus). So the eval side
            # is the full normalized ORIGINAL eval source; the corpus
            # side is exactly the stage-3 survivors. The tiny eval
            # frame is persisted — three consumers (gram pass,
            # auto-size ids, engine split) would otherwise re-run the
            # normalize join each.
            full_evals = _canonize(docs.filter(eval_pred)).persist()
            decontam_docs = deduped.filter(~eval_pred).unionByName(
                full_evals.select(*deduped.columns)
            )
            # ONE gram pass feeds the engine probe, the bloom
            # auto-sizing count and nothing else (blast radius reuses
            # the engine's own flag set, not the grams)
            grams = _dedup.word_ngram_hashes(decontam_docs, 8).persist()
            if decontam == "bloom":
                bits = bloom_bits_log2
                if bits is None:
                    # AUTO-SIZE the filter to the eval list: a fixed m
                    # saturates once the list outgrows it (at ~5
                    # positions per gram a 2^18-bit bloom is ~full by
                    # 150k grams — FP per gram ≈ 73%, so EVERY corpus
                    # doc false-flags and the stage silently empties
                    # the corpus; measured in tests/test_curate_scale
                    # before this sizing). ~32 bits per distinct gram
                    # keeps fill ≈ 14%, per-gram FP ≈ 0.145^5 ≈ 6e-5,
                    # so a 100-gram doc false-flags at ~0.7%. Counting
                    # the DISTINCT eval grams reuses the gram artifact
                    # — small by definition (it's a benchmark list).
                    # Clamp to [18, 26]: a 32 KB floor and an 8 MB /
                    # 2M-gram ceiling (a bigger list should pass
                    # bloom_bits_log2 explicitly and accept the FP
                    # arithmetic, or shard the filter).
                    eval_ids = full_evals.select("doc_id")
                    n_eval_grams = (
                        grams.join(F.broadcast(eval_ids), "doc_id")
                        .select("gh")
                        .distinct()
                        .count()
                    )
                    bits = max(
                        18,
                        min(
                            26,
                            (32 * max(n_eval_grams, 1) - 1).bit_length(),
                        ),
                    )
                    stats["bloom_bits_log2"] = bits
                contaminated = _dedup.bloom_contamination_filter(
                    decontam_docs, eval_pred, grams=grams, bits_log2=bits
                ).persist()
            else:
                contaminated = _dedup.contamination_check(
                    decontam_docs, eval_pred, grams=grams
                ).persist()
            live = deduped.filter(~eval_pred).join(
                contaminated.select("doc_id"), "doc_id", "left_anti"
            )
            if ckpt is None:
                # LINEAGE CUT, not just a persist: the decontam plan
                # (eval-restore union + gram explodes + the probe) is
                # big enough that Spark's plan-equality cache
                # substitution MISSES some downstream re-references —
                # measured at sf0.1: the temperature-mix targets
                # branch recomputed this whole stage from raw files on
                # every later action (pack 3.6 s → 13 s, write 4 s →
                # 13 s). localCheckpoint makes every consumer read the
                # materialized blocks unconditionally. With a
                # checkpoint dir the committed parquet artifact is
                # read back below, which cuts lineage durably instead.
                live = live.localCheckpoint(eager=False)
            else:
                live = live.persist()
            stats["n_after_decontam"] = live.count()
            # cluster-atomic removal price (r12 verdict #3): the
            # engine's OWN flag set ⋈ the stage-3 component artifact —
            # one join + one combinable aggregate, no new scans.
            # Σ n_direct = docs this stage actually dropped;
            # Σ n_members = the flagged text families' full pre-dedup
            # footprint; Σ n_dragged = the gap the cluster-atomic rule
            # would additionally charge (mostly dedup losers already
            # gone — a LARGE value flags boilerplate contamination or
            # an over-merged cluster worth inspecting).
            radius = _dedup.decontam_blast_radius(
                decontam_docs,
                eval_pred,
                components=comp,
                flagged=contaminated.select("doc_id"),
            ).agg(
                F.sum("n_direct").alias("d"),
                F.sum("n_members").alias("m"),
                F.sum("n_dragged").alias("g"),
            ).collect()[0]
            stats["decontam_n_direct"] = int(radius["d"] or 0)
            stats["decontam_n_members"] = int(radius["m"] or 0)
            stats["decontam_n_dragged"] = int(radius["g"] or 0)
            # the stage's scratch frames are consumed (live is cut or
            # committed below; the radius is collected) — release them
            grams.unpersist()
            contaminated.unpersist()
            full_evals.unpersist()
            clean = _commit("decontam", fp, {"docs": live}, _before)[
                "docs"
            ]
            if clean is not live:
                live.unpersist()
            _mark("decontam")
            deduped.unpersist()
            # localCheckpoint already holds materialized blocks — a
            # second persist would only double the storage
            deduped = clean if ckpt is None else clean.persist()
        fp_parts["n_after_decontam"] = stats["n_after_decontam"]

    # ---- 5. optional selection to a row budget -------------------------
    # dsir_target: importance targeting (fit on the target source,
    # score the rest, Gumbel-resample ∝ exp(log_w)); otherwise the
    # language-temperature mix. Both deterministic.
    if budget is not None and dsir_target is not None:
        from ad_data_pipelines_spark.operators import (
            classify as _classify,
        )

        target_pred = F.col("source") == dsir_target
        # own the DSIR gram cache: every later action over `mixed`
        # (count, parquet write, optional jsonl) re-executes the
        # scoring chain, so the cache must live until the job's last
        # action — unpersisted with the other stage caches below
        dsir_gram_cache: list = []
        scored = _classify.dsir_weights(
            deduped.filter(~target_pred),
            deduped.filter(target_pred),
            gram_cache=dsir_gram_cache,
        )
        stats["dsir_n_candidates"] = scored.count()
        sel = _sampling.gumbel_topk_sample(
            scored, F.col("log_w"), k=budget, key="doc_id"
        )
        mixed = deduped.join(sel.select("doc_id"), "doc_id").select(
            *deduped.columns
        )
    elif budget is not None:
        mixed = _sampling.temperature_mix(
            deduped, "lang", "doc_id", budget=budget, tau=tau
        ).select(*deduped.columns)
    else:
        mixed = deduped
    stats["n_curated"] = mixed.count()
    _mark("mix")

    # ---- 6. packing plan for the curated corpus ------------------------
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
    comp.unpersist()
    if budget is not None and dsir_target is not None:
        for _cached in dsir_gram_cache:
            _cached.unpersist()
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
    ap.add_argument("--dsir-target", default=None,
                    help="source value marking the DSIR target "
                    "domain: stage 5 becomes a fixed-size Gumbel "
                    "resample of the raw pool by importance weight "
                    "(requires --budget) instead of the temperature "
                    "mix")
    ap.add_argument("--dedup-threshold", type=float, default=None,
                    help="target Jaccard for the dedup stage: derives "
                    "the LSH banding and min_eq bar via lsh_plan "
                    "instead of the shipped constants")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="enable stage-checkpointed resumable runs: "
                    "expensive stage outputs persist here as "
                    "versioned parquet + atomic markers; a rerun "
                    "skips completed stages")
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
        dedup_threshold=args.dedup_threshold,
        dsir_target=args.dsir_target,
        checkpoint_dir=args.checkpoint_dir,
        exactsubstr_k=args.exactsubstr_k,
        min_kept_chars=args.min_kept_chars,
        classifier_seed_source=args.classifier_seed_source,
        classifier_min_score=args.classifier_min_score,
    )))


if __name__ == "__main__":
    main()
