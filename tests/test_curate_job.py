"""End-to-end curation job: the waterfall composition of normalize →
quality → dedup → mix → pack over real testdata, deterministic across
reruns."""

from __future__ import annotations

import pytest

from ad_data_pipelines_spark.jobs.curate_corpus import curate
from ad_data_pipelines_spark.plans import testdata_queries as tq
from tests.conftest import SF_SMALL


def test_curate_waterfall_counts_and_determinism(spark, tmp_path):
    docs = tq.t(spark, SF_SMALL, "documents")
    out1 = str(tmp_path / "run1")
    stats = curate(spark, docs, out1, budget=100, seq_tokens=256)

    # waterfall: monotone non-increasing through the filters
    assert stats["n_input"] == 500
    assert 0 < stats["n_after_quality"] <= stats["n_input"]
    assert 0 < stats["n_after_dedup"] <= stats["n_after_quality"]
    assert 0 < stats["n_curated"] <= min(stats["n_after_dedup"], 100)
    assert stats["n_sequences"] > 0

    curated = spark.read.parquet(out1 + "/documents")
    packing = spark.read.parquet(out1 + "/packing")
    assert curated.count() == stats["n_curated"]
    assert packing.count() == stats["n_curated"]
    # normalized text: no uppercase, no double spaces
    import pyspark.sql.functions as F

    bad = curated.filter(
        F.col("text").rlike("[A-Z]") | F.col("text").contains("  ")
    ).count()
    assert bad == 0

    # rerun reproduces identical stats and identical curated rows
    out2 = str(tmp_path / "run2")
    stats2 = curate(spark, docs, out2, budget=100, seq_tokens=256)
    assert stats2 == stats
    a = sorted(map(tuple, curated.collect()))
    b = sorted(map(tuple, spark.read.parquet(out2 + "/documents").collect()))
    assert a == b


def test_curate_decontamination_stage(spark, tmp_path):
    """With an eval source, the waterfall drops BOTH the eval docs and
    every corpus doc sharing an 8-gram with them."""
    import pyspark.sql.functions as F

    docs = tq.t(spark, SF_SMALL, "documents")
    out = str(tmp_path / "run")
    stats = curate(
        spark, docs, out, seq_tokens=256, eval_source="src0"
    )
    assert "n_after_decontam" in stats
    assert stats["n_after_decontam"] <= stats["n_after_dedup"]
    curated = spark.read.parquet(out + "/documents")
    assert curated.filter(F.col("source") == "src0").count() == 0
    assert stats["n_curated"] == stats["n_after_decontam"]


def test_curate_jsonl_export_round_trips(spark, tmp_path):
    """--export-jsonl writes gzip JSONL shards the JSONL reader loads
    back losslessly (same doc_ids, same text)."""
    import glob

    from ad_data_pipelines_spark.sources.jsonl import read_jsonl

    docs = tq.t(spark, SF_SMALL, "documents")
    out = str(tmp_path / "run")
    stats = curate(
        spark, docs, out, budget=60, seq_tokens=256, export_jsonl=True
    )
    assert stats["n_jsonl_shards"] >= 1
    shards = glob.glob(out + "/jsonl/*.json.gz")
    assert shards, "expected gzip JSONL shards"

    back = read_jsonl(spark, out + "/jsonl")
    curated = spark.read.parquet(out + "/documents")
    a = {(r.doc_id, r.text) for r in back.select("doc_id", "text").collect()}
    b = {(r.doc_id, r.text) for r in curated.select("doc_id", "text").collect()}
    assert a == b and len(a) == stats["n_curated"]


@pytest.mark.slow
def test_curate_checkpoint_kill_resume(spark, tmp_path):
    """r12 verdict #1: stage-checkpointed runs survive a mid-run kill.
    Run 1 is killed right after the dedup stage's artifact+marker
    commit (injected fault — the S11 mid-write fault pattern,
    tests/test_sources.py); run 2 against the same checkpoint dir
    RESUMES (quality + dedup read back from the versioned-parquet
    artifacts, accounted in stats["resumed_stages"]) and produces
    final outputs content-identical to a from-scratch un-checkpointed
    run — same stats waterfall, same curated rows, same packing rows.
    A third run resumes EVERY checkpointable stage. A marker built
    under a different run config is refused loudly."""
    import pathlib

    import pytest

    docs = tq.t(spark, SF_SMALL, "documents")
    base = dict(budget=100, seq_tokens=256, eval_source="src0")

    # ground truth: from-scratch, no checkpointing
    out_ref = str(tmp_path / "ref")
    ref_stats = curate(spark, docs, out_ref, **base)

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="injected fault"):
        curate(spark, docs, out, checkpoint_dir=ckpt,
               _fail_after_stage="dedup", **base)
    # the kill left completed write+marker pairs for quality+dedup and
    # NOTHING beyond (marker moves only after the stage's writes)
    names = {p.name for p in pathlib.Path(ckpt).iterdir()}
    assert {"quality.done.json", "dedup.done.json"} <= names
    assert "decontam.done.json" not in names
    # versioned-parquet artifacts with committed _CURRENT pointers
    from ad_data_pipelines_spark.operators import merge as _merge

    assert _merge.table_current_version(f"{ckpt}/dedup/docs") == "v000001"
    assert (
        _merge.table_current_version(f"{ckpt}/dedup/components")
        == "v000001"
    )

    stats = curate(spark, docs, out, checkpoint_dir=ckpt, **base)
    assert stats.pop("resumed_stages") == ["quality", "dedup"]
    assert stats == ref_stats  # identical waterfall incl. blast radius
    for sub in ("documents", "packing"):
        a = sorted(map(tuple,
                       spark.read.parquet(f"{out_ref}/{sub}").collect()))
        b = sorted(map(tuple,
                       spark.read.parquet(f"{out}/{sub}").collect()))
        assert a == b, f"{sub} diverged after resume"

    # a fresh rerun resumes EVERY checkpointable stage
    stats2 = curate(
        spark, docs, str(tmp_path / "resumed2"), checkpoint_dir=ckpt,
        **base,
    )
    assert stats2.pop("resumed_stages") == ["quality", "dedup",
                                            "decontam"]
    assert stats2 == ref_stats

    # changed config (dedup bar) → the dedup marker's chained
    # fingerprint mismatches → refused loudly, nothing silently mixed
    with pytest.raises(ValueError, match="different run config"):
        curate(spark, docs, str(tmp_path / "other"),
               checkpoint_dir=ckpt, min_eq=9, **base)

    # r13 advice: DIFFERENT input data with the SAME row count must
    # also refuse — the chain is seeded with a content fingerprint of
    # the input (combinable hash over doc_id+length), not just n_input,
    # so a checkpoint dir can never vouch for another corpus's stages.
    from pyspark.sql import functions as F

    mutated = docs.withColumn("text", F.concat(F.col("text"), F.lit(" x")))
    with pytest.raises(ValueError, match="different run config"):
        curate(spark, mutated, str(tmp_path / "mutated"),
               checkpoint_dir=ckpt, **base)

    # r13 review: a mid-chain recompute INVALIDATES downstream markers
    # at commit time, so a run that dies right after the recomputed
    # stage leaves a resumable dir — not one bricked on stale
    # fingerprints. Enable the classifier (a new stage between quality
    # and dedup under the same quality fingerprint), kill right after
    # its commit, then rerun the SAME config: quality+classifier
    # resume, dedup/decontam recompute (their old markers were
    # deleted, not refused), and the run completes.
    cls = dict(base, classifier_seed_source="src1",
               classifier_min_score=-1e18)
    with pytest.raises(RuntimeError, match="injected fault"):
        curate(spark, docs, str(tmp_path / "cls_killed"),
               checkpoint_dir=ckpt, _fail_after_stage="classifier",
               **cls)
    names = {p.name for p in pathlib.Path(ckpt).iterdir()}
    assert "classifier.done.json" in names
    assert "dedup.done.json" not in names  # invalidated at commit
    stats3 = curate(spark, docs, str(tmp_path / "cls_resumed"),
                    checkpoint_dir=ckpt, **cls)
    assert stats3["resumed_stages"] == ["quality", "classifier"]
    # the no-op classifier (every score above -1e18) keeps the same
    # downstream waterfall as the reference run
    assert stats3["n_after_classifier"] == stats3["n_after_quality"]
    assert stats3["n_after_dedup"] == ref_stats["n_after_dedup"]
    assert stats3["n_curated"] == ref_stats["n_curated"]


def test_curate_dedup_threshold_and_blast_radius_stats(spark, tmp_path):
    """r12 verdict #2+#3 wiring: dedup_threshold derives the banding
    from lsh_plan (recorded in the stats line and matching
    dedup_plan_for_threshold exactly), and the decontam stage reports
    the cluster-atomic blast radius, reconciled: Σ n_direct is
    EXACTLY the number of corpus docs the stage dropped, and
    n_members = n_direct + n_dragged by construction."""
    import pyspark.sql.functions as F

    from ad_data_pipelines_spark.operators import dedup as _dedup

    from ad_data_pipelines_spark.operators import merge as _merge

    docs = tq.t(spark, SF_SMALL, "documents")
    out = str(tmp_path / "run")
    ckpt = str(tmp_path / "ckpt")
    stats = curate(
        spark, docs, out, seq_tokens=256, eval_source="src0",
        dedup_threshold=0.5, checkpoint_dir=ckpt,
    )
    plan = _dedup.dedup_plan_for_threshold(0.5)
    assert stats["dedup_n_bands"] == plan["n_bands"] == 8
    assert stats["dedup_rows_per_band"] == plan["rows_per_band"] == 2
    assert stats["dedup_min_eq"] == plan["min_eq"] == 8
    assert stats["dedup_p_at_threshold"] == plan["p_at_threshold"]

    # blast-radius reconciliation against the run's OWN dedup artifact:
    # Σ n_direct is exactly the corpus docs the decontam stage dropped
    # — (non-eval dedup survivors) − (decontam survivors)
    deduped = _merge.table_read(spark, f"{ckpt}/dedup/docs")
    n_non_eval = deduped.filter(F.col("source") != "src0").count()
    assert (
        stats["decontam_n_direct"]
        == n_non_eval - stats["n_after_decontam"]
    )
    assert stats["decontam_n_direct"] >= 1  # testdata does contaminate
    assert (
        stats["decontam_n_members"]
        == stats["decontam_n_direct"] + stats["decontam_n_dragged"]
    )
    # the wider τ=0.5 banding can only merge MORE docs into clusters
    # than the default 4x4 chain at the same bar
    default_stats = curate(
        spark, docs, str(tmp_path / "default"), seq_tokens=256,
        eval_source="src0",
    )
    assert stats["n_after_dedup"] <= default_stats["n_after_dedup"]
    assert "dedup_n_bands" not in default_stats


@pytest.mark.slow
def test_curate_exactsubstr_stage(spark, tmp_path):
    """With --exactsubstr-k, a boilerplate paragraph shared by
    otherwise-distinct docs survives in exactly ONE curated doc (the
    owner) and is excised from the rest; docs reduced below the
    min-kept length drop out; the stage is deterministic."""
    import pyspark.sql.functions as F

    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray yankee zulu").split()
    # long, VARIED boilerplate (no internal repeated grams, so the
    # per-doc repetition gate stays green) — 55 distinct tokens
    boiler = "subscribe newsletter " + " ".join(
        f"{words[j % len(words)]}b{j}" for j in range(53)
    )
    rows = []
    for i in range(8):
        # varied, quality-passing bodies unique to each doc
        picks = " ".join(words[(i * 3 + j) % len(words)] + str(i * 7 + j)
                         for j in range(30))
        body = f"document body number {i} {picks} "
        rows.append((i, (body + boiler).lower(), "en", "web"))
    # one doc that is ~only boilerplate: quality-passing (plenty of
    # tokens) but reduced below min_kept_chars once the span is excised
    rows.append((8, (boiler + " tiny tail").lower(), "en", "web"))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))

    out = str(tmp_path / "es")
    stats = curate(
        spark, docs, out, seq_tokens=256, min_eq=99,  # disable near-dedup
        exactsubstr_k=30, min_kept_chars=60,
    )
    assert stats["n_after_dedup"] == 9  # quality gate passed everything
    assert stats["n_after_exactsubstr"] == 8  # doc 8 shrank below 60
    curated = spark.read.parquet(out + "/documents")
    with_boiler = curated.filter(
        F.col("text").contains("subscribe newsletter")
    ).collect()
    # the boilerplate survives in exactly one doc — the owner (min id)
    assert len(with_boiler) == 1
    assert with_boiler[0].doc_id == 0
    # non-owners keep their unique bodies
    assert curated.filter(F.col("text").contains(
        "document body number 5")).count() == 1
    # rerun = identical
    stats2 = curate(
        spark, docs, str(tmp_path / "es2"), seq_tokens=256, min_eq=99,
        exactsubstr_k=30, min_kept_chars=60,
    )
    assert stats2 == stats


def test_curate_exactsubstr_does_not_blind_decontam(spark, tmp_path):
    """r13 review: an eval doc that SURVIVES curation up to the
    exactsubstr stage but has a boilerplate span excised (it is not
    the span's min-id owner) must still contribute the excised span's
    grams to the decontamination list — the corpus-side OWNER keeps
    that exact text, so sourcing eval grams from the post-excision
    text would let the contaminated owner escape. Plant: corpus doc 0
    (owner) and eval doc 50 share a long boilerplate span; after span
    removal only doc 0 still carries it; decontam must drop doc 0."""
    import pyspark.sql.functions as F

    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray yankee zulu").split()
    boiler = "shared evaltext " + " ".join(
        f"{words[j % len(words)]}e{j}" for j in range(53)
    )
    rows = []
    for i in range(6):
        picks = " ".join(words[(i * 3 + j) % len(words)] + str(i * 7 + j)
                         for j in range(30))
        body = f"corpus body number {i} {picks} "
        # doc 0 carries the span (and OWNS it: min doc_id); 1-5 don't
        text = (body + boiler) if i == 0 else body + " ".join(
            f"pad{i}x{j}" for j in range(40)
        )
        rows.append((i, text.lower(), "en", "web"))
    eval_body = " ".join(f"evalpad{j}" for j in range(30))
    rows.append((50, (eval_body + " " + boiler).lower(), "en", "heldout"))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))

    out = str(tmp_path / "run")
    stats = curate(
        spark, docs, out, seq_tokens=256, min_eq=99,  # no near-dedup
        exactsubstr_k=30, min_kept_chars=60,
        eval_source="heldout",
    )
    curated = spark.read.parquet(out + "/documents")
    kept = {r.doc_id for r in curated.select("doc_id").collect()}
    assert 50 not in kept  # eval doc always leaves
    assert 0 not in kept, (
        "owner doc 0 kept the eval span but escaped decontamination — "
        "eval grams were sourced from the excised text"
    )
    assert {1, 2, 3, 4, 5} <= kept  # clean docs survive
    assert stats["decontam_n_direct"] >= 1


@pytest.mark.slow
def test_curate_classifier_stage(spark, tmp_path):
    """The model-filter stage trains on the seed source's vocabulary
    and drops off-distribution docs: a synthetic corpus with a
    reference subset (vocab A), in-distribution web docs (vocab A),
    and off-distribution docs (vocab B) keeps the first two and drops
    the third; the seed itself always survives; reruns identical."""
    import pyspark.sql.functions as F

    # 40-word class vocabularies, 30 distinct words per doc — diverse
    # enough to pass the upstream quality stage's repetition rules
    a_words = [f"alpha{k} bravo{k}".split()[k % 2] + str(k) for k in range(40)]
    b_words = [f"zulu{k} xray{k}".split()[k % 2] + str(k) for k in range(40)]

    def text(words, i):
        # every class word exactly once, interleaved with doc-unique
        # fillers — passes the quality stage's repetition rules while
        # keeping a strong shared-vocabulary class signal
        toks = []
        for j in range(40):
            toks.append(words[(i * 7 + j) % 40])
            # filler shared by EVERY doc → class-neutral weight; the
            # interleave still defeats the duplicate-n-gram rules
            toks.append(f"ufill{j}")
        return " ".join(toks)

    rows = []
    for i in range(30):    # seed/reference docs, vocab A
        rows.append((i, text(a_words, i), "en", "wiki"))
    for i in range(30, 60):  # good web docs, vocab A
        rows.append((i, text(a_words, i), "en", "web"))
    for i in range(60, 90):  # off-distribution docs, vocab B
        rows.append((i, text(b_words, i), "en", "web"))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))

    out = str(tmp_path / "run")
    stats = curate(
        spark, docs, out, seq_tokens=256,
        classifier_seed_source="wiki", classifier_min_score=0.0,
    )
    assert stats["n_after_classifier"] == 60  # vocab-B docs dropped
    kept = spark.read.parquet(out + "/documents")
    assert kept.filter(F.col("doc_id") >= 60).count() == 0
    assert kept.filter(F.col("source") == "wiki").count() > 0

    stats2 = curate(
        spark, docs, str(tmp_path / "run2"), seq_tokens=256,
        classifier_seed_source="wiki", classifier_min_score=0.0,
    )
    assert stats2 == stats


@pytest.mark.slow
def test_curate_dsir_targeting_stage(spark, tmp_path):
    """With dsir_target, stage 5 fills the budget by importance
    resampling toward the target source's vocabulary: target-like raw
    docs dominate the selection, the target reference itself stays
    out of the output, reruns are identical, and omitting the budget
    raises."""
    import pytest
    import pyspark.sql.functions as F

    # planted-vocab corpus (the classifier test's shape, but with
    # DOC-UNIQUE fillers so the near-dedup stage keeps every doc):
    # reference docs (vocab A, source=wiki), target-like web docs
    # (vocab A), off-domain web docs (vocab B)
    a_words = [f"alpha{k} bravo{k}".split()[k % 2] + str(k) for k in range(40)]
    b_words = [f"zulu{k} xray{k}".split()[k % 2] + str(k) for k in range(40)]

    def text(words, i):
        # interleave class words with per-(doc, position) 8-hex
        # fillers: the char-shingle Jaccard between any two docs
        # stays far below the near-dup bar (fillers share no
        # shingles), while the class-vocabulary signal the DSIR
        # model keys on stays strong
        toks = []
        for j in range(40):
            toks.append(words[(i * 7 + j) % 40])
            toks.append(f"{(i * 1000 + j) * 2654435761 % 16**8:08x}")
        return " ".join(toks)

    rows = []
    for i in range(30):      # target reference, vocab A
        rows.append((i, text(a_words, i), "en", "wiki"))
    for i in range(30, 60):  # target-like raw docs, vocab A
        rows.append((i, text(a_words, i), "en", "web"))
    for i in range(60, 90):  # off-domain raw docs, vocab B
        rows.append((i, text(b_words, i), "en", "web"))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))

    out = str(tmp_path / "run")
    stats = curate(
        spark, docs, out, budget=20, seq_tokens=256, dsir_target="wiki"
    )
    assert stats["n_curated"] == 20
    assert stats["dsir_n_candidates"] == stats["n_after_dedup"] - 30

    kept = spark.read.parquet(out + "/documents")
    assert kept.count() == 20
    assert kept.filter(F.col("source") == "wiki").count() == 0  # ref only
    # the 20-row budget over 30 target-like + 30 off-domain candidates
    # picks overwhelmingly from the target-like half (importance gap
    # between the vocabularies dwarfs the Gumbel noise scale)
    n_target_like = kept.filter(F.col("doc_id") < 60).count()
    assert n_target_like >= 18

    stats2 = curate(
        spark, docs, str(tmp_path / "run2"), budget=20, seq_tokens=256,
        dsir_target="wiki",
    )
    assert stats2 == stats
    a = sorted(r.doc_id for r in kept.select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "run2") + "/documents")
        .select("doc_id")
        .collect()
    )
    assert a == b

    with pytest.raises(ValueError, match="requires a budget"):
        curate(spark, docs, str(tmp_path / "x"), dsir_target="wiki")
