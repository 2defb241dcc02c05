"""Streaming sessionization + custom stateful operator tests.

session_window is validated by cross-checking the batch form against the
independent lag/running-sum sessionize operator — two different
algorithms, identical session boundaries. The stateful operator runs as
a real AvailableNow stream into a memory sink and must equal the batch
groupBy totals.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators.sessionize import sessionize
from ad_data_pipelines_spark.streaming import sessions
from tests.conftest import SF_SMALL
from ad_data_pipelines_spark.plans import testdata_queries as tq


def _events(spark):
    # registry loader normalizes whichever physical ts type the driver
    # generated (nanos-as-long or micros NTZ) to a UTC timestamp
    return tq.t(spark, SF_SMALL, "events")


def test_session_window_matches_batch_sessionize(spark):
    """Built-in session_window (batch mode) and the lag/running-sum
    operator must agree on every session: same (user, start) keys, same
    event counts and value sums."""
    ev = _events(spark)
    sw = {
        (r.user_id, r.session_start): (r.n_events, r.value_sum)
        for r in sessions.session_window_aggs(ev, "30 minutes", watermark=None)
        .collect()
    }
    ops = {
        (r.user_id, r.session_start): (r.n_events, r.value_sum)
        for r in sessionize(ev, timeout_min=30.0).collect()
    }
    assert sw == ops


def test_running_user_totals_stream(spark, tmp_path):
    """applyInPandasWithState over an AvailableNow stream: final per-user
    cumulative rows equal the batch aggregate."""
    src = tmp_path / "ev_src"
    ck = tmp_path / "ck_state"
    ev = _events(spark)
    ev.write.parquet(str(src))

    stream = sessions.running_user_totals(
        spark.readStream.schema(ev.schema).parquet(str(src))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_running")
        .outputMode("update")
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # keep the LAST update per user (cumulative rows supersede earlier ones)
    got = {
        r.user_id: (r.n_events, r.value_sum)
        for r in spark.sql(
            """
            select user_id, n_events, value_sum from (
                select *, row_number() over (
                    partition by user_id order by n_events desc
                ) rk from t_running
            ) where rk = 1
            """
        ).collect()
    }
    expect = {
        r.user_id: (r.n, r.s)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("s"),
        )
        .collect()
    }
    assert got == expect


def test_session_window_as_real_stream(spark, tmp_path):
    """session_window through an actual AvailableNow streaming query must
    produce the same closed sessions as the batch form (complete mode —
    every session emitted once the stream drains)."""
    src = tmp_path / "ev_sw"
    ck = tmp_path / "ck_sw"
    ev = _events(spark)
    ev.write.parquet(str(src))

    stream = sessions.session_window_aggs(
        spark.readStream.schema(ev.schema).parquet(str(src)), "30 minutes"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start): (r.n_events, r.value_sum)
        for r in spark.sql("select * from t_sessions").collect()
    }
    expect = {
        (r.user_id, r.session_start): (r.n_events, r.value_sum)
        for r in sessions.session_window_aggs(ev, "30 minutes", watermark=None)
        .collect()
    }
    assert got == expect


def test_byte_histogram_features(spark):
    from ad_data_pipelines_spark.operators import multimodal as mm

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)
    rows = mm.byte_histogram_features(docs).collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.features) == mm.FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 1e-9


def test_dedup_within_watermark_stream(spark, tmp_path):
    """Duplicate event_ids arriving in later files inside the watermark
    horizon must be suppressed; the first arrival's row survives."""
    import os

    from ad_data_pipelines_spark.streaming.daily_aggs import read_events_stream
    from ad_data_pipelines_spark.streaming.dedup import dedup_within_watermark

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows1 = [(1, "2025-01-01 10:00:00", 7, "click", 1.0, "{}"),
             (2, "2025-01-01 10:01:00", 7, "click", 2.0, "{}")]
    rows2 = [(1, "2025-01-01 10:05:00", 7, "click", 99.0, "{}"),  # dup id
             (3, "2025-01-01 10:06:00", 8, "view", 3.0, "{}")]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, rows in enumerate([rows1, rows2]):
        (spark.createDataFrame(rows, cols)
         .withColumn("ts", F.to_timestamp("ts"))
         .coalesce(1).write.mode("append").parquet(src))

    deduped = dedup_within_watermark(
        read_events_stream(spark, src, max_files_per_trigger=1),
        ["event_id"],
    )
    q = (deduped.writeStream.format("memory").queryName("dedup_sink")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r.event_id: r.value for r in spark.sql(
        "select * from dedup_sink").collect()}
    assert set(got) == {1, 2, 3}
    # exactly one row per id — the duplicate (value 99.0) dropped OR kept
    # depending on file arrival order within the same micro-batch; with
    # maxFilesPerTrigger=1 arrival order is file order, so 1.0 wins.
    assert got[1] == 1.0


def test_foreach_batch_idempotent_skips_replayed_batches(spark, tmp_path):
    """A replayed batch_id must not be written twice; a new batch_id
    must be. (Crash-replay simulation: call the wrapper directly with
    repeated ids — exactly what a restarted stream does.)"""
    from ad_data_pipelines_spark.streaming.dedup import foreach_batch_idempotent

    written = []
    sink = foreach_batch_idempotent(
        lambda df, bid: written.append((bid, df.count())),
        str(tmp_path / "ledger"),
    )
    df = spark.range(5)
    sink(df, 0)
    sink(df, 0)  # replay after simulated crash
    sink(df, 1)
    assert [b for b, _ in written] == [0, 1]


def test_running_totals_timeout_removes_state():
    """When the processing-time timeout fires (empty batch iterator),
    the update function must remove the idle user's state and must NOT
    re-arm the timeout — otherwise idle-key state grows forever."""
    import pandas as pd

    from ad_data_pipelines_spark.streaming.sessions import (
        make_running_totals_update,
    )

    class FakeState:
        def __init__(self):
            self.hasTimedOut = True
            self.exists = True
            self.get = (7, 21.5)
            self.removed = False
            self.updated = False
            self.rearmed = False

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = True

        def setTimeoutDuration(self, ms):
            self.rearmed = True

    update = make_running_totals_update(timeout_ms=1000)
    state = FakeState()
    out = list(update((42,), iter([]), state))
    assert state.removed and not state.updated and not state.rearmed
    # final cumulative row still emitted
    assert len(out) == 1 and out[0]["n_events"][0] == 7
    assert out[0]["value_sum"][0] == 21.5

    # normal path still accumulates and re-arms
    state2 = FakeState()
    state2.hasTimedOut = False
    state2.get = (1, 1.0)
    out2 = list(update((42,), iter([pd.DataFrame({"value": [2.0]})]), state2))
    assert state2.updated and state2.rearmed and not state2.removed
    assert out2[0]["n_events"][0] == 2


def test_foreach_batch_marker_is_atomic(tmp_path):
    """No .tmp ledger residue after a successful batch, and the marker
    content is the batch id (written via tmp + os.replace)."""
    import os

    from ad_data_pipelines_spark.streaming.dedup import foreach_batch_idempotent

    calls = []
    sink = foreach_batch_idempotent(
        lambda df, bid: calls.append(bid), str(tmp_path / "ledger")
    )
    sink(None, 3)
    sink(None, 3)  # replay: skipped
    assert calls == [3]
    ledger = tmp_path / "ledger"
    assert sorted(p.name for p in ledger.iterdir()) == ["batch-3.done"]
    assert (ledger / "batch-3.done").read_text() == "3"
    assert not any(p.suffix == ".tmp" for p in ledger.iterdir())


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static broadcast join: streamed events enriched with a
    static user dim equal the batch join, and unmatched keys survive
    the left join."""
    from ad_data_pipelines_spark.streaming import daily_aggs as da

    src = tmp_path / "ev_src2"
    ev = _events(spark)
    ev.write.parquet(str(src))
    dim = spark.createDataFrame(
        [(u, f"seg{u % 2}") for u in range(0, 3)],
        "user_id long, segment string",
    )
    enriched = da.enrich_stream(
        spark.readStream.schema(ev.schema).parquet(str(src)), dim, "user_id"
    )
    q = (
        enriched.groupBy("segment")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("t_enriched")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.segment: r.n for r in spark.sql("select * from t_enriched").collect()}
    want = {
        r.segment: r.n
        for r in ev.join(F.broadcast(dim), "user_id", "left")
        .groupBy("segment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and len(got) >= 2


def test_streaming_quality_gate_matches_batch(spark, tmp_path):
    """The streamed keep/quarantine split == the batch quality verdict:
    same pass set, quarantine carries rule flags, partition exhaustive
    and disjoint — doc-local signals make micro-batching exact even
    when the drain runs multiple micro-batches (maxFilesPerTrigger=1)."""
    from ad_data_pipelines_spark.operators.textstats import quality_verdicts
    from ad_data_pipelines_spark.streaming import quality

    docs = tq.t(spark, SF_SMALL, "documents")
    src = tmp_path / "docs_src"
    # several files so AvailableNow runs >1 micro-batch
    docs.repartition(4).write.parquet(str(src))

    expected = {
        r.doc_id: r["pass"] for r in quality_verdicts(docs).collect()
    }

    q = (
        quality.read_docs_stream(spark, str(src), max_files_per_trigger=1)
        .writeStream.foreachBatch(
            lambda b, i: quality._gate_batch(
                b, str(tmp_path / "keep"), str(tmp_path / "quarantine")
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    kept = {r.doc_id for r in spark.read.parquet(str(tmp_path / "keep")).collect()}
    quar = spark.read.parquet(str(tmp_path / "quarantine"))
    quar_ids = {r.doc_id for r in quar.select("doc_id").collect()}
    assert kept == {d for d, p in expected.items() if p}
    assert quar_ids == {d for d, p in expected.items() if not p}
    assert kept.isdisjoint(quar_ids)
    assert "ok_entropy" in quar.columns  # flags ride along for triage


def test_streaming_dsir_gate_matches_batch(spark, tmp_path):
    """The streamed DSIR split == batch `dsir_score` against the same
    batch-fit weight table: same keep set at the median threshold,
    exhaustive + disjoint, exact across multiple micro-batches
    (doc-local scoring, broadcast model, zero streaming state)."""
    from ad_data_pipelines_spark.operators import classify
    from ad_data_pipelines_spark.streaming import dsir as sdsir

    docs = tq.t(spark, SF_SMALL, "documents")
    weights = classify.dsir_bucket_weights(
        classify.hashed_gram_buckets(
            docs.filter(F.col("source") != "src0"), 256
        ),
        classify.hashed_gram_buckets(
            docs.filter(F.col("source") == "src0"), 256
        ),
        n_features=256,
    ).persist()

    batch_scores = {
        r.doc_id: r.log_w
        for r in classify.dsir_score(docs, weights, 256).collect()
    }
    thr = sorted(batch_scores.values())[len(batch_scores) // 2]

    src = tmp_path / "docs_src"
    docs.repartition(4).write.parquet(str(src))
    sdsir.run_dsir_gate_available_now(
        spark,
        str(src),
        weights,
        str(tmp_path / "ck"),
        str(tmp_path / "keep"),
        str(tmp_path / "rest"),
        n_features=256,
        min_log_w=thr,
    )

    keep = spark.read.parquet(str(tmp_path / "keep"))
    kept = {r.doc_id: r.log_w for r in keep.select("doc_id", "log_w").collect()}
    rest_ids = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "rest"))
        .select("doc_id")
        .collect()
    }
    expected_keep = {d for d, w in batch_scores.items() if w >= thr}
    assert set(kept) == expected_keep
    assert all(kept[d] == batch_scores[d] for d in kept)  # bit-equal
    assert kept.keys().isdisjoint(rest_ids)
    assert set(kept) | rest_ids == {r.doc_id for r in docs.collect()}
    weights.unpersist()


def test_jsonl_stream_ingest_quarantine_and_idempotent(spark, tmp_path):
    """AvailableNow JSONL drain: clean rows land in parquet, broken
    lines land verbatim in the quarantine text folder, nothing lands in
    both; a re-run over the same checkpoint ingests nothing new, and
    newly dropped files ingest incrementally."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ad_data_pipelines_spark.sources import jsonl

    src = tmp_path / "drop"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        "not json\n"
        '{"doc_id": 2, "text": "beta"}\n'
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    ck = str(tmp_path / "ck")
    clean_p = str(tmp_path / "clean")
    quar_p = str(tmp_path / "quarantine")

    jsonl.run_jsonl_ingest_available_now(
        spark, str(src), ck, clean_p, quar_p, schema
    )
    got = {(r.doc_id, r.text) for r in spark.read.parquet(clean_p).collect()}
    assert got == {(1, "alpha"), (2, "beta")}
    assert [r.value for r in spark.read.text(quar_p).collect()] == ["not json"]

    # idempotent drain: checkpoint skips the already-ingested file
    jsonl.run_jsonl_ingest_available_now(
        spark, str(src), ck, clean_p, quar_p, schema
    )
    assert spark.read.parquet(clean_p).count() == 2

    # incremental: a new drop ingests only its rows
    (src / "b.jsonl").write_text('{"doc_id": 3, "text": "gamma"}\n')
    jsonl.run_jsonl_ingest_available_now(
        spark, str(src), ck, clean_p, quar_p, schema
    )
    got = {(r.doc_id, r.text) for r in spark.read.parquet(clean_p).collect()}
    assert got == {(1, "alpha"), (2, "beta"), (3, "gamma")}
    assert spark.read.text(quar_p).count() == 1


def test_streaming_near_dedup_matches_batch(spark, tmp_path):
    """The streamed keep/drop split against a static history signature
    table equals the batch incremental-dedup verdicts, across multiple
    micro-batches; dropped docs carry matched_doc evidence; the split
    is exhaustive and disjoint."""
    from ad_data_pipelines_spark.operators import dedup as d
    from ad_data_pipelines_spark.streaming import neardedup

    docs = tq.t(spark, SF_SMALL, "documents")
    history = docs.filter(F.col("doc_id") >= 100)
    incoming = docs.filter(F.col("doc_id") < 100)
    history_sigs = d.minhash_signatures(history).persist()
    history_sigs.count()

    src = tmp_path / "incoming"
    incoming.repartition(3).write.parquet(str(src))

    neardedup.run_near_dedup_available_now(
        spark,
        str(src),
        history_sigs,
        checkpoint=str(tmp_path / "ck"),
        keep_path=str(tmp_path / "keep"),
        drop_path=str(tmp_path / "drop"),
        min_eq=8,
    )

    expected = {
        r.doc_id: (r.kept, r.matched_doc)
        for r in d.dedup_against_corpus(
            d.minhash_signatures(incoming), history_sigs, min_eq=8
        ).collect()
    }
    kept = {r.doc_id for r in spark.read.parquet(str(tmp_path / "keep")).collect()}
    dropped = {
        r.doc_id: r.matched_doc
        for r in spark.read.parquet(str(tmp_path / "drop")).collect()
    }
    assert kept == {d_ for d_, (k, _) in expected.items() if k}
    assert set(dropped) == {d_ for d_, (k, _) in expected.items() if not k}
    for d_, m in dropped.items():
        assert m == expected[d_][1]
    assert kept.isdisjoint(dropped)
    assert len(kept) + len(dropped) == incoming.count()
    history_sigs.unpersist()


def test_streaming_near_dedup_within_batch_duplicates_deterministic(
    spark, tmp_path
):
    """Same-text rows inside one micro-batch collapse to the MIN doc_id
    deterministically; losers land in the drop sink with the keeper as
    matched_doc; NULL-text docs never collapse together; nothing
    vanishes from both sinks."""
    from ad_data_pipelines_spark.operators import dedup as d
    from ad_data_pipelines_spark.streaming import neardedup

    uniq = [
        (i, f"totally unique text number {i} " * 8, "en", "s", 100)
        for i in (1, 2)
    ]
    dups = [
        (10, "identical content " * 10, "en", "s", 100),
        (11, "identical content " * 10, "en", "s", 100),
        (12, "identical content " * 10, "en", "s", 100),
    ]
    nulls = [(20, None, "en", "s", 0), (21, None, "en", "s", 0)]
    batch = spark.createDataFrame(
        uniq + dups + nulls,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    src = tmp_path / "src"
    batch.coalesce(1).write.parquet(str(src))

    history = spark.createDataFrame(
        [(1000, "some historical doc entirely unlike the batch " * 5,
          "en", "s", 100)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    neardedup.run_near_dedup_available_now(
        spark,
        str(src),
        d.minhash_signatures(history),
        checkpoint=str(tmp_path / "ck"),
        keep_path=str(tmp_path / "keep"),
        drop_path=str(tmp_path / "drop"),
    )
    kept = {r.doc_id for r in spark.read.parquet(str(tmp_path / "keep")).collect()}
    dropped = {
        r.doc_id: r.matched_doc
        for r in spark.read.parquet(str(tmp_path / "drop")).collect()
    }
    # min doc_id keeps; 11/12 dropped with keeper 10 as evidence
    assert 10 in kept and dropped.get(11) == 10 and dropped.get(12) == 10
    # NULL texts do NOT collapse together
    assert {20, 21} <= kept
    assert kept.isdisjoint(dropped)
    assert kept | set(dropped) == {1, 2, 10, 11, 12, 20, 21}


def test_streaming_asof_enrich_matches_batch(spark, tmp_path):
    """Per-micro-batch as-of enrichment over a static versioned
    dimension equals one batch asof_join over all events; events
    before any version carry NULL attrs and are not dropped."""
    import datetime as dt

    from ad_data_pipelines_spark.operators.asof import asof_join
    from ad_data_pipelines_spark.streaming import enrich_asof

    events = tq.t(spark, SF_SMALL, "events")
    src = tmp_path / "events_src"
    events.repartition(3).write.parquet(str(src))

    # versioned per-user tier: switch mid-range so both versions match
    T = dt.datetime
    users = [r.user_id for r in events.select("user_id").distinct().collect()]
    dim_rows = []
    for u in users:
        dim_rows.append((u, T(2024, 1, 1), "bronze"))
        dim_rows.append((u, T(2024, 1, 15), "gold"))
    dim = spark.createDataFrame(
        dim_rows, "user_id bigint, valid_from timestamp, tier string"
    )

    enrich_asof.run_asof_enrich_available_now(
        spark,
        str(src),
        dim,
        checkpoint=str(tmp_path / "ck"),
        out_path=str(tmp_path / "out"),
        right_cols=["tier"],
    )

    got = {
        r.event_id: (r.tier, r.asof_ts)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        r.event_id: (r.tier, r.asof_ts)
        for r in asof_join(
            events, dim, on=["user_id"], left_ts="ts",
            right_ts="valid_from", right_cols=["tier"],
        ).collect()
    }
    assert got == want
    assert len(got) == events.count()
    # both versions actually exercised
    assert {t for t, _ in got.values()} == {"bronze", "gold"}


def test_streaming_asof_enrich_refreshes_dim_per_trigger(spark, tmp_path):
    """With a provider-callable dimension, every micro-batch
    re-resolves the history table: a dim rebuilt between triggers is
    visible to the next batch within ONE drain (the long-running
    production stream's freshness contract), and the provider is
    invoked once per micro-batch."""
    import datetime as dt

    from ad_data_pipelines_spark.streaming import enrich_asof

    T = dt.datetime
    events = tq.t(spark, SF_SMALL, "events").limit(40).cache()
    ids = [r.event_id for r in events.select("event_id").collect()]
    half = set(ids[: len(ids) // 2])
    src = tmp_path / "events_src"
    # two single-file batches with known membership
    events.filter(F.col("event_id").isin(half)).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    events.filter(~F.col("event_id").isin(half)).coalesce(1).write.parquet(
        str(src), mode="append"
    )

    users = [r.user_id for r in events.select("user_id").distinct().collect()]

    calls = []

    def provider():
        calls.append(1)
        # the upstream dim job "rebuilt" the table between triggers
        tag = f"v{len(calls)}"
        return spark.createDataFrame(
            [(u, T(2024, 1, 1), tag) for u in users],
            "user_id bigint, valid_from timestamp, tier string",
        )

    enrich_asof.run_asof_enrich_available_now(
        spark,
        str(src),
        provider,
        checkpoint=str(tmp_path / "ck"),
        out_path=str(tmp_path / "out"),
        right_cols=["tier"],
        max_files_per_trigger=1,
    )

    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {r.event_id: r.tier for r in out.collect()}
    assert len(calls) == 2, "provider must be re-invoked per micro-batch"
    assert set(rows) == set(ids)
    # each single-file micro-batch saw exactly one dim version, and the
    # two batches saw DIFFERENT versions
    tiers_a = {rows[i] for i in ids if i in half}
    tiers_b = {rows[i] for i in ids if i not in half}
    assert len(tiers_a) == 1 and len(tiers_b) == 1
    assert tiers_a != tiers_b and tiers_a | tiers_b == {"v1", "v2"}
    events.unpersist()


def test_streaming_psi_monitor_matches_batch_and_flags_shift(
    spark, tmp_path
):
    """Each micro-batch's PSI rows equal the batch operator on that
    batch's file; a batch drawn to match the reference scores ~0 while
    a concentrated batch scores far above the 0.25 'shifted' rule."""
    import datetime as dt

    from ad_data_pipelines_spark.operators.agg import psi_vs_reference
    from ad_data_pipelines_spark.streaming import drift

    T = dt.datetime(2024, 1, 1)
    ref = [0.1] * 10  # uniform over [0, 100) in 10 bins

    def mk(rows):
        return spark.createDataFrame(
            [
                (i, T + dt.timedelta(minutes=i), i % 7, "x", float(v), "{}")
                for i, v in enumerate(rows)
            ],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )

    # batch 1 matches the reference exactly; batch 2 is concentrated
    matching = mk([b * 10 + 5 for b in range(10) for _ in range(20)])
    shifted = mk([42.0] * 150)
    src = tmp_path / "src"
    matching.coalesce(1).write.parquet(str(src), mode="append")
    shifted.coalesce(1).write.parquet(str(src), mode="append")

    drift.run_psi_monitor_available_now(
        spark,
        str(src),
        checkpoint=str(tmp_path / "ck"),
        out_path=str(tmp_path / "out"),
        ref_props=ref,
        lo=0.0,
        hi=100.0,
        group_cols=["event_type"],
        max_files_per_trigger=1,
    )
    out = spark.read.parquet(str(tmp_path / "out")).collect()
    assert len(out) == 2  # one group row per micro-batch
    by_n = {r.n_values: r for r in out}
    assert set(by_n) == {200, 150}
    assert abs(by_n[200].psi) < 1e-9, "matching batch must score ~0"
    assert by_n[150].psi > 0.25, "concentrated batch must flag as shifted"

    # streamed scores == the batch operator applied per batch
    for batch, n in ((matching, 200), (shifted, 150)):
        want = psi_vs_reference(
            batch, "value", ["event_type"], ref, 0.0, 100.0
        ).collect()[0]
        assert (want.n_values, want.psi) == (n, by_n[n].psi)


def test_streaming_near_dedup_refreshes_history_per_trigger(
    spark, tmp_path
):
    """With a provider-callable history, each micro-batch gates
    against the signature table current AT THAT TRIGGER: a doc the
    corpus absorbed after batch 1 (upstream artifact republish)
    already rejects its copy in batch 2 within the same drain."""
    from ad_data_pipelines_spark.operators import dedup as dd
    from ad_data_pipelines_spark.streaming import neardedup

    t_a = "the quick brown fox jumps over the lazy dog again and again"
    t_b = "a completely different document about spark shuffles at scale"

    def docs(rows):
        return spark.createDataFrame(
            [(i, txt, "en", "s", len(txt)) for i, txt in rows],
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        )

    src = tmp_path / "docs_src"
    docs([(1, t_a)]).coalesce(1).write.parquet(str(src), mode="append")
    docs([(2, t_a), (3, t_b)]).coalesce(1).write.parquet(
        str(src), mode="append"
    )

    calls = []

    def history_provider():
        calls.append(1)
        if len(calls) == 1:
            # initial history: nothing — doc 1 is novel
            return dd.minhash_signatures(docs([(100, t_b)]).limit(0))
        # upstream republished: batch 1's keeper is now history
        return dd.minhash_signatures(docs([(1, t_a)]))

    neardedup.run_near_dedup_available_now(
        spark,
        str(src),
        history_provider,
        checkpoint=str(tmp_path / "ck"),
        keep_path=str(tmp_path / "keep"),
        drop_path=str(tmp_path / "drop"),
        max_files_per_trigger=1,
    )

    kept = {r.doc_id for r in spark.read.parquet(
        str(tmp_path / "keep")).collect()}
    drops = {r.doc_id: r.matched_doc for r in spark.read.parquet(
        str(tmp_path / "drop")).collect()}
    assert len(calls) == 2, "history must re-resolve per micro-batch"
    assert kept == {1, 3}, kept          # doc 1 novel then; doc 3 novel
    assert drops == {2: 1}, drops        # doc 2 rejected by refreshed history


def test_stream_stream_attribution_join_matches_batch(spark, tmp_path):
    """Both sides streaming: the watermarked time-range join over an
    AvailableNow drain equals the batch inequality join on the same
    data — including cross-micro-batch pairs (click in file 1,
    purchase in file 2) — and the half-open [click, click+window)
    bound holds at both edges."""
    import datetime as dt

    from ad_data_pipelines_spark.streaming import stream_join

    T = dt.datetime(2024, 1, 1)

    def ev(rows):
        return spark.createDataFrame(
            [
                (i, ts, u, "x", 0.0, "{}")
                for i, ts, u in rows
            ],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )

    H = dt.timedelta(hours=1)
    clicks_1 = ev([(1, T, 10), (2, T + 2 * H, 11)])
    clicks_2 = ev([(3, T + 50 * H, 10)])
    purch_1 = ev([(101, T + 5 * H, 10)])        # matches click 1
    purch_2 = ev([
        (102, T + 51 * H, 10),                  # matches clicks 1? (51h<168h: yes) and 3
        (103, T, 10),                           # same instant as click 1 → inside
        (104, T + 168 * H, 10),                 # exactly click1+window → outside
        (105, T + 3 * H, 99),                   # no such user's click
    ])

    c_src, p_src = tmp_path / "clicks", tmp_path / "purch"
    clicks_1.coalesce(1).write.parquet(str(c_src), mode="append")
    clicks_2.coalesce(1).write.parquet(str(c_src), mode="append")
    purch_1.coalesce(1).write.parquet(str(p_src), mode="append")
    purch_2.coalesce(1).write.parquet(str(p_src), mode="append")

    stream_join.run_attribution_available_now(
        spark,
        str(c_src),
        str(p_src),
        checkpoint=str(tmp_path / "ck"),
        out_path=str(tmp_path / "out"),
        max_files_per_trigger=1,
    )
    got = {
        (r.click_id, r.purchase_id): r.lag_hours
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }

    clicks_all = clicks_1.unionAll(clicks_2)
    purch_all = purch_1.unionAll(purch_2)
    want = {
        (r.click_id, r.purchase_id): r.lag_hours
        for r in stream_join.clicks_purchases_joined(
            clicks_all, purch_all
        ).collect()
    }
    assert got == want and got, (got, want)
    assert (1, 101) in got and got[(1, 101)] == 5.0
    assert (1, 103) in got and got[(1, 103)] == 0.0   # same-instant: inside
    assert (3, 102) in got and got[(3, 102)] == 1.0
    # purchase at exactly click1+window is OUTSIDE click 1's half-open
    # window (it still matches the later click 3, legitimately)
    assert (1, 104) not in got, "purchase at +window leaked into click 1"
    assert (3, 104) in got
    assert all(pid != 105 for _, pid in got), "userless purchase leaked in"


@pytest.mark.slow
def test_stream_stream_left_outer_emits_on_watermark_finality(
    spark, tmp_path
):
    """Left-outer stream-stream join: an unconverted click emits its
    NULL-purchase row only once the watermark passes its window end;
    a click whose window is still open stays in checkpointed state and
    emits in a LATER drain when new data advances the watermark."""
    import datetime as dt

    from ad_data_pipelines_spark.streaming import stream_join

    T = dt.datetime(2024, 1, 1)
    D = dt.timedelta(days=1)

    def ev(rows):
        return spark.createDataFrame(
            [(i, ts, u, "x", 0.0, "{}") for i, ts, u in rows],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )

    c_src, p_src = tmp_path / "clicks", tmp_path / "purch"
    # click A (user 10): never converts, window [T, T+1d)
    # click B (user 11) at T+30d: never converts, window still open
    # click C (user 13) at T+29d: converts 2h later
    ev([(1, T, 10), (2, T + 30 * D, 11), (3, T + 29 * D, 13)]).coalesce(
        1
    ).write.parquet(str(c_src), mode="append")
    ev([(101, T + 29 * D + dt.timedelta(hours=2), 13)]).coalesce(
        1
    ).write.parquet(str(p_src), mode="append")

    kw = dict(
        checkpoint=str(tmp_path / "ck"),
        out_path=str(tmp_path / "out"),
        window="1 day",
        watermark="1 hour",
        how="left_outer",
    )
    stream_join.run_attribution_available_now(
        spark, str(c_src), str(p_src), **kw
    )
    rows1 = {
        r.click_id: r.purchase_id
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert rows1.get(3) == 101          # converted pair emits
    assert 1 in rows1 and rows1[1] is None  # A finalized unconverted
    assert 2 not in rows1               # B's window still open

    # drain 2: far-future events on BOTH streams (the query watermark
    # is the MIN across inputs) push the watermark past B's window
    # end; the checkpointed state releases B as unconverted
    ev([(102, T + 40 * D, 99)]).coalesce(1).write.parquet(
        str(p_src), mode="append"
    )
    ev([(4, T + 40 * D, 98)]).coalesce(1).write.parquet(
        str(c_src), mode="append"
    )
    stream_join.run_attribution_available_now(
        spark, str(c_src), str(p_src), **kw
    )
    rows2 = {
        r.click_id: r.purchase_id
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert rows2.get(2, "absent") is None, rows2  # B emitted, unconverted
    assert len([k for k in rows2]) == 3


def test_streaming_exactsubstr_gate_matches_single_shot(spark, tmp_path):
    """The streamed keep/drop split against a static history gram table
    equals one-shot application of the per-batch verdict function (a
    doc's verdict depends only on history, never on its micro-batch
    companions, so ANY file split gives identical results); the split
    is exhaustive and disjoint and kept docs carry excised text."""
    from ad_data_pipelines_spark.operators import dedup as d
    from ad_data_pipelines_spark.streaming import exactsubstr

    docs = tq.t(spark, SF_SMALL, "documents")
    history = docs.filter(F.col("doc_id") >= 100)
    incoming = docs.filter(F.col("doc_id") < 100)
    history_grams = d.corpus_gram_table(history, k=20).persist()
    history_grams.count()

    src = tmp_path / "incoming"
    incoming.repartition(3).write.parquet(str(src))

    exactsubstr.run_exactsubstr_gate_available_now(
        spark,
        str(src),
        history_grams,
        checkpoint=str(tmp_path / "ck"),
        keep_path=str(tmp_path / "keep"),
        drop_path=str(tmp_path / "drop"),
        k=20,
        min_kept_chars=50,
    )

    expected = {
        r.doc_id: (r.removed_chars, r.kept_chars, r.kept_text)
        for r in exactsubstr.exactsubstr_batch_verdicts(
            incoming, history_grams, k=20
        ).collect()
    }
    kept = {r.doc_id: r for r in spark.read.parquet(
        str(tmp_path / "keep")).collect()}
    import os

    dropped = (
        {r.doc_id: r for r in spark.read.parquet(
            str(tmp_path / "drop")).collect()}
        if os.listdir(str(tmp_path / "drop"))
        else {}
    )
    assert set(kept) | set(dropped) == set(expected)
    assert set(kept).isdisjoint(dropped)
    for d_, r in kept.items():
        want = expected[d_]
        assert want[1] >= 50
        assert (r.removed_chars, r.kept_chars, r.text) == want, d_
    for d_, r in dropped.items():
        assert expected[d_][1] < 50
        assert r.kept_chars == expected[d_][1]
    # the word-salad corpus guarantees real excision happened
    assert any(r.removed_chars > 0 for r in kept.values()) or dropped
    history_grams.unpersist()


def test_streaming_exactsubstr_history_refreshes_per_trigger(
    spark, tmp_path
):
    """With a callable history, a block first seen in micro-batch 1 is
    already owned by the corpus when micro-batch 2 arrives: the later
    copy is excised, the first stays intact — the per-trigger artifact
    refresh shape (upstream batch job republishes the gram table)."""
    from ad_data_pipelines_spark.operators import dedup as d
    from ad_data_pipelines_spark.streaming import exactsubstr
    from ad_data_pipelines_spark.streaming.quality import DOCS_SCHEMA

    block = "SHARED-BOILERPLATE-BLOCK-0123456789"  # 35 chars ≥ k
    fill_a = "unique first document body " * 3
    fill_b = "entirely different second body " * 3
    rows1 = [(1, fill_a + block, "en", "web", len(fill_a + block))]
    rows2 = [(2, fill_b + block, "en", "web", len(fill_b + block))]
    src = tmp_path / "in"
    import os

    os.makedirs(str(src))
    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    keep = str(tmp_path / "keep")
    empty_docs = spark.createDataFrame([], DOCS_SCHEMA)

    def resolve():
        base = d.corpus_gram_table(empty_docs, k=20)
        if os.path.exists(keep) and any(
            f.endswith(".parquet") for f in os.listdir(keep)
        ):
            accepted = spark.read.parquet(keep).select(
                "doc_id", "text"
            )
            return base.unionByName(d.corpus_gram_table(accepted, k=20))
        return base

    exactsubstr.run_exactsubstr_gate_available_now(
        spark,
        str(src),
        resolve,
        checkpoint=str(tmp_path / "ck"),
        keep_path=keep,
        drop_path=str(tmp_path / "drop"),
        k=20,
        min_kept_chars=10,
        max_files_per_trigger=1,
    )
    out = {r.doc_id: r for r in spark.read.parquet(keep).collect()}
    assert set(out) == {1, 2}
    assert block in out[1].text          # first arrival keeps the block
    assert block not in out[2].text      # later copy excised
    assert out[2].removed_chars >= len(block)
    assert out[2].text.startswith(fill_b[:20])


def test_streaming_hotkey_monitor_equals_batch_sketch_and_skips_replay(
    spark, tmp_path
):
    """The streamed Count-Min sketch over two micro-batches equals the
    batch sketch of the whole feed (CMS is deterministic, merge is
    exact addition); a crash-replayed batch_id is a no-op (no
    double-count); a second availableNow run changes nothing."""
    import shutil

    from ad_data_pipelines_spark.operators import sketch as sk
    from ad_data_pipelines_spark.streaming import hotkeys

    src = tmp_path / "src"
    src.mkdir()
    b1 = spark.range(500).select(
        (F.col("id") % 40).cast("string").alias("k")
    )
    b2 = spark.range(500, 900).select(
        F.when(F.col("id") % 3 == 0, "hot").otherwise(
            (F.col("id") % 40).cast("string")
        ).alias("k")
    )
    for i, b in enumerate([b1, b2], start=1):
        d = tmp_path / f"stage{i}"
        b.coalesce(1).write.parquet(str(d))
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        shutil.move(str(part), str(src / f"f{i}.parquet"))

    root = str(tmp_path / "sketch")
    hotkeys.run_hotkey_monitor_available_now(
        spark, str(src), "k string", "k", root,
        checkpoint=str(tmp_path / "ck"), width=256, depth=4,
        max_files_per_trigger=1,
    )

    whole = b1.unionByName(b2)
    want = {
        (r.row, r.bucket): r.cnt
        for r in sk.count_min_table(whole, "k", width=256, depth=4).collect()
    }
    got_df = hotkeys.read_sketch(spark, root)
    got = {(r.row, r.bucket): r.cnt for r in got_df.collect()}
    assert got == want

    # estimates from the streamed sketch never undercount the truth
    est = {
        r.k: r.est
        for r in sk.cms_estimates(
            got_df, whole, "k", width=256, depth=4
        ).collect()
    }
    exact = {r.k: r.cnt for r in whole.groupBy("k").count()
             .withColumnRenamed("count", "cnt").collect()}
    assert all(est[k] >= v for k, v in exact.items())

    # version accumulation bounded: current + at most one prior
    import os as _os

    n_vers = len([d for d in _os.listdir(root) if d.startswith("v")])
    assert n_vers <= 2, n_vers

    # replayed batch_id → no-op, sketch unchanged
    st = hotkeys._state(root)
    assert not hotkeys.apply_batch(spark, root, b2, st["batch_id"], "k",
                                   width=256, depth=4)
    assert {(r.row, r.bucket): r.cnt
            for r in hotkeys.read_sketch(spark, root).collect()} == want

    # second availableNow run over the same source: checkpoint skips
    hotkeys.run_hotkey_monitor_available_now(
        spark, str(src), "k string", "k", root,
        checkpoint=str(tmp_path / "ck"), width=256, depth=4,
    )
    assert {(r.row, r.bucket): r.cnt
            for r in hotkeys.read_sketch(spark, root).collect()} == want


def test_streaming_cdc_drops_null_key_rows_for_replay_safety(
    spark, tmp_path
):
    """merge_plan pins NULL-key change rows as always-INSERT, so a
    crash-replayed micro-batch containing them would duplicate table
    rows. The streaming applier drops them (logged) before applying:
    the final table carries no NULL-key row from the feed and the
    non-NULL changes apply normally."""
    import shutil

    from ad_data_pipelines_spark.operators import merge as M
    from ad_data_pipelines_spark.streaming import cdc

    root = str(tmp_path / "tbl")
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)],
        "id bigint, name string, amount double",
    )
    M.table_init(target, root)

    schema = "id bigint, name string, amount double, op string, seq bigint"
    src = tmp_path / "changes"
    src.mkdir()
    batch = spark.createDataFrame(
        [
            (None, "ghost", 99.0, "I", 1),  # NULL key → dropped
            (2, "b1", 21.0, "U", 2),
            (3, "c", 30.0, "I", 3),
        ],
        schema,
    )
    d = tmp_path / "stage"
    batch.coalesce(1).write.parquet(str(d))
    part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
    shutil.move(str(part), str(src / "f1.parquet"))

    cdc.run_cdc_apply_available_now(
        spark, str(src), schema, root, ["id"],
        checkpoint=str(tmp_path / "ck"),
    )
    got = {r.id: (r.name, r.amount)
           for r in M.table_read(spark, root).collect()}
    assert got == {1: ("a", 10.0), 2: ("b1", 21.0), 3: ("c", 30.0)}
    assert None not in got


def test_hotkey_sketch_rejects_foreign_checkpoint_batch_ids(
    spark, tmp_path
):
    """Batch ids are only comparable within one checkpoint lineage: a
    sketch committed by stream A must RAISE when stream B (recreated /
    relocated checkpoint, ids restarting at 0) tries to apply — the
    silent-skip mode that would freeze the sketch forever. Identity is
    adopted on first commit and None (direct batch callers) skips the
    check."""
    from ad_data_pipelines_spark.streaming import hotkeys

    root = str(tmp_path / "sketch")
    b = spark.range(100).select((F.col("id") % 7).cast("string").alias("k"))

    # adopt identity on first commit
    assert hotkeys.apply_batch(
        spark, root, b, 0, "k", width=64, depth=2, stream_id="qid-A"
    )
    assert hotkeys._state(root)["stream_id"] == "qid-A"

    # same stream: replayed batch_id → no-op, later batch applies
    assert not hotkeys.apply_batch(
        spark, root, b, 0, "k", width=64, depth=2, stream_id="qid-A"
    )
    assert hotkeys.apply_batch(
        spark, root, b, 1, "k", width=64, depth=2, stream_id="qid-A"
    )

    # foreign stream with restarted ids: raise, never silently skip
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="qid-B"):
        hotkeys.apply_batch(
            spark, root, b, 0, "k", width=64, depth=2, stream_id="qid-B"
        )

    # identity-less caller keeps the committed identity
    assert not hotkeys.apply_batch(
        spark, root, b, 1, "k", width=64, depth=2
    )
    assert hotkeys._state(root)["stream_id"] == "qid-A"

    # the streaming runner derives the identity from the checkpoint's
    # metadata file (query id) — verify the reader helper
    ck = tmp_path / "ck2"
    ck.mkdir()
    (ck / "metadata").write_text('{"id": "qid-from-metadata"}')
    assert hotkeys._checkpoint_query_id(str(ck)) == "qid-from-metadata"
    assert hotkeys._checkpoint_query_id(str(tmp_path / "absent")) is None


def test_streaming_psi_monitor_with_trained_quantile_edges(
    spark, tmp_path
):
    """The monitor's trained-edges mode: decile boundaries trained on
    a heavy-tailed reference period score each micro-batch exactly as
    the batch `psi_vs_reference_edges` operator does — a
    reference-like batch ~0, a tail-concentrated batch shifted — with
    the boundaries as pinned literals (zero streaming state, same as
    the equal-width mode)."""
    import datetime as dt

    from ad_data_pipelines_spark.operators import agg
    from ad_data_pipelines_spark.streaming import drift

    T = dt.datetime(2024, 1, 1)

    def mk(values):
        return spark.createDataFrame(
            [
                (i, T + dt.timedelta(minutes=i), i % 7, "x", float(v), "{}")
                for i, v in enumerate(values)
            ],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )

    # heavy-tailed training period → trained decile edges
    train_vals = [2.718 ** ((i * 97 % 1000) / 150.0) for i in range(2000)]
    train = mk(train_vals)
    edges = agg.quantile_bin_edges(train, "value", 10, exact=True)
    props = [0.1] * 10

    like_ref = mk(train_vals[::4])          # same distribution
    concentrated = mk([1.05] * 150)         # all in the bottom decile
    src = tmp_path / "src"
    like_ref.coalesce(1).write.parquet(str(src), mode="append")
    concentrated.coalesce(1).write.parquet(str(src), mode="append")

    drift.run_psi_monitor_available_now(
        spark,
        str(src),
        checkpoint=str(tmp_path / "ck"),
        out_path=str(tmp_path / "out"),
        ref_props=props,
        group_cols=["event_type"],
        max_files_per_trigger=1,
        edges=edges,
    )
    out = spark.read.parquet(str(tmp_path / "out")).collect()
    assert len(out) == 2
    by_n = {r.n_values: r for r in out}
    assert abs(by_n[500].psi) < 0.02, "reference-like batch scores ~0"
    assert by_n[150].psi > 0.25, "tail-concentrated batch flags"

    # streamed == batch operator, per batch
    for batch, n in ((like_ref, 500), (concentrated, 150)):
        want = agg.psi_vs_reference_edges(
            batch, "value", ["event_type"], props, edges
        ).collect()[0]
        assert (want.n_values, want.psi) == (n, by_n[n].psi)


def test_streaming_hll_shard_maintainer_matches_batch_and_replay(
    spark, tmp_path
):
    """The streaming HLL shard maintainer drained over N micro-batches
    produces per-shard distinct estimates EQUAL to the one-shot batch
    `hll_shard_table` over the same data (sparse-mode exactness at
    test cardinality), composes to the exact global distinct via
    `hll_union_estimate`, and — unlike the additive CMS monitor —
    re-applying an identical batch is a no-op by register-max algebra,
    no batch-id guard needed."""
    import datetime as dt

    from ad_data_pipelines_spark.operators import merge, sketch
    from ad_data_pipelines_spark.streaming import distincts

    T = dt.datetime(2024, 1, 1)

    def mk(day, uids):
        return spark.createDataFrame(
            [
                (i, T + dt.timedelta(days=day, minutes=i), int(u), "x", 1.0, "{}")
                for i, u in enumerate(uids)
            ],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )

    # three files → three micro-batches; day 1 spans two batches and
    # uid 7 appears on both days (the cross-shard overlap case)
    b1 = mk(0, [1, 2, 3, 7, 7, 2])
    b2 = mk(1, [7, 8, 9])
    b3 = mk(1, [9, 10, 11, 8])
    src = tmp_path / "src"
    for b in (b1, b2, b3):
        b.coalesce(1).write.parquet(str(src), mode="append")

    derive = lambda df: df.withColumn("day", F.to_date("ts"))  # noqa: E731
    root = str(tmp_path / "shards")
    distincts.run_hll_shard_maintainer_available_now(
        spark,
        str(src),
        checkpoint=str(tmp_path / "ck"),
        shard_root=root,
        key_col="user_id",
        shard_cols=("day",),
        derive=derive,
        max_files_per_trigger=1,
    )

    shards = merge.table_read(spark, root)
    assert shards.count() == 2  # one row per day, however many batches

    whole = b1.unionByName(b2).unionByName(b3)
    want = {
        r.day: r.est
        for r in sketch.hll_union_estimate(
            sketch.hll_shard_table(derive(whole), "user_id", ["day"]),
            ["day"],
        ).selectExpr("day", "n_distinct_est as est").collect()
    }
    got = {
        r.day: r.est
        for r in sketch.hll_union_estimate(shards, ["day"])
        .selectExpr("day", "n_distinct_est as est")
        .collect()
    }
    assert got == want == {
        dt.date(2024, 1, 1): 4.0,   # {1,2,3,7}
        dt.date(2024, 1, 2): 5.0,   # {7,8,9,10,11}
    }
    # global grain: sketch union counts uid 7 once across days
    assert (
        sketch.hll_union_estimate(shards).collect()[0].n_distinct_est == 8.0
    )

    # replay algebra: re-applying an already-applied batch changes
    # nothing (register-max), though it commits a new version
    v_before = merge.table_current_version(root)
    distincts.apply_batch(derive(b2), root, "user_id", ["day"])
    assert merge.table_current_version(root) != v_before
    again = {
        r.day: r.est
        for r in sketch.hll_union_estimate(merge.table_read(spark, root), ["day"])
        .selectExpr("day", "n_distinct_est as est")
        .collect()
    }
    assert again == want

    # version accumulation is bounded (vacuum_keep=2 reader-grace
    # contract): 4 commits happened, ≤2 version dirs remain
    import os

    versions = [d for d in os.listdir(root) if d.startswith("v")]
    assert len(versions) <= 2


def test_streaming_histogram_maintainer_matches_batch_and_guards(
    spark, tmp_path
):
    """The streaming histogram maintainer drained over N micro-batches
    equals the one-shot batch shard table exactly (counts are exact
    integers), quantiles served from the artifact match the batch
    operator, a replayed batch_id is a no-op (additive counts need the
    guard — contrast the HLL maintainer), and versions stay bounded."""
    import datetime as dt

    from ad_data_pipelines_spark.operators import sketch
    from ad_data_pipelines_spark.streaming import histograms

    T = dt.datetime(2024, 3, 1)

    def mk(day, values):
        return spark.createDataFrame(
            [
                (i, T + dt.timedelta(days=day, minutes=i), i % 5, "x",
                 float(v), "{}")
                for i, v in enumerate(values)
            ],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )

    bounds = [0.0, 25.0, 50.0, 75.0, 100.0]
    b1 = mk(0, [float((i * 37) % 100) for i in range(300)])
    b2 = mk(1, [float((i * 53) % 100) for i in range(200)])
    b3 = mk(1, [120.0, -3.0] * 25)  # clamp rows, same day as b2
    src = tmp_path / "src"
    for b in (b1, b2, b3):
        b.coalesce(1).write.parquet(str(src), mode="append")

    derive = lambda df: df.withColumn("day", F.to_date("ts"))  # noqa: E731
    root = str(tmp_path / "hist")
    histograms.run_histogram_maintainer_available_now(
        spark,
        str(src),
        checkpoint=str(tmp_path / "ck"),
        shard_root=root,
        value_col="value",
        bounds=bounds,
        shard_cols=("day",),
        derive=derive,
        max_files_per_trigger=1,
    )

    shards = histograms.read_shards(spark, root)
    whole = derive(b1.unionByName(b2).unionByName(b3))
    want_shards = sketch.histogram_shard_table(whole, "value", bounds, ["day"])
    key = lambda r: (r.day, r.bin)  # noqa: E731
    assert {key(r): r.n for r in shards.collect()} == {
        key(r): r.n for r in want_shards.collect()
    }

    got_q = sorted(
        map(
            tuple,
            sketch.histogram_union_quantiles(
                shards, bounds, [0.5, 0.9], ["day"]
            ).collect(),
        )
    )
    want_q = sorted(
        map(
            tuple,
            sketch.histogram_union_quantiles(
                want_shards, bounds, [0.5, 0.9], ["day"]
            ).collect(),
        )
    )
    assert got_q == want_q and len(got_q) == 4

    # replayed batch_id: no-op (False), artifact unchanged
    before = {key(r): r.n for r in histograms.read_shards(spark, root).collect()}
    assert (
        histograms.apply_batch(
            spark, root, derive(b3), 2, "value", bounds, ["day"]
        )
        is False
    )
    assert {
        key(r): r.n for r in histograms.read_shards(spark, root).collect()
    } == before

    # mismatched bounds must fail loudly, never silently merge
    import pytest

    with pytest.raises(ValueError, match="bounds"):
        histograms.apply_batch(
            spark, root, derive(b3), 50, "value", [0.0, 50.0, 100.0], ["day"]
        )

    # higher batch_id applies; versions stay bounded at 2
    import os

    assert histograms.apply_batch(
        spark, root, derive(mk(2, [10.0])), 99, "value", bounds, ["day"]
    )
    versions = [d for d in os.listdir(root) if d.startswith("v")]
    assert len(versions) <= 2


def test_streaming_bloom_decontam_matches_batch_and_idempotent(
    spark, tmp_path
):
    """The streamed decontamination gate == the batch bloom pass: the
    quarantined doc set AND its per-doc flagged-gram evidence equal
    bloom_contamination_filter's output over the same corpus (the
    probe is doc-local, so micro-batching at maxFilesPerTrigger=1 is
    exact), keep/quarantine partition the corpus exhaustively and
    disjointly, and a re-drain over the same checkpoint appends
    nothing (replay idempotence)."""
    from ad_data_pipelines_spark.operators import dedup as _dedup
    from ad_data_pipelines_spark.streaming import decontam

    docs = tq.t(spark, SF_SMALL, "documents").filter(F.col("doc_id") < 120)
    evals = docs.filter(F.col("doc_id") < 25)
    corpus = docs.filter(F.col("doc_id") >= 25)

    # the list artifact an upstream job would materialize
    eval_grams = (
        _dedup.word_ngram_hashes(evals, 8).select("gh").distinct()
    )
    words = _dedup.bloom_bits(eval_grams, k=5, bits_log2=18)
    words.write.parquet(str(tmp_path / "bloom_words"))
    words_tbl = spark.read.parquet(str(tmp_path / "bloom_words"))

    # batch truth: the same operator over the same corpus
    expected = {
        r.doc_id: r.n
        for r in (
            _dedup.bloom_hit_grams_from_words(
                _dedup.word_ngram_hashes(corpus, 8), words_tbl
            )
            .groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n"))
            .collect()
        )
    }
    assert expected, "fixture must flag at least one doc"

    src = tmp_path / "docs_src"
    corpus.repartition(4).write.parquet(str(src))
    ck = str(tmp_path / "ck")
    keep_p = str(tmp_path / "keep")
    quar_p = str(tmp_path / "quarantine")

    decontam.run_bloom_decontam_available_now(
        spark, str(src), words_tbl, ck, keep_p, quar_p,
        max_files_per_trigger=1,
    )

    quar = {
        r.doc_id: r.n_flagged_ngrams
        for r in spark.read.parquet(quar_p).collect()
    }
    kept = {r.doc_id for r in spark.read.parquet(keep_p).collect()}
    n_corpus = corpus.count()
    assert quar == expected
    assert kept.isdisjoint(quar)
    assert len(kept) + len(quar) == n_corpus

    # replay idempotence: same checkpoint, nothing new appends
    decontam.run_bloom_decontam_available_now(
        spark, str(src), words_tbl, ck, keep_p, quar_p,
        max_files_per_trigger=1,
    )
    assert spark.read.parquet(keep_p).count() == len(kept)
    assert spark.read.parquet(quar_p).count() == len(quar)
