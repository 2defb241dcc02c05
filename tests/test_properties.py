"""Hypothesis property tests for the semantics that are easiest to get
subtly wrong (SURVEY.md §5-3): sessionization partitioning, bin
closure/totality, rollup additivity, and the transfer-count
adjacent-difference identity.

Spark round-trips are slow per example, so each property runs a small
number of generated cases but with adversarial shapes (duplicate
timestamps, exact-boundary gaps, empty groups).
"""

from __future__ import annotations

import datetime as dt

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators.sessionize import sessionize

BASE = dt.datetime(2025, 1, 1)

# events: per-user lists of (offset_minutes, value); offsets may repeat
# and may land exactly on the 30-minute timeout boundary.
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),          # user_id
        st.integers(min_value=0, max_value=600),        # minute offset
        st.sampled_from([0.0, 1.5, 30.0, 60.0]),        # value
    ),
    min_size=1,
    max_size=25,
)


@given(events_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sessionize_partitions_events(spark, evs):
    """Sessions exactly partition each user's events: per-user session
    event counts sum to the user's event count, and consecutive events
    within a session are ≤ timeout apart while session boundaries are
    > timeout apart (boundary gap == timeout stays in-session)."""
    rows = [
        (i, BASE + dt.timedelta(minutes=off), u, v)
        for i, (u, off, v) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = sessionize(df, timeout_min=30.0).collect()

    per_user_events: dict[int, list[dt.datetime]] = {}
    for _, ts, u, _v in rows:
        per_user_events.setdefault(u, []).append(ts)

    # 1. counts partition the events
    got_counts: dict[int, int] = {}
    for r in out:
        got_counts[r.user_id] = got_counts.get(r.user_id, 0) + r.n_events
    assert got_counts == {u: len(v) for u, v in per_user_events.items()}

    # 2. independent oracle: sequential scan per user
    for u, stamps in per_user_events.items():
        stamps.sort()
        expected_sessions = 1
        for a, b in zip(stamps, stamps[1:]):
            if (b - a).total_seconds() > 30 * 60:
                expected_sessions += 1
        got_sessions = sum(1 for r in out if r.user_id == u)
        assert got_sessions == expected_sessions, (u, stamps)


@given(
    st.lists(
        st.floats(
            min_value=-1.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bins_total_and_exclusive(spark, values):
    """Every value lands in exactly one right-closed bin label
    (P15 totality — boundary values included on the right)."""
    from ad_data_pipelines_spark.functions.binning import right_closed_bins

    df = spark.createDataFrame([(v,) for v in values], "x double")
    edges = [0.0, 5.0, 10.0, 20.0, float("inf")]
    labels = ["0-5", "5-10", "10-20", "20+"]
    out = df.withColumn(
        "bin", right_closed_bins("x", edges, labels)
    ).collect()
    for r in out:
        if r.x < 0:
            # below the first edge: reference pd.cut(include_lowest)
            # semantics are engine-policy; just require a defined label
            assert r.bin is None or isinstance(r.bin, str)
        elif r.x <= 5.0:
            assert r.bin == "0-5"
        elif r.x <= 10.0:
            assert r.bin == "5-10"
        elif r.x <= 20.0:
            assert r.bin == "10-20"
        else:
            assert r.bin == "20+"


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rollup_overall_additivity(spark, rows):
    """A9: per-region additive measures must sum exactly to the
    'overall' row produced by the grouping-set rollup."""
    from ad_data_pipelines_spark.operators.agg import rollup_overall

    df = spark.createDataFrame(rows, "region string, v int")
    out = rollup_overall(
        df, [], "region", [F.sum("v").alias("sv")], overall_label="overall"
    ).collect()
    per_region = sum(r.sv for r in out if r.region != "overall")
    overall = next(r.sv for r in out if r.region == "overall")
    assert per_region == overall


edge_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=0, max_value=40),
    ).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=60,
)


@given(edge_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_connected_components_paths_agree(spark, raw_edges):
    """Driver union-find and distributed label propagation must produce
    identical min-root labelings on arbitrary graphs (self-loops
    excluded), and each labeling must be a valid partition: every
    node's component is the min id of its transitive closure."""
    from ad_data_pipelines_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(a, b) for a, b in raw_edges], "doc_a INT, doc_b INT"
    )
    fast = {
        (r.doc_id, r.component)
        for r in connected_components(edges).collect()
    }
    dist = {
        (r.doc_id, r.component)
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert fast == dist
    jump = {
        (r.doc_id, r.component)
        for r in connected_components(
            edges, driver_threshold=0, distributed_algo="jump"
        ).collect()
    }
    assert fast == jump

    # python-oracle: BFS closure
    adj: dict[int, set[int]] = {}
    for a, b in raw_edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for start in adj:
        seen = {start}
        stack = [start]
        while stack:
            x = stack.pop()
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        want[start] = min(seen)
    assert fast == {(n, c) for n, c in want.items()}


# --- as-of join vs naive reference ----------------------------------------

asof_strategy = st.tuples(
    st.lists(  # left: (key, ts offset)
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=1, max_size=12,
    ),
    st.lists(  # right: (key, ts offset, value)
        st.tuples(st.integers(0, 2), st.integers(0, 100),
                  st.sampled_from([1.0, 2.0, None])),
        min_size=0, max_size=12,
    ),
)


@given(asof_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_naive_reference(spark, data):
    """asof_join == driver-side brute force: per left row, the right row
    with the max rts <= ts (ties broken by max tiebreak), including
    NULL payloads and duplicate timestamps on both sides."""
    from ad_data_pipelines_spark.operators.asof import asof_join

    lrows, rrows = data
    left = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(minutes=off))
         for i, (k, off) in enumerate(lrows)],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(minutes=off), v)
         for i, (k, off, v) in enumerate(rrows)],
        "rid long, k long, rts timestamp, v double",
    )
    got = {
        r.lid: (r.asof_ts, r.v)
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            right_cols=["v"], right_tiebreak=["rid"],
        ).collect()
    }
    rref = [(k, BASE + dt.timedelta(minutes=off), v, i)
            for i, (k, off, v) in enumerate(rrows)]
    for i, (k, off) in enumerate(lrows):
        ts = BASE + dt.timedelta(minutes=off)
        cands = [(rts, rid, v) for rk, rts, v, rid in rref
                 if rk == k and rts <= ts]
        want = (None, None)
        if cands:
            rts, _rid, v = max(cands)  # max (rts, rid) = latest, tie→max rid
            want = (rts, v)
        assert got[i] == want, (i, got[i], want)


# --- chunking reconstructs the document -----------------------------------

@given(st.lists(st.text(alphabet="abTÜ😀 ", max_size=40), max_size=6))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunking_reconstructs_text(spark, texts):
    """Dropping each chunk's overlap prefix (except chunk 0) and
    concatenating in chunk_idx order reproduces the original text —
    so chunking never loses or duplicates characters."""
    from ad_data_pipelines_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    chunk_chars, overlap = 16, 4
    step = chunk_chars - overlap
    out = chunk_documents(docs, chunk_chars=chunk_chars, overlap=overlap)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    for i, s in enumerate(texts):
        chunks = [c for _, c in sorted(by_doc[i])]
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == s, (i, s, chunks)
        # every chunk except possibly the last is full-size
        assert all(len(c) == chunk_chars for c in chunks[:-1])
        # starts advance by `step`: no gaps even for short tails
        assert all(
            s[idx * step: idx * step + chunk_chars] == c
            for idx, c in sorted(by_doc[i])
        )


# --- SCD2 reconstructs the snapshots ---------------------------------------

scd_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),                 # key
        st.integers(0, 8),                 # day offset (dedup'd below)
        st.sampled_from(["a", "b", None]),  # attr (None = NULL run)
    ),
    min_size=1,
    max_size=14,
)


@given(scd_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_intervals_reconstruct_snapshots(spark, snaps):
    """Intervals tile each key's timeline with no gaps/overlaps
    (valid_to of run i == valid_from of run i+1, last one open), attrs
    differ across every boundary, and looking up any original snapshot
    date inside the intervals returns that snapshot's attr."""
    from ad_data_pipelines_spark.operators.scd import scd2_history

    # unique per (key, date): keep the last generated value
    dedup = {}
    for k, off, a in snaps:
        dedup[(k, off)] = a
    rows = [
        (k, dt.date(2025, 1, 1 + off), a) for (k, off), a in dedup.items()
    ]
    df = spark.createDataFrame(rows, "k int, snap date, attr string")
    hist = scd2_history(
        df.repartition(F.col("k")), keys=["k"], attrs=["attr"],
        order_col="snap",
    ).collect()

    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r.k, []).append((r.valid_from, r.valid_to, r.attr))
    for k, ivs in by_key.items():
        ivs.sort(key=lambda iv: iv[0])
        for (f1, t1, a1), (f2, t2, a2) in zip(ivs, ivs[1:]):
            assert t1 == f2, (k, ivs)       # contiguous tiling
            assert a1 != a2, (k, ivs)       # real change at boundary
        assert ivs[-1][1] is None           # last interval open
    # point-in-time lookup returns the original snapshot attr
    for (k, off), want in dedup.items():
        d = dt.date(2025, 1, 1 + off)
        hits = [
            a for f, t_, a in by_key[k]
            if f <= d and (t_ is None or d < t_)
        ]
        assert len(hits) == 1 and hits[0] == want, (k, d, want, by_key[k])


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "ab", "ba", "abc", "x"]),
        min_size=0,
        max_size=30,
    ),
    min_size=1,
    max_size=12,
)


@given(docs_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_repetition_signals_match_reference_impl(spark, word_lists):
    """repetition_signals == a brute-force Python reference on random
    small-vocab docs (high repeat density): same top-gram choice under
    count-desc/gram-asc ties, same dup-char cap, same short-doc zeros."""
    from ad_data_pipelines_spark.operators.textstats import repetition_signals

    def expected(words, n_chars):
        def r4(x):
            # Spark F.round is HALF_UP; Python round() is half-even
            import decimal

            return float(
                decimal.Decimal(repr(x)).quantize(
                    decimal.Decimal("0.0001"),
                    rounding=decimal.ROUND_HALF_UP,
                )
            )

        def grams(n):
            return [
                " ".join(words[i : i + n])
                for i in range(len(words) - n + 1)
            ]

        out = {}
        for n in (2, 3):
            g = grams(n)
            if not g:
                out[f"top{n}_frac"] = 0.0
                continue
            from collections import Counter

            cnt = Counter(g)
            top = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            out[f"top{n}_frac"] = r4(
                top[1] * len(top[0]) / max(n_chars, 1)
            )
        from collections import Counter

        c5 = Counter(grams(5))
        dup = sum(v * len(g) for g, v in c5.items() if v > 1)
        out["dup5_frac"] = (
            r4(min(dup / max(n_chars, 1), 1.0)) if dup else 0.0
        )
        return out

    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    docs = spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows],
        "doc_id bigint, text string, n_chars bigint",
    )
    got = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert set(got) == set(range(len(rows)))
    for i, ws in enumerate(word_lists):
        # split('\\s+') of an empty trimmed string yields [''] — one
        # empty token, exactly what ' '.join([]) round-trips to
        words = rows[i][1].split(" ") if rows[i][1] else [""]
        exp = expected(words, len(rows[i][1]))
        for k, v in exp.items():
            assert got[i][k] == pytest.approx(v), (i, k, rows[i][1])


# --- PNG scanline unfilter round-trip --------------------------------------
# random dims/colors/pixels, every scanline filter chosen independently:
# encode (test-local filter application) → decode_png_stdlib must return
# the exact pixel bytes. Pure Python, no Spark fixture needed.
png_strategy = st.tuples(
    st.integers(min_value=1, max_value=12),              # width
    st.integers(min_value=1, max_value=10),              # height
    st.sampled_from([0, 2, 4, 6]),                       # L/RGB/LA/RGBA
    st.integers(min_value=0, max_value=2**32 - 1),       # pixel seed
    st.lists(st.integers(min_value=0, max_value=4),      # per-row filters
             min_size=1, max_size=10),
)


@given(png_strategy)
@settings(max_examples=40, deadline=None)
def test_png_unfilter_roundtrip_random(case):
    from ad_data_pipelines_spark.operators import multimodal as mm
    from tests.test_multimodal import _make_png

    w, h, color_type, seed, filters = case
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    n = w * h * ch
    # xorshift-ish deterministic pixels from the seed
    px, x = bytearray(), seed or 1
    for _ in range(n):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        px.append(x & 0xFF)
    png = _make_png(w, h, bytes(px), color_type=color_type, filters=filters)
    got = mm.decode_png_stdlib(png)
    assert got == (w, h, mm._PNG_MODES[color_type], bytes(px))


# --- budget_select == global prefix rule -----------------------------------
# random scores (duplicates allowed), random token counts (zeros allowed),
# random budget and shard width: the sharded two-phase scan must equal the
# brute-force single-ordering prefix rule.
budget_strategy = st.tuples(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),      # score (many ties)
            st.integers(min_value=0, max_value=50),     # n_tokens
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=400),            # budget
    st.sampled_from([1, 3, 64]),                        # shard_buckets
)


@given(budget_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_budget_select_random_matches_prefix(spark, case):
    from ad_data_pipelines_spark.operators import packing

    rows, budget, buckets = case
    data = [(i, s, t) for i, (s, t) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "doc_id bigint, score bigint, n_tokens bigint"
    )
    cum, expect = 0, {}
    for i, s, t in sorted(data, key=lambda r: (-r[1], r[0])):
        cum += t
        if cum > budget:
            break
        expect[i] = cum
    got = {
        r.doc_id: r.cum_tokens
        for r in packing.budget_select(
            df, budget, shard_buckets=buckets
        ).collect()
    }
    assert got == expect


# --- snapshot diff vs naive dict reference ---------------------------------

snapshot_strategy = st.tuples(
    st.dictionaries(  # old: key -> payload
        st.integers(min_value=0, max_value=12),
        st.sampled_from(["a", "b", "c", ""]),
        max_size=10,
    ),
    st.dictionaries(  # new
        st.integers(min_value=0, max_value=12),
        st.sampled_from(["a", "b", "c", ""]),
        max_size=10,
    ),
)


@given(snapshot_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_snapshot_diff_matches_naive_reference(spark, data):
    """snapshot_diff agrees with the obvious dict-based diff on every
    generated pair of snapshots (including empty sides, empty-string
    payloads, and fully-disjoint key sets)."""
    from ad_data_pipelines_spark.operators.snapshot import snapshot_diff

    old_d, new_d = data
    schema = "doc_id bigint, text string"
    old = spark.createDataFrame(list(old_d.items()) or [], schema)
    new = spark.createDataFrame(list(new_d.items()) or [], schema)
    got = {
        r.doc_id: r.status for r in snapshot_diff(old, new).collect()
    }
    want = {}
    for k in set(old_d) | set(new_d):
        if k not in old_d:
            want[k] = "added"
        elif k not in new_d:
            want[k] = "removed"
        elif old_d[k] == new_d[k]:
            want[k] = "unchanged"
        else:
            want[k] = "changed"
    assert got == want


# --- table checksum mergeability -------------------------------------------

checksum_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.sampled_from(["x", "y", "", None]),
    ),
    min_size=1,
    max_size=30,
)


@given(checksum_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_table_checksum_is_mergeable(spark, rows):
    """checksum(whole) == XOR of checksums of any disjoint split — the
    property that makes per-partition checksums roll up without a
    rescan; counts are additive the same way."""
    from ad_data_pipelines_spark.operators.audit import table_checksum

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "rid bigint, k bigint, v string",
    )
    cols = ["rid", "k", "v"]
    whole = table_checksum(df, cols).collect()[0]
    lo = table_checksum(df.filter(F.col("k") < 20), cols).collect()[0]
    hi = table_checksum(df.filter(F.col("k") >= 20), cols).collect()[0]
    assert whole.n_rows == lo.n_rows + hi.n_rows
    assert whole.checksum == (
        (lo.checksum or 0) ^ (hi.checksum or 0)
    )


# --- interval join vs naive nested-loop reference --------------------------

interval_case = st.tuples(
    st.lists(  # points: (key, hour-offset)
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=96),
        ),
        min_size=1,
        max_size=20,
    ),
    st.lists(  # intervals: (key, start-hour, duration-hours)
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=96),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=8,
    ),
)


@given(interval_case)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_join_matches_nested_loop(spark, case):
    """Bucket-blocked interval_join == the O(P×I) nested-loop reference
    on random multi-day intervals (including zero-length ones and
    boundary timestamps)."""
    from ad_data_pipelines_spark.operators.intervals import interval_join

    points_raw, ivs_raw = case
    base = dt.datetime(2024, 3, 1)
    points = spark.createDataFrame(
        [
            (i, k, base + dt.timedelta(hours=h))
            for i, (k, h) in enumerate(points_raw)
        ],
        "point_id bigint, k string, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (
                j,
                k,
                base + dt.timedelta(hours=s),
                base + dt.timedelta(hours=s + d),
            )
            for j, (k, s, d) in enumerate(ivs_raw)
        ],
        "iv_id bigint, k string, w_start timestamp, w_end timestamp",
    )
    got = {
        (r.point_id, r.iv_id)
        for r in interval_join(points, ivs, keys=["k"]).collect()
    }
    want = set()
    for i, (pk, h) in enumerate(points_raw):
        pt = base + dt.timedelta(hours=h)
        for j, (ik, s, d) in enumerate(ivs_raw):
            lo = base + dt.timedelta(hours=s)
            hi = base + dt.timedelta(hours=s + d)
            if pk == ik and lo <= pt < hi:
                want.add((i, j))
    assert got == want


# --- winsorized stats vs NumPy type-7 quantiles ----------------------------

winsor_case = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
    ),
    min_size=1,
    max_size=25,
)


@given(winsor_case)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_winsorized_stats_matches_numpy_type7(spark, rows):
    """Spark `percentile` interpolates exactly like NumPy's default
    (type-7, rank p·(n−1)) — the assumption the DuckDB quantile_cont
    oracle parity rests on — and the clamped means follow."""
    import numpy as np

    from ad_data_pipelines_spark.operators.agg import winsorized_stats

    df = spark.createDataFrame(rows, "grp string, value double")
    out = {
        r.grp: r
        for r in winsorized_stats(
            df, "value", ["grp"], 0.1, 0.9, exact=True
        ).collect()
    }
    by_grp: dict[str, list[float]] = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    for g, vals in by_grp.items():
        lo = float(np.quantile(vals, 0.1))  # type-7 default
        hi = float(np.quantile(vals, 0.9))
        clamped = [min(max(v, lo), hi) for v in vals]
        r = out[g]
        assert r.q_lo == round(lo, 4) and r.q_hi == round(hi, 4)
        assert r.avg_winsorized == round(sum(clamped) / len(vals), 4)


# --- bigram LM vs pure-python reference ------------------------------------

lm_corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=6
    ),
    min_size=1,
    max_size=8,
)


@given(lm_corpus)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bigram_lm_matches_python_reference(spark, token_lists):
    """The distributed add-k LM scoring equals a dict-based reference
    on arbitrary tiny corpora (repeated tokens, empty docs, singleton
    docs)."""
    import math
    from collections import Counter

    from ad_data_pipelines_spark.operators.lm import bigram_lm_score

    k = 0.5
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_ll)
        for r in bigram_lm_score(docs, k=k).collect()
    }

    uni = Counter(t for toks in token_lists for t in toks)
    big = Counter(
        (toks[i], toks[i + 1])
        for toks in token_lists
        for i in range(len(toks) - 1)
    )
    v = len(uni)
    want = {}
    for i, toks in enumerate(token_lists):
        pairs = [(toks[j], toks[j + 1]) for j in range(len(toks) - 1)]
        if not pairs:
            continue
        ll = [
            math.log((big[p] + k) / (uni[p[0]] + k * v)) for p in pairs
        ]
        want[i] = (len(pairs), round(sum(ll) / len(pairs), 4))
    assert got == want


# --- overlap join vs naive nested-loop reference ---------------------------

overlap_case = st.tuples(
    st.lists(  # left intervals: (key, start-hour, duration-hours)
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=96),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=1,
        max_size=12,
    ),
    st.lists(  # right intervals
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=96),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from(["6 hours", "1 day", "1 week"]),
)


@given(overlap_case)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_overlap_join_matches_nested_loop(spark, case):
    """Bucket-blocked overlap_join == the O(A×B) nested-loop reference
    at every bucket width — multi-bucket co-occupancy dedups to one
    row, zero-length intervals never match, strict half-open overlap."""
    from ad_data_pipelines_spark.operators.intervals import overlap_join

    left_raw, right_raw, width = case
    base = dt.datetime(2024, 3, 1)
    left = spark.createDataFrame(
        [
            (i, k, base + dt.timedelta(hours=s),
             base + dt.timedelta(hours=s + d))
            for i, (k, s, d) in enumerate(left_raw)
        ],
        "a_id bigint, k string, a_start timestamp, a_end timestamp",
    )
    right = spark.createDataFrame(
        [
            (j, k, base + dt.timedelta(hours=s),
             base + dt.timedelta(hours=s + d))
            for j, (k, s, d) in enumerate(right_raw)
        ],
        "b_id bigint, k string, b_start timestamp, b_end timestamp",
    )
    rows = overlap_join(
        left, right, keys=["k"], bucket_width=width
    ).collect()
    got = [(r.a_id, r.b_id) for r in rows]
    assert len(got) == len(set(got)), "multi-bucket pair not deduped"
    want = set()
    for i, (lk, ls, ld) in enumerate(left_raw):
        for j, (rk, rs, rd) in enumerate(right_raw):
            if lk == rk and ld > 0 and rd > 0:
                if ls < rs + rd and rs < ls + ld:
                    want.add((i, j))
    assert set(got) == want


# --- PSI vs pinned reference: numpy cross-implementation -------------------

psi_case = st.tuples(
    st.lists(  # values in [0, 100)
        st.floats(min_value=0.0, max_value=99.99,
                  allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=60,
    ),
    st.lists(  # unnormalized positive reference weights, 4 bins
        st.floats(min_value=0.01, max_value=10.0,
                  allow_nan=False, allow_infinity=False),
        min_size=4,
        max_size=4,
    ),
)


@given(psi_case)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_psi_vs_reference_matches_numpy(spark, case):
    """The Spark PSI equals an independent NumPy implementation of the
    same definition (same binning, eps floor, rounding) on random
    samples and random normalized references — including samples that
    leave bins empty."""
    import numpy as np

    from ad_data_pipelines_spark.operators.agg import psi_vs_reference

    values, weights = case
    ref = [w / sum(weights) for w in weights]
    # re-normalize exactly the way the operator's validator expects
    ref[-1] = 1.0 - sum(ref[:-1])

    df = spark.createDataFrame(
        [("g", float(v)) for v in values], "g string, v double"
    )
    row = psi_vs_reference(df, "v", ["g"], ref, 0.0, 100.0).collect()[0]

    eps, n_bins = 1e-4, 4
    width = 100.0 / n_bins
    counts = np.zeros(n_bins)
    for v in values:
        b = min(max(int(np.floor(v / width)), 0), n_bins - 1)
        counts[b] += 1
    p = np.maximum(counts / counts.sum(), eps)
    r = np.maximum(np.array(ref), eps)
    want = round(float(np.sum((p - r) * np.log(p / r))), 6)
    assert row.n_values == len(values)
    assert row.psi == want


# docs: small random corpora over a 6-word vocabulary so overlap
# varies wildly; thresholds sweep the interesting range including 1.0.
_pj_docs = st.lists(
    st.lists(
        st.sampled_from(["ape", "bee", "cat", "dog", "elk", "fox"]),
        min_size=0,
        max_size=6,
    ),
    min_size=2,
    max_size=8,
)


@given(_pj_docs, st.sampled_from([0.34, 0.5, 0.67, 1.0]))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_prefix_jaccard_matches_brute_force(spark, word_lists, threshold):
    """Prefix filtering is lossless at ANY threshold: the pair set,
    intersection counts and Jaccard values equal an all-pairs Python
    brute force (empty-token docs excluded, exact rational compare)."""
    import itertools

    from ad_data_pipelines_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(word_lists)],
        "doc_id bigint, text string",
    )
    got = {(r.doc_a, r.doc_b): (r.inter_n, r.jac)
           for r in dedup.prefix_jaccard_pairs(
               docs, threshold=threshold).collect()}
    want = {}
    for a, b in itertools.combinations(range(len(word_lists)), 2):
        sa, sb = set(word_lists[a]), set(word_lists[b])
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        # exact rational comparison — no float threshold ambiguity
        if inter * 1.0 / len(sa | sb) >= threshold:
            want[(a, b)] = (inter, round(inter / len(sa | sb), 6))
    assert got == want


_knn_pts = st.lists(
    st.tuples(st.integers(0, 59), st.integers(0, 59)),
    min_size=1,
    max_size=10,
)


@given(_knn_pts, _knn_pts, st.sampled_from([7, 10, 25]))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_grid_knn_matches_brute_force(spark, lpts, rpts, cell):
    """grid_knn_join is exact for ANY cell size: every left point gets
    the brute-force nearest right point (ties → min id), whether the
    3x3 certificate resolves it or the fallback does."""
    from ad_data_pipelines_spark.operators import geo

    ldf = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(lpts)],
        "lid bigint, x bigint, y bigint",
    )
    rdf = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(rpts)],
        "rid bigint, x bigint, y bigint",
    )
    got = {r.lid: (r.nearest_rid, r.dist2)
           for r in geo.grid_knn_join(
               ldf, rdf, "lid", "rid", "x", "y", "x", "y", cell=cell
           ).collect()}
    want = {}
    for i, (lx, ly) in enumerate(lpts):
        d2, rid = min(
            ((rx - lx) ** 2 + (ry - ly) ** 2, j)
            for j, (rx, ry) in enumerate(rpts)
        )
        want[i] = (rid, d2)
    assert got == want


# MERGE semantics: random targets + change batches vs a Python
# reference model. Keys 0-7 (forced collisions), ops I/U/D, optional
# partial columns via NULLs, unique seqs per batch.
merge_case_strategy = st.tuples(
    st.lists(  # target rows: (key, payload)
        st.tuples(st.integers(0, 7), st.integers(0, 100)),
        max_size=8,
        unique_by=lambda r: r[0],
    ),
    st.lists(  # change events: (key, payload, op)
        st.tuples(
            st.integers(0, 7),
            st.integers(0, 100),
            st.sampled_from(["U", "D", "I"]),
        ),
        max_size=12,
    ),
)


@given(merge_case_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_merge_plan_matches_reference_model(spark, case):
    """merge_plan (both join strategies) equals a sequential-replay
    reference model on arbitrary target/change combinations: latest
    change per key wins, D deletes, I/U upsert, untouched rows
    survive."""
    from ad_data_pipelines_spark.operators import merge as M

    target_rows, change_rows = case
    # reference model: replay changes in seq order over a dict
    state = {k: v for k, v in target_rows}
    for k, v, op in change_rows:  # list order == seq order
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v

    target = spark.createDataFrame(
        target_rows or [(None, None)], "k bigint, payload bigint"
    ).filter(F.col("k").isNotNull())
    changes = spark.createDataFrame(
        [
            (k, v, op, i)
            for i, (k, v, op) in enumerate(change_rows)
        ]
        or [(None, None, None, None)],
        "k bigint, payload bigint, op string, seq bigint",
    ).filter(F.col("k").isNotNull())

    for broadcast in (True, False):
        out = {
            r.k: r.payload
            for r in M.merge_plan(
                target, changes, ["k"], op_col="op", seq_col="seq",
                broadcast_changes=broadcast,
            ).collect()
        }
        assert out == state, (broadcast, target_rows, change_rows)


# --- per-seed SSSP vs a pure-python truncated Bellman-Ford ----------------

sssp_case = st.tuples(
    st.lists(  # directed weighted edges over a small id space
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=1, max_value=7),
        ),
        min_size=1,
        max_size=30,
    ),
    st.sets(st.integers(min_value=0, max_value=7), min_size=1, max_size=4),
    st.integers(min_value=1, max_value=4),  # rounds (incl. truncating)
)


@given(sssp_case)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_sssp_per_seed_matches_python_reference(spark, case):
    """Landmark-mode SSSP (full relax AND frontier delta) equals a
    sequential synchronous Bellman-Ford per seed, truncated at the
    same round budget, on generated graphs with duplicate edges
    (MIN-collapsed), self-loops (dropped), isolated seeds, and
    truncating round counts."""
    from ad_data_pipelines_spark.operators import graph

    raw_edges, seeds, rounds = case
    edges = {}
    for u, v, w in raw_edges:
        if u != v:
            edges[(u, v)] = min(edges.get((u, v), w), w)
    # python reference: synchronous relax from the PREVIOUS round's
    # state (matching the operator's state-join-then-min semantics)
    dist = {(s, s): 0 for s in seeds}
    for _ in range(rounds):
        new = dict(dist)
        for (u, v), w in edges.items():
            for s in seeds:
                du = dist.get((s, u))
                if du is not None and du + w < new.get((s, v), 1 << 62):
                    new[(s, v)] = du + w
        dist = new
    want = sorted((s, n, d) for (s, n), d in dist.items())

    df = spark.createDataFrame(
        [(u, v, w) for u, v, w in raw_edges if u != v]
        or [(0, 1, 1)],  # placeholder never hit: min_size=1 + u!=v
        "src bigint, dst bigint, w bigint",
    )
    if not edges:
        # all generated edges were self-loops: the operator drops them
        # and only the seed self-rows remain
        df = df.limit(0)
        want = sorted((s, s, 0) for s in seeds)
    sf = spark.createDataFrame([(s,) for s in seeds], "node bigint")
    for frontier in (False, True):
        got = sorted(
            (r.seed, r.node, r.dist)
            for r in graph.sssp(
                df, sf, weight="w", rounds=rounds,
                per_seed=True, frontier=frontier,
            ).collect()
        )
        assert got == want, (frontier, sorted(edges.items()), seeds, rounds)


# --- frontier-delta label propagation == full sweep on random graphs ------

lp_case = st.tuples(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=4),      # iterations
    st.sampled_from([0.0, 0.3, 1.1]),           # frontier_threshold
)


@given(lp_case)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_label_propagation_frontier_matches_full(spark, case):
    """frontier=True label propagation is label-identical to the
    default sweep on generated directed graphs (self-loops, duplicate
    edges, mixed parities, disconnected nodes) across forced-delta,
    mixed, and forced-full thresholds and iteration budgets that may
    or may not reach the fixpoint."""
    from ad_data_pipelines_spark.operators import graph

    raw_edges, iterations, thr = case
    clean = [(u, v) for u, v in raw_edges if u != v]
    if not clean:
        return  # nothing survives normalization; operator output empty
    df = spark.createDataFrame(clean, "src bigint, dst bigint")
    base = sorted(map(tuple, graph.label_propagation(
        df, iterations=iterations
    ).collect()))
    delta = sorted(map(tuple, graph.label_propagation(
        df, iterations=iterations, frontier=True, frontier_threshold=thr
    ).collect()))
    assert delta == base, (clean, iterations, thr)


# --- HITS vs a pure-python integer recurrence ------------------------------

hits_case = st.tuples(
    st.lists(  # directed edges over a small id space
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=4),  # iterations
)


@given(hits_case)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_hits_matches_python_reference(spark, case):
    """graph.hits equals a sequential pure-python replay of the exact
    L1-normalized integer recurrence (floor division at every step) on
    generated directed graphs with duplicate edges (collapsed),
    self-loops (dropped), sinks, sources, and disconnected nodes —
    the cross-engine determinism contract holds against a THIRD
    implementation, not just the DuckDB twin."""
    from ad_data_pipelines_spark.operators import graph

    raw_edges, iterations = case
    edges = sorted({(u, v) for u, v in raw_edges if u != v})
    if not edges:
        return  # all self-loops: operator returns empty (unit-tested)
    scale = 10**6
    hubs = {u: scale for u in {u for u, _ in edges}}
    auths = {}
    for _ in range(iterations):
        raw_a = {}
        for u, v in edges:
            if u in hubs:
                raw_a[v] = raw_a.get(v, 0) + hubs[u]
        ta = sum(raw_a.values())
        auths = {v: (r * scale) // ta for v, r in raw_a.items()}
        raw_h = {}
        for u, v in edges:
            if v in auths:
                raw_h[u] = raw_h.get(u, 0) + auths[v]
        th = sum(raw_h.values())
        hubs = {u: (r * scale) // th for u, r in raw_h.items()}
    want = sorted(
        [(n, "hub", s) for n, s in hubs.items()]
        + [(n, "auth", s) for n, s in auths.items()]
    )

    df = spark.createDataFrame(raw_edges, "src bigint, dst bigint")
    got = sorted(
        map(tuple, graph.hits(df, iterations=iterations).collect())
    )
    assert got == want, (raw_edges, iterations)
