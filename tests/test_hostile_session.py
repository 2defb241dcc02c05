"""Hostile-session driver simulation, made a permanent regression test
(r11 verdict #3).

The external driver builds its OWN plain SparkSession — nothing says
its default `spark.sql.session.timeZone` is UTC (a cron host in
America/New_York is the realistic hostile case). Every date/window/
timestamp-heavy query still has to match its DuckDB oracle (whose
timestamps are naive == UTC wall-clock) because `testdata_queries.t()`
pins the session to UTC at table-load time, i.e. BEFORE any
timezone-aware expression in the plan is analyzed. That pinning is the
only thing standing between a non-UTC driver host and a silent
hash-mismatch on `to_date`/`date_trunc`/`date_format` — this test is
the tripwire for anyone weakening it (the verify skill's manual
hostile-TZ probe, codified).

Mechanics: `t()` re-pins on CACHE MISS only (no per-call conf RPC), so
each parametrized case clears the table memo and sets the hostile TZ
first — exactly a fresh driver session's first query. The pin happens
during plan BUILD; Spark resolves session-TZ-dependent expressions at
analysis time, so a plan built after the pin evaluates UTC even though
the session started hostile.
"""

from __future__ import annotations

import pytest

from ad_data_pipelines_spark.plans import testdata_queries as tq
from tests.conftest import SF_MEDIUM, register_duck_views
from tests.test_parity import _normalize

HOSTILE_TZ = "America/New_York"

# The date/window/timestamp-heavy subset: parquet timestamp reads
# (a1, w2), the nanos-events normalization + date_trunc/date_format
# (t1, w6), month arithmetic (p18_p19), and the first-seen timestamp
# store (s13). UTC-vs-New-York shifts every one of these by 4-5 hours
# if the pin is lost.
TZ_SENSITIVE = [
    "a1_trips_daily",
    "t1_events_hourly",
    "w2_transfer_time",
    "w6_rolling_window",
    "p18_p19_days_in_month",
    "s13_first_seen",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_query_matches_oracle_under_hostile_session_tz(name, spark, duck):
    spec = tq.REGISTRY[name]
    assert spec.oracle is not None, f"{name} lost its oracle"
    orig_tz = spark.conf.get("spark.sql.session.timeZone")
    saved_cache = dict(tq._TABLE_CACHE)
    try:
        # fresh-driver-session simulation: cold table memo + hostile TZ
        tq._TABLE_CACHE.clear()
        spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
        sdf = spec.fn(spark, SF_MEDIUM)
        # t() must have re-pinned the session during plan build
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC", (
            "t() no longer pins UTC on cache miss — every date/"
            "timestamp query is now at the mercy of the driver host TZ"
        )
        s_rows = [tuple(r) for r in sdf.collect()]

        register_duck_views(duck, SF_MEDIUM)
        tbl = duck.execute(spec.oracle).fetch_arrow_table()
        cols_py = [c.to_pylist() for c in tbl.columns]
        d_rows = list(zip(*cols_py)) if cols_py else []

        assert sorted(sdf.columns) == sorted(tbl.column_names)
        _, s_norm = _normalize(s_rows, sdf.columns)
        _, d_norm = _normalize(d_rows, tbl.column_names)
        assert len(s_norm) == len(d_norm), (
            f"{name} under {HOSTILE_TZ}: row count "
            f"spark={len(s_norm)} duck={len(d_norm)}"
        )
        mismatches = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(s_norm, d_norm))
            if a != b
        ]
        assert not mismatches, (
            f"{name} under {HOSTILE_TZ}: {mismatches[:3]}"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig_tz)
        tq._TABLE_CACHE.clear()
        tq._TABLE_CACHE.update(saved_cache)
