"""Regression tripwire for the driver's CORRECTNESS-gate coverage.

The driver walks REGISTRY in dict-insertion order with a finite (~50-row)
budget, so a query that never reaches the front of the order never gets a
hard-gate verdict (rounds 1-2 each left a tail unverified).  These tests
fail the suite the moment a commit registers a query without sequencing it,
or lets a rows-only (no-oracle) query consume a verifiable slot.
"""

from ad_data_pipelines_spark.plans import testdata_queries as tq


def test_every_registered_query_is_sequenced():
    # The module-level assert already enforces this at import time; assert
    # here too so the invariant shows up as a named test, not an
    # ImportError, when it breaks.
    assert set(tq._GATE_PRIORITY) == set(tq.REGISTRY)
    assert len(tq._GATE_PRIORITY) == len(set(tq._GATE_PRIORITY))


def test_registry_iterates_in_gate_priority_order():
    # The driver consumes dict-insertion order — the reorder must have
    # actually been applied, not just declared.
    assert list(tq.REGISTRY) == tq._GATE_PRIORITY


def test_gate_order_is_artifact_derived_and_monotone_stale_first():
    """Since r14 the post-tier-0 order is computed from
    CORRECTNESS_r*.json (latest hash-green round) — the r13 verdict
    caught the hand-kept note drifting (two r9-latest queries missed
    four consecutive gates). Invariants: (a) beyond tier 0, staleness
    is monotone non-decreasing, (b) the stalest non-tier-0 rows sit at
    the FRONT of the budget so the oldest tail is always eaten first,
    (c) never-green registrations outrank every green query."""
    latest = tq.latest_green_rounds()
    order = list(tq.REGISTRY)
    rest = order[len(tq._GATE_TIER0):]
    if tq._GATE_TAIL_ROWS_ONLY:
        rest = rest[: -len(tq._GATE_TAIL_ROWS_ONLY)]
    rounds = [latest.get(n, -1) for n in rest]
    assert rounds == sorted(rounds), (
        "post-tier-0 gate order is not stale-first: "
        f"{[(n, latest.get(n, -1)) for n in rest[:60]]}"
    )
    # every query at the global staleness minimum (excluding tier-0
    # overrides) must land inside the ~50-row budget
    if rest:
        oldest = min(rounds)
        stalest = [n for n in rest if latest.get(n, -1) == oldest]
        for name in stalest[:50 - len(tq._GATE_TIER0)]:
            assert order.index(name) < 50, (
                f"stalest query {name} (latest green r{oldest}) fell "
                f"past the gate budget"
            )


def test_gate_freshness_histogram_counts_registry():
    hist = tq.gate_freshness_histogram()
    assert sum(hist.values()) == len(tq.REGISTRY)
    # replay sanity: r13 gated 49 hash-green rows (CORRECTNESS_r13) —
    # every later artifact can only move counts to NEWER rounds, so no
    # bucket may ever predate r9 again once this invariant holds
    assert all(r == 0 or r >= 9 for r in hist)


def test_rows_only_queries_sort_dead_last():
    # Queries with no oracle can never turn green; they must not sit ahead
    # of any verifiable query in the budget — EXCEPT a deliberate,
    # documented rotation spending one slot on a first-ever rows_match
    # row (r7: a26_hll_shard_union, the r6 verdict's item #2).
    no_oracle = [n for n, spec in tq.REGISTRY.items() if spec.oracle is None]
    assert sorted(no_oracle) == sorted(
        tq._GATE_TAIL_ROWS_ONLY + tq._GATE_ROWS_ONLY_ROTATED
    )
    if tq._GATE_TAIL_ROWS_ONLY:  # empty since r10: every query has an oracle
        tail = tq._GATE_PRIORITY[-len(tq._GATE_TAIL_ROWS_ONLY):]
        assert sorted(tail) == sorted(tq._GATE_TAIL_ROWS_ONLY)
    # a rotated rows-only slot must actually land inside the ~50-row
    # budget, or the rotation spent nothing
    order = list(tq.REGISTRY)
    for name in tq._GATE_ROWS_ONLY_ROTATED:
        assert order.index(name) < 50, name
