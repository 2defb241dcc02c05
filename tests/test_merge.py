"""MERGE / upsert (CDC batch apply): logical semantics, the atomic
versioned-pointer commit, crash fault injection, and the
partition-scoped apply."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators import merge as M


def _target(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", 30.0),
            (4, "d", 40.0),
        ],
        "id bigint, name string, amount double",
    )


def _changes(spark):
    # update id=2 (partial: only amount), delete id=3,
    # delete id=99 (unmatched → no-op), insert id=5
    return spark.createDataFrame(
        [
            (2, None, 21.5, "U"),
            (3, None, None, "D"),
            (99, None, None, "D"),
            (5, "e", 50.0, "I"),
        ],
        "id bigint, name string, amount double, op string",
    )


EXPECTED = {
    1: ("a", 10.0),
    2: (None, 21.5),  # full-column update: name column IS in changes
    4: ("d", 40.0),
    5: ("e", 50.0),
}


@pytest.mark.parametrize("broadcast", [True, False])
def test_merge_plan_semantics(spark, broadcast):
    """Matched update takes change values (including explicit NULLs),
    matched delete drops, unmatched delete no-ops, unmatched upsert
    inserts — identical under the broadcast and full-outer
    strategies, with the target's exact schema."""
    out = M.merge_plan(
        _target(spark),
        _changes(spark),
        ["id"],
        op_col="op",
        broadcast_changes=broadcast,
    )
    assert out.columns == ["id", "name", "amount"]
    got = {r.id: (r.name, r.amount) for r in out.collect()}
    assert got == EXPECTED


@pytest.mark.parametrize("broadcast", [True, False])
def test_merge_plan_partial_update_keeps_missing_columns(spark, broadcast):
    """A change batch WITHOUT some target columns updates only what it
    carries: missing columns keep the target value on update and are
    NULL on insert."""
    changes = spark.createDataFrame(
        [(2, 21.5, "U"), (5, 50.0, "I")],
        "id bigint, amount double, op string",
    )
    out = M.merge_plan(
        _target(spark), changes, ["id"], op_col="op",
        broadcast_changes=broadcast,
    )
    got = {r.id: (r.name, r.amount) for r in out.collect()}
    assert got[2] == ("b", 21.5)   # name kept from target
    assert got[5] == (None, 50.0)  # inserted row: missing col NULL
    assert got[1] == ("a", 10.0) and got[3] == ("c", 30.0)


def test_merge_plan_seq_col_takes_latest_change(spark):
    """A multi-event CDC batch collapses to the highest-seq change per
    key before applying: an update then delete deletes; a delete then
    re-insert re-inserts."""
    changes = spark.createDataFrame(
        [
            (2, "x", 99.0, "U", 1),
            (2, None, None, "D", 2),   # latest for id=2 → delete
            (3, None, None, "D", 1),
            (3, "c2", 31.0, "U", 2),   # latest for id=3 → upsert
        ],
        "id bigint, name string, amount double, op string, seq bigint",
    )
    out = M.merge_plan(
        _target(spark), changes, ["id"], op_col="op", seq_col="seq"
    )
    got = {r.id: (r.name, r.amount) for r in out.collect()}
    assert 2 not in got
    assert got[3] == ("c2", 31.0)
    assert got[1] == ("a", 10.0) and got[4] == ("d", 40.0)


def test_merge_apply_versioned_commit_and_idempotence(spark, tmp_path):
    """End-to-end: init → apply commits v000002 with the merged state;
    re-applying the same batch commits v000003 with an identical
    state (idempotent in effect); vacuum reclaims old versions but
    never the committed one."""
    root = str(tmp_path / "tbl")
    assert M.table_init(_target(spark), root) == "v000001"
    v2 = M.merge_apply(spark, root, _changes(spark), ["id"], op_col="op")
    assert v2 == "v000002"
    assert M.table_current_version(root) == "v000002"
    got = {r.id: (r.name, r.amount) for r in M.table_read(spark, root).collect()}
    assert got == EXPECTED

    v3 = M.merge_apply(spark, root, _changes(spark), ["id"], op_col="op")
    assert v3 == "v000003"
    again = {r.id: (r.name, r.amount) for r in M.table_read(spark, root).collect()}
    assert again == EXPECTED

    removed = M.table_vacuum(root)
    assert set(removed) == {"v000002", "v000001"}
    assert {r.id for r in M.table_read(spark, root).collect()} == {1, 2, 4, 5}


def test_merge_apply_crash_leaves_live_table_intact(spark, tmp_path):
    """Fault injection: a 'crashed' apply that wrote a partial version
    directory but never committed the pointer is invisible to readers;
    the next successful apply skips past the orphan version number and
    vacuum reclaims the debris."""
    root = str(tmp_path / "tbl")
    M.table_init(_target(spark), root)

    # simulate a mid-write kill: data files exist, pointer not moved
    orphan = os.path.join(root, "v000002")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00partial garbage, never committed")

    assert M.table_current_version(root) == "v000001"
    live = {r.id: (r.name, r.amount) for r in M.table_read(spark, root).collect()}
    assert live == {1: ("a", 10.0), 2: ("b", 20.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    v = M.merge_apply(spark, root, _changes(spark), ["id"], op_col="op")
    assert v == "v000003"  # orphan number consumed, never reused
    got = {r.id: (r.name, r.amount) for r in M.table_read(spark, root).collect()}
    assert got == EXPECTED
    assert "v000002" in M.table_vacuum(root)


def test_merge_apply_partitions_touches_only_changed_partitions(spark, tmp_path):
    """Partition-scoped apply: a change batch confined to day=2 leaves
    day=1's parquet files byte-identical on disk (cold partitions are
    never rewritten) while day=2 reflects the merge."""
    path = str(tmp_path / "part_tbl")
    df = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 2, "c"), (4, 2, "d")],
        "id bigint, day int, v string",
    )
    df.write.partitionBy("day").parquet(path)

    def day_files(day):
        d = os.path.join(path, f"day={day}")
        return {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_day1 = day_files(1)
    changes = spark.createDataFrame(
        [(3, 2, "c2", "U"), (5, 2, "e", "I"), (4, 2, None, "D")],
        "id bigint, day int, v string, op string",
    )
    M.merge_apply_partitions(
        spark, path, changes, ["id", "day"], ["day"], op_col="op"
    )
    assert day_files(1) == before_day1  # cold partition untouched
    got = {(r.id, r.day): r.v for r in spark.read.parquet(path).collect()}
    assert got == {(1, 1): "a", (2, 1): "b", (3, 2): "c2", (5, 2): "e"}


def test_merge_plan_broadcast_keeps_target_unshuffled(spark):
    """Plan shape: with the default broadcast strategy the
    update/delete pass joins the target map-side — the physical plan's
    update branch contains a BroadcastHashJoin and the target scan
    feeds it without an Exchange above it."""
    out = M.merge_plan(_target(spark), _changes(spark), ["id"], op_col="op")
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "CartesianProduct" not in final


def test_streaming_cdc_apply_matches_batch_merge(spark, tmp_path):
    """The streamed CDC apply (micro-batches of change files through
    foreachBatch → merge_apply) converges to the same table state as
    ONE batch merge of all changes collapsed to their latest-seq event
    per key; a second availableNow run over the same source is a
    no-op for state (checkpoint skips consumed files)."""
    from ad_data_pipelines_spark.streaming import cdc

    root = str(tmp_path / "tbl")
    M.table_init(_target(spark), root)

    schema = (
        "id bigint, name string, amount double, op string, seq bigint"
    )
    src = tmp_path / "changes"
    src.mkdir()
    # two change files = two micro-batches, seq-ordered across files
    b1 = spark.createDataFrame(
        [
            (2, "b1", 21.0, "U", 1),
            (3, None, None, "D", 2),
            (5, "e", 50.0, "I", 3),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (2, None, None, "D", 4),   # later delete wins over b1's update
            (3, "c2", 33.0, "U", 5),   # re-insert after b1's delete
            (5, "e2", 55.0, "U", 6),
        ],
        schema,
    )
    # the file stream source lists FILES, not directories — flatten
    # each Spark output dir to a single parquet file under src/
    import shutil

    for i, b in enumerate([b1, b2], start=1):
        d = tmp_path / f"stage{i}"
        b.coalesce(1).write.parquet(str(d))
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        shutil.move(str(part), str(src / f"f{i}.parquet"))

    cdc.run_cdc_apply_available_now(
        spark, str(src), schema, root, ["id"],
        checkpoint=str(tmp_path / "ck"),
        max_files_per_trigger=1,   # force one file per micro-batch
    )

    all_changes = b1.unionByName(b2)
    expected_df = M.merge_plan(
        _target(spark), all_changes, ["id"], op_col="op", seq_col="seq"
    )
    expected = {r.id: (r.name, r.amount) for r in expected_df.collect()}
    got = {r.id: (r.name, r.amount) for r in M.table_read(spark, root).collect()}
    assert got == expected
    assert 2 not in got and got[3] == ("c2", 33.0) and got[5] == ("e2", 55.0)

    # vacuum bound: a long-running stream keeps ≤ vacuum_keep versions
    import os as _os

    n_versions = len([d for d in _os.listdir(root) if d.startswith("v")])
    assert n_versions <= 2, n_versions

    v_before = M.table_current_version(root)
    cdc.run_cdc_apply_available_now(
        spark, str(src), schema, root, ["id"],
        checkpoint=str(tmp_path / "ck"),
    )
    assert M.table_current_version(root) == v_before  # nothing replayed
    again = {r.id: (r.name, r.amount) for r in M.table_read(spark, root).collect()}
    assert again == expected


def test_zorder_write_prunes_files_on_secondary_dimension(spark, tmp_path):
    """The z-ordered layout gives parquet file-level skipping on BOTH
    dimensions: for a narrow predicate on y (the dimension a plain
    x-sort ignores), the fraction of files whose footer y-range
    intersects the predicate is several times smaller than under the
    x-sorted layout — measured on real parquet footers — while the
    read-back rows are identical."""
    import pyarrow.parquet as pq

    from ad_data_pipelines_spark.operators import partitioning as zorder

    n = 40_000
    # independent md5-derived coordinates (linear-multiplier pairs mod
    # 2^k are perfectly correlated, and crc32 pairs are XOR-related —
    # md5 gives a genuinely uniform point cloud)
    from ad_data_pipelines_spark.functions.hashing import portable_hash64

    pts = spark.range(n).select(
        F.col("id"),
        (portable_hash64(F.concat(F.lit("x"), F.col("id"))) % 1024).alias("x"),
        (portable_hash64(F.concat(F.lit("y"), F.col("id"))) % 1024).alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    xpath = str(tmp_path / "xsort")
    zorder.zorder_write(
        pts, zpath, [("x", 0, 1023), ("y", 0, 1023)], bits=10,
        num_files=16,
    )
    pts.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        xpath
    )

    def files_intersecting_y(path, lo, hi):
        import os

        hits, total = 0, 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            total += 1
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = md.schema.names.index("y")
            mn = min(
                md.row_group(i).column(idx).statistics.min
                for i in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(i).column(idx).statistics.max
                for i in range(md.num_row_groups)
            )
            if mx >= lo and mn <= hi:
                hits += 1
        return hits, total

    z_hits, z_total = files_intersecting_y(zpath, 0, 63)
    x_hits, x_total = files_intersecting_y(xpath, 0, 63)
    assert x_hits == x_total  # x-sort: every file spans all of y
    assert z_hits * 2 <= z_total, (z_hits, z_total)  # z-order: ≤ half

    got = spark.read.parquet(zpath).filter(F.col("y") < 64).count()
    want = pts.filter(F.col("y") < 64).count()
    assert got == want


@pytest.mark.parametrize("broadcast", [True, False])
def test_merge_plan_schema_evolution(spark, broadcast):
    """evolve_schema=True widens the table by new change columns:
    untouched target rows read NULL, updates and inserts carry
    values; default False ignores unknown columns entirely."""
    changes = spark.createDataFrame(
        [(2, 21.5, "gold", "U"), (5, 50.0, "silver", "I")],
        "id bigint, amount double, tier string, op string",
    )
    out = M.merge_plan(
        _target(spark), changes, ["id"], op_col="op",
        broadcast_changes=broadcast, evolve_schema=True,
    )
    assert out.columns == ["id", "name", "amount", "tier"]
    got = {r.id: (r.name, r.amount, r.tier) for r in out.collect()}
    assert got[2] == ("b", 21.5, "gold")
    assert got[5] == (None, 50.0, "silver")
    assert got[1] == ("a", 10.0, None) and got[3] == ("c", 30.0, None)

    strict = M.merge_plan(
        _target(spark), changes, ["id"], op_col="op",
        broadcast_changes=broadcast,
    )
    assert strict.columns == ["id", "name", "amount"]


def test_streaming_scd2_apply_matches_batch_rebuild(spark, tmp_path):
    """Micro-batched SCD2 maintenance converges to the same history a
    batch rebuild computes from the full snapshot sequence; replaying
    the drained source changes nothing (unchanged re-sends are
    no-ops by scd2_apply's semantics)."""
    import datetime as dt
    import shutil

    from ad_data_pipelines_spark.operators import scd
    from ad_data_pipelines_spark.streaming import cdc

    D = lambda d: dt.datetime(2025, 1, d)
    days = {
        1: [(1, "a"), (2, "x")],
        2: [(1, "a"), (2, "x"), (3, "p")],
        3: [(1, "b"), (2, "x"), (3, "p")],
    }
    root = str(tmp_path / "hist")
    M.table_init(
        spark.createDataFrame(
            [], "k bigint, attr string, valid_from timestamp, "
                "valid_to timestamp"
        ),
        root,
    )
    src = tmp_path / "changes"
    src.mkdir()
    schema = "k bigint, attr string, effective timestamp, seq bigint"
    for d, rows in days.items():
        b = spark.createDataFrame(
            [(k, v, D(d), d) for k, v in rows], schema
        )
        stage = tmp_path / f"stage{d}"
        b.coalesce(1).write.parquet(str(stage))
        part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
        shutil.move(str(part), str(src / f"f{d}.parquet"))

    cdc.run_scd2_apply_available_now(
        spark, str(src), schema, root, ["k"], ["attr"],
        checkpoint=str(tmp_path / "ck"), max_files_per_trigger=1,
    )

    snapshots = spark.createDataFrame(
        [(k, v, D(d)) for d, rows in days.items() for k, v in rows],
        "k bigint, attr string, snap_ts timestamp",
    )
    want = {
        (r.k, r.attr, r.valid_from, r.valid_to)
        for r in scd.scd2_history(snapshots, ["k"], ["attr"], "snap_ts")
        .collect()
    }
    got = {
        (r.k, r.attr, r.valid_from, r.valid_to)
        for r in M.table_read(spark, root).collect()
    }
    assert got == want

    # fresh checkpoint replays every file — history must not fragment
    cdc.run_scd2_apply_available_now(
        spark, str(src), schema, root, ["k"], ["attr"],
        checkpoint=str(tmp_path / "ck2"), max_files_per_trigger=1,
    )
    again = {
        (r.k, r.attr, r.valid_from, r.valid_to)
        for r in M.table_read(spark, root).collect()
    }
    assert again == want


@pytest.mark.parametrize("broadcast", [True, False])
def test_merge_plan_null_keys_never_match(spark, broadcast):
    """SQL join semantics pinned: a NULL-key change row always inserts
    (never updates the NULL-key target row), a NULL-key target row is
    never touched — identical under both strategies and aligned with
    Delta MERGE; the docstring directs callers to scrub NULL keys
    upstream because re-applies accumulate."""
    target = spark.createDataFrame(
        [(None, "t", 1.0), (1, "a", 2.0)],
        "id bigint, name string, amount double",
    )
    changes = spark.createDataFrame(
        [(None, "c", 9.0, "U"), (1, "a2", 3.0, "U")],
        "id bigint, name string, amount double, op string",
    )
    out = sorted(
        [
            (r.id, r.name, r.amount)
            for r in M.merge_plan(
                target, changes, ["id"], op_col="op",
                broadcast_changes=broadcast,
            ).collect()
        ],
        key=str,
    )
    assert out == sorted(
        [(1, "a2", 3.0), (None, "c", 9.0), (None, "t", 1.0)], key=str
    )


def test_merge_apply_partitions_null_partition_value(spark, tmp_path):
    """NULL partition values round-trip through the partition-scoped
    apply: the pruning predicate is null-safe (`eqNullSafe`), so a
    change batch touching the NULL partition (__HIVE_DEFAULT_PARTITION__
    on disk) merges AGAINST its existing rows instead of replacing the
    whole partition with only the batch rows — the silent-loss mode
    this test pins shut."""
    path = str(tmp_path / "null_part_tbl")
    df = spark.createDataFrame(
        [(1, None, "a"), (2, None, "b"), (3, 1, "c")],
        "id bigint, day int, v string",
    )
    df.write.partitionBy("day").parquet(path)

    changes = spark.createDataFrame(
        [(2, None, "b2", "U"), (9, None, "i", "I")],
        "id bigint, day int, v string, op string",
    )
    M.merge_apply_partitions(
        spark, path, changes, ["id"], ["day"], op_col="op"
    )
    got = {(r.id, r.day): r.v for r in spark.read.parquet(path).collect()}
    assert got == {
        (1, None): "a",   # pre-existing NULL-partition row survives
        (2, None): "b2",  # update applied in place, not duplicated
        (9, None): "i",   # insert lands in the NULL partition
        (3, 1): "c",      # cold partition untouched
    }


def test_version_pointer_survives_six_digit_rollover(spark, tmp_path):
    """v999999 → v1000000: the pointer regex accepts widths beyond the
    six-digit zero-pad and vacuum's newest-first ordering is numeric
    (lexicographically 'v999999' > 'v1000000', which would misorder
    the protected set) — the long-running streaming applier commits
    one version per micro-batch, so the rollover is reachable."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "v999999"))
    M._commit_pointer(root, "v999999")
    assert M.table_current_version(root) == "v999999"
    assert M._next_version(root) == "v1000000"

    os.makedirs(os.path.join(root, "v1000000"))
    M._commit_pointer(root, "v1000000")
    assert M.table_current_version(root) == "v1000000"
    assert M._next_version(root) == "v1000001"
    # keep=2 protects the committed version AND the newest other
    assert M.table_vacuum(root, keep=2) == []
    # keep=1 reclaims the prior; numeric sort keeps the right one
    assert M.table_vacuum(root, keep=1) == ["v999999"]
    assert M.table_current_version(root) == "v1000000"


def test_table_vacuum_keep2_retains_one_prior_version(spark, tmp_path):
    """The reader-grace contract of the streaming appliers
    (vacuum_keep=2): after a commit, the immediately prior version is
    still on disk so a reader that resolved the pointer just before
    the commit can finish."""
    root = str(tmp_path / "tbl")
    M.table_init(_target(spark), root)
    M.merge_apply(spark, root, _changes(spark), ["id"], op_col="op")
    M.merge_apply(spark, root, _changes(spark), ["id"], op_col="op")
    removed = M.table_vacuum(root, keep=2)
    assert removed == ["v000001"]
    left = sorted(d for d in os.listdir(root) if d.startswith("v"))
    assert left == ["v000002", "v000003"]
