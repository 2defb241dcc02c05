"""First-seen timestamp preservation (S13) — the reference's SQLite
key-value store replaced by a join against the previous output snapshot.

Reference: scripts/ads_passenger_travel_distance_di.py:9-52 kept a
per-(date, region, bucket) `create_time` in SQLite so re-runs preserved
the first write's timestamp. On Spark that side-database becomes:

    coalesce(previous.create_time, current_timestamp())

over a left join with the prior snapshot — idempotent, no external
state, and (on Delta/Iceberg) expressible as MERGE. The join is on the
output grain (tiny), so it broadcasts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_first_seen(
    current: DataFrame,
    previous: DataFrame | None,
    keys: Sequence[str],
    time_col: str = "create_time",
    now: "F.Column | None" = None,
) -> DataFrame:
    """Current output rows with `time_col` inherited from the previous
    snapshot where the key existed, else `now` (default
    current_timestamp; pass a literal for deterministic tests/backfills)."""
    if now is None:
        now = F.current_timestamp()
    if previous is None:
        return current.withColumn(time_col, now)
    prev = previous.select(*keys, F.col(time_col).alias("__prev_time"))
    cur = current.drop(time_col) if time_col in current.columns else current
    return (
        cur.join(F.broadcast(prev), list(keys), "left")
        .withColumn(
            time_col, F.coalesce(F.col("__prev_time"), now)
        )
        .drop("__prev_time")
    )
