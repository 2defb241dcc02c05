"""Deterministic corpus splitting/sampling for training-data pipelines.

`df.sample()`/`sampleBy()` are seed-dependent AND partition-layout-
dependent — rerunning after a repartition reassigns rows, which is
poison for train/val/test hygiene (leakage when a doc hops splits
between runs). Hash-based assignment keys the decision to the ROW, not
the execution: stable across runs, engines, partitionings and
cluster sizes, and exactly reproducible in the DuckDB oracle via the
md5-portable hash (functions/hashing.py). Production can swap to
xxhash64 (fast=True) once cross-engine reproducibility isn't needed.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ad_data_pipelines_spark.functions.hashing import portable_hash64

#: Bucket granularity for split fractions (0.1% resolution).
N_BUCKETS = 1000


def hash_bucket(key: Column | str, salt: str = "", *, fast: bool = False) -> Column:
    """Stable bucket in [0, N_BUCKETS) from a key column + salt. The salt
    decorrelates independent sampling decisions on the same key (e.g. a
    10% eval subsample drawn inside the train split)."""
    c = F.col(key) if isinstance(key, str) else key
    keyed = F.concat(c.cast("string"), F.lit("#" + salt))
    return (portable_hash64(keyed, fast=fast) % N_BUCKETS).cast("int")


def hash_split(
    df: DataFrame,
    key: str,
    splits: Mapping[str, float],
    salt: str = "split",
    *,
    fast: bool = False,
) -> DataFrame:
    """Assign every row to a named split by hashing `key`: adds a
    `split` column. Fractions must sum to ≤ 1; any remainder falls into
    the last split (so {'train': .8, 'val': .1, 'test': .1} is exact).

    Narrow map-only transform — no shuffle, no state; at 100 TB the
    split is computed on the fly wherever it's consumed.
    """
    bucket = hash_bucket(key, salt, fast=fast)
    names = list(splits)
    chain = None
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        cond = bucket < round(acc * N_BUCKETS)
        chain = (
            F.when(cond, F.lit(name))
            if chain is None
            else chain.when(cond, F.lit(name))
        )
    assigned = F.lit(names[-1]) if chain is None else chain.otherwise(F.lit(names[-1]))
    return df.withColumn("split", assigned)


def hash_bucket_sql(expr: str, salt: str = "") -> str:
    """DuckDB twin of `hash_bucket` (md5-portable path)."""
    keyed = f"(CAST({expr} AS VARCHAR) || '#{salt}')"
    return (
        f"(CAST('0x' || substr(md5({keyed}), 1, 15) AS BIGINT) % {N_BUCKETS})"
    )


def hash_split_sql(expr: str, splits: Mapping[str, float], salt: str = "split") -> str:
    bucket = hash_bucket_sql(expr, salt)
    names = list(splits)
    acc = 0.0
    cases = []
    for name in names[:-1]:
        acc += splits[name]
        cases.append(f"WHEN {bucket} < {round(acc * N_BUCKETS)} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
