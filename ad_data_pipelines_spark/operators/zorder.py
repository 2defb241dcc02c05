"""Z-order (Morton) clustering: multi-dimensional data-skipping
layout for parquet tables.

Beyond-reference (SURVEY.md north star). A 100 TB fact sorted by one
column skips beautifully on that column and not at all on any other;
interleaving the bits of several columns into one sort key gives every
participating dimension tight per-file min/max ranges, so parquet
footer pruning works for predicates on ANY of them — the layout trick
behind Delta's OPTIMIZE ZORDER and Iceberg's sort orders, implemented
here as plain column arithmetic + a range-partitioned write.

Design:
  * `z_value` is PURE column arithmetic (shift/mask/or per bit —
    whole-stage codegen, no UDF), so it can sit in any plan;
    normalization bounds are EXPLICIT parameters, not a hidden
    min/max job — at scale you know your domains, and a stats job
    would make layout nondeterministic under appends.
  * `zorder_write` uses `repartitionByRange` on the z-key (range
    partitioning = contiguous z-runs per file = tight per-file
    bounds on every interleaved dimension) + `sortWithinPartitions`
    for row-group-level skipping inside each file.
  * Locality guarantee tested: for points in the same coarse z-cell,
    every dimension's spread is bounded by the cell edge — and the
    file-pruning win over a single-column sort is asserted on real
    parquet footers (tests/test_operators.py).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(
    col: Column | str, lo: float, hi: float, bits: int
) -> Column:
    """Map [lo, hi] linearly onto the integer grid [0, 2^bits), clamped
    at both ends (out-of-bounds values land on the edge cells rather
    than corrupting the interleave)."""
    if hi <= lo:
        raise ValueError(f"normalize_to_bits: need lo < hi, got [{lo}, {hi}]")
    c = F.col(col) if isinstance(col, str) else col
    top = (1 << bits) - 1
    scaled = F.floor(
        (c.cast("double") - F.lit(float(lo)))
        * F.lit(top / (float(hi) - float(lo)))
    ).cast("long")
    return F.greatest(F.least(scaled, F.lit(top)), F.lit(0))


def z_value(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton interleave of already-normalized integer columns (each in
    [0, 2^bits)): bit b of column i lands at position b*len(cols)+i.
    len(cols)*bits must fit a signed 64-bit long (≤ 62 keeps the sign
    bit clear). Pure shift/mask/or — codegen, no UDF."""
    n = len(cols)
    if n == 0:
        raise ValueError("z_value: need at least one column")
    if n * bits > 62:
        raise ValueError(
            f"z_value: {n} cols × {bits} bits = {n * bits} exceeds 62"
        )
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(
                F.lit(1)
            )
            terms.append(F.shiftleft(bit, b * n + i))
    return reduce(lambda a, t: a.bitwiseOR(t), terms).alias("z")


def z_value_sql(exprs: Sequence[str], bits: int = 16) -> str:
    """The identical interleave as an ANSI-SQL expression over
    already-normalized integer SQL expressions — the DuckDB oracle
    twin (generated the same way simhash_sql is)."""
    n = len(exprs)
    terms = [
        f"((({e}) >> {b} & 1) << {b * n + i})"
        for b in range(bits)
        for i, e in enumerate(exprs)
    ]
    return " | ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[tuple[str, float, float]],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write `df` as parquet clustered by the z-order of `cols`
    ((name, lo, hi) domain triples): range partitioning on the z-key
    gives each output file a contiguous z-run → tight per-file min/max
    for EVERY interleaved column; the within-partition sort tightens
    row-group bounds too. The z-key itself is dropped before writing
    (it is a layout device, not data)."""
    z = z_value(
        [normalize_to_bits(c, lo, hi, bits) for c, lo, hi in cols], bits
    )
    keyed = df.withColumn("__z", z)
    parts = (
        keyed.repartitionByRange(num_files, "__z")
        if num_files
        else keyed.repartitionByRange("__z")
    )
    parts.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)
