"""Fuzzy entity matching: blocking + edit-distance verification.

Beyond-reference (BASELINE.json north star): the record-linkage /
entity-resolution primitive a curation pipeline needs when joining
dirty catalogs (vendor names, product titles, station labels) that
exact keys can't line up. The reference's pipelines join on clean
surrogate keys only (e.g. `scripts/ads_passenger_travel_time_di.R:112-114`'s
route-key joins); this operator is the standard scalable answer for
when those keys don't exist.

Scale design (the canonical block→verify shape):
  * ALL-PAIRS EDIT DISTANCE IS QUADRATIC AND BANNED — candidates come
    from equi-joining a cheap deterministic blocking key (shared last
    word, soundex, first-n chars…), so the self-join is a plain hash
    join whose cost is Σ block_size², not n².
  * verification (`levenshtein`) runs JVM-side per candidate pair —
    no UDF, stays inside whole-stage codegen.
  * distinct-normalize BEFORE pairing: duplicate surface forms
    collapse first, so a 100 TB catalog pairs distinct strings (a far
    smaller table), and exact duplicates (distance 0) stay the
    business of the exact-dedup operators.
  * a skewed block (one dominant last word) is a skewed join key —
    AQE skew-split handles it, or pick a finer blocking key; the
    block-size histogram from `block_size_report` is the diagnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    text_col: str,
    block: Column,
    max_dist: int = 3,
    min_dist: int = 1,
) -> DataFrame:
    """(text_a, text_b, dist) for distinct values of `text_col` that
    share a blocking key and sit within [min_dist, max_dist] edit
    distance; text_a < text_b so each pair appears once. The default
    min_dist=1 excludes exact duplicates (exact-dedup territory)."""
    names = (
        df.select(F.col(text_col).alias("text"))
        .distinct()
        .select("text", block.alias("blk"))
    )
    a = names.select(
        F.col("text").alias("text_a"), F.col("blk").alias("blk")
    )
    b = names.select(
        F.col("text").alias("text_b"), F.col("blk").alias("blk")
    )
    dist = F.levenshtein("text_a", "text_b")
    return (
        a.join(b, "blk")
        .filter(F.col("text_a") < F.col("text_b"))
        .select("text_a", "text_b", dist.cast("int").alias("dist"))
        .filter(
            (F.col("dist") >= min_dist) & (F.col("dist") <= max_dist)
        )
    )


def last_word(col: str) -> Column:
    """Blocking key: the last whitespace word (product-noun blocking
    for '<modifier> <noun>' catalogs)."""
    return F.element_at(F.split(F.col(col), r"\s+"), -1)


def soundex_last_word(col: str) -> Column:
    """Blocking key: Soundex code of the last word — groups phonetic
    misspellings ('smith'/'smyth') that edit-distance blocking on raw
    substrings would scatter. JVM built-in, codegen-friendly.
    Pytest-only coverage (no DuckDB twin: the oracle engine has no
    soundex; pair results remain engine-checkable through the plain
    `last_word` registry query)."""
    return F.soundex(F.upper(last_word(col)))


def block_size_report(df: DataFrame, text_col: str, block: Column) -> DataFrame:
    """(blk, n_values, n_candidate_pairs) per block — the skew
    diagnostic to run BEFORE the pair join at a new scale; a block
    contributing most of Σ n·(n−1)/2 needs a finer key."""
    return (
        df.select(F.col(text_col).alias("text"))
        .distinct()
        .select(block.alias("blk"))
        .groupBy("blk")
        .agg(F.count("*").alias("n_values"))
        .select(
            "blk",
            "n_values",
            (F.col("n_values") * (F.col("n_values") - 1) / 2)
            .cast("bigint")
            .alias("n_candidate_pairs"),
        )
    )


def entity_clusters(
    df: DataFrame,
    text_col: str,
    block: Column,
    max_dist: int = 3,
) -> DataFrame:
    """Full entity resolution: fuzzy pairs → connected components →
    (name, canonical, is_canonical), one row per distinct surface
    form. Canonical = lexicographic-min name reachable through the
    fuzzy-match graph (deterministic, engine-independent); names with
    no fuzzy neighbor are their own canonical.

    Composition of `blocked_levenshtein_pairs` with
    `dedup.connected_components` (operators/dedup.py) — the min-label
    algorithm is value-generic, so it clusters name strings exactly as
    it clusters doc_ids: the edge list (already distinct-normalized
    and blocked) is the only thing shuffled or collected, never the
    input table."""
    from ad_data_pipelines_spark.operators.dedup import connected_components

    pairs = blocked_levenshtein_pairs(df, text_col, block, max_dist)
    cc = connected_components(pairs, src="text_a", dst="text_b").select(
        F.col("doc_id").alias("name"), F.col("component").alias("canonical")
    )
    names = df.select(F.col(text_col).alias("name")).distinct()
    return (
        names.join(cc, "name", "left")
        .select(
            "name",
            F.coalesce("canonical", "name").alias("canonical"),
        )
        .withColumn(
            "is_canonical",
            F.when(F.col("name") == F.col("canonical"), 1).otherwise(0),
        )
    )


def entity_clusters_sql(
    scope: str,
    text_expr: str,
    block_expr: str,
    max_dist: int = 3,
) -> str:
    """DuckDB twin of `entity_clusters`: transitive closure by
    recursive CTE (oracle scale only — production is the min-label /
    union-find hybrid in `dedup.connected_components`)."""
    pairs = blocked_levenshtein_sql(scope, text_expr, block_expr, max_dist)
    return f"""
        WITH RECURSIVE fpairs AS (
            SELECT text_a, text_b FROM ({pairs})
        ),
        edges AS (
            SELECT text_a AS u, text_b AS v FROM fpairs
            UNION ALL
            SELECT text_b AS u, text_a AS v FROM fpairs
        ),
        reach(src, dst) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
        ),
        comp AS (
            SELECT src AS name, MIN(dst) AS canonical FROM reach GROUP BY src
        ),
        names AS (SELECT DISTINCT {text_expr} AS name FROM {scope})
        SELECT n.name,
               COALESCE(c.canonical, n.name) AS canonical,
               CASE WHEN n.name = COALESCE(c.canonical, n.name)
                    THEN 1 ELSE 0 END AS is_canonical
        FROM names n LEFT JOIN comp c USING (name)
    """


def blocked_levenshtein_sql(
    scope: str,
    text_expr: str,
    block_expr: str,
    max_dist: int = 3,
    min_dist: int = 1,
) -> str:
    """DuckDB twin of `blocked_levenshtein_pairs`; `block_expr` is a
    SQL expression over the alias `text`."""
    return f"""
        WITH names AS (
            SELECT DISTINCT {text_expr} AS text FROM {scope}
        ),
        blocked AS (
            SELECT text, {block_expr} AS blk FROM names
        )
        SELECT a.text AS text_a, b.text AS text_b,
               CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist
        FROM blocked a JOIN blocked b USING (blk)
        WHERE a.text < b.text
          AND levenshtein(a.text, b.text) BETWEEN {min_dist} AND {max_dist}
    """
