"""Embedding similarity search: brute-force cosine top-k (baseline) and
hyperplane-LSH bucketing (scale path).

Beyond-reference (BASELINE.json north star): ANN over an
`embeddings(vec_id, embedding array<float>, label)` table. Dot products
run as built-in higher-order functions (`zip_with` + `aggregate`) in
double precision — JVM-side, codegen'd, no Python.

Scale design (100 TB / billions of vectors):
  * brute-force is O(Q×N): correct baseline; the query side must stay
    small and broadcast. 1000 executors stream the candidate side.
  * LSH buckets: b sign-bits from dot(v, hyperplane_j) → 2^b buckets;
    search only the query's bucket (optionally multi-probe neighboring
    buckets). Bucket assignment is a narrow map; the bucketed join
    shuffles vectors once by bucket id.
  * an IVF variant would k-means the corpus and probe nearest
    centroids; hyperplane LSH is chosen here because it is stateless
    (no training pass) and fully expressible as column algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Deterministic pseudo-random hyperplanes (LCG-generated, fixed seed) —
#: stable across runs/engines so bucket ids are reproducible.
N_PLANES = 8
DIM = 64


def _lcg_floats(n: int, seed: int = 1103515245) -> list[float]:
    out = []
    x = seed
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(x / float(1 << 31) - 0.5)
    return out


HYPERPLANES: list[list[float]] = [
    _lcg_floats(DIM, seed=7919 * (j + 1)) for j in range(N_PLANES)
]


def dot(a, b):
    """Double-precision dot product of two array columns (built-in HOF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest
    corpus vectors (excluding itself). Assumes unit-normalized inputs
    (dot == cosine); returns (query_id, neighbor_id, sim, rk).

    The query side is broadcast — the corpus is never shuffled, each
    executor streams its partitions against all queries.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    sims = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("q_emb"), F.col("c_emb")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def lsh_bucket(
    embeddings: DataFrame, id_col: str = "vec_id", n_planes: int = N_PLANES
) -> DataFrame:
    """Assign each vector a hyperplane-LSH bucket id (0..2^n_planes-1).

    Tune n_planes so expected bucket occupancy = corpus/2^n_planes stays
    well above k — at billions of vectors use 16-20 planes; small corpora
    need 4-6.
    """
    bucket = F.lit(0)
    for j, plane in enumerate(HYPERPLANES[:n_planes]):
        arr = F.array(*[F.lit(v) for v in plane])
        bucket = bucket + F.when(dot(F.col("embedding"), arr) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
    return embeddings.select(
        F.col(id_col), bucket.cast("int").alias("bucket_id"), "embedding"
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    n_planes: int = 4,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN top-k searching the query's LSH bucket (+ optional multi-probe).

    multiprobe=1 also probes every bucket at Hamming distance 1 from the
    query's (flip each sign bit once): n_planes+1 buckets per query —
    the standard recall/cost dial. Cost is O(Q × occupancy × probes)
    vs brute force O(Q×N); recall < 1.0 by construction (floor asserted
    in tests).
    """
    qb0 = lsh_bucket(queries, id_col, n_planes).select(
        F.col(id_col).alias("query_id"),
        F.col("bucket_id"),
        F.col("embedding").alias("q_emb"),
    )
    if multiprobe >= 1:
        probes = F.array(
            F.col("bucket_id"),
            *[
                F.col("bucket_id").bitwiseXOR(F.lit(1 << j))
                for j in range(n_planes)
            ],
        )
        qb = qb0.select(
            "query_id", F.explode(probes).alias("bucket_id"), "q_emb"
        )
    else:
        qb = qb0
    cb = lsh_bucket(embeddings, id_col, n_planes).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("bucket_id"),
        F.col("embedding").alias("c_emb"),
    )
    sims = (
        cb.join(F.broadcast(qb), "bucket_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("q_emb"), F.col("c_emb")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def cosine_topk_sql(max_query_id: int, k: int = 5) -> str:
    """DuckDB oracle for cosine_topk with identical double math."""
    dot_sql = (
        "list_sum(list_transform(list_zip(q.embedding, c.embedding), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )
    return f"""
        WITH pairs AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND({dot_sql}, 4) AS sim
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {max_query_id}
        )
        SELECT query_id, neighbor_id, sim, rk FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY sim DESC, neighbor_id
            ) AS rk FROM pairs
        ) WHERE rk <= {k}
    """
