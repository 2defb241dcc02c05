"""Model-based document scoring: hashed-feature Naive Bayes text
classifier, trained AND applied as pure DataFrame aggregation.

Beyond-reference (SURVEY.md north star). Modern corpus curation
(CCNet, DCLM, FineWeb) filters with a lightweight linear text
classifier — "does this look like reference text / the target
domain?" — not just rule features (`textstats.quality_features`).
The fasttext-style recipe maps exactly onto Spark:

  * features — the HASHING TRICK: token → md5 bucket in
    [0, n_features); no vocabulary object to build, broadcast, or
    version, and the md5-portable path makes the oracle reproduce
    buckets bit-for-bit (swap `fast=True` xxhash64 in production).
  * training — multinomial NB log-odds are ONE aggregate over the
    labeled corpus: per-bucket occurrence counts by class + add-α
    smoothing. No gradient loop, no driver-side state; retraining on
    100 TB is a groupBy.
  * scoring — score(doc) = prior + Σ_tokens w(bucket(token)): one
    token explode, one broadcast join against the (≤ n_features)-row
    weight table, one per-doc sum. When training and scoring run over
    the SAME corpus (self-scoring, the registry query), pass one
    persisted `token_buckets` table into both so the corpus explodes
    ONCE. Whole-stage codegen throughout;
    the corpus text never shuffles (only doc_id + bucket ids reach
    the aggregate).

score > 0 reads "more likely positive-class than negative". The
decision threshold, like any filter knob, should be validated against
held-out labels (`llm_nb_quality` surfaces per-class score means and
above-threshold rates for exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ad_data_pipelines_spark.functions.hashing import portable_hash64


def token_buckets(
    docs: DataFrame, n_features: int = 1024, text_col: str = "text"
) -> DataFrame:
    """(doc_id, bucket): one row per token OCCURRENCE, token hashed to
    [0, n_features) — the hashing-trick featurizer shared by training
    and scoring."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(text_col)), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("tok"),
    )
    return toks.select(
        "doc_id",
        F.pmod(portable_hash64("tok"), F.lit(n_features)).alias("bucket"),
    )


def train_nb(
    docs: DataFrame,
    label: F.Column,
    n_features: int = 1024,
    alpha: float = 1.0,
    text_col: str = "text",
    buckets: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial-NB log-odds weights on `docs` with boolean
    `label` (positive class where true). Returns (weights, consts):

      weights: (bucket, w) for every bucket seen in training, where
        w = ln((c_pos+α)/(N_pos+α·F)) − ln((c_neg+α)/(N_neg+α·F)),
      consts: ONE row (prior, w_unseen) — the class-prior log-odds
        and the weight every bucket ABSENT from training inherits
        (the same smoothing formula with c=0), kept separate so the
        scoring join can coalesce instead of densifying all F
        buckets.

    One aggregate over the corpus; both outputs are tiny (≤ F rows)
    and broadcastable."""
    lb = docs.withColumn("__pos", label)
    tb = (
        buckets
        if buckets is not None
        else token_buckets(lb, n_features, text_col)
    )
    b = tb.join(lb.select("doc_id", "__pos"), "doc_id")
    per_bucket = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("c_neg"),
    )
    totals = b.agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("n_neg"),
    )
    doc_totals = lb.agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("d_pos"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("d_neg"),
    )
    a, ff = float(alpha), float(n_features)
    weights = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_pos") + a) / (F.col("n_pos") + a * ff))
            - F.log((F.col("c_neg") + a) / (F.col("n_neg") + a * ff))
        ).alias("w"),
    )
    consts = totals.crossJoin(F.broadcast(doc_totals)).select(
        F.log(
            (F.col("d_pos") + 1.0) / (F.col("d_neg") + 1.0)
        ).alias("prior"),
        (
            F.log(F.lit(a) / (F.col("n_pos") + a * ff))
            - F.log(F.lit(a) / (F.col("n_neg") + a * ff))
        ).alias("w_unseen"),
    )
    return weights, consts


def hashed_gram_buckets(
    docs: DataFrame,
    n_features: int = 4096,
    text_col: str = "text",
    *,
    fast: bool = False,
) -> DataFrame:
    """(doc_id, bucket): one row per unigram AND bigram occurrence,
    each gram hashed to [0, n_features) — the DSIR featurizer (Xie et
    al. 2023 use hashed uni+bigram bag models). Bigrams build
    ARRAY-SIDE with zip_with over two slices (the lm.py trick) so
    extraction is a narrow map stage; docs with zero tokens contribute
    no rows (and therefore drop from any per-doc score — mirrored by
    the oracle's unnest of an empty list)."""
    toks = F.filter(
        F.split(F.lower(F.trim(text_col)), r"\s+"),
        lambda x: x != F.lit(""),
    )
    n = F.size("__toks")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("__toks", 1, n - 1),
            F.slice("__toks", 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", toks.alias("__toks"))
        .select(
            "doc_id",
            F.explode(F.concat(F.col("__toks"), bigrams)).alias("gram"),
        )
        .select(
            "doc_id",
            F.pmod(
                portable_hash64("gram", fast=fast), F.lit(n_features)
            ).alias("bucket"),
        )
    )


def dsir_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_features: int = 4096,
    alpha: float = 1.0,
    text_col: str = "text",
    round_dp: int = 4,
    *,
    fast: bool = False,
    gram_cache: list | None = None,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): fit two bag-of-hashed-ngram generative models — p̂ on the
    TARGET corpus (the domain you want more of), q̂ on the RAW pool —
    and score every raw doc with its log importance weight

        log w(doc) = Σ_gram  ln p̂(bucket(gram)) − ln q̂(bucket(gram)),

    add-α smoothed over the n_features-bucket feature space. Docs that
    look like the target score high; resampling raw data ∝ w shifts
    the pretraining mixture toward the target domain without a hard
    classifier threshold (pair with `sampling.gumbel_topk_sample` for
    the fixed-size resample step). Returns (doc_id, n_grams, log_w),
    log_w rounded to `round_dp`.

    Scale shape: featurization is a narrow map+explode (text never
    shuffles — only (doc_id, bucket) longs); each model is ONE
    combinable count aggregate reduced to ≤ n_features rows; the
    per-bucket log-ratio table broadcasts to the scoring join; the
    per-doc score is one combinable sum. Retraining on a new target
    at 100 TB is two groupBys. Every scored bucket appears in the raw
    counts by construction (raw scores itself), so no unseen-bucket
    fallback path is needed — callers scoring a THIRD corpus should
    score it as part of the raw pool or add the NB-style coalesce.
    """
    if n_features <= 0 or alpha <= 0:
        raise ValueError(
            "dsir_weights: n_features and alpha must be positive "
            f"(got n_features={n_features}, alpha={alpha})"
        )
    bt = hashed_gram_buckets(target_docs, n_features, text_col, fast=fast)
    # the raw pool's gram frame feeds TWO plan branches — the model fit
    # (via the tagged-union aggregate inside dsir_bucket_weights, which
    # executes first as the broadcast-build job) and the scoring join —
    # so persist it: the md5-portable gram hash over the whole raw pool
    # is the dominant map cost and would otherwise run twice (r14 opt,
    # the lsh_candidate_pairs internal-persist precedent). Occurrence
    # rows are two longs each — never text. OWNERSHIP (r15, per the
    # r14 advice): pass ``gram_cache=[]`` to receive the persisted
    # frame and unpersist it once your last action over the result has
    # run; without it the cache lives until session GC — acceptable
    # for one-shot sessions, leaky for repeated calls in a long one.
    br = hashed_gram_buckets(
        raw_docs, n_features, text_col, fast=fast
    ).persist()
    if gram_cache is not None:
        gram_cache.append(br)
    weights = dsir_bucket_weights(br, bt, n_features, alpha)
    return (
        br.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.round(F.sum("w"), round_dp).alias("log_w"),
        )
    )


def dsir_bucket_weights(
    raw_buckets: DataFrame,
    target_buckets: DataFrame,
    n_features: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """The DSIR model itself: the per-bucket log importance ratio
    table (bucket, w) with w = ln p̂(b) − ln q̂(b), add-α smoothed —
    fit from two (doc_id, bucket) gram frames (`hashed_gram_buckets`
    output). ≤ n_features rows; persist/broadcast it to score any
    stream or corpus slice later (`dsir_score`) without refitting —
    at ingest time the model is a KB-scale broadcast artifact, the
    same deployment shape as the NB classifier weights."""
    # ONE tagged-union aggregate, not ct ⋈FULL OUTER⋈ cr: a full outer
    # join cannot broadcast, so Spark plans a sort-merge exchange for
    # two ≤n_features-row frames (caught by the sf0.1 SMJ allowlist
    # sweep) — whereas the union form is a single combinable count
    # with no join anywhere
    tagged = raw_buckets.select(
        "bucket", F.lit(0).alias("is_t")
    ).unionByName(target_buckets.select("bucket", F.lit(1).alias("is_t")))
    counts = tagged.groupBy("bucket").agg(
        F.sum("is_t").alias("ct"),
        F.sum(F.lit(1) - F.col("is_t")).alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    a, b = float(alpha), float(n_features)
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + a) / (F.col("nt") + a * b))
            - F.log((F.col("cr") + a) / (F.col("nr") + a * b))
        ).alias("w"),
    )


def dsir_score(
    docs: DataFrame,
    weights: DataFrame,
    n_features: int = 4096,
    text_col: str = "text",
    round_dp: int = 4,
    *,
    fast: bool = False,
) -> DataFrame:
    """Score docs against an already-fit DSIR weight table
    (`dsir_bucket_weights` output): per-doc (n_grams, log_w). Buckets
    absent from the table contribute 0 (unseen under BOTH models —
    the neutral prior), via the left join's coalesce. The scoring
    side is one gram explode + a broadcast join + a combinable sum —
    the per-micro-batch shape of the streaming ingest gate."""
    gb = hashed_gram_buckets(docs, n_features, text_col, fast=fast)
    return (
        gb.join(F.broadcast(weights), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.round(F.sum(F.coalesce("w", F.lit(0.0))), round_dp).alias(
                "log_w"
            ),
        )
    )


def dsir_weights_sql(
    raw_where: str,
    target_where: str,
    n_features: int = 4096,
    alpha: float = 1.0,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of `dsir_weights` over the documents table;
    `raw_where` / `target_where` are SQL predicates selecting the two
    corpora. Same md5-portable bucket hash, same add-α algebra."""
    a, b = float(alpha), float(n_features)
    return f"""
        WITH base AS (
            SELECT doc_id, lang, source,
                   list_filter(
                       regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ),
        grams AS (
            SELECT doc_id, lang, source,
                   unnest(toks || list_transform(
                       range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i + 1])) AS gram
            FROM base
        ),
        gb AS (
            SELECT doc_id, lang, source,
                   CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT)
                       % {n_features} AS bucket
            FROM grams
        ),
        ct AS (
            SELECT bucket, COUNT(*) AS ct FROM gb
            WHERE {target_where} GROUP BY bucket
        ),
        cr AS (
            SELECT bucket, COUNT(*) AS cr FROM gb
            WHERE {raw_where} GROUP BY bucket
        ),
        counts AS (
            SELECT COALESCE(ct.bucket, cr.bucket) AS bucket,
                   COALESCE(ct.ct, 0) AS ct, COALESCE(cr.cr, 0) AS cr
            FROM ct FULL OUTER JOIN cr ON ct.bucket = cr.bucket
        ),
        totals AS (
            SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM counts
        ),
        w AS (
            SELECT bucket,
                   ln((ct + {a}) / (nt + {a} * {b}))
                   - ln((cr + {a}) / (nr + {a} * {b})) AS w
            FROM counts CROSS JOIN totals
        )
        SELECT gb.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               ROUND(SUM(w.w), {round_dp}) AS log_w
        FROM gb JOIN w USING (bucket)
        WHERE {raw_where}
        GROUP BY gb.doc_id
    """


def hashed_doc_embedding(
    docs: DataFrame,
    n_features: int = 4096,
    dim: int = 8,
    seed: int = 0,
    text_col: str = "text",
    *,
    fast: bool = False,
) -> DataFrame:
    """Model-free text featurizer: a signed-count Johnson–Lindenstrauss
    sketch of each doc's hashed uni+bigram bag —

        val(doc, d) = Σ_buckets count(doc, bucket) · sign(bucket, d),

    sign(bucket, d) = ±1 from md5(seed:bucket:d) parity (the
    `similarity.projection_signs` convention, portable to any engine).
    Returns one flat row per (doc_id, dim): (doc_id, dim, val) with
    val an exact BIGINT — no floats anywhere, so the cross-engine
    contract is integer-exact. Docs with zero tokens contribute no
    rows.

    This is the text-side bridge to the similarity family: when no
    neural embedder is at hand (or before one runs), it gives every
    document a cheap dense vector for clustering, near-dup scanning,
    and drift monitoring — the same hashed-feature idea DSIR uses for
    importance weights, projected instead of scored.

    Scale shape: featurization is the narrow map+explode of
    `hashed_gram_buckets`; per-doc bucket counts are one combinable
    aggregate; the (n_features × dim) sign table is generated
    ENGINE-SIDE (spark.range cross spark.range — never driver data)
    and broadcast to the projection join; the final reduce is a
    second combinable aggregate on (doc_id, dim). Text never
    shuffles; re-featurizing 100 TB is two groupBys.
    """
    if n_features <= 0 or dim <= 0:
        raise ValueError(
            "hashed_doc_embedding: n_features and dim must be positive "
            f"(got n_features={n_features}, dim={dim})"
        )
    if dim > 64:
        raise ValueError(
            f"hashed_doc_embedding: dim={dim} > 64 — the projection is "
            "one wide aggregate (dim sum columns per doc); very wide "
            "sketches should shard across calls"
        )
    spark = docs.sparkSession
    gb = hashed_gram_buckets(docs, n_features, text_col, fast=fast)
    counts = gb.groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt"))

    # the sign table is WIDE (bucket, s0..s{dim-1}), not long: joining
    # a (bucket, dim, sign) long table would multiply the pre-combine
    # aggregate input by dim (the kmeans-update posexplode lesson) —
    # the wide join keeps the exchange at one row per (doc, bucket)
    # and the per-dim sums combine map-side
    def _sign(d: int):
        return (
            portable_hash64(
                F.concat_ws(
                    ":", F.lit(str(seed)), F.col("bucket"), F.lit(str(d))
                ),
                fast=fast,
            )
            % 2
            * 2
            - 1
        ).alias(f"s{d}")

    signs = spark.range(n_features).select(
        F.col("id").alias("bucket"), *[_sign(d) for d in range(dim)]
    )
    wide = (
        counts.join(F.broadcast(signs), "bucket")
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.col("cnt") * F.col(f"s{d}"))
                .cast("bigint")
                .alias(f"v{d}")
                for d in range(dim)
            ]
        )
    )
    return wide.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"v{d}") for d in range(dim)])).alias(
            "dim", "val"
        ),
    ).select("doc_id", F.col("dim").cast("bigint").alias("dim"), "val")


def hashed_doc_embedding_sql(
    n_features: int = 4096,
    dim: int = 8,
    seed: int = 0,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of `hashed_doc_embedding` over the documents table
    — same md5 gram buckets, same md5-parity signs, integer-exact."""
    return f"""
        WITH de_base AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents WHERE {where}
        ),
        de_grams AS (
            SELECT doc_id,
                   unnest(toks || list_transform(
                       range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i + 1])) AS gram
            FROM de_base
        ),
        de_counts AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT)
                       % {n_features} AS bucket,
                   COUNT(*) AS cnt
            FROM de_grams GROUP BY 1, 2
        ),
        de_signs AS (
            SELECT b.bucket, d.dim,
                   (CAST('0x' || substr(md5(
                        '{seed}:' || CAST(b.bucket AS VARCHAR) || ':'
                        || CAST(d.dim AS VARCHAR)), 1, 15) AS BIGINT)
                    % 2) * 2 - 1 AS sign
            FROM (SELECT unnest(generate_series(0, {n_features - 1}))
                      AS bucket) b
            CROSS JOIN (SELECT unnest(generate_series(0, {dim - 1}))
                            AS dim) d
        )
        SELECT doc_id, dim, CAST(SUM(cnt * sign) AS BIGINT) AS val
        FROM de_counts JOIN de_signs USING (bucket)
        GROUP BY doc_id, dim
    """


def nb_score(
    docs: DataFrame,
    weights: DataFrame,
    consts: DataFrame,
    n_features: int = 1024,
    text_col: str = "text",
    buckets: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, score): prior + Σ_token w(bucket); buckets unseen in
    training contribute w_unseen. Empty docs score the bare prior.
    Weight table broadcasts; only (doc_id, bucket) pairs shuffle."""
    b = (
        buckets
        if buckets is not None
        else token_buckets(docs, n_features, text_col)
    )
    summed = (
        b.join(F.broadcast(weights), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("__n"),
            F.sum(F.col("w").isNull().cast("int")).alias("__n_unseen"),
            F.sum(F.coalesce("w", F.lit(0.0))).alias("__w_sum"),
        )
    )
    return (
        docs.select("doc_id")
        .join(summed, "doc_id", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            (
                F.col("prior")
                + F.coalesce("__w_sum", F.lit(0.0))
                + F.coalesce("__n_unseen", F.lit(0)) * F.col("w_unseen")
            ).alias("score"),
        )
    )
