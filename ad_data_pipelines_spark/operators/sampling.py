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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key: str,
    default: float = 0.0,
    salt: str = "strat",
    *,
    fast: bool = False,
) -> DataFrame:
    """Keep a per-stratum fraction of rows, deterministically: a row
    survives iff hash_bucket(key) < fraction(stratum) — the data-mix
    rebalancing step of corpus assembly (e.g. downsample boilerplate
    languages, keep all of a rare one).

    Map-only like `hash_split` (no shuffle, no state); strata not in
    `fractions` fall back to `default`. Because the decision is keyed
    to the row, overlapping runs agree: the 20% sample is a superset
    of the 10% sample with the same salt.
    """
    bucket = hash_bucket(key, salt, fast=fast)
    thresh = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        val = F.lit(round(frac * N_BUCKETS))
        thresh = F.when(cond, val) if thresh is None else thresh.when(cond, val)
    thresh = (
        F.lit(round(default * N_BUCKETS))
        if thresh is None
        else thresh.otherwise(F.lit(round(default * N_BUCKETS)))
    )
    return df.filter(bucket < thresh)


def stratified_sample_sql(
    strata_expr: str,
    fractions: Mapping[str, float],
    key_expr: str,
    default: float = 0.0,
    salt: str = "strat",
) -> str:
    """DuckDB WHERE-clause twin of `stratified_sample`."""
    bucket = hash_bucket_sql(key_expr, salt)
    cases = " ".join(
        f"WHEN {strata_expr} = '{name}' THEN {round(frac * N_BUCKETS)}"
        for name, frac in fractions.items()
    )
    return f"{bucket} < (CASE {cases} ELSE {round(default * N_BUCKETS)} END)"


def stratified_topk(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    key: str,
    salt: str = "topk",
    *,
    fast: bool = False,
) -> DataFrame:
    """Exactly min(k, stratum size) rows per stratum, chosen by hash
    rank — a deterministic reservoir sample (balanced eval sets,
    per-cluster representatives). ONE window shuffle on the strata
    key; the hash order is uniform so the pick is unbiased, and the
    (hash, key) order key is unique so reruns and engines agree."""
    from pyspark.sql import Window

    h = portable_hash64(
        F.concat(F.col(key).cast("string"), F.lit("#" + salt)), fast=fast
    )
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def stratified_topk_sql(
    strata_exprs: str, key_expr: str, salt: str = "topk"
) -> str:
    """DuckDB twin: the same hash-rank window, as a qualify-style rank
    expression — embed in ROW_NUMBER() OVER (...) <= k."""
    keyed = f"(CAST({key_expr} AS VARCHAR) || '#{salt}')"
    h = f"CAST('0x' || substr(md5({keyed}), 1, 15) AS BIGINT)"
    return (
        f"ROW_NUMBER() OVER (PARTITION BY {strata_exprs} "
        f"ORDER BY {h}, {key_expr})"
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    key: str,
    salt: str = "wsample",
    *,
    fast: bool = False,
) -> DataFrame:
    """Keep each row with probability equal to its OWN weight expression
    (clamped to [0, 1]), deterministically — the importance-resampling
    step of corpus curation: keep probability proportional to a quality
    or informativeness score, so low-value documents thin out without a
    hard cutoff (hard thresholds are `stratified_sample`'s job).

    `stratified_sample` generalized from per-stratum constants to a
    per-row column. Map-only (no shuffle, no state); monotone in the
    weight: raising a row's weight can only flip it from dropped to
    kept under the same salt. Resolution is 1/N_BUCKETS (0.1%).
    """
    bucket = hash_bucket(key, salt, fast=fast)
    w = F.least(F.greatest(weight.cast("double"), F.lit(0.0)), F.lit(1.0))
    # floor, not round: half-up vs half-even rounding differs between
    # engines; floor of the same IEEE double product agrees everywhere
    return df.filter(bucket < F.floor(w * N_BUCKETS))


def weighted_sample_sql(
    weight_expr: str, key_expr: str, salt: str = "wsample"
) -> str:
    """DuckDB WHERE-clause twin of `weighted_sample`."""
    bucket = hash_bucket_sql(key_expr, salt)
    w = f"LEAST(GREATEST(CAST({weight_expr} AS DOUBLE), 0.0), 1.0)"
    return f"{bucket} < FLOOR({w} * {N_BUCKETS})"


#: 31-bit Mersenne prime — uniform-draw modulus for the Gumbel trick.
_M31 = (1 << 31) - 1


def gumbel_key(
    log_weight: Column,
    key: Column | str,
    salt: str = "gumbel",
    round_dp: int = 4,
    *,
    fast: bool = False,
) -> Column:
    """Per-row Gumbel-perturbed sampling key: log_weight + g where
    g = −ln(−ln(u)) and u is a deterministic hash-uniform in (0, 1)
    ((h mod (2^31−1)) + 1) / 2^31 — an exactly-representable dyadic
    rational, so both engines feed ln identical doubles. Rounded to
    `round_dp` so the cross-engine contract is the registry's usual
    rounded-double one."""
    c = F.col(key) if isinstance(key, str) else key
    h = portable_hash64(
        F.concat(c.cast("string"), F.lit("#" + salt)), fast=fast
    )
    u = ((h % F.lit(_M31)) + F.lit(1)) / F.lit(float(1 << 31))
    return F.round(log_weight - F.log(-F.log(u)), round_dp)


def gumbel_topk_sample(
    df: DataFrame,
    log_weight: Column,
    k: int,
    key: str,
    salt: str = "gumbel",
    round_dp: int = 4,
    *,
    fast: bool = False,
) -> DataFrame:
    """Fixed-size weighted sample WITHOUT replacement in ONE pass —
    the Gumbel-max / Efraimidis–Spirakis trick: perturb each row's
    log-weight with deterministic Gumbel noise and keep the global
    top-k keys. Distributionally this samples k rows with probability
    proportional to exp(log_weight) without replacement, which is the
    DSIR resampling step (pair with `classify.dsir_weights`) and the
    general answer to "draw a fixed-size weighted subsample of a
    100 TB corpus" — `weighted_sample` is Bernoulli (size varies),
    this pins the size.

    Scale shape: the key is map-only; the top-k is a TakeOrdered
    (per-partition heaps + k-row driver merge) — never a global
    window, never a full sort. Deterministic: the noise is keyed to
    the row, and the (gumbel_key, key) order is unique, so reruns,
    engines and partitionings pick the same k rows.

    Returns the selected rows with their `gumbel_key` column.
    """
    if k <= 0:
        raise ValueError(f"gumbel_topk_sample: k must be positive, got {k}")
    out = df.withColumn(
        "gumbel_key",
        gumbel_key(log_weight, key, salt, round_dp, fast=fast),
    )
    return out.orderBy(
        F.col("gumbel_key").desc(), F.col(key).asc()
    ).limit(k)


def gumbel_key_sql(
    log_w_expr: str,
    key_expr: str,
    salt: str = "gumbel",
    round_dp: int = 4,
) -> str:
    """DuckDB twin of `gumbel_key` — embed in an ORDER BY ... LIMIT k
    with the same (DESC, key ASC) tie-break as `gumbel_topk_sample`."""
    keyed = f"(CAST({key_expr} AS VARCHAR) || '#{salt}')"
    h = f"CAST('0x' || substr(md5({keyed}), 1, 15) AS BIGINT)"
    u = f"(({h} % {_M31}) + 1) / {float(1 << 31)!r}"
    return f"ROUND(({log_w_expr}) - ln(-ln({u})), {round_dp})"


def mixture_balance(
    df: DataFrame,
    strata_col: str,
    targets: Mapping[str, int],
    key: str,
    salt: str = "mix",
    *,
    fast: bool = False,
) -> DataFrame:
    """Deterministic domain/source mixing: exactly min(target, stratum
    size) rows per stratum, chosen by hash rank; strata without a
    target are dropped. This is the corpus-assembly step that hits a
    prescribed data mixture ("60% web, 25% books, 15% code") as row
    COUNTS — `stratified_sample` scales by fractions of whatever is
    there, this pins absolute budgets.

    ONE window shuffle partitioned by the stratum; the (hash, key)
    order key is unique, so reruns, engines and partition layouts all
    pick the same rows, and a stratum's sample is stable under growth
    of OTHER strata (per-stratum rank ignores them).
    """
    from pyspark.sql import Window

    if not targets:
        raise ValueError(
            "mixture_balance: targets must be non-empty (an empty "
            "mixture keeps nothing — filter explicitly if that is "
            "intended)"
        )
    h = portable_hash64(
        F.concat(F.col(key).cast("string"), F.lit("#" + salt)), fast=fast
    )
    kmap = None
    for name, k in targets.items():
        cond = F.col(strata_col) == name
        kmap = F.when(cond, k) if kmap is None else kmap.when(cond, k)
    kmap = kmap.otherwise(F.lit(0))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= kmap)
        .drop("__rk")
    )


def mixture_balance_sql(
    strata_expr: str, targets: Mapping[str, int], key_expr: str, salt: str = "mix"
) -> str:
    """DuckDB twin of `mixture_balance`: rank-vs-target predicate for a
    QUALIFY-style subquery filter."""
    keyed = f"(CAST({key_expr} AS VARCHAR) || '#{salt}')"
    h = f"CAST('0x' || substr(md5({keyed}), 1, 15) AS BIGINT)"
    cases = " ".join(
        f"WHEN {strata_expr} = '{name}' THEN {k}" for name, k in targets.items()
    )
    return (
        f"ROW_NUMBER() OVER (PARTITION BY {strata_expr} "
        f"ORDER BY {h}, {key_expr}) <= (CASE {cases} ELSE 0 END)"
    )


def cluster_balanced_sample(
    df: DataFrame,
    strata_col: str,
    per_stratum: int,
    key: str,
    salt: str = "cbal",
    *,
    fast: bool = False,
) -> DataFrame:
    """Semantic-diversity curation: exactly min(per_stratum, |stratum|)
    rows from EVERY stratum, chosen by hash rank — `mixture_balance`
    with a uniform budget and no drop-unlisted-strata semantics, built
    for strata that are DISCOVERED (embedding-cluster cells from
    `similarity.ivf_cells`, CC components, …) rather than enumerated
    up front: a targets mapping can't list cluster ids it hasn't seen,
    and a new cell appearing in the next corpus revision must default
    to SAMPLED, not silently dropped.

    Pairing nearest-centroid cells with this is the standard
    diversity-preserving selection step (cluster-balanced sampling):
    uniform-over-clusters beats uniform-over-rows when the corpus is
    dominated by one dense mode. ONE window shuffle partitioned by the
    stratum; the (hash, key) order key is unique, so reruns, engines,
    and partition layouts pick the same rows, and a stratum's sample
    never changes because OTHER strata grew. At 100 TB the window's
    per-stratum sort is bounded by the largest cell — the centroid
    count is the knob, exactly as in `semantic_dedup`.
    """
    if per_stratum < 1:
        raise ValueError(
            f"cluster_balanced_sample: per_stratum={per_stratum} "
            "must be >= 1 (an empty sample keeps nothing)"
        )
    from pyspark.sql import Window

    h = portable_hash64(
        F.concat(F.col(key).cast("string"), F.lit("#" + salt)), fast=fast
    )
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= per_stratum)
        .drop("__rk")
    )


def cluster_balanced_sample_sql(
    strata_expr: str, per_stratum: int, key_expr: str, salt: str = "cbal"
) -> str:
    """DuckDB twin of `cluster_balanced_sample`: rank-vs-budget
    predicate for a QUALIFY-style subquery filter."""
    keyed = f"(CAST({key_expr} AS VARCHAR) || '#{salt}')"
    h = f"CAST('0x' || substr(md5({keyed}), 1, 15) AS BIGINT)"
    return (
        f"ROW_NUMBER() OVER (PARTITION BY {strata_expr} "
        f"ORDER BY {h}, {key_expr}) <= {per_stratum}"
    )


def deterministic_shuffle(
    df: DataFrame,
    key: str,
    n_buckets: int = 64,
    salt: str = "shuffle",
    *,
    fast: bool = False,
) -> DataFrame:
    """Reproducible global shuffle order for training-data serving:
    every row gets (shuffle_bucket, shuffle_rank), where global order =
    bucket-major, rank-minor. `orderBy(rand())` is neither reproducible
    nor resumable; keying the order to a row hash makes the epoch-0
    data order a pure function of the corpus — re-runs, engine changes
    and partition layouts all serve identical batches.

    One shuffle: rows hash-route to `n_buckets` window partitions
    (corpus/n_buckets rows each — size buckets so one fits an executor
    task), rank is a within-bucket window ordered by (hash, key); a
    writer then emits one sorted file per bucket and readers stream
    buckets in order (or round-robin them for approximate interleave).
    """
    c = F.col(key)
    h = portable_hash64(
        F.concat(c.cast("string"), F.lit("#" + salt)), fast=fast
    )
    from pyspark.sql import Window

    w = Window.partitionBy("shuffle_bucket").orderBy("h", key)
    return (
        df.withColumn("h", h)
        .withColumn("shuffle_bucket", F.pmod(F.col("h"), n_buckets).cast("int"))
        .withColumn("shuffle_rank", F.row_number().over(w))
        .drop("h")
    )


def deterministic_shuffle_sql(
    expr: str, n_buckets: int = 64, salt: str = "shuffle"
) -> str:
    """DuckDB twin of `deterministic_shuffle`'s (bucket, rank) pair."""
    h = f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR) || '#{salt}'), 1, 15) AS BIGINT)"
    return (
        f"CAST({h} % {n_buckets} AS INT) AS shuffle_bucket, "
        f"ROW_NUMBER() OVER (PARTITION BY {h} % {n_buckets} "
        f"ORDER BY {h}, {expr}) AS shuffle_rank"
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    key: str,
    budget: int,
    tau: float = 0.5,
    salt: str = "tmix",
    eps: float = 1e-9,
    *,
    fast: bool = False,
) -> DataFrame:
    """Temperature-weighted mixture sampling: stratum l receives
    k_l = min(n_l, floor(budget · n_l^τ / Σ n^τ)) rows, picked by the
    same deterministic hash rank as `mixture_balance` — the
    multilingual-LM sampling recipe (τ<1 up-weights small strata
    relative to proportional sampling; τ=1 is proportional, τ=0 is
    uniform-across-strata). Unlike `mixture_balance`, the per-stratum
    budgets derive from CORPUS STATISTICS, so the mixture tracks the
    data as it grows.

    Scale shape: one stratum count aggregate, a 1-row weight-sum
    broadcast back, a broadcast join of the tiny per-stratum target
    table, then the single hash-rank window shuffle.

    Cross-engine determinism: τ=0.5 computes weights via sqrt (IEEE
    correctly-rounded in every engine); other τ go through pow, whose
    last ulp may differ between libm implementations — the `eps` guard
    absorbs that unless budget·p_l sits within eps of an integer.
    """
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError("budget must be non-negative")
    weight = (
        F.sqrt(F.col("__n"))
        if tau == 0.5
        else F.pow(F.col("__n"), F.lit(float(tau)))
    )
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n"))
    wsum = counts.agg(F.sum(weight).alias("__w"))
    targets = (
        counts.crossJoin(F.broadcast(wsum))
        .select(
            strata_col,
            F.least(
                F.col("__n"),
                F.floor(
                    F.lit(float(budget)) * weight / F.col("__w")
                    + F.lit(eps)
                ).cast("long"),
            ).alias("__k"),
        )
    )
    h = portable_hash64(
        F.concat(F.col(key).cast("string"), F.lit("#" + salt)), fast=fast
    )
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key).asc())
    return (
        df.join(F.broadcast(targets), strata_col)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__k"))
        .drop("__rk", "__k")
    )


def temperature_mix_sql(
    table: str,
    strata_col: str,
    key: str,
    budget: int,
    tau: float = 0.5,
    salt: str = "tmix",
    eps: float = 1e-9,
    select_cols: str = "*",
) -> str:
    """DuckDB twin of `temperature_mix` (τ=0.5 mirrors the sqrt path)."""
    wexpr = "sqrt(n)" if tau == 0.5 else f"pow(n, {tau!r})"
    keyed = f"(CAST({key} AS VARCHAR) || '#{salt}')"
    h = f"CAST('0x' || substr(md5({keyed}), 1, 15) AS BIGINT)"
    return f"""
        WITH counts AS (
            SELECT {strata_col} AS s, COUNT(*) AS n
            FROM {table} GROUP BY 1
        ),
        wsum AS (SELECT SUM({wexpr}) AS w FROM counts),
        targets AS (
            SELECT s,
                   LEAST(n, CAST(FLOOR({budget} * {wexpr} / w + {eps!r})
                                 AS BIGINT)) AS k
            FROM counts CROSS JOIN wsum
        ),
        ranked AS (
            SELECT {select_cols},
                   ROW_NUMBER() OVER (
                       PARTITION BY {strata_col}
                       ORDER BY {h} ASC, {key} ASC
                   ) AS rk
            FROM {table}
        )
        SELECT {select_cols} FROM ranked
        JOIN targets ON {strata_col} = targets.s
        WHERE rk <= targets.k
    """

def epoch_plan(
    docs: DataFrame,
    strata_col: str,
    budget_tokens: int,
    tau: float = 0.5,
    max_epochs: float = 4.0,
    eps: float = 1e-9,
) -> DataFrame:
    """Token-budget mixing plan with repetition caps — the planning
    stage of assembling a training mixture when the token budget
    exceeds some sources' size: stratum s holding n_s tokens is
    allotted desired_s = budget · n_s^τ / Σ n^τ tokens (the
    `temperature_mix` recipe at token grain), giving a repeat factor
    epochs_s = desired_s / n_s CAPPED at `max_epochs` (repeating a
    small source many times degrades quality faster than undershooting
    the budget — the data-constrained-scaling rule of thumb), so the
    plan reports per source: available tokens, the capped epoch count,
    the planned token allotment, and whether the cap bit. Summing
    planned_tokens against the budget gives the shortfall to re-weight
    or backfill.

    Pure plan computation, no data moves: ONE combinable token-count
    aggregate over the corpus + a 1-row weight-sum broadcast; output is
    one row per stratum. τ=0.5 computes weights via sqrt (IEEE
    correctly-rounded everywhere); other τ go through pow, whose last
    ulp may differ across libm builds — `eps` absorbs that at the
    floor boundary (the `temperature_mix` determinism note).
    """
    from ad_data_pipelines_spark.operators.textstats import token_count

    if budget_tokens < 0:
        raise ValueError("budget_tokens must be non-negative")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be positive")
    counts = docs.groupBy(strata_col).agg(
        F.sum(token_count("text")).cast("bigint").alias("avail_tokens")
    )
    weight = (
        F.sqrt(F.col("avail_tokens"))
        if tau == 0.5
        else F.pow(F.col("avail_tokens"), F.lit(float(tau)))
    )
    wsum = counts.agg(F.sum(weight).alias("__w"))
    raw = (
        F.lit(float(budget_tokens))
        * weight
        / F.col("__w")
        / F.col("avail_tokens")
    )
    capped = F.least(raw, F.lit(float(max_epochs)))
    return (
        counts.crossJoin(F.broadcast(wsum))
        .select(
            strata_col,
            "avail_tokens",
            F.round(capped, 4).alias("epochs"),
            F.floor(F.col("avail_tokens") * capped + F.lit(eps))
            .cast("bigint")
            .alias("planned_tokens"),
            (raw > F.lit(float(max_epochs))).alias("capped"),
        )
    )


def epoch_plan_sql(
    strata_col: str,
    budget_tokens: int,
    tau: float = 0.5,
    max_epochs: float = 4.0,
    eps: float = 1e-9,
) -> str:
    """DuckDB twin of `epoch_plan` over the documents table (τ=0.5
    mirrors the sqrt path; expression shapes match the Spark side op
    for op so both engines see identical doubles)."""
    wexpr = (
        "sqrt(avail_tokens)" if tau == 0.5 else f"pow(avail_tokens, {tau!r})"
    )
    raw = f"{float(budget_tokens)!r} * {wexpr} / w / avail_tokens"
    return f"""
        WITH counts AS (
            SELECT {strata_col},
                   CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                        AS BIGINT) AS avail_tokens
            FROM documents GROUP BY 1
        ),
        wsum AS (SELECT SUM({wexpr}) AS w FROM counts)
        SELECT {strata_col},
               avail_tokens,
               ROUND(LEAST({raw}, {float(max_epochs)!r}), 4) AS epochs,
               CAST(FLOOR(avail_tokens
                          * LEAST({raw}, {float(max_epochs)!r})
                          + {eps!r}) AS BIGINT) AS planned_tokens,
               ({raw}) > {float(max_epochs)!r} AS capped
        FROM counts CROSS JOIN wsum
    """
