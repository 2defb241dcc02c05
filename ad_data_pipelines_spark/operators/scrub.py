"""PII scrubbing: detect and redact emails, URLs, IPv4s and long digit
runs in document text — the compliance pass every training-data
pipeline runs before a corpus ships (C4/Dolma-style rule scrubbing).

Beyond-reference. Pure `regexp_count`/`regexp_replace` columns — JVM
regex inside codegen, no UDFs; at 100 TB this is a map-only stage that
fuses with whatever scan or filter surrounds it.

Patterns deliberately stay inside the Java-regex ∩ RE2 common subset
(character classes, bounded repeats, \\b; no lookarounds) so the DuckDB
twins match byte-for-byte — cross-engine agreement is asserted on
crafted rows in tests/test_operators.py. DuckDB's regexp_replace needs
the 'g' flag to match Spark's replace-all default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Detection patterns (order matters for redaction: URLs before emails
#: would eat "user@host" inside query strings — emails go first).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "longnum": r"\b\d{9,}\b",  # phone/account/SSN-ish digit runs
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """{kind: match-count column} for every PII pattern."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.regexp_count(c, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    }


def pii_redact(text: Column | str) -> Column:
    """Replace every PII match with a typed placeholder token."""
    c = F.col(text) if isinstance(text, str) else text
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{kind.upper()}>")
    return c


def flag_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs + per-kind match counts + `has_pii` flag + redacted text."""
    counts = pii_counts(text_col)
    out = docs
    for kind, col in counts.items():
        out = out.withColumn(f"n_{kind}", col)
    total = sum([F.col(f"n_{k}") for k in PII_PATTERNS], F.lit(0))
    return out.withColumn("has_pii", (total > 0).cast("int")).withColumn(
        "text_redacted", pii_redact(text_col)
    )


def pii_counts_sql(text_expr: str) -> dict[str, str]:
    """DuckDB twins: len(regexp_extract_all(...)) == Spark regexp_count."""
    return {
        kind: f"len(regexp_extract_all({text_expr}, '{pat}'))"
        for kind, pat in PII_PATTERNS.items()
    }


def pii_redact_sql(text_expr: str) -> str:
    """DuckDB twin of `pii_redact` ('g' flag = Spark's replace-all)."""
    out = text_expr
    for kind, pat in PII_PATTERNS.items():
        out = f"regexp_replace({out}, '{pat}', '<{kind.upper()}>', 'g')"
    return out


def remove_boilerplate_spans(
    docs: DataFrame,
    sep: str = "\n",
    max_df: int | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """C4-style boilerplate REMOVAL (the `boilerplate_ngrams` reporter's
    acting sibling): split each doc into spans on `sep` (lines in
    production; any unit the separator defines), drop every non-blank
    span whose document frequency exceeds the threshold — `max_df`
    absolute or `max_df_frac` of the corpus — and reassemble the doc
    with original order and spacing. Returns (doc_id, clean_text,
    n_removed); docs whose every span is boilerplate come back with
    empty text, never a missing row.

    Scale shape: span TEXT never shuffles for the counting — spans
    reduce to md5 hashes, the document-frequency aggregate runs on
    (hash, doc_id) pairs, and only the (tiny) heavy-hitter hash set
    joins back, broadcast. Reassembly is one groupBy(doc_id) with
    array_sort over (pos, span) structs, order-correct under any
    partitioning. The corpus-size scalar comes from a 1-row aggregate
    cross-joined in — no driver collect.
    """
    import re as _re

    if (max_df is None) == (max_df_frac is None):
        raise ValueError("pass exactly one of max_df / max_df_frac")
    spans = docs.select(
        "doc_id",
        F.posexplode(F.split("text", _re.escape(sep), -1)).alias(
            "pos", "span"
        ),
    )
    hashed = spans.filter(F.trim("span") != "").select(
        "doc_id", F.md5("span").alias("h")
    )
    df_counts = hashed.groupBy("h").agg(
        F.count_distinct("doc_id").alias("df")
    )
    if max_df is not None:
        heavy = df_counts.filter(F.col("df") > max_df).select("h")
    else:
        total = docs.agg(F.count_distinct("doc_id").alias("__total"))
        heavy = (
            df_counts.crossJoin(F.broadcast(total))
            .filter(F.col("df") > F.col("__total") * max_df_frac)
            .select("h")
        )
    marked = spans.join(
        F.broadcast(heavy.withColumn("__rm", F.lit(1))),
        F.md5("span") == F.col("h"),
        "left",
    ).select(
        "doc_id",
        "pos",
        "span",
        (F.col("__rm").isNotNull() & (F.trim("span") != "")).alias("rm"),
    )
    rebuilt = marked.groupBy("doc_id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("rm"), F.struct("pos", "span"))
                    )
                ),
                lambda s: s["span"],
            ),
        ).alias("clean_text"),
        F.count(F.when(F.col("rm"), 1)).cast("bigint").alias("n_removed"),
    )
    return (
        docs.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
    )


def remove_boilerplate_sql(sep: str, max_df_frac: float) -> str:
    """DuckDB twin of `remove_boilerplate_spans(max_df_frac=...)` over
    the documents table (literal separator)."""
    s = sep.replace("'", "''")
    return f"""
        WITH d AS (
            SELECT doc_id, string_split(text, '{s}') AS arr FROM documents
        ),
        spans AS (
            SELECT doc_id, i AS pos, arr[i] AS span
            FROM d, LATERAL unnest(generate_series(1, len(arr))) AS t(i)
        ),
        tot AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
        heavy AS (
            SELECT md5(span) AS h
            FROM spans, tot
            WHERE trim(span) <> ''
            GROUP BY 1, tot.n
            HAVING COUNT(DISTINCT doc_id) > tot.n * {max_df_frac}
        ),
        marked AS (
            SELECT doc_id, pos, span,
                   (trim(span) <> ''
                    AND md5(span) IN (SELECT h FROM heavy)) AS rm
            FROM spans
        )
        SELECT doc_id,
               COALESCE(string_agg(CASE WHEN NOT rm THEN span END, '{s}'
                                   ORDER BY pos), '') AS clean_text,
               CAST(COUNT(CASE WHEN rm THEN 1 END) AS BIGINT) AS n_removed
        FROM marked GROUP BY 1
    """


# --- Text normalization ----------------------------------------------------

#: control characters (C0 + DEL) — explicit byte class so Java regex and
#: RE2/DuckDB agree exactly (no \p{Cntrl} dialect differences).
_CTRL_CLASS = r"[\x00-\x1f\x7f]"


def normalized_text_expr(text_col: str = "text"):
    """The `normalize_text` map algebra as a bare Column (lowercase,
    control chars → space, whitespace runs collapsed, trimmed) — for
    callers that replace the text IN PLACE with `withColumn` instead of
    joining the (doc_id, norm_text) frame back on: a 1:1 self-join by
    doc_id shuffles the whole text payload twice for a value that is a
    pure function of the row (guide §8 — decide with small rows, and
    here not even that: just compute in place)."""
    c = F.col(text_col)
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), _CTRL_CLASS, " "), r"\s+", " "
        )
    )


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text normalization — the step every corpus pipeline
    runs BEFORE hashing/dedup so that case and whitespace variants of
    the same content collide: lowercase, control chars → space,
    whitespace runs collapsed to single spaces, trimmed.

    Output: (doc_id, norm_text, changed, n_chars_saved). Pure map-only
    column algebra (lower + two regexp_replace + trim) — narrow,
    codegen, zero shuffle at any scale. Feed `norm_text` into
    `operators/dedup` to catch near-identical casing/spacing variants
    that raw exact-hash dedup misses.
    """
    c = F.col(text_col)
    norm = normalized_text_expr(text_col)
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        (norm != c).alias("changed"),
        (F.length(c) - F.length(norm)).cast("bigint").alias(
            "n_chars_saved"
        ),
    )


def normalize_text_sql(text_expr: str = "text") -> str:
    """DuckDB twin of `normalize_text` (regexp_replace needs the 'g'
    flag to match Spark's replace-all semantics)."""
    norm = (
        f"trim(regexp_replace(regexp_replace(lower({text_expr}), "
        f"'[\\x00-\\x1f\\x7f]', ' ', 'g'), '\\s+', ' ', 'g'))"
    )
    return f"""
        SELECT doc_id,
               {norm} AS norm_text,
               {norm} <> {text_expr} AS changed,
               CAST(length({text_expr}) - length({norm}) AS BIGINT)
                   AS n_chars_saved
        FROM documents
    """
