"""Column-expression library: the reference's scalar/row-wise functions
re-expressed as pure Spark `Column`s (SURVEY.md §2.7/§2.8 — no UDFs)."""

from ad_data_pipelines_spark.functions.binning import right_closed_bins, threshold_bins
from ad_data_pipelines_spark.functions.cleaning import (
    NA_STRINGS,
    deep_clean,
    nullify_na_strings,
    strip_quotes,
)
from ad_data_pipelines_spark.functions.hashing import (
    MERSENNE_61,
    minhash_perm,
    portable_hash64,
)
from ad_data_pipelines_spark.functions.mapping import (
    first_digit_map,
    pair_case,
    patch_values,
    prefix_map,
)
from ad_data_pipelines_spark.functions.timeutil import (
    clamp_outliers,
    days_in_month,
    minutes_between,
    month_str,
    quarter_month_part,
)

__all__ = [
    "NA_STRINGS",
    "MERSENNE_61",
    "deep_clean",
    "nullify_na_strings",
    "strip_quotes",
    "right_closed_bins",
    "threshold_bins",
    "portable_hash64",
    "minhash_perm",
    "first_digit_map",
    "pair_case",
    "patch_values",
    "prefix_map",
    "clamp_outliers",
    "days_in_month",
    "minutes_between",
    "month_str",
    "quarter_month_part",
]
