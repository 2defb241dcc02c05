"""ad_data_pipelines_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic Spark (DataFrame/SQL/Catalyst) engine providing
the query and data-processing capabilities of the reference system
`fanw86/ad_data_pipelines` (a transit-analytics batch ETL: layered
ods/dwd/dim/ads warehouse over AFC fact + VDV dimension data), plus
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Design principles (SURVEY.md §7):
  * Declarative DataFrame/SQL plans — Catalyst does pushdown, pruning,
    partial aggregation, broadcast-join selection; we never hand-schedule.
  * Column-expression library instead of row UDFs — everything the
    reference did with Python/R row functions is a pure `Column` here.
  * Pandas UDFs (Arrow) only where built-ins genuinely cannot express the
    semantics (none needed for reference parity; used for multimodal stubs).
  * Scale-first: all dimension joins broadcast, facts partitioned by date,
    AQE enabled, no driver-side collects in any pipeline.
"""

__version__ = "0.1.0"

from ad_data_pipelines_spark.session import get_spark  # noqa: F401
